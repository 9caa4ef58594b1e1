"""Lag/lead, resampling, sessionization parity tests."""

import numpy as np
import pandas as pd
import pytest

from recipys_spark import Accumulator, Recipe
from recipys_spark.operators import (
    StepLag,
    StepLead,
    StepResampling,
    StepSessionize,
)
from recipys_spark.operators.timeseries import parse_resolution
from recipys_spark.selector import all_of

from tests.conftest import collect_sorted, make_example_pdf


def _recipe(spark, pdf):
    return Recipe(
        spark.createDataFrame(pdf),
        outcomes="y",
        predictors=["x1", "x2", "x3", "x4"],
        groups="id",
        sequences="time",
    )


def test_parse_resolution():
    assert parse_resolution("2h") == 7200
    assert parse_resolution("30m") == 1800
    assert parse_resolution("90s") == 90
    assert parse_resolution("1d") == 86400
    with pytest.raises(ValueError):
        parse_resolution("2 fortnights")


def test_lag_lead(spark):
    pdf = make_example_pdf()
    rec = _recipe(spark, pdf).add_step(StepLag(sel=all_of(["x1"]), lags=(1, 2)))
    rec.add_step(StepLead(sel=all_of(["x1"]), leads=(1,)))
    got = collect_sorted(rec.prep())
    g = pdf.groupby("id")["x1"]
    np.testing.assert_allclose(got["x1_lag_1"].to_numpy(), g.shift(1).to_numpy(), equal_nan=True)
    np.testing.assert_allclose(got["x1_lag_2"].to_numpy(), g.shift(2).to_numpy(), equal_nan=True)
    np.testing.assert_allclose(got["x1_lead_1"].to_numpy(), g.shift(-1).to_numpy(), equal_nan=True)


def test_lag_never_crosses_group(spark):
    pdf = make_example_pdf()
    rec = _recipe(spark, pdf).add_step(StepLag(sel=all_of(["x1"]), lags=(1,)))
    got = collect_sorted(rec.prep())
    # first row of each group has null lag
    firsts = got.groupby("id").head(1)
    assert firsts["x1_lag_1"].isna().all()


def test_resample_halves_rows(spark):
    """Reference row-count assertion (test_steps.py:61–124): hourly data
    resampled to 2h halves the row count per group."""
    pdf = make_example_pdf()
    rec = _recipe(spark, pdf).add_step(
        StepResampling(
            new_resolution="2h",
            accumulator_dict={all_of(["x1"]): Accumulator.MEAN},
            default_accumulator=Accumulator.LAST,
        )
    )
    out = rec.prep()
    assert out.count() == 5  # 6 hourly rows -> 3 buckets, 4 -> 2
    got = collect_sorted(out)
    # bucket mean parity for x1, group 1 bucket [0h,2h)
    g1 = pdf[pdf.id == 1]
    expected_first = g1.iloc[:2]["x1"].mean()
    assert got[got.id == 1]["x1"].iloc[0] == pytest.approx(expected_first)


def test_resample_last_is_last_non_null_by_time(spark):
    pdf = make_example_pdf(nan_x2=True)
    rec = _recipe(spark, pdf).add_step(
        StepResampling(new_resolution="2h", default_accumulator=Accumulator.LAST)
    )
    got = collect_sorted(rec.prep())
    # pandas oracle: resample 2h with last (skipna)
    oracle = (
        pdf.set_index("time")
        .groupby("id")
        .resample("2h")["x2"]
        .last()
        .reset_index()
        .sort_values(["id", "time"])
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["x2"].to_numpy(dtype=float), oracle["x2"].to_numpy(dtype=float), equal_nan=True
    )


def test_resample_fill_gaps(spark):
    pdf = make_example_pdf()
    # knock out the middle rows to create a gap in group 1
    pdf = pdf.drop(index=[2, 3]).reset_index(drop=True)
    rec = _recipe(spark, pdf).add_step(
        StepResampling(new_resolution="1h", fill_gaps=True)
    )
    got = collect_sorted(rec.prep())
    # group 1 spans 0..5h -> 6 dense buckets despite dropped rows
    assert (got["id"] == 1).sum() == 6
    # the gap rows exist with null payloads
    assert got[got.id == 1]["x1"].isna().sum() == 2


def test_sessionize(spark):
    pdf = make_example_pdf()
    # inject a 2-hour gap inside group 1: shift last two rows by +3h
    pdf.loc[[4, 5], "time"] = pdf.loc[[4, 5], "time"] + pd.Timedelta(hours=3)
    rec = _recipe(spark, pdf).add_step(StepSessionize(gap="90m"))
    got = collect_sorted(rec.prep())
    g1 = got[got.id == 1]["session_id"].to_numpy()
    np.testing.assert_array_equal(g1, [0, 0, 0, 0, 1, 1])
    g2 = got[got.id == 2]["session_id"].to_numpy()
    np.testing.assert_array_equal(g2, [0, 0, 0, 0])


def test_sessionize_requires_temporal_sequence(spark):
    pdf = make_example_pdf().drop(columns=["time"]).assign(seq=range(10))
    rec = Recipe(
        spark.createDataFrame(pdf[["id", "seq", "y", "x1", "x2", "x3", "x4"]]),
        groups="id",
        sequences="seq",
    ).add_step(StepSessionize(gap="30m"))
    with pytest.raises(ValueError):
        rec.prep()


def test_time_rollup_grains_match_pandas(spark):
    """One grouping-sets pass ≡ the three separate pandas groupbys."""
    import numpy as np
    import pandas as pd

    from recipys_spark.operators.timeseries import time_rollup

    rs = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "user_id": rs.randint(0, 4, 300),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rs.randint(0, 72 * 3600, 300), unit="s"),
            "value": rs.normal(size=300).round(3),
        }
    )
    out = time_rollup(
        spark.createDataFrame(pdf), group_cols=["user_id"]
    ).toPandas()

    hour = out[out.grain == "hour"]
    day = out[out.grain == "day"]
    total = out[out.grain == "total"]

    exp_hour = pdf.groupby(
        ["user_id", pdf.ts.dt.floor("D"), pdf.ts.dt.floor("h")]
    ).value.agg(["count", "sum"])
    assert len(hour) == len(exp_hour)
    got = {
        (r.user_id, r.ts_day, r.ts_hour): (r.n, round(r.value_sum, 9))
        for r in hour.itertuples()
    }
    exp = {k: (v["count"], round(v["sum"], 9)) for k, v in exp_hour.iterrows()}
    assert got == exp

    exp_day = pdf.groupby(["user_id", pdf.ts.dt.floor("D")]).value.sum()
    assert len(day) == len(exp_day)
    assert day.ts_hour.isna().all()

    assert len(total) == pdf.user_id.nunique()
    assert total.ts_day.isna().all() and total.ts_hour.isna().all()
    # exact decimal sums: rollup levels agree exactly, not approximately
    assert sorted(total.value_sum.round(9)) == sorted(
        day.groupby(day.user_id).value_sum.sum().round(9)
    )


def test_time_rollup_grain_order_validated(spark):
    import pytest as _pytest

    from recipys_spark.operators.timeseries import time_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with _pytest.raises(ValueError, match="coarse"):
        time_rollup(ev, grains=("hour", "day"))
    with _pytest.raises(ValueError, match="coarse"):
        time_rollup(ev, grains=("day", "day"))
    with _pytest.raises(ValueError, match="unknown time grain"):
        time_rollup(ev, grains=("fortnight",))
