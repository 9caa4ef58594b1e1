"""StepHistorical parity vs pandas expanding oracles (reference
tests/test_steps.py:127–154 re-expressed; oracle = the reference's own
pandas-backend semantics: groupby(id).expanding() with skipna)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from recipys_spark import Accumulator, Recipe
from recipys_spark.operators import StepHistorical
from recipys_spark.selector import all_numeric_predictors, all_of

from tests.conftest import collect_sorted, make_example_pdf


def pandas_expanding_oracle(pdf, col, fun):
    g = pdf.groupby("id")[col]
    if fun is Accumulator.MAX:
        return g.cummax()
    if fun is Accumulator.MIN:
        return g.cummin()
    if fun is Accumulator.MEAN:
        return g.expanding().mean().reset_index(drop=True)
    if fun is Accumulator.MEDIAN:
        return g.expanding().median().reset_index(drop=True)
    if fun is Accumulator.COUNT:
        return g.expanding().count().reset_index(drop=True)
    if fun is Accumulator.VAR:
        return g.expanding().var().reset_index(drop=True)
    raise AssertionError(fun)


@pytest.mark.parametrize(
    "fun",
    [
        Accumulator.MAX,
        Accumulator.MIN,
        Accumulator.MEAN,
        Accumulator.MEDIAN,
        Accumulator.COUNT,
        Accumulator.VAR,
    ],
)
@pytest.mark.parametrize("with_nan", [False, True])
def test_historical_matches_pandas(spark, fun, with_nan):
    pdf = make_example_pdf(nan_x1=with_nan)
    rec = Recipe(
        spark.createDataFrame(pdf),
        outcomes="y",
        predictors=["x1", "x2"],
        groups="id",
        sequences="time",
    )
    rec.add_step(StepHistorical(sel=all_numeric_predictors(), fun=fun))
    got = collect_sorted(rec.prep())
    for col in ["x1", "x2"]:
        expected = pandas_expanding_oracle(pdf, col, fun).to_numpy(dtype="float64")
        actual = got[f"{col}_{fun.value}"].to_numpy(dtype="float64")
        np.testing.assert_allclose(actual, expected, equal_nan=True, err_msg=f"{col} {fun}")


def test_historical_last_row_equals_group_agg(spark, example_recipe):
    """Reference invariant: at a group's last row the expanding max/min
    equal the whole-group aggregate (reference test_steps.py:137–154)."""
    example_recipe.add_step(StepHistorical(fun=Accumulator.MAX, suffix="max"))
    out = collect_sorted(example_recipe.prep())
    for gid, grp in out.groupby("id"):
        assert grp["x1_max"].iloc[-1] == pytest.approx(grp["x1"].max())


def test_historical_rejects_first_last():
    with pytest.raises(TypeError):
        StepHistorical(fun=Accumulator.LAST)
    with pytest.raises(TypeError):
        StepHistorical(fun="max")


def test_historical_suffix_stable_across_prep_bake(spark, example_recipe):
    """Normalized reference quirk (step.py:311): suffix must not mutate,
    prep then bake must emit the same column names."""
    example_recipe.add_step(StepHistorical(fun=Accumulator.MEAN))
    prepped = example_recipe.prep()
    baked = example_recipe.bake()
    assert "x1_mean" in prepped.columns
    assert prepped.columns == baked.columns


def test_prep_equals_bake(spark, example_recipe):
    """prep(X) ≡ bake(X) on the same data (reference test_recipe.py:17–21)."""
    example_recipe.add_step(StepHistorical(fun=Accumulator.VAR))
    a = collect_sorted(example_recipe.prep())
    b = collect_sorted(example_recipe.bake())
    for c in a.columns:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())


def test_rolling_matches_pandas(spark):
    from recipys_spark.operators import StepRolling

    pdf = make_example_pdf(nan_x1=True)
    rec = Recipe(
        spark.createDataFrame(pdf),
        outcomes="y",
        predictors=["x1", "x2"],
        groups="id",
        sequences="time",
    )
    rec.add_step(StepRolling(sel=all_numeric_predictors(), fun=Accumulator.MEAN, window=3))
    rec.add_step(StepRolling(sel=all_numeric_predictors(), fun=Accumulator.MAX, window=2))
    got = collect_sorted(rec.prep())
    g = pdf.groupby("id")
    exp_mean = g["x1"].rolling(3, min_periods=1).mean().reset_index(drop=True)
    exp_max = g["x1"].rolling(2, min_periods=1).max().reset_index(drop=True)
    np.testing.assert_allclose(
        got["x1_roll3_mean"].to_numpy(), exp_mean.to_numpy(), equal_nan=True
    )
    np.testing.assert_allclose(
        got["x1_roll2_max"].to_numpy(), exp_max.to_numpy(), equal_nan=True
    )


def test_median_via_pandas_equals_window(spark):
    """The applyInPandas exact-median escape hatch equals the window
    percentile path (SURVEY §7 hard parts)."""
    pdf = make_example_pdf(nan_x1=True)
    def run(**kw):
        rec = Recipe(
            spark.createDataFrame(pdf),
            outcomes="y", predictors=["x1", "x2"], groups="id", sequences="time",
        ).add_step(StepHistorical(sel=all_numeric_predictors(), fun=Accumulator.MEDIAN, **kw))
        return collect_sorted(rec.prep())
    a = run(median_via_pandas=False)  # window percentile (oracle mirror)
    b = run()  # default: scale-safe applyInPandas streaming median
    for c in ["x1_median", "x2_median"]:
        np.testing.assert_allclose(
            a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float), equal_nan=True
        )


def test_median_long_conversation_bounded_time(spark):
    """Scale guard: the default MEDIAN plan must be the streaming
    applyInPandas path, not the O(n²) window percentile — a 200k-turn
    single conversation completes in seconds (the quadratic plan would
    take hours)."""
    import time

    import pandas as pd

    n = 200_000
    pdf = pd.DataFrame(
        {
            "id": 1,
            "time": np.arange(n),
            "x1": np.sin(np.arange(n)) * 100,
        }
    )
    rec = Recipe(
        spark.createDataFrame(pdf), predictors=["x1"], groups="id", sequences="time"
    ).add_step(StepHistorical(sel=all_numeric_predictors(), fun=Accumulator.MEDIAN))
    t0 = time.time()
    out = rec.prep()
    got = out.where(F.col("time") == n - 1).collect()
    wall = time.time() - t0
    assert wall < 120, f"expanding median took {wall:.0f}s — quadratic plan?"
    exp = float(np.median(pdf["x1"].to_numpy()))
    np.testing.assert_allclose(got[0]["x1_median"], exp)


def test_median_null_keys_survive_both_paths(spark):
    """Rows with NULL group or sequence keys must survive the Arrow
    median join-back (null-safe join) and match the window-percentile
    mirror, which keeps them via NULL window partitions/ordering."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "id": [1.0, 1.0, None, None, 2.0, 2.0],
            "time": [0.0, 1.0, 0.0, 1.0, 0.0, None],
            "x1": [10.0, 20.0, 5.0, 7.0, 1.0, 3.0],
        }
    )
    sdf = spark.createDataFrame(pdf)

    def run(**kw):
        rec = Recipe(
            sdf, predictors=["x1"], groups="id", sequences="time"
        ).add_step(
            StepHistorical(
                sel=all_numeric_predictors(), fun=Accumulator.MEDIAN, **kw
            )
        )
        return (
            rec.prep()
            .toPandas()
            .sort_values(["id", "time"], na_position="first")
            .reset_index(drop=True)
        )

    a = run(median_via_pandas=False)
    b = run()
    assert len(a) == len(pdf) and len(b) == len(pdf)
    np.testing.assert_allclose(
        a["x1_median"].to_numpy(dtype=float),
        b["x1_median"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_median_ship_paths_identical(spark, example_df_nan):
    """full-row applyInArrow ≡ narrow+join applyInPandas ≡ window
    percentile expression, including NULL normalization and NULL
    sequence keys; and the auto policy routes by passthrough width."""
    from pyspark.sql import functions as F

    def run(**kw):
        rec = Recipe(
            example_df_nan, predictors=["x1"], groups="id", sequences="time"
        ).add_step(
            StepHistorical(sel=all_of(["x1"]), fun=Accumulator.MEDIAN, **kw)
        )
        return rec.prep().orderBy("id", "time").toPandas()

    full = run(median_ship="full")
    narrow = run(median_ship="narrow")
    window = run(median_via_pandas=False)
    pd.testing.assert_frame_equal(full, narrow)
    pd.testing.assert_frame_equal(full, window)

    s = StepHistorical(sel=all_of(["x1"]), fun=Accumulator.MEDIAN)
    # example frame carries string columns x3/x4 → auto ships narrow
    assert not s._median_ship_full(example_df_nan, ["id"], ["time"])
    numeric_only = example_df_nan.select("id", "time", "x1", "y")
    assert s._median_ship_full(numeric_only, ["id"], ["time"])
    with pytest.raises(ValueError, match="median_ship"):
        StepHistorical(sel=all_of(["x1"]), fun=Accumulator.MEDIAN, median_ship="bogus")
    with pytest.raises(ValueError, match="median_ship"):
        StepHistorical(sel=all_of(["x1"]), fun=Accumulator.MAX, median_ship="full")


def test_median_ship_conflicts_with_window_path():
    with pytest.raises(ValueError, match="median_via_pandas"):
        StepHistorical(
            fun=Accumulator.MEDIAN, median_ship="full", median_via_pandas=False
        )

def test_median_batched_partition_semantics(spark):
    """The partition-batched median (one mapInArrow call per partition,
    round 7) must group exactly like Spark's groupBy within a shared
    partition: NaN float keys are ONE group (Arrow's NaN != NaN must
    not split them), NULL keys are their own group, and many groups
    per partition reproduce the window-percentile mirror."""
    import pandas as pd

    # NOTE: in a float64 pandas column None IS NaN — all three NaN-id
    # rows form ONE group (Spark's groupBy NaN normalization); (id,
    # time) stays unique per the engine's ordering-key requirement
    pdf = pd.DataFrame(
        {
            "id": [float("nan"), float("nan"), float("nan"), 1.0, 1.0, 2.0, 2.0, 3.0],
            "time": [0.0, 1.0, 2.0, 0.0, 1.0, 0.0, 1.0, 0.0],
            "x1": [4.0, 8.0, 3.0, 10.0, 20.0, 1.0, 5.0, 7.0],
        }
    )
    # coalesce(1): every group shares one partition, exercising the
    # in-partition boundary detection rather than one-group-per-task
    sdf = spark.createDataFrame(pdf).coalesce(1)

    def run(**kw):
        rec = Recipe(
            sdf, predictors=["x1"], groups="id", sequences="time"
        ).add_step(
            StepHistorical(
                sel=all_numeric_predictors(), fun=Accumulator.MEDIAN, **kw
            )
        )
        return (
            rec.prep()
            .toPandas()
            .sort_values(["id", "time"], na_position="first")
            .reset_index(drop=True)
        )

    batched = run()  # default: partition-batched Arrow path
    window = run(median_via_pandas=False)  # SQL-oracle mirror
    assert len(batched) == len(pdf)
    np.testing.assert_allclose(
        batched["x1_median"].to_numpy(dtype=float),
        window["x1_median"].to_numpy(dtype=float),
        equal_nan=True,
    )
    # NaN keys grouped together: the NaN group's expanding median at
    # time=1 is median(4, 8) = 6 — it would be 8.0 if Arrow's
    # NaN != NaN split each NaN row into its own group
    nan_rows = batched[batched["id"].isna()].sort_values("time")
    np.testing.assert_allclose(
        nan_rows["x1_median"].to_numpy(dtype=float), [4.0, 6.0, 4.0]
    )
