"""StepImputeFill parity vs the reference's expected-value semantics
(reference tests/test_steps.py:158–203): fills are group-scoped, never
cross a group boundary; leading nulls in a group stay null."""

import numpy as np
import pytest

from recipys_spark import Recipe
from recipys_spark.operators import (
    StepImputeFastForwardFill,
    StepImputeFastZeroFill,
    StepImputeFill,
)
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


@pytest.fixture
def pdf_nan():
    return make_example_pdf(nan_x1=True, nan_x2=True)


def test_ffill_matches_pandas(spark, pdf_nan):
    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeFill(sel=all_of(["x1", "x2"]), strategy="forward")
    )
    got = collect_sorted(rec.prep())
    for c in ["x1", "x2"]:
        expected = pdf_nan.groupby("id")[c].ffill().to_numpy()
        np.testing.assert_allclose(got[c].to_numpy(), expected, equal_nan=True)
    # leading nulls stay null: row 7 is the second row of group 2 but
    # x1 row 7 is NaN with row 6 present — check group boundary via x2:
    # x2 row 6 (first of group 2) is NaN and must stay NaN after ffill
    assert np.isnan(got["x2"].to_numpy()[6])


def test_bfill_matches_pandas(spark, pdf_nan):
    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeFill(sel=all_of(["x1", "x2"]), strategy="backward")
    )
    got = collect_sorted(rec.prep())
    for c in ["x1", "x2"]:
        expected = pdf_nan.groupby("id")[c].bfill().to_numpy()
        np.testing.assert_allclose(got[c].to_numpy(), expected, equal_nan=True)


def test_ffill_with_limit(spark, pdf_nan):
    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeFill(sel=all_of(["x1"]), strategy="forward", limit=1)
    )
    got = collect_sorted(rec.prep())
    expected = pdf_nan.groupby("id")["x1"].ffill(limit=1).to_numpy()
    np.testing.assert_allclose(got["x1"].to_numpy(), expected, equal_nan=True)


def test_bfill_with_limit(spark, pdf_nan):
    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeFill(sel=all_of(["x1"]), strategy="backward", limit=1)
    )
    got = collect_sorted(rec.prep())
    expected = pdf_nan.groupby("id")["x1"].bfill(limit=1).to_numpy()
    np.testing.assert_allclose(got["x1"].to_numpy(), expected, equal_nan=True)


def test_constant_fill(spark, pdf_nan):
    rec = _recipe(spark, pdf_nan).add_step(StepImputeFill(sel=all_of(["x1"]), value=0.0))
    got = collect_sorted(rec.prep())
    expected = pdf_nan["x1"].fillna(0.0).to_numpy()
    np.testing.assert_allclose(got["x1"].to_numpy(), expected)


@pytest.mark.parametrize("strategy,oracle", [
    ("mean", "mean"),
    ("min", "min"),
    ("max", "max"),
])
def test_group_stat_fill(spark, pdf_nan, strategy, oracle):
    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeFill(sel=all_of(["x1"]), strategy=strategy)
    )
    got = collect_sorted(rec.prep())
    stat = pdf_nan.groupby("id")["x1"].transform(oracle)
    expected = pdf_nan["x1"].fillna(stat).to_numpy()
    np.testing.assert_allclose(got["x1"].to_numpy(), expected, equal_nan=True)


def test_zero_one_fill(spark, pdf_nan):
    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeFill(sel=all_of(["x2"]), strategy="one")
    )
    got = collect_sorted(rec.prep())
    expected = pdf_nan["x2"].fillna(1.0).to_numpy()
    np.testing.assert_allclose(got["x2"].to_numpy(), expected)


def test_fast_zero_fill(spark, pdf_nan):
    rec = _recipe(spark, pdf_nan).add_step(StepImputeFastZeroFill(sel=all_of(["x1", "x2"])))
    got = collect_sorted(rec.prep())
    for c in ["x1", "x2"]:
        np.testing.assert_allclose(
            got[c].to_numpy(), pdf_nan[c].fillna(0).to_numpy()
        )


def test_fast_forward_fill_equals_strategy_forward(spark, pdf_nan):
    a = collect_sorted(
        _recipe(spark, pdf_nan)
        .add_step(StepImputeFastForwardFill(sel=all_of(["x1", "x2"])))
        .prep()
    )
    b = collect_sorted(
        _recipe(spark, pdf_nan)
        .add_step(StepImputeFill(sel=all_of(["x1", "x2"]), strategy="forward"))
        .prep()
    )
    for c in ["x1", "x2"]:
        np.testing.assert_allclose(a[c].to_numpy(), b[c].to_numpy(), equal_nan=True)


def test_impute_keeps_all_columns(spark, pdf_nan):
    """Normalized reference quirk (step.py:154): non-selected columns
    must survive the fill."""
    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeFill(sel=all_of(["x1"]), strategy="forward")
    )
    out = rec.prep()
    assert out.columns == list(pdf_nan.columns)


def test_invalid_args():
    with pytest.raises(ValueError):
        StepImputeFill(value=1, strategy="forward")
    with pytest.raises(ValueError):
        StepImputeFill()
    with pytest.raises(ValueError):
        StepImputeFill(strategy="sideways")
    with pytest.raises(ValueError):
        StepImputeFill(value=1, limit=2)


def test_impute_model_applyinpandas(spark, pdf_nan):
    """StepImputeModel: user model fn applied per-group via Arrow
    batches (reference step.py:244-260)."""
    from recipys_spark.operators import StepImputeModel

    def model(pdf, group_cols):
        out = pdf.copy()
        out["x1"] = out["x1"].fillna(-1.0)
        return out

    rec = _recipe(spark, pdf_nan).add_step(
        StepImputeModel(sel=all_of(["x1"]), model=model)
    )
    got = collect_sorted(rec.prep())
    expected = pdf_nan["x1"].fillna(-1.0).to_numpy()
    np.testing.assert_allclose(got["x1"].to_numpy(), expected)

    with pytest.raises(ValueError):
        StepImputeModel(sel=all_of(["x1"]))


def test_group_stat_fill_null_group_key(spark):
    """NULL group keys form their own fill group (the reference's
    window-partition semantics): nulls there are filled from the
    null-group's own statistic, not left unfilled by a NULL!=NULL
    equi-join."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "id": [1.0, 1.0, None, None, None],
            "time": [0.0, 1.0, 0.0, 1.0, 2.0],
            "x1": [10.0, None, 4.0, None, 8.0],
        }
    )
    rec = Recipe(
        spark.createDataFrame(pdf), predictors=["x1"], groups="id", sequences="time"
    ).add_step(StepImputeFill(sel=all_of(["x1"]), strategy="mean"))
    got = (
        rec.prep()
        .toPandas()
        .sort_values(["id", "time"], na_position="first")
        .reset_index(drop=True)
    )
    assert len(got) == len(pdf)
    # null-group rows sort first: mean of (4, 8) = 6 fills its null
    np.testing.assert_allclose(
        got["x1"].to_numpy(dtype=float), [4.0, 6.0, 8.0, 10.0, 10.0]
    )


def test_limit_bounded_frame_equals_two_pass(spark, monkeypatch):
    """limit=k has two plans (round 7): a bounded [-k, 0] frame for
    small k and the row_number + donor-distance two-pass plan above
    _LIMIT_FRAME_MAX. They must be value-identical on null runs that
    straddle the limit, leading nulls, and group boundaries — in both
    directions."""
    import pandas as pd

    from recipys_spark.operators import impute as impute_mod

    pdf = pd.DataFrame(
        {
            "id": [1, 1, 1, 1, 1, 1, 2, 2, 2, 3, 3],
            "time": [0, 1, 2, 3, 4, 5, 0, 1, 2, 0, 1],
            # run of 3 nulls (limit=2 fills only the first two forward,
            # last two backward), a leading null, a group of all nulls
            "x1": [5.0, None, None, None, 9.0, None, None, 1.0, None, None, None],
        }
    )
    sdf = spark.createDataFrame(pdf)

    def run(strategy, limit):
        rec = Recipe(
            sdf, predictors=["x1"], groups="id", sequences="time"
        ).add_step(StepImputeFill(sel=all_of(["x1"]), strategy=strategy, limit=limit))
        return (
            rec.prep()
            .toPandas()
            .sort_values(["id", "time"])
            .reset_index(drop=True)["x1"]
            .to_numpy(dtype=float)
        )

    for strategy in ("forward", "backward"):
        for limit in (1, 2, 3):
            bounded = run(strategy, limit)
            monkeypatch.setattr(impute_mod, "_LIMIT_FRAME_MAX", 0)
            two_pass = run(strategy, limit)
            monkeypatch.undo()
            np.testing.assert_allclose(bounded, two_pass, equal_nan=True)
            # and both match pandas' groupwise fill-with-limit
            exp = (
                pdf.groupby("id")["x1"]
                .apply(lambda s, st=strategy, li=limit: (
                    s.ffill(limit=li) if st == "forward" else s.bfill(limit=li)
                ))
                .reset_index(drop=True)
                .to_numpy(dtype=float)
            )
            np.testing.assert_allclose(bounded, exp, equal_nan=True)
