"""Fused fit jobs (VERDICT r5 #2): consecutive independent fitted
steps share ONE df.agg scan at prep() instead of one full pass each.

The agg-job count is mock-counted (DataFrame.agg spy), and the fused
results are pinned bit-identical to the sequential / solo fits — the
fusion is a pure scheduling change, never a semantics change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recipys_spark import Recipe
from recipys_spark.operators import (
    StepKBinsDiscretize,
    StepMaxAbsScale,
    StepMinMaxScale,
    StepQuantileTransform,
    StepRobustScale,
    StepScale,
)
from recipys_spark.selector import all_of, all_numeric_predictors

from tests.conftest import make_example_pdf


@pytest.fixture
def frame(spark):
    return spark.createDataFrame(make_example_pdf())


class AggSpy:
    """Counts DataFrame.agg invocations (each fit job is exactly one).

    Spark 4's runtime frames are pyspark.sql.classic.dataframe.DataFrame
    (which overrides agg), so patch the concrete class, not the
    abstract pyspark.sql.DataFrame parent."""

    def __init__(self, monkeypatch):
        try:
            from pyspark.sql.classic.dataframe import DataFrame as ConcreteDF
        except ImportError:  # older Spark: one class
            ConcreteDF = DataFrame
        self.calls = 0
        orig = ConcreteDF.agg
        spy = self

        def counted(df_self, *a, **k):
            spy.calls += 1
            return orig(df_self, *a, **k)

        monkeypatch.setattr(ConcreteDF, "agg", counted)


def _vals(df, cols):
    rows = df.orderBy("id", "time").collect()
    return [tuple(r[c] for c in cols) for r in rows]


def test_three_scaler_chain_fits_in_one_agg(spark, frame, monkeypatch):
    spy = AggSpy(monkeypatch)
    rec = (
        Recipe(frame, predictors=["y", "x1", "x2"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["y"])))
        .add_step(StepMinMaxScale(sel=all_of(["x1"])))
        .add_step(StepRobustScale(sel=all_of(["x2"]), exact=True))
    )
    out = rec.prep()
    assert spy.calls == 1, f"expected ONE fused fit job, got {spy.calls}"

    # bit-identical to the solo (sequential) fits
    solo = (
        Recipe(frame, predictors=["y", "x1", "x2"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["y"])))
    )
    solo_out = solo.prep()
    solo2 = Recipe(solo_out, predictors=["x1"]).add_step(
        StepMinMaxScale(sel=all_of(["x1"]))
    )
    solo2_out = solo2.prep()
    solo3 = Recipe(solo2_out, predictors=["x2"]).add_step(
        StepRobustScale(sel=all_of(["x2"]), exact=True)
    )
    assert _vals(out, ["y", "x1", "x2"]) == _vals(solo3.prep(), ["y", "x1", "x2"])


def test_overlapping_columns_fit_sequentially(spark, frame, monkeypatch):
    """StepScale then StepMinMaxScale on the SAME column are dependent:
    the second must fit on the scaled values — never fused."""
    spy = AggSpy(monkeypatch)
    rec = (
        Recipe(frame, predictors=["x1"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["x1"])))
        .add_step(StepMinMaxScale(sel=all_of(["x1"])))
    )
    out = rec.prep()
    assert spy.calls == 2
    vals = [r["x1"] for r in out.collect()]
    # minmax of standard-scaled data is still exactly [0, 1]
    assert min(vals) == 0.0 and max(vals) == 1.0


def test_fused_state_matches_solo_state(spark, frame):
    """The fused agg row must install EXACTLY the state the solo fit
    would — same expressions, same aliases (prefix-stripped)."""
    fused = (
        Recipe(frame, predictors=["y", "x1"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["y"])))
        .add_step(StepQuantileTransform(sel=all_of(["x1"]), n_quantiles=5, exact=True))
    )
    fused.prep()
    s_scale = Recipe(frame, predictors=["y"]).add_step(StepScale(sel=all_of(["y"])))
    s_scale.prep()
    s_qt = Recipe(frame, predictors=["x1"]).add_step(
        StepQuantileTransform(sel=all_of(["x1"]), n_quantiles=5, exact=True)
    )
    s_qt.prep()
    assert fused.steps[0].state == s_scale.steps[0].state
    assert fused.steps[1].state == s_qt.steps[0].state


def test_fusion_stops_at_non_fusable_step(spark, frame, monkeypatch):
    """A non-fusable step splits the run: scalers before and after it
    fuse within their own runs only."""
    from recipys_spark.operators import StepLag

    spy = AggSpy(monkeypatch)
    rec = (
        Recipe(frame, predictors=["y", "x1", "x2"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["y"])))
        .add_step(StepMinMaxScale(sel=all_of(["x1"])))
        .add_step(StepLag(sel=all_of(["y"]), lags=(1,)))
        .add_step(StepMaxAbsScale(sel=all_of(["x2"])))
    )
    rec.prep()
    # run 1 fused (scale+minmax = 1 agg), StepLag (0 aggs), maxabs solo (1)
    assert spy.calls == 2


def test_dtype_sensitive_selector_not_misfused(spark, frame, monkeypatch):
    """all_numeric_predictors resolves by dtype; after StepScale casts
    y to double it still selects the same set here, so fusion applies —
    the guard re-resolves against the adjusted schema and must AGREE."""
    spy = AggSpy(monkeypatch)
    rec = (
        Recipe(frame, predictors=["y", "x1"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["y"])))
        .add_step(StepMinMaxScale(sel=all_of(["x1"])))
    )
    out = rec.prep()
    assert spy.calls == 1
    assert out.count() == 10


def test_prep_equals_bake_after_fused_fit(spark, frame):
    rec = (
        Recipe(frame, predictors=["y", "x1"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["y"])))
        .add_step(StepKBinsDiscretize(sel=all_of(["x1"]), n_bins=3))
    )
    prep_vals = _vals(rec.prep(), ["y", "x1"])
    bake_vals = _vals(rec.bake(frame), ["y", "x1"])
    assert prep_vals == bake_vals


def test_refit_refuses_stale_state_and_fuses_again(spark, frame, monkeypatch):
    """prep(refit=True) on an already-fitted recipe must re-run the
    fused fit (one agg) and land on the same state as the first fit."""
    rec = (
        Recipe(frame, predictors=["y", "x1"], groups="id", sequences="time")
        .add_step(StepScale(sel=all_of(["y"])))
        .add_step(StepMinMaxScale(sel=all_of(["x1"])))
    )
    rec.prep()
    first = [dict(s.state) for s in rec.steps]
    spy = AggSpy(monkeypatch)
    rec.prep(refit=True)
    assert spy.calls == 1
    assert [dict(s.state) for s in rec.steps] == first
    # without refit, trained steps replay frozen state: zero fit jobs
    spy2 = AggSpy(monkeypatch)
    rec.prep()
    assert spy2.calls == 0
