"""Fitted scaler/encoder parity (reference tests/test_steps.py:239–440
re-expressed with numpy oracles; sklearn is intentionally NOT a
dependency — oracles are hand-computed with the pinned conventions:
population std, lexicographic categories, linear-interpolated
quantiles)."""

import numpy as np
import pytest

from recipys_spark import Recipe
from recipys_spark.operators import (
    StepBinarize,
    StepKBinsDiscretize,
    StepMaxAbsScale,
    StepMinMaxScale,
    StepMissingIndicator,
    StepNormalize,
    StepOneHotEncode,
    StepOrdinalEncode,
    StepQuantileTransform,
    StepRobustScale,
    StepScale,
)
from recipys_spark.selector import all_of

from tests.conftest import collect_sorted, make_example_pdf


def _recipe(spark, pdf=None, **kw):
    pdf = pdf if pdf is not None else make_example_pdf(**kw)
    return pdf, Recipe(
        spark.createDataFrame(pdf),
        outcomes="y",
        predictors=["x1", "x2", "x3", "x4"],
        groups="id",
        sequences="time",
    )


def test_standard_scale(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepScale(sel=all_of(["x1", "x2"])))
    got = collect_sorted(rec.prep())
    for c in ["x1", "x2"]:
        expected = (pdf[c] - pdf[c].mean()) / pdf[c].std(ddof=0)
        np.testing.assert_allclose(got[c].to_numpy(), expected.to_numpy())
    assert abs(got["x1"].mean()) < 1e-9
    assert abs(got["x1"].std(ddof=0) - 1) < 1e-9


def test_standard_scale_flags(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepScale(sel=all_of(["x1"]), with_mean=False))
    got = collect_sorted(rec.prep())
    expected = pdf["x1"] / pdf["x1"].std(ddof=0)
    np.testing.assert_allclose(got["x1"].to_numpy(), expected.to_numpy())


def test_scale_preserves_nulls(spark):
    """Reference restores nulls sklearn turned into NaN (step.py:601–602)."""
    pdf, rec = _recipe(spark, make_example_pdf(nan_x1=True))
    rec.add_step(StepScale(sel=all_of(["x1"])))
    got = collect_sorted(rec.prep())
    assert np.isnan(got["x1"].to_numpy()[[1, 2, 4, 7]]).all()


def test_minmax(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepMinMaxScale(sel=all_of(["x1"])))
    got = collect_sorted(rec.prep())
    expected = (pdf["x1"] - pdf["x1"].min()) / (pdf["x1"].max() - pdf["x1"].min())
    np.testing.assert_allclose(got["x1"].to_numpy(), expected.to_numpy())
    assert got["x1"].min() == 0.0 and got["x1"].max() == 1.0


def test_maxabs(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepMaxAbsScale(sel=all_of(["x1"])))
    got = collect_sorted(rec.prep())
    expected = pdf["x1"] / pdf["x1"].abs().max()
    np.testing.assert_allclose(got["x1"].to_numpy(), expected.to_numpy())


def test_robust(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepRobustScale(sel=all_of(["x1"])))
    got = collect_sorted(rec.prep())
    q25, med, q75 = np.percentile(pdf["x1"], [25, 50, 75])
    expected = (pdf["x1"] - med) / (q75 - q25)
    np.testing.assert_allclose(got["x1"].to_numpy(), expected.to_numpy())


def test_binarize(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepBinarize(sel=all_of(["x1"]), threshold=10.0))
    got = collect_sorted(rec.prep())
    expected = (pdf["x1"] > 10.0).astype(int)
    np.testing.assert_array_equal(got["x1"].to_numpy(), expected.to_numpy())


def test_normalize_l2(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepNormalize(sel=all_of(["x1", "x2"])))
    got = collect_sorted(rec.prep())
    mag = np.sqrt(pdf["x1"] ** 2 + pdf["x2"] ** 2)
    np.testing.assert_allclose(got["x1"].to_numpy(), (pdf["x1"] / mag).to_numpy())
    np.testing.assert_allclose(got["x2"].to_numpy(), (pdf["x2"] / mag).to_numpy())


def test_kbins_uniform(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepKBinsDiscretize(sel=all_of(["x1"]), n_bins=3, strategy="uniform"))
    got = collect_sorted(rec.prep())
    lo, hi = pdf["x1"].min(), pdf["x1"].max()
    edges = np.linspace(lo, hi, 4)
    expected = np.clip(np.digitize(pdf["x1"], edges[1:-1], right=False), 0, 2)
    np.testing.assert_array_equal(got["x1"].to_numpy(), expected.astype(float))


def test_kbins_quantile(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepKBinsDiscretize(sel=all_of(["x1"]), n_bins=4, strategy="quantile"))
    got = collect_sorted(rec.prep())
    # each quantile bin gets ~n/4 rows
    counts = np.bincount(got["x1"].astype(int), minlength=4)
    assert counts.sum() == 10
    assert counts.max() <= 4


def test_quantile_transform(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepQuantileTransform(sel=all_of(["x1"]), n_quantiles=10))
    got = collect_sorted(rec.prep())
    vals = got["x1"].to_numpy()
    assert vals.min() == 0.0 and vals.max() == 1.0
    # rank order preserved
    np.testing.assert_array_equal(np.argsort(vals), np.argsort(pdf["x1"].to_numpy()))
    # interpolated quantile rank of the fitted data is (rank)/(n-1)-ish:
    # with n_quantiles=10 on 10 points the grid hits every point exactly
    expected = (pdf["x1"].rank() - 1) / 9.0
    np.testing.assert_allclose(vals, expected.to_numpy(), atol=1e-9)


def test_ordinal_encode(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepOrdinalEncode(sel=all_of(["x3", "x4"])))
    got = collect_sorted(rec.prep())
    for c in ["x3", "x4"]:
        cats = sorted(pdf[c].unique())
        expected = pdf[c].map({v: float(i) for i, v in enumerate(cats)})
        np.testing.assert_array_equal(got[c].to_numpy(), expected.to_numpy())


def test_ordinal_encode_unknown_category_is_null(spark):
    pdf, rec = _recipe(spark)
    step = StepOrdinalEncode(sel=all_of(["x3"]))
    rec.add_step(step)
    rec.prep()
    pdf2 = pdf.copy()
    pdf2.loc[0, "x3"] = "zzz-new"
    baked = collect_sorted(rec.bake(spark.createDataFrame(pdf2)))
    assert np.isnan(baked["x3"].to_numpy()[0])


def test_onehot(spark):
    pdf, rec = _recipe(spark)
    rec.add_step(StepOneHotEncode(sel=all_of(["x3"])))
    got = collect_sorted(rec.prep())
    cats = sorted(pdf["x3"].unique())
    for i, cat in enumerate(cats, start=1):
        col = f"OneHotEncoder_{i}"
        assert col in got.columns
        np.testing.assert_array_equal(
            got[col].to_numpy(), (pdf["x3"] == cat).astype(int).to_numpy()
        )
    assert "x3" in got.columns  # in_place=False keeps source


def test_missing_indicator(spark):
    pdf, rec = _recipe(spark, make_example_pdf(nan_x1=True))
    rec.add_step(StepMissingIndicator(sel=all_of(["x1"])))
    got = collect_sorted(rec.prep())
    np.testing.assert_array_equal(
        got["x1_missing"].to_numpy(), pdf["x1"].isna().astype(int).to_numpy()
    )


def test_fitted_state_frozen_for_bake(spark):
    """The leakage boundary: bake on shifted data must use the PREP
    statistics, not refit."""
    pdf, rec = _recipe(spark)
    rec.add_step(StepScale(sel=all_of(["x1"])))
    rec.prep()
    shifted = pdf.copy()
    shifted["x1"] = shifted["x1"] + 100.0
    baked = collect_sorted(rec.bake(spark.createDataFrame(shifted)))
    expected = (shifted["x1"] - pdf["x1"].mean()) / pdf["x1"].std(ddof=0)
    np.testing.assert_allclose(baked["x1"].to_numpy(), expected.to_numpy())


def test_save_load_state(spark, tmp_path):
    pdf, rec = _recipe(spark)
    rec.add_step(StepScale(sel=all_of(["x1"])))
    prepped = collect_sorted(rec.prep())
    path = str(tmp_path / "state.json")
    rec.save_state(path)

    pdf2, rec2 = _recipe(spark)
    rec2.add_step(StepScale(sel=all_of(["x1"])))
    rec2.load_state(path)
    baked = collect_sorted(rec2.bake())
    np.testing.assert_allclose(baked["x1"].to_numpy(), prepped["x1"].to_numpy())


def test_encoder_cardinality_guard(spark):
    """A high-cardinality column must fail fast BEFORE collect_set
    pulls the category set onto the driver."""
    from recipys_spark.operators import StepOneHotEncode, StepOrdinalEncode
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("user")
    )
    rec = Recipe(df, predictors=["user"]).add_step(
        StepOrdinalEncode(sel=all_of(["user"]), max_categories=100)
    )
    with pytest.raises(ValueError, match="max_categories"):
        rec.prep()

    rec2 = Recipe(df, predictors=["user"]).add_step(
        StepOneHotEncode(sel=all_of(["user"]), max_categories=100)
    )
    with pytest.raises(ValueError, match="max_categories"):
        rec2.prep()


def test_recipe_cache_literal_api(spark, tmp_path):
    """Reference Recipe.cache() parity: drops the data reference, the
    fitted recipe stays usable with explicit data, and is picklable."""
    import pickle

    from recipys_spark.operators import StepScale

    pdf = make_example_pdf()
    df = spark.createDataFrame(pdf)
    rec = Recipe(df, predictors=["x1"]).add_step(StepScale(sel=all_of(["x1"])))
    before = collect_sorted(rec.prep())
    rec.cache(str(tmp_path / "state.json"))
    assert rec.data is None
    with pytest.raises(ValueError, match="cache"):
        rec.prep()
    after = collect_sorted(rec.bake(df))
    np.testing.assert_array_equal(
        before["x1"].to_numpy(), after["x1"].to_numpy()
    )
    pickle.dumps(rec.steps[0].get_state())  # fitted state is tiny/plain


def test_save_state_typed_categories_roundtrip(spark, tmp_path):
    """Date categories must round-trip as dates, not strings — a
    string-typed literal comparison against a date column yields nulls."""
    import datetime

    import pandas as pd

    from recipys_spark.operators import StepOrdinalEncode

    days = [datetime.date(2024, 1, d) for d in (1, 2, 3)]
    pdf = pd.DataFrame({"id": range(9), "day": [days[i % 3] for i in range(9)]})
    df = spark.createDataFrame(pdf)

    rec = Recipe(df, predictors=["day"]).add_step(StepOrdinalEncode(sel=all_of(["day"])))
    before = collect_sorted(rec.prep(), keys=("id",))
    p = str(tmp_path / "state.json")
    rec.save_state(p)

    rec2 = Recipe(df, predictors=["day"]).add_step(StepOrdinalEncode(sel=all_of(["day"])))
    rec2.load_state(p)
    cats = rec2.steps[0].categories["day"]
    assert all(isinstance(c, datetime.date) for c in cats), cats
    after = collect_sorted(rec2.bake(df), keys=("id",))
    assert not after["day"].isna().any()
    np.testing.assert_array_equal(before["day"].to_numpy(), after["day"].to_numpy())


def test_label_encode_outcome_role(spark):
    """StepLabelEncode defaults to the outcome role; classes sorted
    lexicographically, 0-indexed (sklearn LabelEncoder)."""
    import pandas as pd

    from recipys_spark.operators import StepLabelEncode

    pdf = pd.DataFrame(
        {"id": range(6), "y": ["b", "a", "c", "a", "b", "c"], "x1": 1.0}
    )
    rec = Recipe(spark.createDataFrame(pdf), outcomes="y", predictors=["x1"])
    rec.add_step(StepLabelEncode())
    got = collect_sorted(rec.prep(), keys=("id",))
    assert list(got["y"]) == [1.0, 0.0, 2.0, 0.0, 1.0, 2.0]
    # predictor column untouched
    assert (got["x1"] == 1.0).all()


def test_label_binarize_binary_quirk(spark):
    """Two classes → ONE indicator column (sklearn LabelBinarizer
    binary quirk); three classes → one column per class."""
    import pandas as pd

    from recipys_spark.operators import StepLabelBinarize

    two = pd.DataFrame({"id": range(4), "y": ["no", "yes", "no", "yes"]})
    rec = Recipe(spark.createDataFrame(two), outcomes="y").add_step(
        StepLabelBinarize()
    )
    got = collect_sorted(rec.prep(), keys=("id",))
    assert "LabelBinarizer_1" in got.columns
    assert "LabelBinarizer_2" not in got.columns
    assert list(got["LabelBinarizer_1"]) == [0, 1, 0, 1]  # indicator of 'yes'

    three = pd.DataFrame({"id": range(3), "y": ["a", "b", "c"]})
    rec3 = Recipe(spark.createDataFrame(three), outcomes="y").add_step(
        StepLabelBinarize()
    )
    got3 = collect_sorted(rec3.prep(), keys=("id",))
    assert {"LabelBinarizer_1", "LabelBinarizer_2", "LabelBinarizer_3"} <= set(
        got3.columns
    )
    assert list(got3["LabelBinarizer_2"]) == [0, 1, 0]


def test_percentile_fit_auto_switches_to_sketch(spark):
    """exact=None (the default) must pick the sketch path above
    AUTO_EXACT_MAX_ROWS — the exact percentile aggregator buffers every
    value in executor memory and OOMs at the engine's target scale.
    rows_hint simulates the large input; the sketch's un-interpolated
    median (an actual element, not 2.5) proves the path taken."""
    import pandas as pd

    from recipys_spark import Recipe
    from recipys_spark.operators import StepRobustScale
    from recipys_spark.operators.scale import resolve_exact
    from recipys_spark.selector import all_of

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0]})
    df = spark.createDataFrame(pdf)
    assert resolve_exact(None, df) is True  # small input stays exact
    assert resolve_exact(None, df, rows_hint=10**12) is False

    exact_step = StepRobustScale(sel=all_of(["x"]))
    Recipe(df, predictors=["x"]).add_step(exact_step).prep()
    assert exact_step.state["x"]["median"] == 2.5  # interpolated

    sketch_step = StepRobustScale(sel=all_of(["x"]), rows_hint=10**12)
    Recipe(df, predictors=["x"]).add_step(sketch_step).prep()
    assert sketch_step.state["x"]["median"] in (2.0, 3.0)  # sketch element


def test_quantile_steps_share_one_count_probe(spark, example_df):
    """ADVICE r3: several exact=None fitted steps in one recipe must
    resolve their exact-vs-sketch switch from ONE memoized count probe,
    not one scan each — row-preserving steps propagate the cache."""
    from unittest import mock

    from recipys_spark import Recipe
    from recipys_spark.operators import (
        StepKBinsDiscretize,
        StepRobustScale,
        StepSpline,
    )
    from recipys_spark.selector import all_of

    rec = (
        Recipe(example_df, predictors=["x1", "y"], groups="id", sequences="time")
        .add_step(StepRobustScale(sel=all_of(["x1"])))
        .add_step(StepKBinsDiscretize(sel=all_of(["y"]), strategy="quantile"))
        .add_step(StepSpline(sel=all_of(["x1"]), knots="quantile"))
    )
    cls = type(example_df)  # the concrete (classic) DataFrame class
    real_count = cls.count
    calls = []

    def counting(self):
        calls.append(1)
        return real_count(self)

    with mock.patch.object(cls, "count", counting):
        rec.prep()
    assert sum(calls) == 1, f"expected one shared probe, saw {sum(calls)}"


def test_target_encode_m_estimate_and_bake_freeze(spark):
    """Hand-computed m-estimate means; unknown/NULL categories map to
    the fitted global mean; bake NEVER refits (no apply-time label
    leakage)."""
    import math

    import pandas as pd

    from recipys_spark.operators.encode import StepTargetEncode
    from recipys_spark.selector import all_of

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "cat": ["a", "a", "a", "b", "b", "c", None],
                "y": [1.0, 1.0, 0.0, 0.0, 0.0, 1.0, 1.0],
            }
        )
    )
    step = StepTargetEncode(sel=all_of(["cat"]), smoothing=2.0)
    rec = Recipe(df, outcomes=["y"], predictors=["cat"]).add_step(step)
    out = {r.cat: r.cat_target for r in rec.prep().collect()}
    gm = 4.0 / 7.0
    assert math.isclose(out["a"], (2.0 + 2 * gm) / 5.0)
    assert math.isclose(out["b"], (0.0 + 2 * gm) / 4.0)
    assert math.isclose(out[None], gm)
    frozen = dict(step.state)
    # bake on data with WILDLY different labels must reuse train state
    new = spark.createDataFrame(
        pd.DataFrame({"cat": ["a", "zzz"], "y": [100.0, 100.0]})
    )
    baked = {r.cat: r.cat_target for r in rec.bake(new).collect()}
    assert math.isclose(baked["a"], out["a"])  # train mapping, not 100
    assert math.isclose(baked["zzz"], gm)  # unknown → train global mean
    assert step.state == frozen
    # state round-trip
    st = step.get_state()
    step2 = StepTargetEncode(sel=all_of(["cat"]), smoothing=2.0)
    step2.set_state(st)
    assert step2.state == frozen
    with pytest.raises(ValueError, match="outcome itself"):
        bad = StepTargetEncode(sel=all_of(["y"]))
        Recipe(df, outcomes=["y"], predictors=["cat"]).add_step(bad).prep()


def test_hash_encode_stateless_and_portable(spark):
    import pandas as pd

    from recipys_spark.operators.encode import StepHashEncode
    from recipys_spark.selector import all_of

    df = spark.createDataFrame(
        pd.DataFrame({"cat": ["a", "b", "c", None], "y": [0.0, 1.0, 0.0, 1.0]})
    )

    def run(**kw):
        rec = Recipe(df, outcomes=["y"], predictors=["cat"]).add_step(
            StepHashEncode(sel=all_of(["cat"]), n_features=16, **kw)
        )
        return {r.cat: r.cat_hash for r in rec.prep().collect()}

    md5 = run()
    assert md5[None] is None
    assert all(v is None or 0 <= v < 16 for v in md5.values())
    # identical on re-run AND across repartitioning (hash of content,
    # not of placement)
    assert run() == md5
    rec_rep = Recipe(
        df.repartition(7), outcomes=["y"], predictors=["cat"]
    ).add_step(StepHashEncode(sel=all_of(["cat"]), n_features=16))
    assert {r.cat: r.cat_hash for r in rec_rep.prep().collect()} == md5
    # xxhash64 family also lands in range (values differ — JVM-only path)
    xx = run(hash_family="xxhash64")
    assert all(v is None or 0 <= v < 16 for v in xx.values())
    with pytest.raises(ValueError):
        StepHashEncode(n_features=0)
    with pytest.raises(ValueError):
        StepHashEncode(hash_family="sha1")
