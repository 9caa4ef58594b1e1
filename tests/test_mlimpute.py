"""Native KNN + iterative (MICE) imputers (operators/mlimpute.py).

Closes the two escape-hatch-only rows of SURVEY §2.1: the reference
exercises KNNImputer / IterativeImputer through StepSklearn
(reference tests/test_steps.py:249-267); these are the native,
distributed equivalents. The oracle here is an independent numpy
re-implementation of sklearn's documented semantics (sklearn itself is
absent from this sandbox; tests/test_sklearn_real.py runs the real
library where available)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from recipys_spark.operators.mlimpute import (
    StepImputeIterative,
    StepImputeKNN,
    knn_impute_join,
)
from recipys_spark.recipe import Recipe
from recipys_spark.selector import all_of


# -- numpy reference: sklearn KNNImputer semantics --------------------------


def _nan_euclidean(x, y):
    mask = ~np.isnan(x) & ~np.isnan(y)
    if not mask.any():
        return np.inf
    d = len(x)
    diff = x[mask] - y[mask]
    return np.sqrt(d / mask.sum() * np.sum(diff * diff))


def _knn_reference(X, k=5, weights="uniform"):
    """Direct transcription of the sklearn KNNImputer docs, with the
    engine's deterministic (dist, donor-row) tie-break."""
    out = X.copy()
    col_mean = np.nanmean(X, axis=0)
    n, d = X.shape
    for r in range(n):
        for j in range(d):
            if not np.isnan(X[r, j]):
                continue
            cand = [
                (\
                    _nan_euclidean(X[r], X[i]),
                    i,
                )
                for i in range(n)
                if i != r and not np.isnan(X[i, j])
            ]
            cand = [(dist, i) for dist, i in cand if np.isfinite(dist)]
            if not cand:
                out[r, j] = col_mean[j]
                continue
            cand.sort()
            take = cand[:k]
            vals = np.array([X[i, j] for _, i in take])
            if weights == "uniform":
                out[r, j] = vals.mean()
            else:
                dist = np.array([dd for dd, _ in take])
                if np.any(dist == 0.0):
                    out[r, j] = vals[dist == 0.0].mean()
                else:
                    w = 1.0 / dist
                    out[r, j] = np.sum(w * vals) / np.sum(w)
    return out


def _mice_reference(X, max_iter=3):
    """MICE with OLS round-robin, ascending-missingness order, mean
    init — the algorithm StepImputeIterative documents."""
    X = X.copy()
    miss = np.isnan(X)
    means = np.nanmean(X, axis=0)
    cur = X.copy()
    for j in range(X.shape[1]):
        cur[miss[:, j], j] = means[j]
    order = sorted(
        (j for j in range(X.shape[1]) if 0 < miss[:, j].sum() < len(X)),
        key=lambda j: miss[:, j].sum(),
    )
    for _ in range(max_iter):
        for j in order:
            others = [c for c in range(X.shape[1]) if c != j]
            rows = ~miss[:, j]
            Z = np.column_stack([np.ones(rows.sum()), cur[rows][:, others]])
            beta, *_ = np.linalg.lstsq(Z, X[rows, j], rcond=None)
            pred = np.column_stack(
                [np.ones(len(X)), cur[:, others]]
            ) @ beta
            cur[miss[:, j], j] = pred[miss[:, j]]
    return cur


def _frame(n=200, d=3, miss=0.2, seed=3):
    rng = np.random.RandomState(seed)
    X = rng.normal(10, 4, size=(n, d))
    X[:, 1] = 0.5 * X[:, 0] + rng.normal(0, 1, size=n)  # learnable signal
    for j in range(d):
        X[rng.rand(n) < miss, j] = np.nan
    return X


def _to_spark(spark, X, reps=1):
    cols = [f"x{j}" for j in range(X.shape[1])]
    pdf = pd.DataFrame(X, columns=cols)
    pdf.insert(0, "rid", range(len(pdf)))
    return spark.createDataFrame(pdf).repartition(reps and 4), cols


def test_knn_matches_numpy_reference_uniform_and_distance(spark):
    X = _frame()
    df, cols = _to_spark(spark, X)
    for weights in ("uniform", "distance"):
        step = StepImputeKNN(
            sel=all_of(cols), n_neighbors=5, weights=weights,
            fit_sample_rows=10_000,
        )
        out = (
            Recipe(df, predictors=cols)
            .add_step(step)
            .prep()
            .orderBy("rid")
            .toPandas()[cols]
            .to_numpy()
        )
        expect = _knn_reference(X, k=5, weights=weights)
        np.testing.assert_allclose(out, expect, rtol=1e-9, atol=1e-12)
        assert not np.isnan(out).any()


def test_knn_pool_is_bounded_and_deterministic(spark):
    """The donor pool is a deterministic content-hash top-k — identical
    at any partitioning — and bounded by fit_sample_rows."""
    X = _frame(n=300)
    df, cols = _to_spark(spark, X)
    def fit_pool(parts):
        s = StepImputeKNN(sel=all_of(cols), fit_sample_rows=50)
        Recipe(df.repartition(parts), predictors=cols).add_step(s).prep().count()
        return s.pool
    p1, p2 = fit_pool(2), fit_pool(17)
    assert len(p1) == 50 and p1 == p2


def test_knn_join_tier_matches_arrow_tier_exactly(spark):
    """The pure-JVM broadcast-join plan (the oracle-mirrorable tier)
    and the Arrow mapInPandas tier share the distance tree and the
    exact-decimal neighbor mean — BIT-identical imputed values when
    the Arrow pool covers the donors (single missing column so both
    tiers see the same donor set)."""
    rng = np.random.RandomState(11)
    X = rng.normal(50, 9, size=(150, 3))
    X[rng.rand(150) < 0.25, 2] = np.nan  # missing in ONE column only
    df, cols = _to_spark(spark, X)
    joined = (
        knn_impute_join(df, cols, target_col="x2", id_col="rid", n_neighbors=5)
        .orderBy("rid")
        .toPandas()["x2"]
        .to_numpy()
    )
    step = StepImputeKNN(sel=all_of(cols), n_neighbors=5, fit_sample_rows=None)
    arrow = (
        Recipe(df, predictors=cols)
        .add_step(step)
        .prep()
        .orderBy("rid")
        .toPandas()["x2"]
        .to_numpy()
    )
    assert (joined == arrow).all()  # bit-exact, not allclose


def test_knn_no_overlap_falls_back_to_column_mean(spark):
    pdf = pd.DataFrame(
        {
            "rid": [0, 1, 2],
            "a": [1.0, None, 4.0],
            "b": [None, 7.0, None],
        }
    )
    # row 1 has only b; donors for a (rows 0,2) have no b → no overlap
    df = spark.createDataFrame(pdf)
    step = StepImputeKNN(sel=all_of(["a", "b"]), n_neighbors=2)
    out = (
        Recipe(df, predictors=["a", "b"])
        .add_step(step)
        .prep()
        .orderBy("rid")
        .toPandas()
    )
    assert out.loc[1, "a"] == pytest.approx(2.5)  # mean(1, 4)
    assert out.loc[0, "b"] == pytest.approx(7.0)


def test_knn_partition_invariant_and_state_roundtrip(spark, tmp_path):
    X = _frame(n=120, seed=9)
    df, cols = _to_spark(spark, X)
    rec = Recipe(df, predictors=cols).add_step(
        StepImputeKNN(sel=all_of(cols), n_neighbors=3)
    )
    a = rec.prep().orderBy("rid").toPandas()[cols].to_numpy()
    b = (
        Recipe(df.repartition(13), predictors=cols)
        .add_step(StepImputeKNN(sel=all_of(cols), n_neighbors=3))
        .prep()
        .orderBy("rid")
        .toPandas()[cols]
        .to_numpy()
    )
    np.testing.assert_array_equal(a, b)
    # fitted-state save/load: bake after reload, no refit
    p = str(tmp_path / "knn_state")
    rec.save_state(p)
    rec2 = Recipe(df, predictors=cols).add_step(
        StepImputeKNN(sel=all_of(cols), n_neighbors=3)
    )
    rec2.load_state(p)
    c = rec2.bake(df).orderBy("rid").toPandas()[cols].to_numpy()
    np.testing.assert_array_equal(a, c)


def test_iterative_matches_numpy_reference(spark):
    X = _frame(n=250, seed=5)
    df, cols = _to_spark(spark, X)
    out = (
        Recipe(df, predictors=cols)
        .add_step(StepImputeIterative(sel=all_of(cols), max_iter=3))
        .prep()
        .orderBy("rid")
        .toPandas()[cols]
        .to_numpy()
    )
    expect = _mice_reference(X, max_iter=3)
    np.testing.assert_allclose(out, expect, rtol=1e-7, atol=1e-9)
    assert not np.isnan(out).any()


def test_iterative_recovers_linear_structure(spark):
    """On exactly-linear data the regression imputation must recover
    the true values (the property mean-fill cannot have)."""
    rng = np.random.RandomState(2)
    x0 = rng.uniform(0, 10, 300)
    x1 = 3.0 * x0 + 2.0
    X = np.column_stack([x0, x1])
    miss = rng.rand(300) < 0.3
    truth = X[:, 1].copy()
    X[miss, 1] = np.nan
    df, cols = _to_spark(spark, X)
    out = (
        Recipe(df, predictors=cols)
        .add_step(StepImputeIterative(sel=all_of(cols), max_iter=1))
        .prep()
        .orderBy("rid")
        .toPandas()["x1"]
        .to_numpy()
    )
    np.testing.assert_allclose(out[miss], truth[miss], rtol=1e-9)


def test_iterative_bake_replays_frozen_coefs_zero_jobs(spark):
    """prep learns coefficients from the FIT data only; bake on new
    data replays them as pure expressions (leakage boundary) — and the
    bake plan contains no aggregate of the bake data."""
    X = _frame(n=150, seed=13)
    df, cols = _to_spark(spark, X)
    rec = Recipe(df, predictors=cols).add_step(
        StepImputeIterative(sel=all_of(cols), max_iter=2)
    )
    rec.prep().count()
    step = rec.steps[0]
    assert step.coefs, "fit learned no coefficients"
    # bake data with different distribution: imputations must use the
    # FITTED coefficients, i.e. transform plan is projection-only
    Y = _frame(n=60, seed=99)
    dfy, _ = _to_spark(spark, Y)
    baked = rec.bake(dfy)
    plan = baked._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan, plan
    out = baked.orderBy("rid").toPandas()[cols].to_numpy()
    assert not np.isnan(out).any()


def test_iterative_partition_invariant(spark):
    """Exact-decimal normal equations → identical coefficients (and
    imputed values) at any parallelism — the N-vs-4N determinism rule."""
    X = _frame(n=200, seed=21)
    df, cols = _to_spark(spark, X)
    def run(parts):
        return (
            Recipe(df.repartition(parts), predictors=cols)
            .add_step(StepImputeIterative(sel=all_of(cols), max_iter=2))
            .prep()
            .orderBy("rid")
            .toPandas()[cols]
            .to_numpy()
        )
    np.testing.assert_array_equal(run(2), run(19))


def test_iterative_state_roundtrip(spark, tmp_path):
    X = _frame(n=100, seed=31)
    df, cols = _to_spark(spark, X)
    rec = Recipe(df, predictors=cols).add_step(
        StepImputeIterative(sel=all_of(cols), max_iter=2)
    )
    a = rec.prep().orderBy("rid").toPandas()[cols].to_numpy()
    p = str(tmp_path / "mice_state")
    rec.save_state(p)
    rec2 = Recipe(df, predictors=cols).add_step(
        StepImputeIterative(sel=all_of(cols), max_iter=2)
    )
    rec2.load_state(p)
    b = rec2.bake(df).orderBy("rid").toPandas()[cols].to_numpy()
    np.testing.assert_array_equal(a, b)


def test_reference_fixture_rows_become_finite(example_df_nan):
    """The reference's own acceptance criterion (test_steps.py:249-267):
    after the imputer, the x2 NaN rows [2,4,6] are finite."""
    from recipys_spark.selector import all_numeric_predictors

    for step in (
        StepImputeKNN(sel=all_numeric_predictors()),
        StepImputeIterative(sel=all_numeric_predictors()),
    ):
        rec = Recipe(
            example_df_nan,
            outcomes="y",
            predictors=["x1", "x2", "x3", "x4"],
            groups="id",
            sequences="time",
        ).add_step(step)
        out = rec.prep().orderBy("id", "time").toPandas()
        assert np.isfinite(out["x2"].to_numpy()).all()


def test_iterative_all_null_column_skipped_not_crashed(spark):
    """Review fix: an entirely-NULL selected column used to reach
    float(None) inside the normal-equation solve. It must be excluded
    from targets AND regressors (no signal), left untouched, while the
    other columns still impute."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "rid": range(8),
            "a": [1.0, 2.0, None, 4.0, 5.0, None, 7.0, 8.0],
            "b": [2.1, 4.2, 6.1, 8.3, 10.2, 12.1, 14.3, 16.2],
            "dead": [None] * 8,
        }
    )
    df = spark.createDataFrame(pdf)
    step = StepImputeIterative(sel=all_of(["a", "b", "dead"]), max_iter=2)
    out = (
        Recipe(df, predictors=["a", "b", "dead"])
        .add_step(step)
        .prep()
        .orderBy("rid")
        .toPandas()
    )
    assert out["dead"].isna().all()  # untouched: nothing to learn from
    assert not out["a"].isna().any()  # still imputed from b
    assert all(t != "dead" and "dead" not in regs for t, regs, _, _ in step.coefs)


def test_knn_unbounded_pool_warns_and_orders_by_content(spark):
    """Review fix: fit_sample_rows=None must warn (unbounded driver
    collect — the StepSklearn policy) and the pool must be sorted by
    the content hash in BOTH paths, so tie-breaks never depend on
    physical partitioning."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"x1": [1.0, 2.0, None, 4.0, 5.0, 6.0], "x2": [2.0, 3.0, 4.0, None, 6.0, 7.0]}
    )
    pools = []
    for parts in (1, 5):
        df = spark.createDataFrame(pdf).repartition(parts)
        step = StepImputeKNN(sel=all_of(["x1", "x2"]), fit_sample_rows=None)
        with pytest.warns(UserWarning, match="ENTIRE table"):
            Recipe(df, predictors=["x1", "x2"]).add_step(step).prep().count()
        pools.append(step.pool)
    assert pools[0] == pools[1]  # identical ORDER at any partitioning


# -- LSH-shortlisted tier (VERDICT r5 #3) ------------------------------------


def test_knn_lsh_one_plane_multiprobe_equals_exact_join(spark):
    """With 1 plane + multiprobe the probe searches BOTH buckets — the
    candidate set is the full pool, so the output must be bit-identical
    to the exact broadcast-join tier."""
    from recipys_spark.operators.mlimpute import knn_impute_join, knn_impute_lsh

    X = _frame(n=120, miss=0.25, seed=7)
    df, cols = _to_spark(spark, X)
    exact = {
        r["rid"]: r["x2"]
        for r in knn_impute_join(
            df, cols, target_col="x2", id_col="rid", n_neighbors=5
        ).collect()
    }
    lsh = {
        r["rid"]: r["x2"]
        for r in knn_impute_lsh(
            df, cols, target_col="x2", id_col="rid", n_neighbors=5,
            n_planes=1, multiprobe=True,
        ).collect()
    }
    assert lsh == exact  # bitwise, every row


def test_knn_lsh_recall_bound_on_planted_clusters(spark):
    """Planted two-cluster data: at 4 planes the bucketing must keep
    >= 0.8 of the imputed values in agreement with the exact tier (the
    LSH recall bound the verdict asked to pin)."""
    from recipys_spark.operators.mlimpute import knn_impute_join, knn_impute_lsh

    rng = np.random.RandomState(0)
    n = 200
    centers = np.array([[0.0, 0.0], [50.0, 50.0]])
    lab = rng.randint(0, 2, n)
    P = centers[lab] + rng.normal(0, 1.0, (n, 2))
    t = lab * 100.0 + rng.normal(0, 0.1, n)
    t[rng.rand(n) < 0.2] = np.nan
    X = np.column_stack([t, P])
    df, cols = _to_spark(spark, X)  # x0 = target, x1/x2 = projection
    exact = {
        r["rid"]: r["x0"]
        for r in knn_impute_join(
            df, cols, target_col="x0", id_col="rid", n_neighbors=5
        ).collect()
    }
    lsh = {
        r["rid"]: r["x0"]
        for r in knn_impute_lsh(
            df, cols, target_col="x0", id_col="rid", n_neighbors=5, n_planes=4
        ).collect()
    }
    missing = [i for i in range(n) if np.isnan(X[i, 0])]
    assert missing and all(lsh[i] is not None for i in missing)
    agree = sum(
        1 for i in missing if abs(lsh[i] - exact[i]) <= 1.0
    ) / len(missing)
    assert agree >= 0.8, f"LSH recall {agree:.2f} below the 0.8 bound"


def test_knn_lsh_empty_bucket_falls_back_to_column_mean(spark):
    """Literal axis-aligned planes put the probe in a bucket no donor
    shares (multiprobe off): the imputed value must be the exact-
    decimal column mean, exactly as the verdict's fallback contract."""
    from recipys_spark.operators.mlimpute import knn_impute_lsh

    rows = [
        (0, 1.0, 5.0, 5.0),
        (1, 2.0, 6.0, 7.0),
        (2, 3.0, 7.0, 6.0),
        (99, None, -5.0, -5.0),  # sig 0 vs donor sig 3 — empty bucket
    ]
    df = spark.createDataFrame(rows, ["rid", "t", "x", "y"])
    out = {
        r["rid"]: r["t"]
        for r in knn_impute_lsh(
            df, ["t", "x", "y"], target_col="t", id_col="rid",
            n_planes=2, weights=[[1.0, 0.0], [0.0, 1.0]], multiprobe=False,
        ).collect()
    }
    assert out[99] == 2.0  # mean(1, 2, 3)
    assert out[0] == 1.0 and out[2] == 3.0  # donors untouched


def test_knn_lsh_rejects_no_projection_features(spark):
    from recipys_spark.operators.mlimpute import knn_impute_lsh

    df = spark.createDataFrame([(0, 1.0)], ["rid", "t"])
    with pytest.raises(ValueError, match="non-target"):
        knn_impute_lsh(df, ["t"], target_col="t", id_col="rid")


def test_knn_lsh_bucket_cap_bounds_hot_buckets(spark):
    """bucket_cap keeps a deterministic per-bucket donor subset: with a
    cap >= pool it is a no-op (bit-identical output); with a small cap
    every probe still gets imputed, at any partitioning."""
    from recipys_spark.operators.mlimpute import knn_impute_lsh

    X = _frame(n=120, miss=0.25, seed=11)
    df, cols = _to_spark(spark, X)
    kw = dict(target_col="x2", id_col="rid", n_neighbors=5, n_planes=1)
    uncapped = {
        r["rid"]: r["x2"] for r in knn_impute_lsh(df, cols, **kw).collect()
    }
    nocap_eq = {
        r["rid"]: r["x2"]
        for r in knn_impute_lsh(df, cols, bucket_cap=10_000, **kw).collect()
    }
    assert nocap_eq == uncapped  # cap above pool size: no-op
    for parts in (2, 7):
        capped = {
            r["rid"]: r["x2"]
            for r in knn_impute_lsh(
                df.repartition(parts), cols, bucket_cap=8, **kw
            ).collect()
        }
        assert len(capped) == 120
        missing = [i for i in range(120) if np.isnan(X[i, 2])]
        assert all(capped[i] is not None for i in missing)
        if parts == 2:
            first = capped
        else:
            assert capped == first  # partitioning-invariant under the cap


def test_knn_capped_pool_tier_matches_join_plan_exactly(spark):
    """Round-7 optimization: a bounded pool_cap routes both KNN tiers
    through the collected-pool Arrow path (_collected_pool_fill). With
    a cap that covers every donor, the candidate set is identical to
    the unbounded join plan, so the output must be BIT-identical —
    pinning the numpy mirrors (dist², (dist², id) order, scale-18
    integer neighbor means) against the JVM expression plan."""
    rng = np.random.RandomState(23)
    X = rng.normal(10, 4, size=(200, 3))
    X[rng.rand(200) < 0.3, 1] = np.nan
    X[rng.rand(200) < 0.1, 0] = np.nan  # nan-euclidean partial overlap
    df, cols = _to_spark(spark, X)

    def vals(out):
        return out.orderBy("rid").toPandas()["x1"].to_numpy()

    join_plan = vals(
        knn_impute_join(df, cols, target_col="x1", id_col="rid", n_neighbors=4)
    )
    arrow_pool = vals(
        knn_impute_join(
            df, cols, target_col="x1", id_col="rid", n_neighbors=4,
            pool_cap=100_000,
        )
    )
    assert (join_plan == arrow_pool).all()  # bit-exact


def test_knn_lsh_capped_pool_tier_matches_join_plan_exactly(spark):
    """Same pin for the LSH tier: pool_cap ⇒ collected-pool Arrow path
    with the per-row multiprobe bucket filter; cap covering all donors
    ⇒ identical shortlist ⇒ bit-identical output vs the bucket-join
    plan (pool_cap=None)."""
    from recipys_spark.operators.mlimpute import knn_impute_lsh

    rng = np.random.RandomState(29)
    X = rng.normal(0, 3, size=(180, 3))
    X[rng.rand(180) < 0.25, 0] = np.nan
    df, cols = _to_spark(spark, X)

    def vals(out):
        return out.orderBy("rid").toPandas()["x0"].to_numpy()

    a = vals(
        knn_impute_lsh(
            df, cols, target_col="x0", id_col="rid", n_neighbors=3,
            n_planes=3,
        )
    )
    b = vals(
        knn_impute_lsh(
            df, cols, target_col="x0", id_col="rid", n_neighbors=3,
            n_planes=3, pool_cap=100_000,
        )
    )
    assert (a == b).all()  # bit-exact
