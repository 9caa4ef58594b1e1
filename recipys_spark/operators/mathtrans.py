"""Native math-transform steps: log1p, polynomial features, power
(Yeo-Johnson) transform.

The reference reaches these only through ``StepSklearn`` with
FunctionTransformer(np.log1p) / PolynomialFeatures / PowerTransformer
(reference tests/test_steps.py:406–440). Here they are first-class
Spark-native steps: log1p and polynomial are pure JVM column
expressions (whole-stage codegen, no fitted state beyond column
resolution); the power transform fits one lambda per column by
maximizing the Yeo-Johnson log-likelihood on a deterministic sample,
then standardizes with exact decimal mean/std aggregates over the FULL
data — transform stays a pure column expression.
"""

from __future__ import annotations

import itertools
import math
from typing import Optional

from pyspark.sql import functions as F

from recipys_spark.ingredients import Ingredients
from recipys_spark.operators.base import Step
from recipys_spark.operators.scale import _FittedStep
from recipys_spark.selector import Selector, all_numeric_predictors


class StepLog1p(Step):
    """``log(1 + c)`` (sklearn FunctionTransformer(np.log1p) analog,
    reference test_steps.py:427–434). Stateless JVM expression."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(
        self,
        sel: Optional[Selector] = None,
        in_place: bool = True,
        role: str = "predictor",
    ) -> None:
        super().__init__(sel if sel is not None else all_numeric_predictors())
        self.in_place = in_place
        self.role = role
        self.desc = "log1p transform"

    def new_column_roles(self) -> dict[str, str]:
        if self.in_place:
            return {}
        return {f"{c}_log1p": self.role for c in self.columns}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        if self.in_place:
            return df.select(
                *[
                    F.log1p(F.col(c)).alias(c) if c in set(self.columns) else F.col(c)
                    for c in df.columns
                ]
            )
        return df.select(
            "*", *[F.log1p(F.col(c)).alias(f"{c}_log1p") for c in self.columns]
        )


class StepPolynomialFeatures(Step):
    """Products of the selected columns up to ``degree``, in sklearn's
    PolynomialFeatures output order (combinations_with_replacement per
    ascending degree), named ``{prefix}_{i}`` 1-indexed to match the
    reference's StepSklearn column naming (reference step.py:457–459).

    Stateless beyond column resolution; every output is a plain column
    product — whole-stage codegen, no shuffle."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(
        self,
        sel: Optional[Selector] = None,
        degree: int = 2,
        interaction_only: bool = False,
        include_bias: bool = False,
        prefix: str = "PolynomialFeatures",
        role: str = "predictor",
    ) -> None:
        super().__init__(sel if sel is not None else all_numeric_predictors())
        if degree < 1:
            raise ValueError("degree must be >= 1")
        self.degree = degree
        self.interaction_only = interaction_only
        self.include_bias = include_bias
        self.prefix = prefix
        self.role = role
        self.desc = f"Polynomial features up to degree {degree}"

    def _terms(self) -> list[tuple[str, ...]]:
        combine = (
            itertools.combinations
            if self.interaction_only
            else itertools.combinations_with_replacement
        )
        terms: list[tuple[str, ...]] = []
        if self.include_bias:
            terms.append(())
        for d in range(1, self.degree + 1):
            terms.extend(combine(self.columns, d))
        return terms

    def _named_terms(self) -> list[tuple[str, tuple[str, ...]]]:
        return [
            (f"{self.prefix}_{i}", t) for i, t in enumerate(self._terms(), start=1)
        ]

    def new_column_roles(self) -> dict[str, str]:
        return {name: self.role for name, _ in self._named_terms()}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        exprs = []
        for name, term in self._named_terms():
            if not term:
                e = F.lit(1.0)
            else:
                e = F.col(term[0]).cast("double")
                for c in term[1:]:
                    e = e * F.col(c).cast("double")
            exprs.append(e.alias(name))
        return df.select("*", *exprs)


def yeo_johnson_expr(col, lmbda: float):
    """Yeo-Johnson transform as a Spark column expression."""
    c = col.cast("double")
    pos_zero = abs(lmbda) < 1e-12
    neg_two = abs(lmbda - 2.0) < 1e-12
    pos = (
        F.log1p(c)
        if pos_zero
        else (F.pow(c + F.lit(1.0), F.lit(lmbda)) - F.lit(1.0)) / F.lit(lmbda)
    )
    neg = (
        -F.log1p(-c)
        if neg_two
        else -(F.pow(-c + F.lit(1.0), F.lit(2.0 - lmbda)) - F.lit(1.0))
        / F.lit(2.0 - lmbda)
    )
    return F.when(c >= 0, pos).otherwise(neg)


def _yj_numpy(x, lmbda: float):
    import numpy as np

    out = np.empty_like(x, dtype=float)
    pos = x >= 0
    if abs(lmbda) < 1e-12:
        out[pos] = np.log1p(x[pos])
    else:
        out[pos] = ((x[pos] + 1.0) ** lmbda - 1.0) / lmbda
    if abs(lmbda - 2.0) < 1e-12:
        out[~pos] = -np.log1p(-x[~pos])
    else:
        out[~pos] = -((-x[~pos] + 1.0) ** (2.0 - lmbda) - 1.0) / (2.0 - lmbda)
    return out


def fit_yeo_johnson_lambda(x, lo: float = -5.0, hi: float = 5.0, iters: int = 80):
    """MLE lambda via golden-section search on the YJ log-likelihood
    (the same objective sklearn's PowerTransformer optimizes with
    Brent; golden-section needs no scipy and is deterministic)."""
    import numpy as np

    x = np.asarray(x, dtype=float)
    x = x[~np.isnan(x)]
    if x.size < 2:
        return 1.0  # identity-ish

    log1p_term = np.sign(x) * np.log1p(np.abs(x))

    def neg_loglik(lmb: float) -> float:
        psi = _yj_numpy(x, lmb)
        var = psi.var()
        if not np.isfinite(var) or var <= 0:
            return math.inf
        return 0.5 * x.size * math.log(var) - (lmb - 1.0) * log1p_term.sum()

    invphi = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = neg_loglik(c), neg_loglik(d)
    for _ in range(iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = neg_loglik(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = neg_loglik(d)
    return float((a + b) / 2.0)


def _extend_knots(base: list, degree: int) -> list:
    """sklearn SplineTransformer knot extension (periodic=False): pad
    ``degree`` knots on each side, spaced like the first/last gap."""
    d0 = base[1] - base[0]
    d1 = base[-1] - base[-2]
    lo = [base[0] - (degree - i) * d0 for i in range(degree)]
    hi = [base[-1] + (i + 1) * d1 for i in range(degree)]
    return lo + list(base) + hi


def bspline_basis_exprs(x, knots: list, degree: int):
    """All B-spline basis functions over an extended knot vector, by
    Cox-de Boor recursion unrolled into literal column expressions —
    pure JVM math, whole-stage codegen, no UDF. ``x`` should already be
    clamped to [knots[degree], knots[-degree-1]] for constant
    extrapolation."""
    closing = len(knots) - degree - 2  # the interval ending at upper
    B = []
    for i in range(len(knots) - 1):
        lo, hi = knots[i], knots[i + 1]
        if hi == lo or i > closing:
            # empty, or entirely at/above the clamp range: x == upper
            # must belong only to the closing interval below
            B.append(F.lit(0.0))
        elif i == closing:
            # closed on both ends so x == max belongs to the last
            # basis function (scipy design_matrix behavior)
            B.append(F.when((x >= F.lit(lo)) & (x <= F.lit(hi)), 1.0).otherwise(0.0))
        else:
            B.append(F.when((x >= F.lit(lo)) & (x < F.lit(hi)), 1.0).otherwise(0.0))
    for d in range(1, degree + 1):
        nxt = []
        for i in range(len(knots) - d - 1):
            den1 = knots[i + d] - knots[i]
            den2 = knots[i + d + 1] - knots[i + 1]
            t1 = (
                ((x - F.lit(knots[i])) / F.lit(den1)) * B[i]
                if den1 > 0
                else F.lit(0.0)
            )
            t2 = (
                ((F.lit(knots[i + d + 1]) - x) / F.lit(den2)) * B[i + 1]
                if den2 > 0
                else F.lit(0.0)
            )
            nxt.append(t1 + t2)
        B = nxt
    return B


def _bspline_numpy(x, knots: list, degree: int):
    """numpy mirror of bspline_basis_exprs (the test oracle)."""
    import numpy as np

    x = np.asarray(x, dtype=float)
    upper = knots[-degree - 1]
    lower = knots[degree]
    x = np.clip(x, lower, upper)
    closing = len(knots) - degree - 2
    B = []
    for i in range(len(knots) - 1):
        lo, hi = knots[i], knots[i + 1]
        if hi == lo or i > closing:
            B.append(np.zeros_like(x))
        elif i == closing:
            B.append(((x >= lo) & (x <= hi)).astype(float))
        else:
            B.append(((x >= lo) & (x < hi)).astype(float))
    for d in range(1, degree + 1):
        nxt = []
        for i in range(len(knots) - d - 1):
            den1 = knots[i + d] - knots[i]
            den2 = knots[i + d + 1] - knots[i + 1]
            t1 = ((x - knots[i]) / den1) * B[i] if den1 > 0 else 0.0
            t2 = ((knots[i + d + 1] - x) / den2) * B[i + 1] if den2 > 0 else 0.0
            nxt.append(t1 + t2)
        B = nxt
    return B


class StepSpline(_FittedStep):
    """B-spline basis expansion (sklearn SplineTransformer analog,
    reference test_steps.py:406–425 family). Emits
    ``n_knots + degree - 1`` basis columns per selected column, named
    ``Spline_{i}`` 1-indexed across columns (reference StepSklearn
    naming convention).

    fit: per-column knot positions — 'uniform' (linspace over min/max)
    or 'quantile' (exact percentiles), one small aggregation job.
    transform: Cox-de Boor unrolled to literal expressions; constant
    extrapolation outside the fitted range via clamping (bake data may
    exceed the prep range without producing nulls)."""

    def __init__(
        self,
        sel: Optional[Selector] = None,
        n_knots: int = 5,
        degree: int = 3,
        knots: str = "uniform",
        prefix: str = "Spline",
        role: str = "predictor",
        exact: Optional[bool] = None,
        rows_hint: Optional[int] = None,
    ) -> None:
        super().__init__(sel)
        if n_knots < 2:
            raise ValueError("n_knots must be >= 2")
        if degree < 1:
            raise ValueError("degree must be >= 1")
        if knots not in ("uniform", "quantile"):
            raise ValueError("knots must be 'uniform' or 'quantile'")
        self.n_knots = n_knots
        self.degree = degree
        self.knots = knots
        self.prefix = prefix
        self.role = role
        self.exact = exact  # quantile knots: None = auto by input size
        self.rows_hint = rows_hint
        self.desc = f"B-spline basis (degree {degree}, {n_knots} knots)"

    @property
    def n_basis(self) -> int:
        return self.n_knots + self.degree - 2 + 1  # n_knots + degree - 1

    def do_fit(self, ingredients: Ingredients) -> None:
        df = ingredients.df
        fracs = [i / (self.n_knots - 1) for i in range(self.n_knots)]
        if self.knots == "uniform":
            aggs = []
            for c in self.columns:
                aggs += [
                    F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                    F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
                ]
            row = df.agg(*aggs).first().asDict()
            base = {
                c: [
                    row[f"__mn_{c}"] + f * (row[f"__mx_{c}"] - row[f"__mn_{c}"])
                    for f in fracs
                ]
                for c in self.columns
            }
        else:
            from recipys_spark.operators.scale import percentile_agg, resolve_exact

            ex = resolve_exact(self.exact, ingredients, self.rows_hint)
            aggs = [
                percentile_agg(F.col(c), fracs, ex).alias(c)
                for c in self.columns
            ]
            row = df.agg(*aggs).first().asDict()
            base = {c: [float(v) for v in row[c]] for c in self.columns}
        self.state = {c: {"base_knots": base[c]} for c in self.columns}

    def _out_names(self) -> list[tuple[str, int, str]]:
        out = []
        i = 1
        for c in self.columns:
            for j in range(self.n_basis):
                out.append((c, j, f"{self.prefix}_{i}"))
                i += 1
        return out

    def new_column_roles(self) -> dict[str, str]:
        return {name: self.role for _, _, name in self._out_names()}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        exprs = []
        for c in self.columns:
            base = self.state[c]["base_knots"]
            ext = _extend_knots(base, self.degree)
            lo, hi = base[0], base[-1]
            xc = F.least(
                F.greatest(F.col(c).cast("double"), F.lit(float(lo))),
                F.lit(float(hi)),
            )
            basis = bspline_basis_exprs(xc, ext, self.degree)
            for j, b in enumerate(basis):
                exprs.append(b)
        named = [
            e.alias(name) for e, (_, _, name) in zip(exprs, self._out_names())
        ]
        return df.select("*", *named)


class StepPowerTransform(_FittedStep):
    """Yeo-Johnson power transform with optional standardization
    (sklearn PowerTransformer analog, reference test_steps.py:406–425).

    fit: per-column lambda by MLE on a deterministic hash-top-k sample
    (``fit_sample_rows``; the objective is smooth, a sample suffices and
    keeps the fit one small collect), then exact decimal mean /
    population std of the transformed column over the FULL data (one
    Spark aggregation) when ``standardize=True``.
    transform: pure column expression with the frozen parameters."""

    def __init__(
        self,
        sel: Optional[Selector] = None,
        standardize: bool = True,
        fit_sample_rows: int = 100_000,
    ) -> None:
        super().__init__(sel)
        self.standardize = standardize
        self.fit_sample_rows = fit_sample_rows
        self.desc = "Yeo-Johnson power transform"

    def do_fit(self, ingredients: Ingredients) -> None:
        from recipys_spark.functions.deterministic import det_mean, det_stddev_pop

        df = ingredients.df.select(*self.columns)
        h = F.xxhash64(*[F.col(c) for c in self.columns])
        sample = (
            df.withColumn("__h", h)
            .orderBy("__h")
            .limit(self.fit_sample_rows)
            .drop("__h")
            .toPandas()
        )
        lambdas = {
            c: fit_yeo_johnson_lambda(sample[c].to_numpy(dtype=float))
            for c in self.columns
        }
        state = {c: {"lmbda": lambdas[c]} for c in self.columns}
        if self.standardize:
            aggs = []
            for c in self.columns:
                t = yeo_johnson_expr(F.col(c), lambdas[c])
                aggs += [
                    det_mean(t).alias(f"__mean_{c}"),
                    det_stddev_pop(t).alias(f"__std_{c}"),
                ]
            row = ingredients.df.agg(*aggs).first().asDict()
            for c in self.columns:
                state[c]["mean"] = row[f"__mean_{c}"]
                state[c]["std"] = row[f"__std_{c}"]
        self.state = state

    def do_transform(self, ingredients: Ingredients):
        exprs = {}
        for c in self.columns:
            p = self.state[c]
            e = yeo_johnson_expr(F.col(c), p["lmbda"])
            if self.standardize:
                std = p["std"] if p["std"] else 1.0
                e = (e - F.lit(p["mean"])) / F.lit(std)
            exprs[c] = e
        return self._replace(ingredients, exprs)
