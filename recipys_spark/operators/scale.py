"""Fitted scaling / discretization steps, Spark-native.

These re-implement the sklearn transformers the reference exercises
through ``StepSklearn`` (reference tests/test_steps.py:239–440;
``StepScale`` itself wraps sklearn's StandardScaler, reference
recipys/step.py:581–605) as first-class steps: ``fit`` is one small
Spark aggregation job whose result is collected to the driver and
frozen; ``transform`` is a pure column expression using that state —
the prep/bake leakage boundary in action.

Parity pins (SURVEY.md §7): StandardScaler uses population variance
(ddof=0) → ``stddev_pop``; RobustScaler centers on the exact median and
scales by IQR (exact ``percentile``); fitting is explicitly *ungrouped*
(whole-table), matching the reference's ``self._group = False``
(step.py:391).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import functions as F

from recipys_spark.ingredients import Ingredients
from recipys_spark.operators.base import Step
from recipys_spark.selector import Selector, all_numeric_predictors


def percentile_agg(col, probs, exact: bool = True, accuracy: int = 10_000):
    """Percentile aggregation expression for fitted state.

    exact ``F.percentile`` buffers every value of the aggregation group
    in executor memory — correct and oracle-matching, but an OOM at
    10^11+ rows. ``exact=False`` switches to ``percentile_approx``
    (t-digest style sketch, bounded memory, rank error ~1/accuracy) —
    the 100-TB fit path; the fitted parameters shift within the sketch
    error, the transform stays the same pure expression."""
    arr = F.array(*[F.lit(p) for p in probs])
    if exact:
        return F.percentile(col, arr)
    return F.percentile_approx(col, arr, F.lit(accuracy))


#: auto switch point for percentile fits: exact at/below (oracle
#: bit-parity), sketch above (bounded executor memory)
AUTO_EXACT_MAX_ROWS = 100_000_000


def resolve_exact(exact, data, rows_hint=None) -> bool:
    """Resolve a step's ``exact=None`` default by probing the input
    size ONCE at fit time: exact percentiles at/below
    AUTO_EXACT_MAX_ROWS (bit-identical to the numpy/DuckDB oracles),
    the percentile_approx sketch above — the exact aggregator buffers
    every value per column in executor memory, which is an OOM at the
    engine's own 10^10+-row target scale, so a scale-unsafe DEFAULT is
    a landmine even though the opt-in sketch exists.

    NOTE (behavior change vs the always-exact default of early
    releases): inputs above 10^8 rows now fit APPROXIMATE percentiles
    unless ``exact=True`` is passed explicitly.

    ``data`` may be an Ingredients (preferred — the count memoizes on
    the frame, so several quantile-fitted steps in one recipe share a
    single probe job) or a bare DataFrame; ``rows_hint`` skips the
    count job entirely (callers that already know the cardinality)."""
    if exact is not None:
        return exact
    if rows_hint is not None:
        n = rows_hint
    elif isinstance(data, Ingredients):
        n = data.row_count()
    else:
        n = data.count()
    return n <= AUTO_EXACT_MAX_ROWS


class _FittedStep(Step):
    """Base for steps whose state is a dict[col, dict[param, value]].

    All concrete subclasses are in-place 1:1 rewrites of their selected
    columns to DOUBLE whose fit is one whole-table ``df.agg`` — exactly
    the shape Recipe.prep can FUSE: consecutive independent scalers
    share a single aggregation scan (``fit_agg_plan``) instead of one
    full pass each (VERDICT r5 #2; at 100 TB a StepScale + MinMax +
    Robust chain costs 1 scan, not 3).

    Subclasses implement ``do_fit`` by delegating to ``fit_agg_plan``
    (prefix '') so the solo and fused paths run the SAME expressions —
    bit-identical fitted state either way.
    """

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True  # pure 1:1 column rewrites
    _stream_safe = True  # fitted state replays as a stateless projection/map
    fused_fit_dtype = "double"

    def __init__(self, sel: Optional[Selector] = None) -> None:
        super().__init__(sel if sel is not None else all_numeric_predictors())
        self.state: dict[str, dict] = {}

    def do_fit(self, ingredients: Ingredients) -> None:
        exprs, consume = self.fit_agg_plan(ingredients)
        consume(ingredients.df.agg(*exprs).first().asDict())

    def get_state(self) -> dict:
        return {"columns": self.columns, "state": self.state}

    def set_state(self, state: dict) -> None:
        self.columns = state["columns"]
        self.state = state["state"]
        self._trained = True

    def _replace(self, ingredients: Ingredients, exprs: dict[str, "F.Column"]):
        df = ingredients.df
        return df.select(
            *[
                exprs[c].alias(c) if c in exprs else F.col(c)
                for c in df.columns
            ]
        )


class StepScale(_FittedStep):
    """Standard scaling: (c - mean) / std_pop (reference step.py:581–605)."""

    def __init__(
        self,
        sel: Optional[Selector] = None,
        with_mean: bool = True,
        with_std: bool = True,
    ) -> None:
        super().__init__(sel)
        self.with_mean = with_mean
        self.with_std = with_std
        self.desc = "Scale with mean and std"

    def fit_agg_plan(self, ingredients: Ingredients, prefix: str = ""):
        # deterministic (order-independent) fit stats — identical at any
        # executor count; see functions/deterministic.py
        from recipys_spark.functions.deterministic import det_mean, det_stddev_pop

        aggs = []
        for c in self.columns:
            col = F.col(c)
            aggs += [
                det_mean(col).alias(f"{prefix}{c}__mean"),
                det_stddev_pop(col).alias(f"{prefix}{c}__std"),
            ]

        def consume(row: dict) -> None:
            self.state = {
                c: {"mean": row[f"{prefix}{c}__mean"], "std": row[f"{prefix}{c}__std"]}
                for c in self.columns
            }

        return aggs, consume

    def do_transform(self, ingredients: Ingredients):
        exprs = {}
        for c in self.columns:
            st = self.state[c]
            e = F.col(c).cast("double")
            if self.with_mean and st["mean"] is not None:
                e = e - F.lit(st["mean"])
            # sklearn: zero/None std scales by 1
            if self.with_std and st["std"]:
                e = e / F.lit(st["std"])
            exprs[c] = e
        return self._replace(ingredients, exprs)


class StepMinMaxScale(_FittedStep):
    """(c - min) / (max - min), sklearn MinMaxScaler semantics."""

    def fit_agg_plan(self, ingredients: Ingredients, prefix: str = ""):
        aggs = []
        for c in self.columns:
            aggs += [
                F.min(c).alias(f"{prefix}{c}__min"),
                F.max(c).alias(f"{prefix}{c}__max"),
            ]

        def consume(row: dict) -> None:
            self.state = {
                c: {"min": row[f"{prefix}{c}__min"], "max": row[f"{prefix}{c}__max"]}
                for c in self.columns
            }

        return aggs, consume

    def do_transform(self, ingredients: Ingredients):
        exprs = {}
        for c in self.columns:
            st = self.state[c]
            rng = (st["max"] - st["min"]) if st["max"] is not None else None
            e = F.col(c).cast("double")
            if rng:
                exprs[c] = (e - F.lit(st["min"])) / F.lit(rng)
            else:
                # constant column: sklearn maps to 0 offsetted by min
                exprs[c] = e - F.lit(st["min"] or 0.0)
        return self._replace(ingredients, exprs)


class StepMaxAbsScale(_FittedStep):
    """c / max(|c|), sklearn MaxAbsScaler semantics."""

    def fit_agg_plan(self, ingredients: Ingredients, prefix: str = ""):
        aggs = [
            F.max(F.abs(F.col(c))).alias(f"{prefix}{c}") for c in self.columns
        ]

        def consume(row: dict) -> None:
            self.state = {c: {"maxabs": row[f"{prefix}{c}"]} for c in self.columns}

        return aggs, consume

    def do_transform(self, ingredients: Ingredients):
        exprs = {}
        for c in self.columns:
            m = self.state[c]["maxabs"]
            e = F.col(c).cast("double")
            exprs[c] = e / F.lit(m) if m else e
        return self._replace(ingredients, exprs)


class StepRobustScale(_FittedStep):
    """(c - median) / IQR, sklearn RobustScaler defaults (q 25/75).
    ``exact=None`` (default) auto-selects exact vs sketch percentiles
    by input size (see resolve_exact); True/False forces a path."""

    def __init__(
        self,
        sel: Optional[Selector] = None,
        exact: Optional[bool] = None,
        rows_hint: Optional[int] = None,
    ) -> None:
        super().__init__(sel)
        self.exact = exact
        self.rows_hint = rows_hint

    def fit_agg_plan(self, ingredients: Ingredients, prefix: str = ""):
        ex = resolve_exact(self.exact, ingredients, self.rows_hint)
        aggs = [
            percentile_agg(F.col(c), [0.25, 0.5, 0.75], ex).alias(f"{prefix}{c}")
            for c in self.columns
        ]

        def consume(row: dict) -> None:
            self.state = {
                c: {
                    "q25": row[f"{prefix}{c}"][0],
                    "median": row[f"{prefix}{c}"][1],
                    "q75": row[f"{prefix}{c}"][2],
                }
                for c in self.columns
            }

        return aggs, consume

    def do_transform(self, ingredients: Ingredients):
        exprs = {}
        for c in self.columns:
            st = self.state[c]
            iqr = (
                st["q75"] - st["q25"]
                if st["q75"] is not None and st["q25"] is not None
                else None
            )
            e = F.col(c).cast("double") - F.lit(st["median"])
            exprs[c] = e / F.lit(iqr) if iqr else e
        return self._replace(ingredients, exprs)


class StepBinarize(Step):
    """(c > threshold) → 1/0, stateless (sklearn Binarizer)."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(self, sel: Optional[Selector] = None, threshold: float = 0.0) -> None:
        super().__init__(sel if sel is not None else all_numeric_predictors())
        self.threshold = threshold
        self.desc = f"Binarize at {threshold}"

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        return df.select(
            *[
                (F.col(c) > F.lit(self.threshold)).cast("int").alias(c)
                if c in self.columns
                else F.col(c)
                for c in df.columns
            ]
        )


class StepNormalize(Step):
    """Row-wise Lp normalization over the selected columns, stateless
    (sklearn Normalizer; norm ∈ l1, l2, max)."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(self, sel: Optional[Selector] = None, norm: str = "l2") -> None:
        super().__init__(sel if sel is not None else all_numeric_predictors())
        if norm not in ("l1", "l2", "max"):
            raise ValueError(f"norm must be l1|l2|max, got {norm!r}")
        self.norm = norm
        self.desc = f"Normalize rows ({norm})"

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        cols = [F.col(c).cast("double") for c in self.columns]
        if self.norm == "l2":
            mag = F.sqrt(sum((c * c for c in cols), F.lit(0.0)))
        elif self.norm == "l1":
            mag = sum((F.abs(c) for c in cols), F.lit(0.0))
        else:
            mag = F.greatest(*[F.abs(c) for c in cols]) if len(cols) > 1 else F.abs(cols[0])
        safe = F.when(mag == 0, F.lit(1.0)).otherwise(mag)
        sel = set(self.columns)
        return df.select(
            *[
                (F.col(c).cast("double") / safe).alias(c) if c in sel else F.col(c)
                for c in df.columns
            ]
        )


class StepKBinsDiscretize(_FittedStep):
    """Bucket into k bins (sklearn KBinsDiscretizer, ordinal encoding).

    strategy='uniform': equal-width bins from fitted min/max;
    strategy='quantile': bin edges at fitted quantiles (auto
    exact-vs-sketch by input size, see resolve_exact — exact matches
    numpy linear interpolation and the DuckDB oracles)."""

    def __init__(
        self,
        sel: Optional[Selector] = None,
        n_bins: int = 5,
        strategy: str = "uniform",
        exact: Optional[bool] = None,
        rows_hint: Optional[int] = None,
    ) -> None:
        super().__init__(sel)
        if strategy not in ("uniform", "quantile"):
            raise ValueError("strategy must be uniform|quantile")
        if n_bins < 2:
            raise ValueError("n_bins must be >= 2")
        self.n_bins = n_bins
        self.strategy = strategy
        self.exact = exact
        self.rows_hint = rows_hint
        self.desc = f"KBins({n_bins}, {strategy})"

    def fit_agg_plan(self, ingredients: Ingredients, prefix: str = ""):
        if self.strategy == "uniform":
            aggs = []
            for c in self.columns:
                aggs += [
                    F.min(c).alias(f"{prefix}{c}__min"),
                    F.max(c).alias(f"{prefix}{c}__max"),
                ]

            def consume(row: dict) -> None:
                self.state = {}
                for c in self.columns:
                    lo, hi = row[f"{prefix}{c}__min"], row[f"{prefix}{c}__max"]
                    edges = [
                        lo + (hi - lo) * i / self.n_bins
                        for i in range(self.n_bins + 1)
                    ]
                    self.state[c] = {"edges": edges}

        else:
            ex = resolve_exact(self.exact, ingredients, self.rows_hint)
            probs = [i / self.n_bins for i in range(self.n_bins + 1)]
            aggs = [
                percentile_agg(F.col(c), probs, ex).alias(f"{prefix}{c}")
                for c in self.columns
            ]

            def consume(row: dict) -> None:
                self.state = {
                    c: {"edges": list(row[f"{prefix}{c}"])} for c in self.columns
                }

        return aggs, consume

    def do_transform(self, ingredients: Ingredients):
        exprs = {}
        for c in self.columns:
            edges = self.state[c]["edges"]
            # interior edges only; values == upper edge fall in last bin
            e = F.lit(0)
            for i, edge in enumerate(edges[1:-1]):
                e = e + (F.col(c) >= F.lit(edge)).cast("int")
            exprs[c] = F.when(F.col(c).isNull(), F.lit(None)).otherwise(e).cast("double")
        return self._replace(ingredients, exprs)


class StepQuantileTransform(_FittedStep):
    """Map values to their (interpolated) quantile rank in [0, 1]
    (sklearn QuantileTransformer, uniform output).

    Fit: an ``n_quantiles`` reference grid of exact percentiles.
    Transform: piecewise-linear interpolation between grid points,
    expressed as a CASE chain (grid is small, stays JVM-side)."""

    def __init__(
        self,
        sel: Optional[Selector] = None,
        n_quantiles: int = 100,
        exact: Optional[bool] = None,
    ) -> None:
        super().__init__(sel)
        self.n_quantiles = n_quantiles
        self.exact = exact
        self.desc = f"QuantileTransform({n_quantiles})"

    def fit_agg_plan(self, ingredients: Ingredients, prefix: str = ""):
        n = ingredients.row_count()  # also the resolve_exact probe (memoized)
        ex = resolve_exact(self.exact, ingredients.df, rows_hint=n)
        k = min(self.n_quantiles, max(2, n))
        probs = [i / (k - 1) for i in range(k)]
        aggs = [
            percentile_agg(F.col(c), probs, ex).alias(f"{prefix}{c}")
            for c in self.columns
        ]

        def consume(row: dict) -> None:
            self.state = {
                c: {"grid": list(row[f"{prefix}{c}"]), "probs": probs}
                for c in self.columns
            }

        return aggs, consume

    def do_transform(self, ingredients: Ingredients):
        exprs = {}
        for c in self.columns:
            grid = self.state[c]["grid"]
            probs = self.state[c]["probs"]
            x = F.col(c).cast("double")
            e = F.lit(1.0)
            # walk segments from the top so earlier WHENs catch lower values
            expr = F.lit(1.0)
            for i in range(len(grid) - 1):
                lo, hi = grid[i], grid[i + 1]
                plo, phi = probs[i], probs[i + 1]
                if hi == lo:
                    seg = F.lit(phi)
                else:
                    seg = F.lit(plo) + (x - F.lit(lo)) / F.lit(hi - lo) * F.lit(phi - plo)
                if i == 0:
                    expr = F.when(x <= F.lit(grid[0]), F.lit(0.0)).when(
                        x <= F.lit(hi), seg
                    )
                else:
                    expr = expr.when(x <= F.lit(hi), seg)
            expr = expr.otherwise(F.lit(1.0))
            exprs[c] = F.when(x.isNull(), F.lit(None)).otherwise(expr)
        return self._replace(ingredients, exprs)
