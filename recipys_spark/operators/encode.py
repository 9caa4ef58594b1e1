"""Fitted categorical encoders, Spark-native.

Cover the encoder surface the reference reaches through sklearn
(reference tests/test_steps.py:351–404): OrdinalEncoder, OneHotEncoder,
LabelEncoder/LabelBinarizer (same math on the outcome role),
MissingIndicator. Parity pins (SURVEY.md §7): categories are the
distinct values sorted lexicographically (sklearn's convention); the
one-hot column naming follows the reference's ``{Name}_{i}`` 1-indexed
pattern (reference step.py:433, 457–459).

Fit = one distinct-aggregate job; the category maps are tiny and live
in the plan as literal CASE/array expressions (broadcast by value) —
no join, no shuffle at transform time.

Scale guard: the literal-map design assumes enum-like columns. A
high-cardinality key would collect_set millions of values onto the
driver and inline them into the plan, so fit first runs a cheap
``approx_count_distinct`` probe and fails fast above ``max_categories``
(tunable) with a clear error instead of OOMing the driver.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from recipys_spark.ingredients import Ingredients
from recipys_spark.operators.base import Step
from recipys_spark.selector import Selector, all_predictors


def _fit_categories(df, columns, max_categories: int, step_name: str) -> dict:
    """Distinct sorted categories per column, guarded by an
    approx_count_distinct probe (±5% typical HLL error — the guard
    uses 1.2x headroom so legitimate near-limit columns still fit)."""
    probe = df.agg(
        *[F.approx_count_distinct(F.col(c)).alias(c) for c in columns]
    ).first()
    too_big = {c: probe[c] for c in columns if probe[c] > max_categories * 1.2}
    if too_big:
        raise ValueError(
            f"{step_name}: column(s) exceed max_categories={max_categories}: "
            f"{ {c: int(n) for c, n in too_big.items()} } (approximate). "
            "Literal-map encoding of a high-cardinality column would "
            "collect the full category set to the driver; raise "
            "max_categories only if that is intended, or hash/bucket the "
            "column instead."
        )
    aggs = [F.sort_array(F.collect_set(F.col(c))).alias(c) for c in columns]
    row = df.agg(*aggs).first().asDict()
    cats = {c: list(row[c]) for c in columns}
    oversize = {c: len(v) for c, v in cats.items() if len(v) > max_categories}
    if oversize:
        raise ValueError(
            f"{step_name}: column(s) exceed max_categories={max_categories}: "
            f"{oversize} (exact)"
        )
    return cats


class StepOrdinalEncode(Step):
    """category → its index in the lexicographically sorted distinct
    set; unknown categories at transform time → null."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(
        self, sel: Optional[Selector] = None, max_categories: int = 10_000
    ) -> None:
        super().__init__(sel if sel is not None else all_predictors())
        self.categories: dict[str, list] = {}
        self.max_categories = max_categories
        self.desc = "Ordinal-encode categories"

    def do_fit(self, ingredients: Ingredients) -> None:
        self.categories = _fit_categories(
            ingredients.df, self.columns, self.max_categories, "StepOrdinalEncode"
        )

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        exprs = {}
        for c in self.columns:
            cats = self.categories[c]
            mapping = F.map_from_arrays(
                F.array(*[F.lit(v) for v in cats]),
                F.array(*[F.lit(float(i)) for i in range(len(cats))]),
            )
            exprs[c] = mapping[F.col(c)]
        return df.select(
            *[exprs[c].alias(c) if c in exprs else F.col(c) for c in df.columns]
        )

    def get_state(self) -> dict:
        return {"columns": self.columns, "categories": self.categories}

    def set_state(self, state: dict) -> None:
        self.columns = state["columns"]
        self.categories = state["categories"]
        self._trained = True


class StepOneHotEncode(Step):
    """One 0/1 column per fitted category, named
    ``OneHotEncoder_{i}`` 1-indexed across all selected columns
    (reference naming, step.py:457–459); ``in_place=False`` keeps the
    source columns, matching StepSklearn's column-emitting mode."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(
        self,
        sel: Optional[Selector] = None,
        in_place: bool = False,
        role: str = "predictor",
        prefix: str = "OneHotEncoder",
        max_categories: int = 1_000,
    ) -> None:
        super().__init__(sel if sel is not None else all_predictors())
        self.in_place = in_place
        self.role = role
        self.prefix = prefix
        self.max_categories = max_categories
        self.categories: dict[str, list] = {}
        self.desc = "One-hot encode categories"

    def do_fit(self, ingredients: Ingredients) -> None:
        # one-hot emits a COLUMN per category — far tighter default cap
        self.categories = _fit_categories(
            ingredients.df, self.columns, self.max_categories, "StepOneHotEncode"
        )

    def _out_names(self) -> list[tuple[str, object, str]]:
        out = []
        i = 1
        for c in self.columns:
            for cat in self.categories[c]:
                out.append((c, cat, f"{self.prefix}_{i}"))
                i += 1
        return out

    def new_column_roles(self) -> dict[str, str]:
        return {name: self.role for _, _, name in self._out_names()}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        onehots = [
            (F.col(c) == F.lit(cat)).cast("int").alias(name)
            for c, cat, name in self._out_names()
        ]
        keep = [
            F.col(c)
            for c in df.columns
            if not self.in_place or c not in self.columns
        ]
        return df.select(*keep, *onehots)

    def get_state(self) -> dict:
        return {"columns": self.columns, "categories": self.categories}

    def set_state(self, state: dict) -> None:
        self.columns = state["columns"]
        self.categories = state["categories"]
        self._trained = True


class StepMissingIndicator(Step):
    """Add ``c_missing`` 0/1 columns (sklearn MissingIndicator with
    features='all' semantics, stateless)."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(
        self,
        sel: Optional[Selector] = None,
        suffix: str = "missing",
        role: str = "predictor",
    ) -> None:
        super().__init__(sel if sel is not None else all_predictors())
        self.suffix = suffix
        self.role = role
        self.desc = "Missing indicators"

    def new_column_roles(self) -> dict[str, str]:
        return {f"{c}_{self.suffix}": self.role for c in self.columns}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        inds = [
            F.isnull(F.col(c)).cast("int").alias(f"{c}_{self.suffix}")
            for c in self.columns
        ]
        return df.select("*", *inds)


class StepLabelEncode(StepOrdinalEncode):
    """sklearn LabelEncoder analog: ordinal-encode the OUTCOME role
    (classes sorted lexicographically, 0-indexed). Same math as
    StepOrdinalEncode; named step for reference API parity (the
    reference reaches it via StepSklearn(LabelEncoder(), columnwise=
    True, role='outcome') — reference tests/test_steps.py:387–395)."""

    def __init__(
        self, sel: Optional[Selector] = None, max_categories: int = 10_000
    ) -> None:
        from recipys_spark.selector import all_outcomes

        super().__init__(
            sel if sel is not None else all_outcomes(), max_categories=max_categories
        )
        self.desc = "Label-encode outcomes"


class StepLabelBinarize(Step):
    """sklearn LabelBinarizer analog on the OUTCOME role, including its
    binary quirk: with exactly TWO classes it emits ONE 0/1 column (the
    indicator of the second sorted class), not two — matching
    sklearn's LabelBinarizer (reference tests/test_steps.py:397–404).
    Multiclass emits one column per class, ``{prefix}_{i}`` 1-indexed."""

    _uses_groups = False
    _stream_safe = True  # fitted state replays as a stateless projection/map
    _uses_sequence = False

    def __init__(
        self,
        sel: Optional[Selector] = None,
        prefix: str = "LabelBinarizer",
        role: str = "outcome",
        max_categories: int = 1_000,
    ) -> None:
        from recipys_spark.selector import all_outcomes

        super().__init__(sel if sel is not None else all_outcomes())
        self.prefix = prefix
        self.role = role
        self.max_categories = max_categories
        self.categories: dict[str, list] = {}
        self.desc = "Label-binarize outcomes"

    def do_fit(self, ingredients: Ingredients) -> None:
        self.categories = _fit_categories(
            ingredients.df, self.columns, self.max_categories, "StepLabelBinarize"
        )

    def _out_names(self) -> list[tuple[str, object, str]]:
        out = []
        i = 1
        for c in self.columns:
            cats = self.categories[c]
            if len(cats) == 2:
                # sklearn binary quirk: single indicator of the 2nd class
                out.append((c, cats[1], f"{self.prefix}_{i}"))
                i += 1
            else:
                for cat in cats:
                    out.append((c, cat, f"{self.prefix}_{i}"))
                    i += 1
        return out

    def new_column_roles(self) -> dict[str, str]:
        return {name: self.role for _, _, name in self._out_names()}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        cols = [
            (F.col(c) == F.lit(cat)).cast("int").alias(name)
            for c, cat, name in self._out_names()
        ]
        return df.select("*", *cols)

    def get_state(self) -> dict:
        return {"columns": self.columns, "categories": self.categories}

    def set_state(self, state: dict) -> None:
        self.columns = state["columns"]
        self.categories = state["categories"]
        self._trained = True


class StepTargetEncode(Step):
    """m-estimate target (mean) encoding — sklearn TargetEncoder
    semantics with explicit smoothing: category c maps to

        (sum_y(c) + smoothing * global_mean) / (count(c) + smoothing)

    Fit runs one per-category aggregation job per selected column plus
    one global-mean job (state bounded by max_categories) and freezes
    the mapping — the prep/bake leakage boundary every fitted step gets:
    bake NEVER sees its own outcomes, so the encoder cannot leak
    apply-time labels. Unknown categories and NULLs at transform time
    map to the fitted global mean (sklearn's unknown_value behavior).

    ``outcome_col=None`` resolves the recipe's outcome role at fit
    time. Deterministic decimal accumulation makes the fitted means
    bit-identical at any parallelism."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(
        self,
        sel: Optional[Selector] = None,
        outcome_col: Optional[str] = None,
        smoothing: float = 20.0,
        max_categories: int = 10_000,
    ) -> None:
        from recipys_spark.selector import has_type

        super().__init__(sel if sel is not None else has_type("string"))
        if smoothing < 0:
            raise ValueError("smoothing must be >= 0")
        self.outcome_col = outcome_col
        self.smoothing = smoothing
        self.max_categories = max_categories
        self.state: dict = {}
        self.desc = f"Target-encode (m={smoothing})"

    def _resolve_outcome(self, ingredients: Ingredients) -> str:
        if self.outcome_col is not None:
            return self.outcome_col
        outs = [
            c for c, roles in ingredients.roles.items() if "outcome" in roles
        ]
        if len(outs) != 1:
            raise ValueError(
                f"StepTargetEncode needs outcome_col= or exactly one "
                f"outcome-role column; found {outs}"
            )
        return outs[0]

    def do_fit(self, ingredients: Ingredients) -> None:
        from recipys_spark.functions.deterministic import det_mean, det_sum

        df = ingredients.df
        y = self._resolve_outcome(ingredients)
        g = df.agg(
            det_mean(F.col(y).cast("double")).alias("gm")
        ).first()
        global_mean = float(g.gm) if g.gm is not None else 0.0
        self.state = {"__global_mean": global_mean, "__outcome": y}
        for c in self.columns:
            if c == y:
                raise ValueError("cannot target-encode the outcome itself")
            # limit without orderBy: if over the cap we RAISE (which
            # subset arrives is irrelevant), if under it every row
            # arrives — so no global sort is needed
            rows = (
                df.where(F.col(c).isNotNull() & F.col(y).isNotNull())
                .groupBy(c)
                .agg(
                    det_sum(F.col(y).cast("double")).cast("double").alias("s"),
                    F.count("*").alias("n"),
                )
                .limit(self.max_categories + 1)
                .collect()
            )
            if len(rows) > self.max_categories:
                raise ValueError(
                    f"StepTargetEncode: column {c!r} exceeds max_categories="
                    f"{self.max_categories}; raise the cap or hash-encode instead"
                )
            m = self.smoothing
            self.state[c] = {
                r[c]: (float(r.s) + m * global_mean) / (r.n + m) for r in rows
            }

    def new_column_roles(self) -> dict:
        return {f"{c}_target": "predictor" for c in self.columns}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        gm = self.state["__global_mean"]
        exprs = []
        for c in self.columns:
            mapping = self.state[c]
            if mapping:
                keys = F.array(*[F.lit(k) for k in mapping])
                vals = F.array(*[F.lit(v) for v in mapping.values()])
                e = F.coalesce(
                    F.map_from_arrays(keys, vals)[F.col(c)], F.lit(gm)
                )
            else:
                e = F.lit(gm)
            exprs.append(e.alias(f"{c}_target"))
        return df.select("*", *exprs)

    def get_state(self) -> dict:
        # parallel key/value LISTS, not a dict: json.dump stringifies
        # dict keys WITHOUT the manifest's _tag_value hook, so typed
        # categories (dates, ints, floats) would corrupt or crash the
        # save_state round-trip — list elements go through tagging
        out = {
            "columns": self.columns,
            "global_mean": self.state["__global_mean"],
            "outcome": self.state["__outcome"],
            "mappings": {
                c: {
                    "keys": list(self.state[c]),
                    "values": list(self.state[c].values()),
                }
                for c in self.columns
            },
        }
        return out

    def set_state(self, state: dict) -> None:
        self.columns = state["columns"]
        self.state = {
            "__global_mean": state["global_mean"],
            "__outcome": state["outcome"],
        }
        for c, m in state["mappings"].items():
            self.state[c] = dict(zip(m["keys"], m["values"]))
        self._trained = True


class StepHashEncode(Step):
    """Hashing-trick encoder (sklearn FeatureHasher / vw-style):
    category → ``hash(category) % n_features`` as an integer index
    column ``{c}_hash``. STATELESS — no vocabulary, no fit pass, no
    cardinality cap, no unknown-category problem: the properties that
    make it the default categorical path at 10^9-distinct-value scale
    (user ids, URLs) where fitted vocabularies cannot exist.

    ``hash_family="md5"`` (default) uses the portable 60-bit md5 coin
    (exact DuckDB mirror); ``"xxhash64"`` is the cheaper JVM-only
    production path. NULL stays NULL (a NULL category is missing
    data, not bucket 0)."""

    _uses_groups = False
    _uses_sequence = False
    _row_preserving = True
    _stream_safe = True  # fitted state replays as a stateless projection/map

    def __init__(
        self,
        sel: Optional[Selector] = None,
        n_features: int = 1 << 18,
        seed: int = 42,
        hash_family: str = "md5",
    ) -> None:
        from recipys_spark.selector import has_type

        super().__init__(sel if sel is not None else has_type("string"))
        if n_features < 1:
            raise ValueError("n_features must be >= 1")
        if hash_family not in ("md5", "xxhash64"):
            raise ValueError("hash_family must be 'md5' or 'xxhash64'")
        self.n_features = n_features
        self.seed = seed
        self.hash_family = hash_family
        # stateless, but fit still runs (the no-op default) so the
        # selector resolves columns against the live schema
        self.desc = f"Hash-encode into {n_features} buckets"

    def new_column_roles(self) -> dict:
        return {f"{c}_hash": "predictor" for c in self.columns}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        exprs = []
        for c in self.columns:
            col = F.col(c).cast("string")
            if self.hash_family == "md5":
                from recipys_spark.operators.packing import md5_long

                e = md5_long(col, self.seed) % F.lit(self.n_features)
            else:
                e = F.pmod(
                    F.xxhash64(col, F.lit(self.seed)), F.lit(self.n_features)
                )
            exprs.append(
                F.when(F.col(c).isNotNull(), e).cast("long").alias(f"{c}_hash")
            )
        return df.select("*", *exprs)
