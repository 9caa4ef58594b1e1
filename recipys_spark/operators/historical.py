"""StepHistorical: per-group expanding (running) accumulators.

Reference semantics (reference recipys/step.py:274–363): for each
selected column ``c`` add ``c_{suffix}`` holding the accumulator over
the group's history *including the current row*; suffix defaults to the
accumulator name. Nulls are skipped (polars cum_max / pandas
``skipna=True``); VAR is sample variance (ddof=1, the polars
``rolling_var`` / pandas ``expanding().var()`` default); COUNT counts
non-nulls; MEDIAN is the exact interpolated median. FIRST/LAST raise
TypeError (reference step.py:336–337, 354–355).

Reference quirk normalized (SURVEY.md §2.4): the reference mutates
``self.suffix`` on every transform so prep→bake emits ``c__max``; here
the suffix is computed per call.

Spark mapping: one expression per (column, accumulator) over the shared
expanding row frame — all steps in a recipe reuse the identical
``Window.partitionBy(groups).orderBy(sequence)`` spec, so Catalyst
fuses them into a single shuffle + sort. For conversations long enough
to break a single window task, ``skew_bucket_size`` switches the
decomposable accumulators (MAX/MIN/MEAN/COUNT/VAR) to a salted
two-phase plan (see functions/skew.py). MEDIAN is not decomposable:
its default plan is the streaming Arrow applyInPandas path (the window
``percentile`` recomputes the expanding frame per row — O(n²) per
conversation; opt back in with ``median_via_pandas=False`` only for
the SQL-mirror comparison).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import functions as F

from recipys_spark.ingredients import Ingredients
from recipys_spark.operators.base import Accumulator, Step
from recipys_spark.selector import Selector, all_numeric_predictors
from recipys_spark.functions.windows import expanding


def historical_expr(col: str, fun: Accumulator, frame) -> "F.Column":
    """The single-window expression for one accumulator."""
    c = F.col(col)
    # cum_max/cum_min semantics (polars cum_*, pandas cummax/cummin):
    # nulls are skipped for the running value but the OUTPUT at a
    # null-input row is null; the expanding() family (mean/median/
    # count/var) instead emits the aggregate of prior non-nulls there.
    if fun is Accumulator.MAX:
        return F.when(c.isNotNull(), F.max(c).over(frame))
    if fun is Accumulator.MIN:
        return F.when(c.isNotNull(), F.min(c).over(frame))
    if fun is Accumulator.MEAN:
        # exact decimal accumulation: bit-identical at any parallelism
        # (north-rule determinism) — see functions/deterministic.py
        from recipys_spark.functions.deterministic import det_mean

        return det_mean(c, frame)
    if fun is Accumulator.MEDIAN:
        # exact interpolated median, matching pandas expanding().median()
        return F.percentile(c, F.lit(0.5)).over(frame)
    if fun is Accumulator.COUNT:
        return F.count(c).over(frame)
    if fun is Accumulator.VAR:
        from recipys_spark.functions.deterministic import det_var_samp

        return det_var_samp(c, frame)
    raise TypeError(f"Expected a historical Accumulator, got {fun!r}")


class StepRolling(Step):
    """Trailing rolling-window accumulator over the prior ``window``
    rows *including the current row* (pandas ``rolling(window,
    min_periods=1)`` semantics): adds ``{c}_roll{window}_{fun}``.

    Engine extension beyond the reference (its windows are expanding
    only); same shared conversation window spec, bounded row frame."""

    def __init__(
        self,
        sel: Optional[Selector] = None,
        fun: Accumulator = Accumulator.MEAN,
        window: int = 3,
        suffix: Optional[str] = None,
        role: str = "predictor",
        skew_bucket_size: Optional[int] = None,
        skew_rows_per_bucket: int = 100_000,
    ) -> None:
        super().__init__(sel if sel is not None else all_numeric_predictors())
        if not isinstance(fun, Accumulator):
            raise TypeError(f"Expected Accumulator enum for function, got {type(fun)}")
        if fun in (Accumulator.FIRST, Accumulator.LAST):
            raise TypeError(f"FIRST/LAST are resampling-only policies, got {fun}")
        if window < 1:
            raise ValueError("window must be >= 1")
        self.fun = fun
        self.window = window
        self.suffix = suffix if suffix is not None else f"roll{window}_{fun.value}"
        self.role = role
        self.skew_bucket_size = skew_bucket_size
        self.skew_rows_per_bucket = skew_rows_per_bucket
        self.desc = f"Rolling {fun} over {window} rows"

    def new_column_roles(self) -> dict[str, str]:
        return {f"{c}_{self.suffix}": self.role for c in self.columns}

    def do_transform(self, ingredients: Ingredients):
        from recipys_spark.functions.windows import trailing

        if not self.sequence_columns:
            raise ValueError("StepRolling requires a sequence role column")
        if self.skew_bucket_size is not None:
            from recipys_spark.functions.skew import salted_trailing

            return salted_trailing(
                ingredients.df,
                cols=self.columns,
                groups=self.group_columns,
                sequence=self.sequence_columns[0],
                fun=self.fun,
                window=self.window,
                suffix=self.suffix,
                bucket_size=self.skew_bucket_size,
                rows_per_bucket=self.skew_rows_per_bucket,
            )
        if self.fun in (Accumulator.MEAN, Accumulator.VAR):
            # decimal accumulators over a bounded frame are recomputed
            # per row — use the exact cumsum-difference form instead
            return rolling_sum_diff(
                ingredients.df,
                self.columns,
                self.fun,
                self.window,
                self.group_columns,
                self.sequence_columns,
                self.suffix,
            )
        frame = trailing(self.group_columns, self.sequence_columns, self.window - 1)
        exprs = [
            rolling_expr(c, self.fun, frame).alias(f"{c}_{self.suffix}")
            for c in self.columns
        ]
        return ingredients.df.select("*", *exprs)


def rolling_expr(col: str, fun: Accumulator, frame) -> "F.Column":
    """Bounded-frame accumulator with pandas ``rolling(min_periods=1)``
    semantics: unlike the cum_max/cum_min expanding family, MAX/MIN
    emit the window aggregate even at null-input rows."""
    c = F.col(col)
    if fun is Accumulator.MAX:
        return F.max(c).over(frame)
    if fun is Accumulator.MIN:
        return F.min(c).over(frame)
    return historical_expr(col, fun, frame)


def rolling_sum_diff(df, cols, fun, window, part_cols, order_cols, suffix):
    """Rolling MEAN/VAR via cumsum differences instead of a bounded
    decimal frame.

    Spark recomputes a bounded ("sliding") frame's aggregation buffer
    from scratch for EVERY row; with DECIMAL(38,18) accumulators that
    is O(window) BigDecimal allocations per row — measured 4-40x slower
    than the sort itself at 10^7 rows. Expanding (unbounded-preceding)
    frames instead update incrementally, and decimal arithmetic is
    EXACT, so  sum(frame[-(w-1)..0]) == cumsum[i] - cumsum[i-w]
    bit-for-bit — two O(1)/row expanding sums plus a lag, same
    Exchange+sort, identical values to the direct bounded-frame
    det_mean/det_var_samp expressions (and therefore to the DuckDB
    oracles)."""
    from recipys_spark.functions.deterministic import DEC
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    exp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base_cols = list(df.columns)
    inter = []
    for c in cols:
        col = F.col(c)
        inter.append(F.sum(col.cast(DEC)).over(exp).alias(f"__cs_{c}"))
        inter.append(F.count(col).over(exp).alias(f"__cn_{c}"))
        if fun is Accumulator.VAR:
            sq = (col.cast("double") * col.cast("double")).cast(DEC)
            inter.append(F.sum(sq).over(exp).alias(f"__cq_{c}"))
    df2 = df.select("*", *inter)

    zero = F.lit(0).cast(DEC)
    outs = []
    for c in cols:
        cs, cn = F.col(f"__cs_{c}"), F.col(f"__cn_{c}")
        s = cs - F.coalesce(F.lag(cs, window).over(w), zero)
        n = cn - F.coalesce(F.lag(cn, window).over(w), F.lit(0))
        if fun is Accumulator.MEAN:
            e = F.when(n > 0, s.cast("double") / n)
        else:  # VAR — mirror det_var_samp's expression tree exactly
            cq = F.col(f"__cq_{c}")
            q = cq - F.coalesce(F.lag(cq, window).over(w), zero)
            sd, qd, nd = s.cast("double"), q.cast("double"), n.cast("double")
            var = (qd - sd * sd / nd) / (nd - F.lit(1.0))
            e = F.when(n > 1, F.greatest(var, F.lit(0.0)))
        outs.append(e.alias(f"{c}_{suffix}"))
    return df2.select(*base_cols, *outs)


class StepHistorical(Step):
    def __init__(
        self,
        sel: Optional[Selector] = None,
        fun: Accumulator = Accumulator.MAX,
        suffix: Optional[str] = None,
        role: str = "predictor",
        skew_bucket_size: Optional[int] = None,
        median_via_pandas: Optional[bool] = None,
        median_ship: Optional[str] = None,
    ) -> None:
        super().__init__(sel if sel is not None else all_numeric_predictors())
        if not isinstance(fun, Accumulator):
            raise TypeError(f"Expected Accumulator enum for function, got {type(fun)}")
        if fun in (Accumulator.FIRST, Accumulator.LAST):
            raise TypeError(f"FIRST/LAST are resampling-only policies, got {fun}")
        if median_via_pandas and fun is not Accumulator.MEDIAN:
            raise ValueError("median_via_pandas applies only to MEDIAN")
        if median_ship is not None:
            if fun is not Accumulator.MEDIAN:
                raise ValueError("median_ship applies only to MEDIAN")
            if median_ship not in ("auto", "narrow", "full"):
                raise ValueError("median_ship must be 'auto', 'narrow' or 'full'")
            if median_via_pandas is False:
                raise ValueError(
                    "median_ship configures the Arrow median paths, but "
                    "median_via_pandas=False forces the window-percentile "
                    "expression — the requested ship strategy would be "
                    "silently ignored; drop one of the two options"
                )
        self.median_ship = median_ship or "auto"
        self.fun = fun
        self.suffix = suffix if suffix is not None else fun.value
        self.role = role
        self.skew_bucket_size = skew_bucket_size
        self.median_via_pandas = median_via_pandas
        self.desc = f"Create historical {fun}"

    def new_column_roles(self) -> dict[str, str]:
        return {f"{c}_{self.suffix}": self.role for c in self.columns}

    def do_transform(self, ingredients: Ingredients):
        df = ingredients.df
        groups = self.group_columns
        seq = self.sequence_columns
        if not seq:
            raise ValueError(
                "StepHistorical requires a sequence role column for deterministic ordering."
            )
        if self.skew_bucket_size and self.fun is not Accumulator.MEDIAN:
            from recipys_spark.functions.skew import salted_expanding

            return salted_expanding(
                df,
                cols=self.columns,
                groups=groups,
                sequence=seq[0],
                fun=self.fun,
                suffix=self.suffix,
                bucket_size=self.skew_bucket_size,
            )
        if self.fun is Accumulator.MEDIAN and self.median_via_pandas is not False:
            # Scale-safe default: the window `percentile` recomputes the
            # expanding frame per row — O(n²) per conversation, which
            # never finishes at 10^6+ turns. The Arrow paths stream it
            # (pandas skiplist expanding median, O(n log n)). Pass
            # median_via_pandas=False to force the window expression
            # (the SQL-oracle mirror).
            if self._median_ship_full(df, groups, seq):
                return self._median_apply_in_arrow(df, groups, seq)
            return self._median_apply_in_pandas(df, groups, seq)
        frame = expanding(groups, seq)
        exprs = [
            historical_expr(c, self.fun, frame).alias(f"{c}_{self.suffix}")
            for c in self.columns
        ]
        return df.select("*", *exprs)

    def _median_batched(self, df, groups, seq_cols, cols, out_schema):
        """Partition-batched exact expanding median: hash-repartition by
        the group columns (all rows of a group land in one partition —
        the same exchange groupBy/applyInArrow would pay), then ONE
        ``mapInArrow`` call per partition instead of one Python call
        per group. With ~67-row groups the per-group dispatch (Arrow
        IPC framing + function call + schema checks) dominated the
        Arrow median path; batching runs one pyarrow sort and, per
        value column, one C-level grouped expanding median
        (``Series.groupby(gids).expanding().median()`` — a single
        cython pass over the whole partition) for all groups at once.

        Exactness: the partition table is sorted by (groups, sequence)
        with ``null_placement="at_start"`` — the same asc_nulls_first
        order as the window mirror — and group ids come from null-safe
        (and NaN-safe, matching Spark's groupBy NaN normalization)
        boundary comparisons on the ARROW side, so group keys never
        round-trip through pandas (no int64→float64 coercion above
        2^53). Only the selected value columns are materialized as
        pandas Series, exactly like the per-group path. Per-group
        order, NaN→NULL normalization and the skiplist expanding
        median are unchanged, so results are bit-identical
        (parity-pinned against the window-percentile mirror)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql import types as T

        suffix = self.suffix
        sort_keys = [(c, "ascending") for c in list(groups) + list(seq_cols)]
        float_groups = {
            f.name
            for f in df.schema
            if f.name in groups and isinstance(f.dataType, (T.FloatType, T.DoubleType))
        }

        def per_partition(batches):
            batches = [b for b in batches if b.num_rows]
            if not batches:
                return
            tbl = pa.Table.from_batches(batches)
            tbl = tbl.sort_by(sort_keys, null_placement="at_start")
            n = tbl.num_rows
            change = np.zeros(n, dtype=bool)
            for g in groups:
                col = tbl.column(g).combine_chunks()
                a, b = col.slice(1), col.slice(0, n - 1)
                eq = pc.fill_null(pc.equal(a, b), False)
                both_null = pc.and_(pc.is_null(a), pc.is_null(b))
                same = pc.or_(eq, both_null)
                if g in float_groups:
                    # Spark groups NaN keys together; Arrow NaN != NaN
                    both_nan = pc.and_(
                        pc.fill_null(pc.is_nan(a), False),
                        pc.fill_null(pc.is_nan(b), False),
                    )
                    same = pc.or_(same, both_nan)
                change[1:] |= np.invert(same.to_numpy(zero_copy_only=False))
            gids = np.cumsum(change)
            for c in cols:
                s = tbl.column(c).to_pandas()
                med = s.groupby(gids).expanding().median().to_numpy()
                # NaN (empty expanding window) → Arrow NULL, matching
                # the window-percentile path and the SQL oracles
                arr = pa.array(med, type=pa.float64(), mask=np.isnan(med))
                tbl = tbl.append_column(f"{c}_{suffix}", arr)
            yield from tbl.to_batches()

        return df.repartition(*groups).mapInArrow(per_partition, schema=out_schema)

    def _median_apply_in_pandas(self, df, groups, seq):
        """Exact expanding median via Arrow-batched applyInPandas
        (SURVEY.md §7 hard parts): the window ``percentile`` recomputes
        the frame per row (quadratic for long conversations); pandas
        expanding().median() streams it.

        Only (groups, sequence, selected columns) ride the Arrow
        round-trip — shipping the full row (e.g. the transcript `text`
        column) through Python would multiply the shuffle+serialize
        volume by the table width for no reason; the medians join back
        on (groups, sequence), which the engine already requires to be
        a unique, deterministic ordering key (SURVEY.md §7)."""
        from pyspark.sql import types as T

        cols, suffix = list(self.columns), self.suffix
        seq_cols = list(seq)
        key_cols = list(groups) + seq_cols
        narrow = df.select(*key_cols, *[c for c in cols if c not in key_cols])
        out_schema = T.StructType(
            [narrow.schema[c] for c in key_cols]
            + [T.StructField(f"{c}_{suffix}", T.DoubleType()) for c in cols]
        )

        def per_group(pdf):
            # na_position="first" mirrors Spark's asc_nulls_first window
            # ordering, so NULL sequence keys see the same expanding
            # history on both median paths
            pdf = pdf.sort_values(seq_cols, na_position="first")
            res = pdf[key_cols].copy()
            for c in cols:
                res[f"{c}_{suffix}"] = pdf[c].expanding().median()
            return res

        if groups:
            # partition-batched path: one Python call per partition
            # (see _median_batched); NaN→NULL happens via the Arrow
            # validity mask inside the helper
            batched_schema = T.StructType(
                list(narrow.schema)
                + [T.StructField(f"{c}_{suffix}", T.DoubleType()) for c in cols]
            )
            meds = self._median_batched(
                narrow, groups, seq_cols, cols, batched_schema
            ).select(*key_cols, *[f"{c}_{suffix}" for c in cols])
        else:
            # a global (ungrouped) expanding median is a single group —
            # per-group dispatch overhead is irrelevant, keep applyInPandas
            meds = narrow.groupBy(*groups).applyInPandas(
                per_group, schema=out_schema
            )
            # pandas emits NaN (not NULL) when the expanding window holds
            # no non-null values; the window-percentile path and SQL
            # oracles emit NULL — normalize so both paths are
            # value-identical.
            fixed = [
                F.when(
                    ~F.isnan(F.col(f"{c}_{suffix}")), F.col(f"{c}_{suffix}")
                ).alias(f"{c}_{suffix}")
                for c in cols
            ]
            meds = meds.select(*key_cols, *fixed)
        # Null-safe join-back: Spark's groupBy/applyInPandas treats NULL
        # group/sequence keys as their own group, so the Arrow path
        # computes their medians too — a plain equi-join (NULL != NULL)
        # would silently drop those rows, diverging from the
        # window-percentile mirror which keeps them. (groups, sequence)
        # is the engine's required-unique ordering key, so the inner
        # null-safe join is exactly row-preserving.
        cond = None
        for kc in key_cols:
            eq = df[kc].eqNullSafe(meds[kc])
            cond = eq if cond is None else cond & eq
        return df.join(meds, cond, "inner").select(
            *[df[c] for c in df.columns],
            *[meds[f"{c}_{suffix}"] for c in cols],
        )

    def _median_ship_full(self, df, groups, seq) -> bool:
        """Ship-strategy policy for the Arrow median.

        ``full`` ships whole rows once through applyInArrow and appends
        the medians in place — ONE shuffle, no join-back (measured ~2×
        on the bench events table). ``narrow`` ships only (groups,
        sequence, selected cols) and joins the medians back — two extra
        exchanges, but the right trade when the row carries wide
        variable-width payloads (a transcript ``text`` column would
        multiply the Arrow+shuffle volume for no reason). ``auto``
        picks ``full`` iff every passthrough column is a fixed-width
        primitive (numeric/bool/timestamp/date) — variable-width
        passthrough (string/binary/array/map/struct) routes narrow."""
        if self.median_ship != "auto":
            return self.median_ship == "full"
        from pyspark.sql import types as T

        fixed = (
            T.NumericType, T.BooleanType, T.TimestampType,
            T.TimestampNTZType, T.DateType,
        )
        shipped = set(groups) | set(seq) | set(self.columns)
        return all(
            isinstance(f.dataType, fixed)
            for f in df.schema
            if f.name not in shipped
        )

    def _median_apply_in_arrow(self, df, groups, seq):
        """Full-row expanding median: one applyInArrow pass appends the
        median columns to the rows in place — no join-back stage.

        applyInArrow (not applyInPandas) on purpose: passthrough
        columns stay zero-copy Arrow and never round-trip through
        pandas, which would coerce nullable int64 to float64 and
        corrupt values above 2^53. Only the selected value columns are
        materialized as pandas Series (for the O(n log n) skiplist
        expanding median); the sort mirrors the window path's
        asc_nulls_first ordering."""
        import numpy as np
        import pyarrow as pa
        from pyspark.sql import types as T

        cols, suffix = list(self.columns), self.suffix
        seq_cols = list(seq)
        out_schema = T.StructType(
            list(df.schema)
            + [T.StructField(f"{c}_{suffix}", T.DoubleType()) for c in cols]
        )

        if groups:
            # partition-batched path: one Python call per partition
            # instead of one per group (see _median_batched)
            return self._median_batched(df, groups, seq_cols, cols, out_schema)

        def per_group(tbl: "pa.Table") -> "pa.Table":
            tbl = tbl.sort_by(
                [(c, "ascending") for c in seq_cols], null_placement="at_start"
            )
            for c in cols:
                med = tbl[c].to_pandas().expanding().median().to_numpy()
                # NaN (empty expanding window) → Arrow NULL, matching
                # the window-percentile path and the SQL oracles
                arr = pa.array(med, type=pa.float64(), mask=np.isnan(med))
                tbl = tbl.append_column(f"{c}_{suffix}", arr)
            return tbl

        return df.groupBy(*groups).applyInArrow(per_group, schema=out_schema)
