"""Order-independent (deterministic) floating aggregates.

Double-precision sums depend on partial-aggregation order, so a plain
``avg`` can differ in the last ulps between two runs of the same job at
different parallelism — which breaks (a) the north rule's bit-identical
results at N vs 4N executors and (b) cross-engine value-hash parity
with the DuckDB oracles.

Fix: accumulate in DECIMAL(38,18). Decimal addition is exact and
associative → the sum is identical for ANY partitioning; the final
divide happens in double on identical operands, so the result is
bit-identical everywhere. Doubles of magnitude ≥ ~1e-2 convert to
scale-18 decimal exactly (ulp > 1e-18), and 38 digits leave room for
~1e19-magnitude sums — fine for 10^12 rows of feature-scale values.

Used for MEAN accumulators, mean-imputation, and fitted scaler stats.
VAR keeps Spark's ``var_samp`` (Welford-style, numerically robust);
its residual run-to-run wobble is ~1e-9 relative and handled by
coarser rounding at the comparison layer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DEC = "decimal(38,18)"


def det_sum(col) -> "F.Column":
    return F.sum(col.cast(DEC))


def det_mean(col, frame=None) -> "F.Column":
    """Exact-sum mean; null when no non-null values (guarded division)."""
    s = det_sum(col)
    n = F.count(col)
    if frame is not None:
        s, n = s.over(frame), n.over(frame)
    return F.when(n > 0, s.cast("double") / n)


def det_stddev_pop(col) -> "F.Column":
    """Deterministic population std via exact decimal sums of x and x².

    The squares are formed in double (deterministic per element) then
    accumulated exactly. Subject to cancellation for near-constant
    columns at extreme magnitude — clamped at 0."""
    sq = (col.cast("double") * col.cast("double")).cast(DEC)
    s = det_sum(col).cast("double")
    ssq = F.sum(sq).cast("double")
    n = F.count(col).cast("double")
    var = (ssq - s * s / n) / n
    return F.when(n > 0, F.sqrt(F.greatest(var, F.lit(0.0))))


def det_var_samp(col, frame=None) -> "F.Column":
    """Deterministic sample variance via exact decimal sums of x and x²
    — (Σx² − (Σx)²/n)/(n−1) evaluated in double on exact operands.
    Order-independent; subject to cancellation only for near-constant
    columns at extreme magnitude (clamped at 0). Null when n < 2,
    matching pandas expanding().var()."""
    sq = (col.cast("double") * col.cast("double")).cast(DEC)
    s = det_sum(col)
    ssq = F.sum(sq)
    n = F.count(col)
    if frame is not None:
        s, ssq, n = s.over(frame), ssq.over(frame), n.over(frame)
    sd = s.cast("double")
    ssqd = ssq.cast("double")
    nd = n.cast("double")
    var = (ssqd - sd * sd / nd) / (nd - F.lit(1.0))
    return F.when(n > 1, F.greatest(var, F.lit(0.0)))


# SQL mirrors (DuckDB) — same expression tree so doubles match bit-wise.
#
# DuckDB converts double→decimal by binary multiplication, while Spark
# goes through the shortest decimal representation (BigDecimal.valueOf).
# Routing the DuckDB cast through VARCHAR forces the shortest-repr path
# (both engines print round-trip-shortest doubles), making the decimal
# operands — and therefore the exact sums — identical.


def _dec(col: str) -> str:
    return f"CAST(CAST({col} AS VARCHAR) AS DECIMAL(38,18))"


def _dec2dbl(expr: str) -> str:
    # DuckDB's direct decimal→double is not correctly rounded either;
    # decimal→varchar is exact and varchar→double is correctly rounded,
    # matching Spark's BigDecimal.doubleValue().
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_det_mean(col: str, over: str) -> str:
    return (
        f"CASE WHEN count({col}) {over} > 0 THEN "
        f"{_dec2dbl(f'sum({_dec(col)}) {over}')} "
        f"/ count({col}) {over} END"
    )


def sql_det_var_samp(col: str, over: str) -> str:
    s = _dec2dbl(f"sum({_dec(col)}) {over}")
    ssq = _dec2dbl(f"sum({_dec(f'{col} * {col}')}) {over}")
    n = f"count({col}) {over}"
    nd = f"CAST({n} AS DOUBLE)"
    return (
        f"CASE WHEN {n} > 1 THEN "
        f"greatest(({ssq} - {s} * {s} / {nd}) / ({nd} - 1.0), 0.0) END"
    )


def sql_det_stddev_pop(col: str, over: str) -> str:
    s = _dec2dbl(f"sum({_dec(col)}) {over}")
    ssq = _dec2dbl(f"sum({_dec(f'{col} * {col}')}) {over}")
    n = f"CAST(count({col}) {over} AS DOUBLE)"
    return (
        f"CASE WHEN {n} > 0 THEN "
        f"sqrt(greatest(({ssq} - {s} * {s} / {n}) / {n}, 0.0)) END"
    )
