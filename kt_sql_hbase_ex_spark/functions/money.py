"""Order-independent cross-engine money aggregation.

Why this exists: a double SUM over n rows accumulates ~n·ε·|max|
reordering error — at sf0.1 magnitudes (1e7-1e10 sums over 600k rows)
that is 1e-4..1e-1 absolute, larger than the half-cent boundary a
2-decimal ROUND snaps to, so Spark and the DuckDB oracle can round the
same quantity to different cents (observed: c18 at sf0.1, one cell off
by exactly 0.01). At 100 TB the error is proportionally worse, and the
same reordering nondeterminism appears between *runs* of the same
engine.

Fix: sum money exactly, in fixed point. Every fixture money expression
is a product of at-most-three 2dp factors, so its true value has <= 6
decimal places and the double computed for it sits ~1e-9 away —
``ROUND(expr * 1e6)`` therefore recovers the exact micro-unit integer,
identically in both engines (they evaluate the same IEEE double product
bit-for-bit). The LONG sum of micro-units is exact and
order-independent, and it is ~3x faster than a DECIMAL(18,6) sum: the
aggregation buffer stays a packed 64-bit long inside whole-stage
codegen instead of a BigDecimal object per add (measured 0.5s vs 1.4s
for the a01 triple-sum at sf0.1).

The micros → cents rounding never touches floating point while the
value is still micro-scale: the per-group (not per-row) post-aggregate
projection widens the long sum to DECIMAL, divides exactly, and rounds
half-away-from-zero in decimal space (Spark) / runs sign-split integer
division on the HUGEINT sum (DuckDB) — both exact integer arithmetic
wherever the sum itself is. A double-space ``ROUND(s / 1e4)`` here
would silently degrade past 2^53 µ ≈ $9.0e9 per group, because
float(long) is lossy three orders of magnitude before the long
overflows. Only the final already-rounded cents integer is emitted
through a double divide (exact below 2^53 cents ≈ $9.0e13; the nearest
double either way).

Magnitude bound: the 64-bit micro-unit sum is exact up to 2^63 µ ≈
$9.2e12 **per group**. That covers any per-group revenue a real catalog
produces; for planet-scale *unfiltered* totals beyond it,
:func:`exact_sum_wide` keeps the micro-unit integers but sums them
through DECIMAL(38,0) (Spark's int128) at the BigDecimal-buffer cost —
property-tested equal to the narrow variant on the fixtures. Overflow
is not silent either way: ``session.py`` pins
``spark.sql.ansi.enabled=true`` (also Spark 4's default), so a long
overflow raises instead of wrapping.

Spark-side and SQL-side builders live together so each query's plan and
oracle are generated from the same recipe (the dedup.py constants
pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: micro-units per currency unit: 6 decimals holds every fixture money
#: expression (2dp prices, and products with 2dp discount/tax factors)
#: exactly and unambiguously.
_UNIT = 1_000_000


def _micros(col: Column | str) -> Column:
    """Per-row micro-unit integerization — the hot path, kept in pure
    double arithmetic. ``F.round`` on a double compiles to a per-row
    ``java.math.BigDecimal.setScale`` in Spark's codegen (allocation +
    GC pressure measured at ~2x the whole aggregate's cost on a01);
    since the scaled value provably sits within ~1e-9 of its integer
    (<= 3 factors of 2dp each — see module doc), sign-aware
    add-half-then-truncate recovers the SAME integer as ROUND in both
    engines (no value can sit near a .5 boundary), with no per-row
    object allocation."""
    c = F.col(col) if isinstance(col, str) else col
    scaled = c * _UNIT
    half = F.when(scaled >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    # CAST(double AS bigint) truncates toward zero in Spark: exact
    # round-half-away-from-zero given the 1e-9 integer-proximity bound
    return (scaled + half).cast("bigint")


def _emit(s: Column, scale: int) -> Column:
    """Exact micros-sum → rounded value, as a double. Post-aggregate
    (per GROUP, so the decimal math here costs nothing): widen to
    DECIMAL(38,0), divide by 10^(6-scale) exactly in decimal space,
    ROUND(…, 0) half-away-from-zero (Spark decimal HALF_UP), emit the
    small integer through one exact double divide."""
    q = 10 ** (6 - scale)
    cents = F.round(s.cast("decimal(38,0)") / F.lit(q), 0)
    return (cents / F.lit(10**scale)).cast("double")


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact money SUM, emitted as a 2dp double (schema-compatible with
    the plain ``F.round(F.sum(...), 2)`` it replaces). Fixed point end
    to end: long micro-unit sum, decimal-integer cents rounding, one
    exact double emit."""
    return _emit(F.sum(_micros(col)), scale)


def exact_sum_wide(col: Column | str, scale: int = 2) -> Column:
    """The beyond-$9.2e12-per-group variant: identical micro-unit fixed
    point, summed through DECIMAL(38,0) (int128) with the same
    decimal-integer cents rounding. Drop-in for :func:`exact_sum` when
    a group's total can exceed the long bound."""
    return _emit(F.sum(_micros(col).cast("decimal(38,0)")), scale)


def exact_sum_dec(col: Column | str) -> Column:
    """Exact money SUM kept as DECIMAL — for *comparisons* (thresholds,
    max-equality) where the value participates in a predicate and the
    compare itself must be exact."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,6)"))


def exact_sum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of :func:`exact_sum`: the BIGINT sum is HUGEINT
    (int128) in DuckDB, the cents rounding is sign-split integer
    division (``//`` truncates toward zero on the positive magnitude),
    so one SQL form mirrors both Spark variants exactly."""
    q = 10 ** (6 - scale)
    half = q // 2
    s = f"SUM(CAST(ROUND(({expr}) * {_UNIT}) AS BIGINT))"
    return (
        f"CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END)"
        f" * ((ABS({s}) + {half}) // {q}) / {10**scale}.0 AS DOUBLE)"
    )


def exact_sum_dec_sql(expr: str) -> str:
    """DuckDB mirror of :func:`exact_sum_dec`."""
    return f"SUM(CAST({expr} AS DECIMAL(18,6)))"
