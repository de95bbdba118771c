"""Order-independent cross-engine money aggregation.

Why this exists: a double SUM over n rows accumulates ~n·ε·|max|
reordering error — at sf0.1 magnitudes (1e7-1e10 sums over 600k rows)
that is 1e-4..1e-1 absolute, larger than the half-cent boundary a
2-decimal ROUND snaps to, so Spark and the DuckDB oracle can round the
same quantity to different cents (observed: c18 at sf0.1, one cell off
by exactly 0.01). At 100 TB the error is proportionally worse, and the
same reordering nondeterminism appears between *runs* of the same
engine.

Fix: sum money exactly. Per-row values cast to DECIMAL(18,6) — every
fixture money expression is a product of at-most-three 2dp factors, so
its true value has <= 6 decimal places and sits ~1e-9 from the double,
far from any 1e-6 rounding boundary: the cast recovers the exact
decimal identically in both engines (at 4dp this FAILED — 6dp products
land exactly on 4dp ties, where Java BigDecimal and DuckDB's
scaled-multiply conversion disagree; observed on a01 sum_charge). The
decimal SUM is exact and order-independent; the cents ROUND happens in
*decimal* space, where both engines round ties half-away-from-zero
(verified: 1.005 -> 1.01, -1.005 -> -1.01 in both); only the final
already-2dp value is cast to DOUBLE, which is exact.

Spark-side and SQL-side builders live together so each query's plan and
oracle are generated from the same recipe (the dedup.py constants
pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: per-row cast scale: 6 decimals holds every fixture money expression
#: (2dp prices, and products with 2dp discount/tax factors) exactly and
#: unambiguously; 18 digits of precision bounds the per-row magnitude,
#: the SUM widens automatically.
_ROW_DECIMAL = "decimal(18,6)"
_ROW_DECIMAL_SQL = "DECIMAL(18,6)"


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact money SUM, emitted as a 2dp double (schema-compatible with
    the plain ``F.round(F.sum(...), 2)`` it replaces). The ROUND runs on
    the exact decimal (tie rule identical cross-engine); the final
    double cast of a 2dp value is exact."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_ROW_DECIMAL)), scale).cast("double")


def exact_sum_dec(col: Column | str) -> Column:
    """Exact money SUM kept as DECIMAL — for *comparisons* (thresholds,
    max-equality) where the value participates in a predicate and the
    compare itself must be exact."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_ROW_DECIMAL))


def exact_sum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of :func:`exact_sum`."""
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS {_ROW_DECIMAL_SQL})), {scale}) AS DOUBLE)"
    )


def exact_sum_dec_sql(expr: str) -> str:
    """DuckDB mirror of :func:`exact_sum_dec`."""
    return f"SUM(CAST({expr} AS {_ROW_DECIMAL_SQL}))"
