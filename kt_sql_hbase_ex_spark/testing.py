"""Oracle-parity harness: compare a registered query against its DuckDB oracle.

Mirrors the driver's correctness gate (``__spark_entry__.py`` contract):
row-count + column-name/schema + order-insensitive value comparison at a
given scale-factor directory. Used by tests and ad-hoc checks so
mismatches surface before the driver runs.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from kt_sql_hbase_ex_spark.sources.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm_value(v: object) -> object:
    """Normalize a cell for order-insensitive cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Round to 6 *decimal places* — an absolute tolerance that mirrors
        # the driver's gate bit-for-bit. Absolute tolerance means every
        # float-producing query/oracle pair must ROUND on both sides:
        # an unrounded 1e8-magnitude sum can differ across engines by more
        # than 1e-6 from summation reordering alone. _precision_risk()
        # enforces that convention.
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    try:  # Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:  # pragma: no cover
        pass
    return v


def _precision_risk(v: object) -> bool:
    """True when a cell would make the 6-decimal absolute compare flaky.

    A double of magnitude >= 1e4 whose fraction extends beyond 6 decimal
    places is an unrounded aggregate: cross-engine summation reordering
    perturbs it by ~|v|*1e-13..1e-10, which crosses the gate's 5e-7
    rounding boundary. Such values must be ROUNDed in BOTH the Spark
    query and the DuckDB oracle (the repo convention: 2dp for money,
    up to 6dp for ratios)."""
    if isinstance(v, float):
        return (
            not math.isnan(v)
            and not math.isinf(v)
            and abs(v) >= 1e4
            and v != round(v, 6)
        )
    if isinstance(v, (list, tuple)):
        return any(_precision_risk(x) for x in v)
    return False


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)
    precision_risks: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover
        status = "OK" if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        for m in self.precision_risks[:5]:
            msg += f"\n    PRECISION-RISK {m}"
        return msg


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> ParityResult:
    spark_cols = sorted(spark_df.columns)
    spark_rows = spark_df.collect()

    rel = con.execute(oracle_sql)
    oracle_cols_raw = [d[0] for d in rel.description]
    oracle_rows_raw = rel.fetchall()
    oracle_cols = sorted(oracle_cols_raw)

    mismatches: list[str] = []
    if spark_cols != oracle_cols:
        mismatches.append(f"columns differ: spark={spark_cols} oracle={oracle_cols}")

    def spark_key(row):
        return tuple(_norm_value(row[c]) for c in spark_cols)

    col_idx = {c: i for i, c in enumerate(oracle_cols_raw)}

    def oracle_key(row):
        return tuple(_norm_value(row[col_idx[c]]) for c in oracle_cols)

    precision_risks: list[str] = []
    for row in spark_rows:
        for c in spark_cols:
            if _precision_risk(row[c]):
                precision_risks.append(f"unrounded large float {c}={row[c]!r}")
        if len(precision_risks) >= 5:
            break

    s_vals = sorted((spark_key(r) for r in spark_rows), key=repr)
    o_vals = sorted((oracle_key(r) for r in oracle_rows_raw), key=repr)
    if len(s_vals) != len(o_vals):
        mismatches.append(f"row counts differ: {len(s_vals)} vs {len(o_vals)}")
    elif not mismatches:
        for i, (a, b) in enumerate(zip(s_vals, o_vals)):
            if a != b:
                mismatches.append(f"row {i}: spark={a!r} oracle={b!r}")
                if len(mismatches) >= 5:
                    break

    return ParityResult(
        name,
        not mismatches,
        len(spark_rows),
        len(oracle_rows_raw),
        mismatches,
        precision_risks,
    )


def check_query(
    name: str, spark: SparkSession, sf_dir: str, con: duckdb.DuckDBPyConnection | None = None
) -> ParityResult:
    from kt_sql_hbase_ex_spark import registry

    rq = registry.all_queries()[name]
    if rq.oracle is None:
        df = rq.fn(spark, sf_dir)
        n = df.count()
        return ParityResult(name, True, n, -1, [])
    own_con = con is None
    if own_con:
        con = duckdb_connect(sf_dir)
    try:
        return compare(name, rq.fn(spark, sf_dir), rq.oracle, con)
    finally:
        if own_con:
            con.close()
