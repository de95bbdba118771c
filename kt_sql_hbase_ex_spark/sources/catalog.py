"""Catalog: table registry + schema metadata.

Reference analog: the reference persists its catalog in two HBase system
tables — ``table.sys`` (rowkey = table name, attributes per
``SystemAttribute``; ``hbase/HBaseTable.kt:209-219``,
``hbase/HBaseSchema.kt:119-139``) and ``column.sys`` (rowkey =
``{table}.{column}``, attributes per ``ColumnAttribute`` incl. DATA_TYPE /
NULLABLE / POSITION; ``hbase/HBaseTable.kt:221-229``,
``hbase/HBaseSchema.kt:143-162``) — and rebuilds Calcite row types from
them at table open (``hbase/HBaseTable.kt:101-118,135-165``).

Spark-first: the session catalog already *is* that system — temp views /
catalog tables carry a ``StructType`` with name, type, nullability and
position. ``describe_table``/``describe_columns`` expose the same
attribute surface the reference's catalog did, sourced from Spark.

Scale note: table paths are directories of Parquet files; on a cluster a
"table" here is thousands of files and the registration below is
metadata-only (no data read happens until an action).

Type-mapping note (SURVEY §1.3): the reference's SQL ``TIME`` type has
no Spark analog — this engine's declared model is **IntegerType
milliseconds-since-midnight** (matching Calcite's TIME physical
representation): store as INT, render with
``date_format(timestamp_millis(t), 'HH:mm:ss')``, compare numerically.
The convention is exercised end-to-end by ``f17_time_type``
(``functions/scalar.py``): INT encode, numeric business-hours range
predicate, HH:mm:ss rendering at the output edge, DuckDB TIME oracle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All fixture tables (TESTDATA.md). Order is the registration order.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables small enough (dimension-shaped) to broadcast in joins even at
#: 100 TB total scale — region/nation are bounded by geography; supplier
#: and part grow sub-linearly in TPC-H-style schemas. customer/orders/
#: lineitem/events/documents/embeddings are fact-sized: never broadcast.
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})

#: Primary key by convention (reference: mandatory PK concatenated into
#: the HBase rowkey, ``hbase/HBaseSchema.kt:127-136``). Used by the
#: DML-as-transform operators for merge/delete semantics.
#: NOTE: in the synthetic fixtures every key below is verified unique
#: EXCEPT lineitem's (l_orderkey, l_linenumber) — the generator reuses
#: line numbers, so keyed DML demos use orders instead.
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def events_ts_is_nanos(sf_dir: str) -> bool:
    """True if the events fixture uses the legacy TIMESTAMP(NANOS)/int64
    physical layout (older driver generations); False for the native
    ``timestamp[us]`` layout. Footer-only read — no data is scanned."""
    import pyarrow.parquet as pq

    t = pq.read_schema(table_path(sf_dir, "events")).field("ts").type
    return getattr(t, "unit", None) == "ns" or str(t) == "int64"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One SQL table = one Parquet dataset (reference: one SQL table = one
    HBase table with a single column family, ``hbase/HBaseTable.kt:62-65``).

    ``events.ts`` has shipped in two physical layouts across fixture
    generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    reader rejects without the ``nanosAsLong`` legacy conf + an explicit
    nanos→timestamp conversion — and native ``timestamp[us]``. Both are
    normalized to session-zone TimestampType (UTC session, so values are
    identical either way).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        if events_ts_is_nanos(sf_dir):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(table_path(sf_dir, name))
            # integer division: double division would round large ns values
            # (2^52 mantissa < 1.7e18) and drift the microsecond by ±1
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(table_path(sf_dir, name))


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least the session's core budget of partitions before a
    CPU-heavy narrow transform (shingling, hashing, vector math).

    The fixture tables are single Parquet files → one input split, which
    serializes every downstream per-row computation on one core. On the
    100 TB target the scan has thousands of splits and this is a no-op —
    the repartition only fires when the input is narrower than the core
    budget, so it never adds a shuffle at scale.
    """
    from kt_sql_hbase_ex_spark.session import default_parallelism

    n = min_partitions or default_parallelism()
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view so both the DataFrame
    and ``spark.sql`` surfaces see the same catalog (reference:
    ``HBaseSchema`` eagerly builds the name->Table map at connect,
    ``hbase/HBaseSchema.kt:57-61,293-312``)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


@dataclass(frozen=True)
class ColumnInfo:
    """``column.sys`` attribute row analog (``hbase/HBaseTable.kt:221-229``):
    DATA_TYPE, NULLABLE, POSITION surface here; DEFAULT comes from the
    StructField metadata Spark records for ``DEFAULT`` columns;
    MAX_LENGTH (char/varchar) and PRECISION/SCALE (decimal) parse from
    the declared Spark type; COMMENT comes from the StructField
    ``comment`` metadata ``CREATE TABLE … COMMENT`` records — the
    reference stored all of these as explicit ``column.sys``
    attributes."""

    table: str
    name: str
    data_type: str
    nullable: bool
    position: int
    default: str | None = None
    max_length: int | None = None
    precision: int | None = None
    scale: int | None = None
    comment: str | None = None


def _length_precision(field) -> tuple[int | None, int | None, int | None]:
    """(max_length, precision, scale) for one StructField. Spark erases
    char/varchar to string in the schema and keeps the declared type in
    field metadata (``__CHAR_VARCHAR_TYPE_STRING``), so look there
    first; decimal carries precision/scale on the type object."""
    import re

    from pyspark.sql.types import DecimalType

    if isinstance(field.dataType, DecimalType):
        return None, field.dataType.precision, field.dataType.scale
    declared = (
        field.metadata.get("__CHAR_VARCHAR_TYPE_STRING")
        if field.metadata
        else None
    ) or field.dataType.simpleString()
    m = re.fullmatch(r"(?:char|varchar)\((\d+)\)", declared)
    if m:
        return int(m.group(1)), None, None
    return None, None, None


def describe_columns(spark: SparkSession, name: str) -> list[ColumnInfo]:
    """Column metadata in declaration order — the ``getRowType`` contract
    (``hbase/HBaseTable.kt:101-118``): build the struct type from catalog
    attributes, ordered by POSITION."""
    schema = spark.table(name).schema
    out = []
    for i, f in enumerate(schema.fields):
        max_len, prec, scale = _length_precision(f)
        out.append(
            ColumnInfo(
                name,
                f.name,
                f.dataType.simpleString(),
                f.nullable,
                i,
                f.metadata.get("CURRENT_DEFAULT"),
                max_len,
                prec,
                scale,
                (f.metadata or {}).get("comment"),
            )
        )
    return out


class PrimaryKeyMissedError(ValueError):
    """No primary key supplied to ``create_table`` — the reference makes
    the PK mandatory (``PrimaryKeyMissedException``,
    ``hbase/HBaseSchema.kt:133-136``: the concatenated PK becomes the
    HBase rowkey, so a table without one cannot exist)."""


class IllegalColumnNameError(ValueError):
    """A column is named ``id`` (any case) — reserved by the reference
    (``IllegalColumnNameException``, ``hbase/HBaseSchema.kt:113-115``)
    for its auto-generated surrogate rowkey."""


#: TBLPROPERTIES namespace for the ``table.sys`` attribute analogs.
_PROP_PREFIX = "ktsql."


def validate_create_columns(
    columns, primary_key, partitioned_by=None
) -> list[tuple[str, str, str | None, str | None]]:
    """The reference's create-time rules (``HBaseSchema.kt:113-136``) as
    a side-effect-free check, returning the normalized 4-tuples.
    Callers with destructive pre-steps (the engine facade drops an
    existing table first) MUST validate before destroying — a rejected
    CREATE must leave the world untouched."""
    norm = [(c[0], c[1], c[2], c[3] if len(c) > 3 else None) for c in columns]
    for col, _, _, _ in norm:
        if col.lower() == "id":
            raise IllegalColumnNameError("column name should not be id")
    if not primary_key:
        raise PrimaryKeyMissedError("no primary key")
    declared = {c for c, _, _, _ in norm}
    missing = [k for k in primary_key if k not in declared]
    if missing:
        raise PrimaryKeyMissedError(f"primary key columns not in schema: {missing}")
    if partitioned_by:
        declared_lower = {c.lower() for c in declared}
        bad = [p for p in partitioned_by if p.lower() not in declared_lower]
        if bad:
            raise ValueError(f"partition columns not in schema: {bad}")
    return norm


def create_table(
    spark: SparkSession,
    name: str,
    columns: list[tuple[str, str, str | None]],
    primary_key: tuple[str, ...] | list[str] | None,
    *,
    comment: str = "",
    charset: str = "UTF-8",
    partitioned_by: tuple[str, ...] | list[str] | None = None,
) -> None:
    """Validated CREATE TABLE — the engine's analog of the reference's
    ``createTable`` (``hbase/HBaseSchema.kt:101-178``): reject the
    reserved ``id`` column name, require a primary key, persist the
    ``table.sys`` attributes (PRIMARY / CHARSET / COMMENT / CREATE_TIME)
    as TBLPROPERTIES, and declare per-column ``DEFAULT`` expressions
    (the ``ColumnStrategy.DEFAULT`` / ``InitializerExpressionFactory``
    wiring, ``hbase/HBaseSchema.kt:143-162``) so inserts that omit the
    column are filled by the engine.

    ``columns`` is ``[(name, sql_type, default_sql_literal | None)]``,
    optionally with a 4th per-column COMMENT element (the
    ``ColumnAttribute.COMMENT`` analog — surfaced back by
    :func:`describe_columns`, quote-escaped like the table comment).

    ``partitioned_by`` (Spark-native, no reference analog: HBase's
    physical layout is region-split by rowkey) declares Hive-style
    partition columns — each must be one of the declared columns. A
    partitioned target unlocks the engine's partition-pruned
    copy-on-write DML path: UPDATE/DELETE on it rewrite only the
    partitions containing matched rows.
    """
    part = tuple(partitioned_by) if partitioned_by else ()
    norm = validate_create_columns(columns, primary_key, part)

    import datetime

    def _qc(v: str) -> str:
        return str(v).replace("'", "''")

    col_ddl = ", ".join(
        f"{c} {t}"
        + (f" DEFAULT {d}" if d is not None else "")
        + (f" COMMENT '{_qc(cm)}'" if cm is not None else "")
        for c, t, d, cm in norm
    )
    props = {
        f"{_PROP_PREFIX}primary": ",".join(primary_key),
        f"{_PROP_PREFIX}charset": charset,
        f"{_PROP_PREFIX}comment": comment,
        f"{_PROP_PREFIX}create_time": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(),
    }
    def _q(v: str) -> str:
        # SQL-escape property values: a quote in a user comment must not
        # break (or inject into) the generated DDL
        return str(v).replace("'", "''")

    prop_ddl = ", ".join(f"'{_q(k)}'='{_q(v)}'" for k, v in props.items())
    part_ddl = f" PARTITIONED BY ({', '.join(part)})" if part else ""
    spark.sql(
        f"CREATE TABLE {name} ({col_ddl}) USING parquet{part_ddl} "
        f"TBLPROPERTIES ({prop_ddl})"
    )


def describe_table(spark: SparkSession, name: str) -> dict[str, object]:
    """``table.sys`` attribute row analog (``hbase/HBaseTable.kt:209-219``):
    PRIMARY, CHARSET, COMMENT, CREATE_TIME surface here — from
    TBLPROPERTIES for tables made by :func:`create_table`, from the
    fixture conventions otherwise. OLTP-only attributes
    (IS_TRANSACTIONAL, LOCK_STATUS) have no analytics analog and are
    reported as None."""
    try:
        props = {
            r["key"]: r["value"]
            for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
        }
    except Exception:  # temp views / path tables carry no properties
        props = {}
    primary = PRIMARY_KEYS.get(name)
    if f"{_PROP_PREFIX}primary" in props:
        primary = tuple(props[f"{_PROP_PREFIX}primary"].split(","))
    return {
        "name": name,
        "primary": primary,
        "n_columns": len(spark.table(name).columns),
        "charset": props.get(f"{_PROP_PREFIX}charset", "UTF-8"),
        "comment": props.get(f"{_PROP_PREFIX}comment", ""),
        "create_time": props.get(f"{_PROP_PREFIX}create_time"),
        "is_transactional": None,
        "lock_status": None,
        "broadcastable": name in BROADCAST_TABLES,
    }
