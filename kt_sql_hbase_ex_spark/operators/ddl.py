"""DDL / catalog lifecycle — CREATE TABLE, CTAS, DROP, catalog listing.

Reference analog: the reference's second half is DDL against HBase —
``createTable`` validates the schema, writes ``table.sys``/``column.sys``
catalog rows, creates the storage table and registers it live
(``hbase/HBaseSchema.kt:101-178``); ``dropTable`` tears all of it down
(``hbase/HBaseSchema.kt:187-217``); table listing enumerates the
namespace minus system tables (``hbase/HBaseSchema.kt:293-312``).

Spark-first: DDL goes through the session catalog — ``saveAsTable`` /
``spark.sql("CREATE TABLE ...")`` writes Parquet under the warehouse dir
and registers metadata; ``DROP TABLE`` removes both. The reference's
index DDL (``createIndex``/``dropIndex``, ``hbase/HBaseSchema.kt:226-288``)
is intentionally dropped: Parquet min/max stats + partition pruning
replace user-managed secondary indexes (SURVEY.md §2.4).

Scale notes: CTAS is a distributed write (one task per partition, no
driver data path); the managed-table roundtrip below is byte-for-byte
the pattern that writes a 100 TB table — only the partition count
differs. DDL itself is metadata-only and O(1) in data size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table

#: CTAS result table name (namespaced to avoid user collisions, like the
#: reference's system-table prefix convention ``hbase/HBaseUtils.kt:8-9``)
CTAS_TABLE = "ktsql_ddl01_region_summary"


def _reset_table(spark: SparkSession, tbl: str) -> None:
    """DROP IF EXISTS plus orphan-location cleanup: a managed table whose
    files survive a crashed session blocks re-creation (the reference had
    the same failure mode — its DDL lock attribute existed to fence
    half-done DDL, ``hbase/HBaseTable.kt:187-190``)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = os.path.join(warehouse.removeprefix("file:"), tbl)
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)


@query(
    "ddl01_ctas_roundtrip",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def ddl01_ctas_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE AS SELECT, then read the *stored* table back through
    the catalog (reference: createTable + registered live table map,
    ``hbase/HBaseSchema.kt:101-178``). The result returned to the driver
    is the post-write catalog read, so the oracle checks the full
    write→catalog→scan roundtrip, not just the SELECT."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    summary = (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count("*").alias("n_nations"))
    )
    _reset_table(spark, CTAS_TABLE)
    summary.write.mode("overwrite").saveAsTable(CTAS_TABLE)
    return spark.table(CTAS_TABLE)


@query(
    "ddl02_catalog_lifecycle",
    oracle="""
    SELECT * FROM (VALUES
        ('create', 'ktsql_ddl02_tmp', TRUE),
        ('exists', 'ktsql_ddl02_tmp', TRUE),
        ('columns', 'ktsql_ddl02_tmp', TRUE),
        ('drop',   'ktsql_ddl02_tmp', FALSE)
    ) AS t(op, tbl, present)
    """,
)
def ddl02_catalog_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create → verify existence and column metadata → drop → verify
    gone, reported as a deterministic op log (the reference's create/
    drop/list cycle, ``hbase/HBaseSchema.kt:101-217,293-312``). Uses a
    real managed table so DROP also removes storage."""
    tbl = "ktsql_ddl02_tmp"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} (k BIGINT NOT NULL, v STRING, price DECIMAL(10,2)) USING parquet"
    )
    created = spark.catalog.tableExists(tbl)
    cols = [c.name for c in spark.catalog.listColumns(tbl)]
    cols_ok = cols == ["k", "v", "price"]
    spark.sql(f"DROP TABLE {tbl}")
    dropped_present = spark.catalog.tableExists(tbl)
    return spark.createDataFrame(
        [
            ("create", tbl, True),
            ("exists", tbl, created),
            ("columns", tbl, cols_ok),
            ("drop", tbl, dropped_present),
        ],
        "op string, tbl string, present boolean",
    )


@query(
    "ddl03_insert_into_table",
    oracle="""
    SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region
    UNION ALL SELECT 99, 'ATLANTIS'
    """,
)
def ddl03_insert_into_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT INTO a managed table (reference: S9 insert sink,
    ``hbase/HBaseModifiableTable.kt:123-130,171-195`` — PK row + cells
    put). Spark-side: CTAS from the fixture then an ``INSERT INTO``
    appends a file; the read-back shows both. Append is the one
    mutation that stays cheap at 100 TB (no rewrite, no shuffle)."""
    tbl = "ktsql_ddl03_region_copy"
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("bigint"), "r_name"
    )
    _reset_table(spark, tbl)
    r.write.mode("overwrite").saveAsTable(tbl)
    spark.sql(f"INSERT INTO {tbl} VALUES (99, 'ATLANTIS')")
    return spark.table(tbl)


@query(
    "ddl04_surrogate_keys",
    oracle="""
    SELECT o_orderkey,
           md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR))
               AS stable_uid,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS seq_id
    FROM orders WHERE o_orderkey <= 100
    """,
)
def ddl04_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key generation — the reference auto-generates a UUID
    rowkey for tables without a natural PK (``hbase/HBaseUtils.kt:22-24``).
    The engine's analogs, both *deterministic*: a content-stable uid
    (hash of the natural key — same row ⇒ same id on every run, engine,
    and layout, which is what makes backfills and joins reproducible)
    and a dense sequence via ROW_NUMBER over an explicit order. The
    tempting scale shortcuts — ``uuid()`` and
    ``monotonically_increasing_id()`` — are layout-dependent /
    nondeterministic, so they can never be oracle-checked or safely
    re-run; ROW_NUMBER's total order serializes at 100 TB, where the
    fix is zipWithIndex-style per-partition offsets or just the
    content hash."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    from pyspark.sql import Window as W

    return o.select(
        "o_orderkey",
        F.md5(
            F.concat_ws(":", F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"))
        ).alias("stable_uid"),
        F.row_number().over(W.orderBy("o_orderkey")).cast("bigint").alias("seq_id"),
    )


@query(
    "ddl05_analyze_stats",
    oracle="""
    SELECT 'ktsql_ddl05_part_stats' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM part
    """,
)
def ddl05_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE COMPUTE STATISTICS — the stats leg of the
    reference's CREATE-INDEX replacement (cache = opt04, bucketing =
    opt02, layout = opt03/opt06, stats = here). Collected rowCount/size
    feed Catalyst's cost-based join reordering and broadcast decisions —
    at 100 TB, stats are what let the planner pick broadcast vs
    sort-merge *without* the explicit hints the fixture queries carry.
    The checked result reads the recorded rowCount back from the catalog
    (``DESCRIBE EXTENDED``'s Statistics row) and must equal the oracle's
    COUNT(*)."""
    tbl = "ktsql_ddl05_part_stats"
    _reset_table(spark, tbl)
    load_table(spark, sf_dir, "part").write.mode("overwrite").saveAsTable(tbl)
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    desc = spark.sql(f"DESCRIBE EXTENDED {tbl}")
    return desc.filter(F.col("col_name") == "Statistics").select(
        F.lit(tbl).alias("table_name"),
        F.regexp_extract("data_type", r"(\d+) rows", 1).cast("bigint").alias("n_rows"),
    )


@query(
    "ddl06_default_columns",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'NEW',     CAST(0.0  AS DOUBLE), 'alpha'),
        (CAST(2 AS BIGINT), 'NEW',     CAST(0.0  AS DOUBLE), 'beta'),
        (CAST(3 AS BIGINT), 'SHIPPED', CAST(9.75 AS DOUBLE), 'gamma')
    ) AS t(k, status, score, label)
    """,
)
def ddl06_default_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column DEFAULT values — the reference persists a per-column
    ``DEFAULT`` attribute and wires Calcite's
    ``InitializerExpressionFactory`` / ``ColumnStrategy.DEFAULT`` so
    inserts that omit the column get the stored default
    (``hbase/HBaseSchema.kt:143-162``, ``hbase/HBaseTable.kt:221-229``).
    Spark-first: ``DEFAULT`` is first-class DDL (3.4+) — declared at
    CREATE, recorded in StructField metadata, applied by the engine at
    INSERT time for both omitted columns and explicit ``DEFAULT``
    keywords. The read-back checks engine-filled and explicit values
    side by side; creation goes through the validated
    :func:`create_table` wrapper (mandatory PK + reserved ``id``)."""
    from kt_sql_hbase_ex_spark.sources.catalog import create_table

    tbl = "ktsql_ddl06_defaults"
    _reset_table(spark, tbl)
    create_table(
        spark,
        tbl,
        [
            ("k", "BIGINT", None),
            ("status", "STRING", "'NEW'"),
            ("score", "DOUBLE", "0.0"),
            ("label", "STRING", None),
        ],
        primary_key=("k",),
        comment="ddl06 default-column demo",
    )
    # omitted columns -> engine fills stored defaults
    spark.sql(f"INSERT INTO {tbl} (k, label) VALUES (1, 'alpha')")
    # explicit DEFAULT keyword
    spark.sql(f"INSERT INTO {tbl} VALUES (2, DEFAULT, DEFAULT, 'beta')")
    # explicit values override the default
    spark.sql(f"INSERT INTO {tbl} VALUES (3, 'SHIPPED', 9.75, 'gamma')")
    return spark.table(tbl)


@query(
    "ddl07_alter_add_column",
    oracle="""
    SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name,
           'unassigned' AS steward,
           CASE WHEN r_regionkey = 99 THEN 'poseidon' END AS steward2
    FROM (
        SELECT r_regionkey, r_name FROM region
        UNION ALL SELECT 99, 'ATLANTIS'
    )
    """,
)
def ddl07_alter_add_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the CATALOG — ``ALTER TABLE ADD
    COLUMNS`` on a managed table (the DDL counterpart of opt10's
    scan-level mergeSchema): adding a column is metadata-only, history
    is never rewritten, and rows written before the change read the
    column's DEFAULT (Spark's exists-default mechanism stamps the
    backfill value into the column metadata at ALTER time) while a NULL
    fills where no default was declared. The sequence: create+load →
    ALTER ADD steward DEFAULT 'unassigned' (pre-ALTER rows read the
    default) → ALTER ADD steward2 (no default: pre-existing rows read
    NULL) → one post-ALTER insert supplying steward2. At 100 TB this is
    the only sane way to add a column: O(1) catalog write, zero data
    IO, old files null-fill/default-fill at read."""
    tbl = "ktsql_ddl07_region_evolved"
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("bigint"), "r_name"
    )
    _reset_table(spark, tbl)
    r.write.mode("overwrite").saveAsTable(tbl)
    spark.sql(
        f"ALTER TABLE {tbl} ADD COLUMNS (steward STRING DEFAULT 'unassigned')"
    )
    spark.sql(f"ALTER TABLE {tbl} ADD COLUMNS (steward2 STRING)")
    spark.sql(
        f"INSERT INTO {tbl} VALUES (99, 'ATLANTIS', DEFAULT, 'poseidon')"
    )
    return spark.table(tbl)
