"""Scans: full / filtered / projected — SURVEY.md §2.1 S1–S7, §2.2.

Reference behavior being re-expressed:

* S1 full scan — ``hbase/HBaseScannableTable.kt:25-27``: unfiltered HBase
  Scan, all columns.
* S2 filtered scan — ``hbase/HBaseFilterableTable.kt:28-45``: conjunctive
  ``=,<,<=,>,>=`` predicates pushed to region servers as a
  ``FilterList(MUST_PASS_ALL)`` built by ``translateMatch2``
  (``hbase/HBaseModifiableTable.kt:275-345``).
* S3 projected+filtered scan — ``hbase/HBaseProjectableFilterableTable.kt:15-41``:
  ``scan.addColumn`` per projected ordinal.
* S7 index point lookup — ``hbase/index/keyvalue/KVIndexTable.kt:63-80``:
  equality secondary-index access.
* PK/rowkey range — PK predicates became ``RowFilter`` rowkey compares
  (``hbase/HBaseModifiableTable.kt:337-339``).
* The reference *crashed* on ``OR/NOT/<>/LIKE/IN/IS NULL``
  (``hbase/HBaseModifiableTable.kt:282-283`` throws); Spark handles these
  natively — ``extended_predicates`` below demonstrates the superset.

Spark-first: every filter/projection here is declarative, so Catalyst
pushes it into the Parquet scan (``PushedFilters`` / ``ReadSchema`` in
the formatted plan — asserted in tests/test_plans.py). At 100 TB that
means row-group skipping on min/max stats and never deserializing
unprojected columns; the pushdown the reference hand-built is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "s01_full_scan",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def s01_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: unfiltered scan, all columns (HBaseScannableTable.kt:25-27)."""
    return load_table(spark, sf_dir, "customer")


@query(
    "s02_filtered_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_quantity < 10
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_discount <= 0.05
    """,
)
def s02_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: conjunctive `<,>=,<=` predicates pushed into the scan — the
    FilterList(MUST_PASS_ALL) analog (HBaseFilterableTable.kt:33-39)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 10)
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") <= 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


@query(
    "s03_projected_filtered_scan",
    oracle="""
    SELECT p_name, p_retailprice FROM part
    WHERE p_size = 10 AND p_retailprice > 950.0
    """,
)
def s03_projected_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: projection reaches the reader (scan.addColumn analog,
    HBaseProjectableFilterableTable.kt:28-33) — ReadSchema carries only
    the 3 referenced columns of part's 6."""
    part = load_table(spark, sf_dir, "part")
    return part.filter((F.col("p_size") == 10) & (F.col("p_retailprice") > 950.0)).select(
        "p_name", "p_retailprice"
    )


@query(
    "s04_sql_scan",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate, o_orderstatus
    FROM orders WHERE o_orderkey <= 100
    """,
)
def s04_sql_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S5: the SQL entry point over the same table (the reference's
    Queryable-vs-Enumerable split, HBaseScannableTable.kt:29-38, collapses
    into one API in Spark) + typed row decode of int64/double/timestamp/
    string columns (SqlEnumeratorImpl, HBaseTable.kt:241-262)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice, o_orderdate, o_orderstatus
        FROM orders WHERE o_orderkey <= 100
        """
    )


@query(
    "s07_pk_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey = 42
    """,
)
def s07_pk_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 + rowkey RowFilter: point access by primary key
    (HBaseModifiableTable.kt:337-339; KVIndexTable.kt:63-80). At scale this
    is a parquet min/max-pruned scan — only row groups whose c_custkey
    range covers 42 are read."""
    return load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


@query(
    "s08_pk_range_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 200
    """,
)
def s08_pk_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rowkey-range scan analog: PK between bounds → contiguous HBase
    rowkey range in the reference; contiguous row-group skip range here."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 200))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "s09_extended_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 300000.0)
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus <> 'P'
      AND o_orderpriority LIKE '%-%'
      AND o_custkey IS NOT NULL
      AND NOT (o_totalprice < 0.0)
    """,
)
def s09_extended_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate forms the reference could NOT push or even execute —
    translateMatch2 throws AssertionError on OR/NOT/<>/IN/LIKE/IS NULL
    (HBaseModifiableTable.kt:282-283). Native in Spark, and still pushed
    to Parquet (Or/In/Not show up in PushedFilters)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 300000.0))
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") != "P")
        & F.col("o_orderpriority").like("%-%")
        & F.col("o_custkey").isNotNull()
        & ~(F.col("o_totalprice") < 0.0)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "s10_cast_unwrap_predicate",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE CAST(n_nationkey AS BIGINT) = 7
    """,
)
def s10_cast_unwrap_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST-unwrap in comparisons: the reference recursively strips casts
    so the predicate still pushes (translateBinary2,
    HBaseModifiableTable.kt:314-315); Catalyst's
    UnwrapCastInBinaryComparison does the same here."""
    n = load_table(spark, sf_dir, "nation")
    return n.filter(F.col("n_nationkey").cast("bigint") == F.lit(7)).select(
        "n_nationkey", "n_name"
    )
