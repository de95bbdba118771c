"""Sort / limit / offset / top-k — SURVEY.md §2.3.

Reference analog: ``EnumerableSort`` + ``EnumerableLimit`` in
calcite-core (``build.gradle:28``), fused by its planner for top-k.

Scale design: ORDER BY + LIMIT compiles to ``TakeOrderedAndProject`` —
each task keeps only its local top-k and the driver merges k·tasks rows;
the full sort never happens. A bare global ORDER BY (no limit) is the
expensive path (range-partitioned shuffle); it exists for completeness
but the top-k forms are what 100 TB workloads should use. Orderings end
with a unique key so LIMIT/OFFSET slices are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "sl01_top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sl01_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price → TakeOrderedAndProject (no global sort)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "sl02_multi_key_sort",
    oracle="""
    SELECT c_nationkey, c_mktsegment, c_custkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey ASC
    LIMIT 50
    """,
)
def sl02_multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-direction multi-key ordering with limit."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment", "c_custkey", "c_acctbal")
        .orderBy(F.asc("c_nationkey"), F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(50)
    )


@query(
    "sl03_limit_offset",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 10 OFFSET 10
    """,
)
def sl03_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: rows 11-20 of the price ranking (offset + limit).
    Deterministic only because the sort key ends with the unique
    p_partkey — offset without total order is nondeterministic."""
    return (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .offset(10)
        .limit(10)
    )


@query(
    "sl04_global_sort_sample",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    """,
)
def sl04_global_sort_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global ORDER BY (range-partitioned sort) on the *smallest*
    table — demonstrates EnumerableSort parity without paying a
    fact-table global sort; value comparison is order-insensitive so
    this checks content, tests check the plan uses a range partitioner."""
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    )
