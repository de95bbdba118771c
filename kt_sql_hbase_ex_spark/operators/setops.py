"""Set operators: UNION / INTERSECT / EXCEPT / VALUES — SURVEY.md §2.3.

Reference analog: ``EnumerableUnion`` / ``EnumerableIntersect`` /
``EnumerableMinus`` / ``EnumerableValues`` in calcite-core
(``build.gradle:28``).

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
the *distinct* variants (UNION/INTERSECT/EXCEPT) each imply a shuffle
on the full row — keep projections narrow before applying them (done
below: single-column nation keys, not whole rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@query(
    "set01_union_all",
    oracle="""
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) t GROUP BY nationkey
    """,
)
def set01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, no shuffle) + count to witness
    multiplicity is preserved."""
    return (
        _cust_nations(spark, sf_dir)
        .unionAll(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
    )


@query(
    "set02_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set02_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics) = concat + distinct shuffle."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@query(
    "set03_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set03_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "set04_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set04_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min multiplicity per side)."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    done_c = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_c.intersectAll(done_c)


@query(
    "set05_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000.0
    """,
)
def set05_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/MINUS (set semantics): customers with a 400k+ order but no
    450k+ order. ``subtract`` is the set-difference (distinct) form —
    NOT ``distinct(exceptAll)``, which would keep any key whose left
    multiplicity merely exceeds the right's."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000.0).select(F.col("o_custkey").alias("custkey"))
    huge = o.filter(F.col("o_totalprice") > 450000.0).select(F.col("o_custkey").alias("custkey"))
    return big.subtract(huge)


@query(
    "set06_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set06_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference of multiplicities)."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    done_c = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_c.exceptAll(done_c)


@query(
    "set07_values_relation",
    oracle="""
    SELECT t.r_key AS r_key, t.tier AS tier, r_name
    FROM (VALUES (0, 'core'), (2, 'growth'), (4, 'frontier')) AS t(r_key, tier)
    JOIN region ON r_regionkey = t.r_key
    """,
)
def set07_values_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES literal relation (EnumerableValues analog) joined against a
    table — the idiom for small driver-defined lookup tables; always
    broadcast (it is created on the driver and tiny by construction)."""
    tiers = spark.createDataFrame(
        [(0, "core"), (2, "growth"), (4, "frontier")], schema="r_key int, tier string"
    )
    region = load_table(spark, sf_dir, "region")
    return (
        F.broadcast(tiers)
        .join(region, F.col("r_regionkey") == F.col("r_key"))
        .select("r_key", "tier", "r_name")
    )


@query(
    "set08_union_schema_evolution",
    oracle="""
    SELECT * FROM (
        SELECT s_suppkey AS entity_key, s_name AS entity_name,
               ROUND(s_acctbal, 2) AS acctbal, CAST(NULL AS VARCHAR) AS mktsegment
        FROM supplier
        UNION ALL
        SELECT c_custkey, c_name, NULL, c_mktsegment
        FROM customer WHERE c_custkey <= 50
    )
    """,
)
def set08_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: ``unionByName(allowMissingColumns=True)``
    aligns relations by *column name* and null-fills what either side
    lacks — the ingest idiom when a feed adds or drops columns between
    batches (positional UNION, set01, would silently mis-align instead).
    The oracle replays it as DuckDB's name-aligned union with explicit
    NULL padding. Map-side only: no shuffle, evolution costs nothing at
    scale."""
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 50)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("entity_name"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )
    return s.unionByName(c, allowMissingColumns=True)


@query(
    "set09_symmetric_difference",
    oracle="""
    WITH open_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                       WHERE o_orderstatus = 'O'),
    rich_cust AS (SELECT c_custkey AS custkey FROM customer
                  WHERE c_acctbal > 5000),
    sym AS (
        (SELECT custkey FROM open_cust EXCEPT SELECT custkey FROM rich_cust)
        UNION ALL
        (SELECT custkey FROM rich_cust EXCEPT SELECT custkey FROM open_cust)
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM sym JOIN customer ON c_custkey = custkey
    GROUP BY c_nationkey
    """,
)
def set09_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference (the one classical set op with no single SQL
    keyword): customers with open orders XOR high-balance customers,
    composed as EXCEPT ∪ EXCEPT — two partially-overlapping key sets
    that stay large and distinct at any scale factor. Both EXCEPT legs
    distinct-reduce to key sets before combining (shuffle ∝ keys, never
    the fact rows they came from); the name-back join and rollup reuse
    the customer key partitioning."""
    open_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    rich_cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    sym = open_cust.exceptAll(rich_cust).unionByName(rich_cust.exceptAll(open_cust))
    customer = load_table(spark, sf_dir, "customer")
    return (
        sym.join(customer, sym.custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )
