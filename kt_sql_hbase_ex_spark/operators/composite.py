"""Composite analytics queries — realistic multi-operator pipelines.

TPC-H-shaped end-to-end queries (the flagship's siblings): each one
chains scan-pushdown → dimension broadcast → fact shuffle → aggregation
→ window/top-k, the composition profile of real reporting workloads.
The reference ran shapes like these through Calcite's Enumerable
operators over adapter scans (SURVEY.md §3.1); here each stage lands on
the Catalyst physical operator the plan tests pin.

Scale notes: these inherit every guarantee of their constituent parts —
dims broadcast, facts shuffle at most once per key change, top-k never
sorts globally. They are also the queries where AQE's join-strategy
switching matters: post-filter selectivity on orders/lineitem decides
broadcast vs shuffle at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "c01_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def c01_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ date-filtered orders
    ⋈ unshipped lineitems → revenue per order → top-10. Both date
    predicates push to the scans; the orderkey aggregation reuses the
    join's partitioning."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "c02_supplier_revenue_share",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey, s.s_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_nationkey, s.s_name
    )
    SELECT n.n_name AS nation, s_name, revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY n.n_name), 6) AS share,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY s_nationkey
                     ORDER BY revenue DESC, s_name) AS rnk FROM rev) r
    JOIN nation n ON n.n_nationkey = r.s_nationkey
    WHERE rnk <= 3
    """,
)
def c02_supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers per nation with revenue share: fact aggregation →
    two windows over the (small) aggregate → dimension broadcast for
    names. The windows run on supplier-level data (post-aggregation),
    so the expensive lineitem pass happens exactly once."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "s_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    w_rank = W.partitionBy("s_nationkey").orderBy(F.desc("revenue"), "s_name")
    ranked = rev.withColumn("rnk", F.row_number().over(w_rank))
    w_share = W.partitionBy("n_name")
    return (
        ranked.filter(F.col("rnk") <= 3)
        .join(F.broadcast(n), n.n_nationkey == ranked.s_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "s_name",
            "revenue",
            F.round(F.col("revenue") / F.sum("revenue").over(w_share), 6).alias("share"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@query(
    "c03_customer_order_distribution",
    oracle="""
    WITH counts AS (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM counts GROUP BY c_count
    """,
)
def c03_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram including
    zero-order customers (LEFT join with a join-condition filter — the
    filter must NOT push below the outer join or empty customers
    vanish). Two aggregations: per-customer count, then the
    distribution; the second input is customer-cardinality, tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    counts = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "c04_semantic_doc_retrieval",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 1, 2)),
    scored AS (
        SELECT q.query_id, e.vec_id AS doc_id,
               (list_dot_product(q.qv, e.v)
                / (sqrt(list_dot_product(q.qv, q.qv))
                   * sqrt(list_dot_product(e.v, e.v)))) AS c
        FROM q JOIN e ON e.vec_id <> q.query_id
    ),
    topk AS (
        SELECT query_id, doc_id, c,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ROUND(c, 6) DESC, doc_id) AS rnk
        FROM scored
    )
    SELECT t.query_id, t.doc_id AS neighbor_doc, ROUND(t.c, 6) AS cosine,
           CAST(t.rnk AS BIGINT) AS rnk, d.lang, d.n_chars
    FROM topk t JOIN documents d ON d.doc_id = t.doc_id
    WHERE t.rnk <= 5
    """,
)
def c04_semantic_doc_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval pipeline — the training-data workflow end to
    end: query documents → their embedding vectors → cosine top-5 over
    the corpus → join back to document metadata. documents.doc_id and
    embeddings.vec_id are the shared key (one row per document in both).
    Scale shape: query vectors broadcast (map-side scoring, corpus never
    shuffles), per-query top-k via window over the scored slice, and the
    k·|queries| winners — tiny — broadcast into the documents join, so
    the *documents* table is touched only by a semi-join-sized probe."""
    from kt_sql_hbase_ex_spark.functions.similarity import _cosine_spark

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        e.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("v"))
        .join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", _cosine_spark("qv", "v").alias("c"))
    )
    w = W.partitionBy("query_id").orderBy(F.round("c", 6).desc(), F.col("doc_id"))
    topk = (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
    )
    return (
        d.join(F.broadcast(topk), ["doc_id"])
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_doc"),
            F.round("c", 6).alias("cosine"),
            "rnk",
            "lang",
            "n_chars",
        )
    )


@query(
    "c05_returned_item_reporting",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def c05_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter. Date
    predicate pushes to the orders scan, returnflag to lineitem; nation
    broadcast; top-20 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


LARGE_ORDER_QTY = 250


@query(
    "c06_large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > {LARGE_ORDER_QTY})
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def c06_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds
    {LARGE_ORDER_QTY}, with their customers — an IN-subquery over an
    aggregate, planned as aggregate → semi-join. The qualifying-order
    set is small (p99+ of orders), so it broadcasts into the semi-join
    and the lineitem re-scan aggregates only matching orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > LARGE_ORDER_QTY)
        .select("l_orderkey")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(big), "l_orderkey", "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )
