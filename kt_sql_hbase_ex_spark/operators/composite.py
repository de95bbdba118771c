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

from kt_sql_hbase_ex_spark.functions.money import exact_sum, exact_sum_dec
from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "c01_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
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
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
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
               CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
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
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
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
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
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
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
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


TRADE_NATIONS = ("NATION_1", "NATION_2")


@query(
    "c07_nation_trade_flow",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(ROUND(SUM(CAST(volume AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE n1.n_name IN {TRADE_NATIONS!r}
          AND n2.n_name IN {TRADE_NATIONS!r}
          AND n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def c07_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations in both directions, by ship year. The same nation dim joins
    twice under different roles (supplier's vs customer's) — both
    broadcast; the nation-pair predicate is applied to each broadcast
    side BEFORE the fact joins (the flagship's semi-join reduction
    generalized to two reduction keys), so only lineitem rows of
    qualifying suppliers survive the first join. The date predicate is
    pushed to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    n1 = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*TRADE_NATIONS)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n1.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(n1.select(F.col("n_nationkey").alias("cn_key"),
                                  F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


SHARE_REGION = "AMERICA"
SHARE_NATION = "NATION_3"


@query(
    "c08_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = '{SHARE_NATION}' THEN volume
                          ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = '{SHARE_REGION}'
    ) all_sales
    GROUP BY o_year
    """,
)
def c08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): within one region's
    customer market, the fraction of revenue supplied by one nation,
    per order year — a conditional-aggregate ratio over a 6-table
    join. Customer side is semi-reduced to the region's nationkey set
    pre-shuffle (broadcast), supplier side carries its nation name for
    the CASE; both dims broadcast so the only shuffles are the
    lineitem⋈orders key exchange and the final year aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == SHARE_REGION
    )
    region_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(region_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey",
                                      F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                exact_sum_dec(
                    F.when(F.col("supp_nation") == SHARE_NATION, vol).otherwise(F.lit(0.0))
                ).cast("double")
                / exact_sum_dec(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "c09_promo_revenue_effect",
    oracle="""
    SELECT EXTRACT(year FROM l.l_shipdate) AS l_year,
           ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    """,
)
def c09_promo_revenue_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect), widened to per-year: percent
    of revenue from PROMO-type parts. One broadcast of the part dim,
    one aggregation shuffle on ~7 year keys; the CASE keeps it a single
    pass (no separate promo/total scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.lit(100.0)
                * exact_sum_dec(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
                ).cast("double")
                / exact_sum_dec(vol).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "c10_disjunctive_predicate_revenue",
    oracle="""
    SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1  AND 15
           AND l.l_quantity BETWEEN 1  AND 30)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    GROUP BY p.p_brand
    """,
)
def c10_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): an OR-of-ANDs predicate
    mixing both join sides — the form the reference's pushdown
    translator crashed on (SURVEY §2.2: OR unsupported). Catalyst
    splits it: the part-only disjunction (brand/size) prunes the
    broadcast build side, the l_quantity envelope (BETWEEN 1 AND 50)
    is derivable but per-branch quantity bounds must evaluate post-join
    — exactly the residual split src02's connector does by hand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


@query(
    "c11_top_revenue_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def c11_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): a revenue view per supplier, then
    the supplier(s) whose revenue equals the view's max — an aggregate
    consumed twice (as join input and inside a scalar subquery).
    Catalyst evaluates the MAX subquery as its own tiny job over the
    ~supplier-count aggregate and folds the result in as a literal, so
    the fact table is scanned once; revenue is rounded to 2dp BEFORE
    the max comparison on both engines so a last-ulp difference can't
    flip which supplier wins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    revenue.createOrReplaceTempView("c11_revenue")
    s = load_table(spark, sf_dir, "supplier")
    s.createOrReplaceTempView("c11_supplier")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM c11_supplier s JOIN c11_revenue r ON r.supplier_no = s.s_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM c11_revenue)
        """
    )


@query(
    "c12_prospective_customers",
    oracle="""
    WITH threshold AS (
        SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def c12_prospective_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with above-
    average positive balance and no RECENT orders (every fixture
    customer has some order, so the anti-join is anchored on the lapsed-
    since-2000 window) — a scalar-average subquery (evaluated once,
    folded to a literal) feeding an anti-join against the filtered
    fact. At scale the orders side reduces to its distinct recent
    custkey set map-side before the anti-join probes it."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c.createOrReplaceTempView("c12_customer")
    o.createOrReplaceTempView("c12_orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_custs,
               CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
        FROM c12_customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM c12_customer
                             WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM c12_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "c13_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def c13_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders in a six-month
    window having at least one late lineitem (shipped >80 days after
    the order date — the fixture's l_commitdate analog), counted by
    priority. The EXISTS is a LEFT SEMI join whose non-equi clause
    (l_shipdate vs o_orderdate) rides on the orderkey equi-join, so it
    stays a hash semi-join: the date window prunes orders at the scan,
    and the semi-join short-circuits per orderkey (no lineitem
    fan-out rows ever materialize). The reference would have run the
    decorrelated Calcite plan row-at-a-time (SURVEY §2.3 correlated
    subqueries, HBaseTable.kt scan loop)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "c14_forecast_revenue_change",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def c14_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the all-pushdown
    aggregate — every predicate (date range, discount band, quantity
    cap) reaches PushedFilters, so at 100 TB the scan reads only
    row-groups whose min/max straddle 1997 and three columns of those;
    the aggregate itself is a two-phase partial with a single-row
    result. This is the query shape where scan pushdown IS the whole
    cost model — the reference translated exactly these conjunctive
    range forms (SURVEY §2.2, PredicateAnalyzer)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "c15_late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def c15_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): late 1997
    lineitems classified by linestatus (the fixture's shipmode analog),
    counting urgent/high- vs low-priority orders per class via
    conditional sums — one joint pass, no per-class scans. The ship-
    year range pushes to the lineitem scan; the lateness predicate
    (two-column comparison) evaluates as the join residual; the final
    aggregate has tiny cardinality so the fact shuffles once, on the
    join key only."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "c16_small_quantity_revenue",
    oracle="""
    WITH brand_lines AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
    ), part_avg AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM brand_lines GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM brand_lines b JOIN part_avg a ON a.l_partkey = b.l_partkey
    WHERE b.l_quantity < 0.5 * a.avg_qty
    """,
)
def c16_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    quantity is under half the per-part average, for one brand —
    the correlated scalar-AVG-per-part subquery decorrelated into an
    aggregate + self-join. Order of operations is the scale decision:
    the brand filter (broadcast semi via the part dim) runs FIRST, so
    the per-part averages aggregate ~1/25th of the fact, and the
    avg⋈lines join is per-part (the aggregate side is tiny → AQE
    broadcasts it). Never compute per-part stats over the unfiltered
    fact when the correlation is brand-scoped."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = li.join(
        F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"), "left_semi"
    )
    part_avg = brand_lines.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        brand_lines.alias("b")
        .join(part_avg.alias("a"), F.col("b.l_partkey") == F.col("a.l_partkey"))
        .filter(F.col("b.l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                exact_sum_dec("b.l_extendedprice").cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "c17_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey,
               MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    ), per_order AS (
        SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
               SUM(is_late) OVER (PARTITION BY l_orderkey) AS n_late
        FROM late
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order po JOIN supplier s ON s.s_suppkey = po.l_suppkey
    WHERE po.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def c17_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished orders with multiple suppliers, find the supplier who was
    the ONLY late one — the EXISTS / NOT EXISTS pair decorrelated into
    one orderkey-grouped pass. The (orderkey, suppkey) aggregate and
    the per-order window both partition by l_orderkey, so the fact
    shuffles exactly once; the two correlated subqueries of the
    textbook form (which would re-scan lineitem twice) never run.
    numwait counts distinct waiting orders per supplier."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    is_late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS"), 1
    ).otherwise(0)
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(is_late).alias("is_late"))
    )
    w = W.partitionBy("l_orderkey")
    per_order = late.withColumn("n_supp", F.count("*").over(w)).withColumn(
        "n_late", F.sum("is_late").over(w)
    )
    return (
        per_order.filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "c18_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%ring%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
)
def c18_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product type profit): profit on '%ring%' parts
    by supplier nation and order year, with cost modeled as 60% of
    retail price (the fixture has no partsupp.ps_supplycost). Join
    order is the scale story: the LIKE-filtered part dim broadcast-
    reduces lineitem FIRST (~1/8th survives), then supplier/nation
    broadcast, and only the surviving rows shuffle for the
    orders⋈lineitem fact-fact join — the same filtered-fact-first
    discipline as the flagship. The infix LIKE cannot prune row-groups
    but runs JVM-side pre-join; the profit expression folds into the
    aggregate's partial step."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%ring%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum(profit).alias("sum_profit"))
    )


@query(
    "c19_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_name, ROUND(c.unit_cost, 4) AS unit_cost
    FROM cost c
    JOIN best b     ON b.l_partkey = c.l_partkey AND c.unit_cost = b.min_cost
    JOIN part p     ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
    ORDER BY s.s_acctbal DESC, s.s_name, p.p_partkey
    LIMIT 20
    """,
)
def c19_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the supplier(s) offering the minimum unit cost — the correlated
    MIN subquery decorrelated into a per-part aggregate + equality join
    (the fixture has no partsupp; unit cost = min l_extendedprice /
    l_quantity per (part, supplier) observed in lineitem). Scale: the
    part filter broadcast-semi-reduces lineitem BEFORE the (part,
    supplier) aggregate, so both aggregates and the best⋈cost join run
    over the qualifying ~1/15th of the fact; all dims broadcast; the
    final ORDER BY is a top-k (TakeOrderedAndProject), never a global
    sort. MIN-equality on doubles is engine-safe: both sides take MIN
    over identical IEEE division results."""
    pq = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    li_q = li.join(
        F.broadcast(pq.select("p_partkey")),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_semi",
    )
    cost = li_q.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cost.join(
            best.withColumnRenamed("l_partkey", "b_partkey"),
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(pq), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "c20_important_stock",
    oracle="""
    WITH nat AS (
        SELECT s_suppkey FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    ), val AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS value_dec
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM nat)
        GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(CAST(value_dec AS DOUBLE), 2) AS stock_value
    FROM val
    WHERE value_dec * (SELECT COUNT(*) FROM val)
            > 2 * (SELECT SUM(value_dec) FROM val)
    """,
)
def c20_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): parts whose
    supplied value from one region's suppliers exceeds a threshold
    share of that region's total — the scalar-aggregate-subquery-in-
    HAVING form. The threshold is RELATIVE (value above 2× the mean
    per-part share, i.e. ``value·n_parts > 2·total``) rather than
    Q11's fixed fraction, because the fixed fraction is itself
    scale-dependent in TPC-H (0.0001/SF — a constant empties the
    result as part count grows, which the sf0.1 robustness sweep
    caught); the relative form selects a stable head at every scale.
    The compare runs entirely in exact DECIMAL (per-part sums, grand
    total, and the integer part count), so the boundary cannot flip on
    cross-engine double-summation ulps. Decorrelation is the scale
    story: the per-part aggregate runs ONCE and is reused for both the
    values and their (total, count) summary (one extra reduce over
    group-cardinality rows, not a second fact scan); the one-row
    summary then broadcast-cross-joins back. The region's supplier set
    broadcast-semi-filters lineitem before any shuffle."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nat = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    val = (
        li.join(F.broadcast(nat), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(exact_sum_dec("l_extendedprice").alias("value_dec"))
    )
    summary = val.agg(
        F.sum("value_dec").alias("total"), F.count("*").alias("n_parts")
    )
    return (
        val.crossJoin(F.broadcast(summary))
        .filter(F.col("value_dec") * F.col("n_parts") > 2 * F.col("total"))
        .select(
            "l_partkey",
            F.round(F.col("value_dec").cast("double"), 2).alias("stock_value"),
        )
    )


@query(
    "c21_parts_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def c21_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) bucket, excluding one brand, an IN
    size-list, and a NOT IN supplier exclusion. The NOT IN becomes a
    broadcast anti-join (null-safe here: s_suppkey is a non-null PK),
    the brand/size predicates push into the part dim before it
    broadcasts, and COUNT(DISTINCT) shuffles (group, suppkey) pairs
    once — no fact self-join anywhere."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "c22_potential_part_promotion",
    oracle="""
    WITH ring AS (SELECT p_partkey FROM part WHERE p_name LIKE '%ring%'),
    qty AS (
        SELECT l_suppkey, l_partkey,
               SUM(CASE WHEN EXTRACT(year FROM l_shipdate) >= 1999
                        THEN l_quantity ELSE 0 END) AS q_recent,
               SUM(l_quantity) AS q_total,
               CAST(COUNT(*) AS BIGINT) AS n_ship
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM ring)
        GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s.s_name, ROUND(s.s_acctbal, 2) AS s_acctbal
    FROM qty JOIN supplier s ON s.s_suppkey = qty.l_suppkey
    WHERE qty.n_ship >= 3 AND qty.q_recent > 0.5 * qty.q_total
    ORDER BY s.s_name
    """,
)
def c22_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    recent shipments of a name-filtered part family dominate their
    all-time volume for that part — the doubly-nested IN subqueries
    decorrelated into one (supplier, part) aggregate with a conditional
    sum. Scale: the ring-part set broadcast-semi-filters lineitem
    first; the single grouped pass computes both the windowed and total
    quantities (no second scan, no self-join); the supplier dim
    broadcasts for the name lookup. Quantity sums are integer-valued
    doubles, so the 0.5×total comparison is exact cross-engine."""
    ring = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%ring%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    recent = F.when(F.year("l_shipdate") >= 1999, F.col("l_quantity")).otherwise(0.0)
    qty = (
        li.join(F.broadcast(ring), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(recent).alias("q_recent"),
            F.sum("l_quantity").alias("q_total"),
            F.count("*").alias("n_ship"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        qty.filter((F.col("n_ship") >= 3) & (F.col("q_recent") > 0.5 * F.col("q_total")))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .distinct()
        .orderBy("s_name")
    )
