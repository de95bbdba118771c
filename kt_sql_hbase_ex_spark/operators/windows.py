"""Window / analytic functions — SURVEY.md §2.3 (EnumerableWindow analog).

The reference system got ``ROW_NUMBER/RANK/NTILE/LAG/LEAD/FIRST_VALUE/
LAST_VALUE`` and framed aggregates from calcite-core's ``EnumerableWindow``
(``build.gradle:28``), executed client-side over the full result set.

Spark-first scale design: every window below partitions by a real key
(customer, nation, brand) so state is bounded per partition and the sort
happens inside each hash partition after one shuffle. No query uses a
global (unpartitioned) window — on 100 TB that funnels the table through
one task; where a global ordering is genuinely wanted, use orderBy+limit
(sort_limit.py) or approx quantiles instead. All orderings carry a
unique tiebreak key so ROW_NUMBER/LAG/LEAD are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "w01_row_number_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders) t
    WHERE rn <= 3
    """,
)
def w01_row_number_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price: ROW_NUMBER + filter — the
    distributed top-k-per-group idiom (single shuffle on the partition
    key; Spark pushes a per-partition limit below the final sort)."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "w02_rank_dense_rank",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           CAST(RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS BIGINT) AS drnk
    FROM supplier
    """,
)
def w02_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK vs DENSE_RANK within nation (gap vs no-gap tie semantics)."""
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return load_table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "w03_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def w03_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD across a customer's order history (null at the edges)."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "w04_running_sum_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
    FROM orders
    """,
)
def w04_running_sum_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer — explicit ROWS frame. Deterministic
    because the frame order ends with the unique o_orderkey: float
    additions happen in the same sequence in any engine."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
    )


@query(
    "w05_range_frame",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           CAST(COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar_size
    FROM part
    """,
)
def w05_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering: parts within 5 size units
    below — value-based frame boundaries, unlike w04's row-based."""
    w = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, W.currentRow)
    return load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.count("*").over(w).cast("bigint").alias("n_similar_size"),
    )


@query(
    "w06_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderdate) OVER w AS first_order_date,
           LAST_VALUE(o_orderdate)  OVER w AS latest_order_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w06_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE with a full-partition frame (the default
    frame stops at CURRENT ROW — an infamous LAST_VALUE trap in every
    engine; spelled explicitly here)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(w).alias("latest_order_date"),
    )


@query(
    "w07_ntile",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(NTILE(4) OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS balance_quartile
    FROM customer
    """,
)
def w07_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4): balance quartiles within each nation (partitioned, so it
    scales; a global NTILE would single-task the table)."""
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
    )


@query(
    "w08_window_share",
    oracle="""
    SELECT c_nationkey, c_custkey,
           ROUND(c_acctbal / SUM(c_acctbal) OVER (PARTITION BY c_nationkey), 6) AS balance_share
    FROM customer
    """,
)
def w08_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered window aggregate: each row vs its partition total (share
    of nation balance) — one shuffle, no sort needed."""
    w = W.partitionBy("c_nationkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.round(F.col("c_acctbal") / F.sum("c_acctbal").over(w), 6).alias("balance_share"),
    )


@query(
    "w09_percent_rank_cume_dist",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY s_nationkey
                 ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (PARTITION BY s_nationkey
                 ORDER BY s_acctbal, s_suppkey), 6) AS cume
    FROM supplier
    """,
)
def w09_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK and CUME_DIST — relative-position analytics closing
    out the Calcite 1.17 ranking family (SURVEY.md §2.3). Partitioned by
    nation so the sort is per-group, never global."""
    w = W.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return load_table(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "w10_running_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
    FROM events
    """,
)
def w10_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed DISTINCT aggregation — the window form Spark does NOT
    support natively (``COUNT(DISTINCT) OVER`` raises): re-expressed as
    ``size(collect_set(...))`` over the running frame, which is exactly
    the distinct-count semantics with set-sized state per row. Scale:
    state per partition-key is bounded by the distinct-value cardinality
    (event types ≪ events); for high-cardinality distincts the same
    query switches the set for an HLL sketch column (a14's mergeable
    states) at bounded memory. The DuckDB oracle runs the native
    windowed DISTINCT — two different mechanisms, one semantics."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types_seen"),
    )


#: w11 trailing time-range frame width
TRAILING_WINDOW_MINUTES = 60


@query(
    "w11_time_range_window",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           SUM(CAST(ROUND(value * 1000000) AS BIGINT)) OVER w AS value_micros_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '{TRAILING_WINDOW_MINUTES} minutes' PRECEDING
                           AND CURRENT ROW)
    """,
)
def w11_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame — the trailing-hour rolling exposure
    per user (rate limiting, spend caps, burst detection). Distinct
    from w05's numeric range frame: the frame boundary here is an
    INTERVAL on event TIME, so peers are whatever landed inside the
    trailing {TRAILING_WINDOW_MINUTES} minutes, not a fixed row count.
    Spark's ``rangeBetween`` takes numeric bounds only, so the frame
    orders by ``unix_micros(ts)`` with the interval expressed in
    microseconds — semantically identical to the oracle's
    ``RANGE BETWEEN INTERVAL ... PRECEDING`` (DuckDB orders by the
    timestamp directly), and the equivalence of the two encodings is
    exactly what the parity check proves. The rolling money sum stays
    in exact micro-unit integers: a double running sum over a sliding
    frame re-associates constantly and WOULD drift between engines.
    Scale: one shuffle on user_id; the frame is computed by Spark's
    sliding-frame aggregator in O(n) per partition, state bounded by
    the densest hour."""
    from kt_sql_hbase_ex_spark.functions.money import _micros

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-TRAILING_WINDOW_MINUTES * 60 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(_micros(F.col("value"))).over(w).alias("value_micros_last_hour"),
    )
