"""Joins: every join type the reference system supported — SURVEY.md §2.3.

The reference executed all joins in calcite-core's Enumerable engine
(``EnumerableHashJoin``/``EnumerableNestedLoopJoin``/``EnumerableSemiJoin``,
dependency ``build.gradle:28``), single-threaded on the client after the
adapter's scans returned rows (``hbase/HBaseTable.kt:40-50``). Here each
join is declared on the DataFrame API and Catalyst picks the physical
strategy.

Scale design (100 TB):

* fact ⋈ dimension → explicit ``F.broadcast`` on the dimension side
  (region/nation/supplier/part per ``catalog.BROADCAST_TABLES``) — no
  shuffle of the fact table.
* fact ⋈ fact (lineitem⋈orders, customer⋈orders) → shuffle on the join
  key; both sides hash-partition on the same key so co-location holds,
  AQE handles skew (``skewJoin.enabled``) and may demote to broadcast
  after filters shrink a side.
* theta/non-equi joins → BroadcastNestedLoop only when one side is
  provably small (here: self-join of `part` within brand); never
  fact × fact.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.functions.money import exact_sum, exact_sum_sql
from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "j01_inner_equi_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_name, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#1'
    """,
)
def j01_inner_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact⋈dim with broadcast (EnumerableHashJoin analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    return li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_orderkey", "l_linenumber", "p_name", "l_quantity", "l_extendedprice"
    )


@query(
    "j02_left_outer_join",
    oracle="""
    SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS order_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def j02_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (TPC-H Q13 shape).
    COUNT(col) counts only matched rows — null-extension semantics."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


@query(
    "j03_right_outer_join",
    oracle="""
    SELECT n_name, s_suppkey, s_name
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def j03_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every nation appears, suppliers null-extended."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(n, F.col("s_nationkey") == F.col("n_nationkey"), "right").select(
        "n_name", "s_suppkey", "s_name"
    )


@query(
    "j04_full_outer_join",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def j04_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count("*").alias("n_customers"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cn.join(sn, F.col("cnk") == F.col("snk"), "full").select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "j05_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_mktsegment = 'BUILDING'
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def j05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS subquery (EnumerableSemiJoin analog).
    Only left columns survive; no row duplication from multiple matches."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "j06_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000.0)
    """,
)
def j06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS (planner-derived anti join in Calcite):
    customers with no large order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000.0)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "j07_theta_join",
    oracle="""
    SELECT a.p_brand AS p_brand, CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size < b.p_size
    GROUP BY a.p_brand
    """,
)
def j07_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) self-join: ordered part pairs within a brand
    (EnumerableNestedLoopJoin analog). The equi conjunct on p_brand keeps
    it a hash join with a residual `<` condition — at scale the non-equi
    part never degenerates to a full cross product."""
    a = load_table(spark, sf_dir, "part").select(
        F.col("p_brand"), F.col("p_size").alias("a_size")
    )
    b = load_table(spark, sf_dir, "part").select(
        F.col("p_brand").alias("b_brand"), F.col("p_size").alias("b_size")
    )
    return (
        a.join(b, (F.col("p_brand") == F.col("b_brand")) & (F.col("a_size") < F.col("b_size")))
        .groupBy("p_brand")
        .agg(F.count("*").alias("pair_count"))
    )


@query(
    "j08_cross_join",
    oracle="""
    SELECT r_name, seg, CAST(COUNT(*) AS BIGINT) AS n
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    GROUP BY r_name, seg
    """,
)
def j08_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two provably-small relations (5 regions ×
    5 segments). Cross joins are only ever sane dim × dim; Spark requires
    the explicit crossJoin() call — a guard the reference lacked."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    seg = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return r.crossJoin(seg).groupBy("r_name", "seg").agg(F.count("*").alias("n"))


@query(
    "j09_correlated_subquery",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier s
    WHERE s_acctbal > (SELECT AVG(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def j09_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (EnumerableCorrelate / decorrelation in
    Calcite's planner): suppliers above their nation's average balance.
    Catalyst decorrelates this into an aggregate + equi-join."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_acctbal FROM supplier s
        WHERE s_acctbal > (SELECT AVG(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
        """
    )


@query(
    "j10_scalar_subquery",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
           ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 2)
               AS above_avg_by
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.8
    """,
)
def j10_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in both WHERE and SELECT (the
    j09 correlated form's simpler sibling — Calcite plans both via
    EnumerableCorrelate/decorrelation). Catalyst executes the scalar
    subquery ONCE as a separate tiny job and folds the result into the
    main plan as a literal — the fact table is scanned a single time
    with the threshold already resolved, which is exactly the 100 TB
    shape (no per-row re-evaluation, no join)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 2)
                   AS above_avg_by
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.8
        """
    )


#: promotion windows for the interval-overlap join (order "activity"
#: interval = [o_orderdate, o_orderdate + ACTIVITY_DAYS])
ACTIVITY_DAYS = 7
PROMO_WINDOWS = (
    ("NEWYEAR96", "1996-01-01", "1996-01-15"),
    ("SUMMER96", "1996-06-10", "1996-07-10"),
    ("HOLIDAY97", "1997-12-01", "1997-12-31"),
)
_PROMO_SQL = ", ".join(
    f"('{n}', TIMESTAMP '{a}', TIMESTAMP '{b}')" for n, a, b in PROMO_WINDOWS
)


@query(
    "j11_interval_overlap_join",
    oracle=f"""
    WITH promos(promo, p_start, p_end) AS (VALUES {_PROMO_SQL})
    SELECT promo, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           {exact_sum_sql("o_totalprice")} AS total
    FROM promos LEFT JOIN orders
      ON o_orderdate <= p_end
     AND o_orderdate + INTERVAL '{ACTIVITY_DAYS} days' >= p_start
    GROUP BY promo
    """,
)
def j11_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each order's activity interval
    ([orderdate, orderdate+{ACTIVITY_DAYS}d]) matched against promotion
    windows on the standard overlap predicate (a.start <= b.end AND
    a.end >= b.start). The promo side is a literal dimension →
    broadcast, so the fact never shuffles and the inequality pair is
    evaluated map-side (BroadcastNestedLoopJoin over a 3-row build is a
    per-row constant). When BOTH interval sets are fact-sized, this
    becomes ts02's bucketed form — intervals bucketed to window-width
    bins, each emitting ceil(len/width)+1 keys, equi-join on bin before
    the exact overlap residual."""
    promos = spark.createDataFrame(
        [
            (n, dt.datetime.fromisoformat(a), dt.datetime.fromisoformat(b))
            for n, a, b in PROMO_WINDOWS
        ],
        "promo string, p_start timestamp, p_end timestamp",
    )
    orders = load_table(spark, sf_dir, "orders")
    overlap = (F.col("o_orderdate") <= F.col("p_end")) & (
        F.col("o_orderdate") + F.expr(f"INTERVAL {ACTIVITY_DAYS} DAYS")
        >= F.col("p_start")
    )
    return (
        F.broadcast(promos)
        .join(orders, overlap, "left")
        .groupBy("promo")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            exact_sum("o_totalprice").alias("total"),
        )
    )


#: j12: the dimension re-versions mid-way through the event range, so
#: the point-in-time join genuinely discriminates (events before the
#: date bind to v1, after to v2).
TEMPORAL_EFFECTIVE = "2024-01-15"


@query(
    "j12_temporal_dimension_join",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey AS user_id, c_mktsegment AS seg,
               TIMESTAMP '2020-01-01' AS valid_from,
               CASE WHEN c_custkey % 10 = 3
                    THEN TIMESTAMP '{TEMPORAL_EFFECTIVE}' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, 'VIP', TIMESTAMP '{TEMPORAL_EFFECTIVE}', NULL
        FROM customer WHERE c_custkey % 10 = 3
    ),
    j AS (
        SELECT e.value, d.seg
        FROM events e JOIN dim d
          ON d.user_id = e.user_id
         AND e.ts >= d.valid_from
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    )
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_events,
           {exact_sum_sql("value")} AS total_value
    FROM j GROUP BY seg
    """,
)
def j12_temporal_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension join — each event binds to the
    dimension VERSION valid at its own timestamp (the SCD2-consumption
    side of dml06; Flink calls this a temporal table join): customers
    ending in 3 re-segment to VIP effective {TEMPORAL_EFFECTIVE}, so
    January events split across both versions. Scale-right form: NOT an
    interval join (an inequality join over fact×versions) — version
    starts become timeline rows unioned with the events, ONE shuffle on
    the entity key, and a forward-fill window (``last`` ignorenulls)
    assigns each event the segment in force at its instant; dimension
    rows sort before same-timestamp events so a version is effective AT
    its boundary. This is ts01's as-of mechanics promoted to versioned
    attributes: state per key ∝ versions, never events × versions. The
    oracle is the declarative BETWEEN join — two formulations, one
    answer."""
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.lit("2020-01-01").cast("timestamp").alias("t"),
        F.col("c_mktsegment").alias("seg"),
    )
    v2 = (
        cust.filter(F.col("c_custkey") % 10 == 3)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.lit(TEMPORAL_EFFECTIVE).cast("timestamp").alias("t"),
            F.lit("VIP").alias("seg"),
        )
    )
    dim_rows = v1.unionByName(v2).select(
        "user_id", "t", "seg", F.lit(1).alias("is_dim"), F.lit(None).cast("double").alias("value")
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("string").alias("seg"),
        F.lit(0).alias("is_dim"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", F.desc("is_dim"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    timeline = dim_rows.unionByName(ev).withColumn(
        "seg_asof", F.last("seg", ignorenulls=True).over(w)
    )
    return (
        timeline.filter(F.col("is_dim") == 0)
        # events with NO applicable version (unknown entity, or ts before
        # the first valid_from) drop, matching the oracle's INNER join —
        # without this filter they would surface as a NULL-segment group
        # the oracle never produces
        .filter(F.col("seg_asof").isNotNull())
        .groupBy(F.col("seg_asof").alias("seg"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
    )


@query(
    "j13_lateral_topn_per_group",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) t
    """,
)
def j13_lateral_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — the per-group top-N written as the
    SQL standard's lateral join (Spark 4 syntax; DuckDB runs the SAME
    text as the oracle): for each nation, its two highest-balance
    customers, deterministic under ties (c_custkey tiebreak). Calcite
    1.17 parsed LATERAL but the reference's adapter had no join
    push-in, so every lateral probe re-scanned HBase client-side
    (``hbase/HBaseTable.kt:226-233`` materializes the full scanner per
    enumerate); here Catalyst DECORRELATES the subquery — the plan is
    one ranked window over ``customer`` partitioned by the correlation
    key joined back to ``nation``, never a per-row rescan. Scale: the
    window partitions by c_nationkey (parallel across keys, no global
    sort), and the LIMIT prunes inside each partition before the join;
    w01 pins the equivalent explicit-window form — this entry grades
    the *syntax surface* decorrelating to the same scalable plan."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_acctbal FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        """
    )
