"""Aggregates: hash agg, distinct, rollup/cube/grouping sets — SURVEY.md §2.3.

Reference analog: ``EnumerableAggregate`` (hash) with distinct and
grouping-set support, all in calcite-core (``build.gradle:28``),
evaluated client-side single-threaded after the scan.

Spark-first scale design: every groupBy below compiles to a partial
(map-side) aggregate + shuffle-on-group-key + final aggregate — the
partial combine is what makes 100 TB group-bys feasible (bytes shuffled
∝ #groups, not #rows). Low-cardinality group keys (returnflag ×
linestatus = 6 groups) shuffle almost nothing. Double-typed measures are
rounded at the *end* (2dp) so cross-engine float-sum ordering effects
can't flip the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kt_sql_hbase_ex_spark.functions.money import exact_sum, exact_sum_sql
from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "a01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           {exact_sum_sql("l_extendedprice")} AS sum_base_price,
           {exact_sum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {exact_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical hash aggregate: 8
    aggregates over 2 group keys, map-side combined to 6 groups."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        exact_sum("l_extendedprice").alias("sum_base_price"),
        exact_sum(disc_price).alias("sum_disc_price"),
        exact_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "a02_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def a02_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = group-by-all-columns; partial dedup happens map-side."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "a03_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a03_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi COUNT(DISTINCT) — Catalyst plans an Expand + two-phase
    aggregate; at scale prefer a04's approx_count_distinct when ±2% is
    acceptable (no expand, constant memory HLL sketch)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "a04_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_tolerance
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a04_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale answer to
    COUNT(DISTINCT) — mergeable constant-size sketch, no Expand, no
    per-key shuffle.

    HLL estimates are engine-specific, so the raw sketch value can't be
    hash-compared against a DuckDB oracle. Instead we emit the *exact*
    count plus a boolean `within_tolerance` asserting the HLL estimate
    landed within 5% relative error of it (rsd was configured at 2%, so
    5% is a generous deterministic bound). The oracle predicts the exact
    counts and an all-true flag column, making the query fully
    hash-checkable while still executing the approximate aggregate."""
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("within_tolerance"),
    )


@query(
    "a05_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a05_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (rf,ls), (rf), () hierarchy levels (Calcite
    Aggregate.groupSets analog)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "a06_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a06_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-key subsets in one pass (Expand operator)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


@query(
    "a07_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a07_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers disambiguating
    "NULL because aggregated away" from a NULL key value."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "a08_statistical_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price,
           ROUND(VAR_SAMP(l_extendedprice), 1) AS var_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a08_statistical_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX/AVG/STDDEV/VARIANCE (SqlStdOperatorTable aggregate set)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
            F.round(F.var_samp("l_extendedprice"), 1).alias("var_price"),
        )
    )


@query(
    "a09_conditional_agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {exact_sum_sql("CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END")} AS price_o,
           {exact_sum_sql("CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END")} AS price_f,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a09_conditional_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-by-CASE): one pass computes
    per-status measures as columns — the scalable alternative to N
    filtered scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        exact_sum(
            F.when(F.col("l_linestatus") == "O", F.col("l_extendedprice")).otherwise(0.0)
        ).alias("price_o"),
        exact_sum(
            F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice")).otherwise(0.0)
        ).alias("price_f"),
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).cast("bigint").alias("n_bulk"),
    )


@query(
    "a10_having",
    oracle=f"""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {exact_sum_sql("o_totalprice")} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def a10_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregate filter (planner folds it above the agg)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum("o_totalprice").alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "a11_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (``percentile`` — the
    same continuous-quantile definition as the oracle's quantile_cont).
    Scale note: exact percentile buffers per-group values at the
    reducer; at 100 TB swap in ``approx_percentile`` (t-digest-style
    sketch, mergeable, fixed memory) exactly as a04 does for distinct
    counts — the exact form here is the correctness baseline."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("price_p99"),
    )


@query(
    "a12_mode_median",
    oracle="""
    WITH counts AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    m AS (
        SELECT l_returnflag, l_quantity AS mode_qty,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_quantity ASC) AS rn
        FROM counts
    ),
    med AS (
        SELECT l_returnflag, ROUND(MEDIAN(l_quantity), 6) AS median_qty
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT med.l_returnflag, med.median_qty, m.mode_qty
    FROM med JOIN m ON m.l_returnflag = med.l_returnflag AND m.rn = 1
    """,
)
def a12_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN (continuous-interpolated, = quantile_cont 0.5) and a
    *deterministic* MODE per group. Engines leave mode tie-breaks
    unspecified, so the mode here is pinned explicitly: count per value,
    then row_number ordered by (count DESC, value ASC) — reproducible on
    any engine and at any parallelism. Scale shape: the value-count
    groupBy combines map-side to #distinct values per group; the window
    then runs over that small aggregate, never over raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), F.col("l_quantity").asc())
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty")
    )
    return med.join(mode, "l_returnflag")


@query(
    "a13_string_agg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def a13_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): collect_list →
    array_sort → concat_ws, which pins a deterministic element order the
    way ``WITHIN GROUP (ORDER BY …)`` does — collect_list alone is
    assembly-order-dependent and would differ run to run under
    parallelism. Scale note: list aggregation buffers per-group values;
    bounded group sizes only (here: 5 nations per region)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


@query(
    "a14_hll_sketch_union",
    oracle="""
    SELECT r.r_name,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_tolerance
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def a14_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes approximate
    distinct-counting work at 100 TB: per-nation HLL sketches
    (``hll_sketch_agg``, Apache DataSketches binary) are built once,
    then rolled up to region level by ``hll_union_agg`` WITHOUT
    re-touching the fact table — the two-level rollup pattern of a
    standing pipeline (daily sketches → monthly union → quarterly
    union), impossible with exact COUNT(DISTINCT) whose partials
    aren't unions. Like a04, the estimate is engine-specific, so the
    query emits the exact count + a tolerance flag on the unioned
    estimate (HLL lgK=12 ⇒ rse ~1.6%; 5% bound) and the oracle predicts
    exact + all-true."""
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        c.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "c_nationkey")
        .agg(F.expr("hll_sketch_agg(c_custkey)").alias("sk"))
    )
    per_region = (
        per_nation.groupBy("n_regionkey")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_customers"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    exact = (
        c.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("exact_customers"))
        .withColumnRenamed("n_regionkey", "e_regionkey")
    )
    return (
        per_region.join(exact, F.col("n_regionkey") == F.col("e_regionkey"))
        .select(
            "r_name",
            "exact_customers",
            (
                F.abs(F.col("approx_customers") - F.col("exact_customers"))
                <= 0.05 * F.col("exact_customers")
            ).alias("within_tolerance"),
        )
    )


# ---------------------------------------------------------------------------
# a15/a16 — sketch-adjacent statistics: histogram, heavy hitters

#: Fixed, data-independent histogram bounds for o_totalprice: at scale
#: the bounds come from stats (ddl05) or domain knowledge, never from a
#: pre-pass min/max over the data.
HIST_LO = 0.0
HIST_HI = 60000.0
HIST_BUCKETS = 12
_HIST_W = (HIST_HI - HIST_LO) / HIST_BUCKETS

#: Heavy-hitter threshold: tokens carrying >= 1% of corpus occurrences.
HH_MIN_SHARE = 0.01


@query(
    "a15_histogram",
    oracle=f"""
    WITH b AS (
        SELECT LEAST(CAST(FLOOR((o_totalprice - {HIST_LO}) / {_HIST_W}) AS INT),
                     {HIST_BUCKETS - 1}) AS bucket
        FROM orders
    ),
    counts AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bucket
    )
    SELECT bucket,
           ROUND({HIST_LO} + bucket * {_HIST_W}, 2) AS lo,
           ROUND({HIST_LO} + (bucket + 1) * {_HIST_W}, 2) AS hi,
           n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share,
           ROUND(CAST(SUM(n) OVER (ORDER BY bucket) AS DOUBLE)
                 / SUM(n) OVER (), 6) AS cum_share
    FROM counts
    """,
)
def a15_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals with FIXED bounds (the
    streaming/distributed-safe kind): bucket index is pure row-local
    arithmetic, so the aggregate is map-side-combined down to at most
    {HIST_BUCKETS} rows per partition before the one tiny shuffle —
    the same profile at 60k rows or 100 TB. share/cum_share come from
    an unpartitioned window over the {HIST_BUCKETS}-row result (driver-
    scale, not data-scale). A data-dependent (min/max) histogram would
    need a pre-pass; fixed bounds are what monitoring pipelines use."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor((F.col("o_totalprice") - HIST_LO) / _HIST_W).cast("int"),
        F.lit(HIST_BUCKETS - 1),
    )
    counts = o.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n")
    )
    w_all = W.partitionBy()
    w_cum = W.partitionBy().orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return counts.select(
        "bucket",
        F.round(F.lit(HIST_LO) + F.col("bucket") * _HIST_W, 2).alias("lo"),
        F.round(F.lit(HIST_LO) + (F.col("bucket") + 1) * _HIST_W, 2).alias("hi"),
        "n",
        F.round(F.col("n") / F.sum("n").over(w_all), 6).alias("share"),
        F.round(
            F.sum("n").over(w_cum).cast("double") / F.sum("n").over(w_all), 6
        ).alias("cum_share"),
    )


@query(
    "a16_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token
    ),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT token, n, ROUND(CAST(n AS DOUBLE) / total, 6) AS share
    FROM counts, tot
    WHERE n >= {HH_MIN_SHARE} * total
    """,
)
def a16_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent items: tokens with >= {HH_MIN_SHARE:.0%} of all corpus
    occurrences — the exact form of the count-min/Misra-Gries question,
    kept exact because the two-phase aggregate already scales: map-side
    combine bounds the token shuffle by per-partition vocabulary (Zipf:
    ~distinct tokens, not corpus size), the grand total is a second
    aggregate over the (vocab-sized) counts, and the threshold filter
    broadcasts that single total back. At adversarial vocab sizes
    (URLs, ids) the same query runs over a hashed token space first —
    the pre-agg shape is unchanged."""
    from kt_sql_hbase_ex_spark.sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"))
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("n") >= HH_MIN_SHARE * F.col("total"))
        .select(
            "token", "n", F.round(F.col("n") / F.col("total"), 6).alias("share")
        )
    )


@query(
    "a17_quantile_sketch",
    oracle="""
    SELECT o_orderpriority,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
               AS exact_p50,
           TRUE AS within_tolerance
    FROM orders GROUP BY o_orderpriority
    """,
)
def a17_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketching — the third sketch alongside a04/a14's HLL:
    ``percentile_approx`` (Greenwald-Khanna, mergeable fixed-size
    summaries) is THE 100 TB quantile path — exact percentiles buffer
    whole groups (a11's documented limit) while the sketch streams in
    bounded memory and its partials merge map-side. Checkability follows
    the a04 pattern: the query emits the exact per-group median plus a
    boolean asserting the sketch landed within 2% of it, so the oracle
    (exact median + TRUE) hash-checks the approximation contract itself.
    The exact median rounds at 4dp: medians of 2dp inputs have <= 3dp,
    so the round is exact and interpolation-order ulps can't flip it."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("approx"),
    )
    return g.select(
        "o_orderpriority",
        F.round("exact", 4).alias("exact_p50"),
        (
            F.abs(F.col("approx") - F.col("exact")) <= 0.02 * F.abs(F.col("exact"))
        ).alias("within_tolerance"),
    )


@query(
    "a18_regression_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a18_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates — corr / covar_samp and the SQL
    standard linear-regression family (regr_slope / regr_intercept /
    regr_r2), completing a08's univariate set. All are single-pass
    mergeable moment aggregates (sums of x, y, x², y², xy): partials
    combine map-side, state is O(1) per group — exactly the shape that
    holds at 100 TB, unlike a fit that materializes the points. Both
    engines compute from the same moment formulas; outputs round above
    the float error of the moment accumulation (slope of a 2dp price
    per unit quantity at 4dp, correlations at 6dp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_covar"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "a19_native_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS open_cnt,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS filled_cnt,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS partial_cnt,
           {exact_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_rev,
           {exact_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS filled_rev,
           {exact_sum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS partial_rev
    FROM orders GROUP BY o_orderpriority
    """,
)
def a19_native_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``PIVOT`` syntax (Spark 4 relation-level PIVOT) — the
    rotate-rows-to-columns surface a09 builds manually from conditional
    aggregates, here as the declarative form Catalyst compiles to the
    SAME single hash-aggregate (one shuffle on the group key, pivot
    columns materialized map-side — no per-status scan). The money
    cells run the exact micro-unit fixed point (functions/money.py):
    the pivot aggregates LONG micros, the post-pivot projection does
    the decimal cents rounding per GROUP — so cells match the oracle's
    conditional-aggregation form bit-for-bit. The IN-list is explicit
    ('O','F','P' — the fixture's status domain), which is what makes
    PIVOT plannable without a pre-scan; the oracle mirrors it with the
    same three CASE arms. Calcite 1.17 had no PIVOT (added in 1.21+),
    so this extends the reference surface."""
    from kt_sql_hbase_ex_spark.functions.money import _emit

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    piv = spark.sql(
        """
        SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(o_totalprice * 1000000 +
                        (CASE WHEN o_totalprice >= 0 THEN 0.5D ELSE -0.5D END)
                        AS BIGINT) AS micros
            FROM orders
        ) PIVOT (
            SUM(micros) AS s, COUNT(micros) AS n
            FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p)
        )
        """
    )
    return piv.select(
        "o_orderpriority",
        F.col("o_n").alias("open_cnt"),
        F.col("f_n").alias("filled_cnt"),
        F.col("p_n").alias("partial_cnt"),
        _emit(F.col("o_s"), 2).alias("open_rev"),
        _emit(F.col("f_s"), 2).alias("filled_rev"),
        _emit(F.col("p_s"), 2).alias("partial_rev"),
    )
