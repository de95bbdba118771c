"""Data-quality audit operators — constraint checking as queries.

The reference *enforces* its two schema rules at create time (mandatory
PK + reserved ``id`` column, ``hbase/HBaseSchema.kt:113-136``) and trusts
HBase for the rest. An analytics engine over immutable files inverts
this: constraints are *audited* by queries over the data — the
expectation-suite pattern (null rates, key uniqueness, referential
integrity, domain ranges) every warehouse and training-data pipeline
runs before trusting a snapshot.

Scale design: one aggregate PASS per table — all row-local checks for a
table fold into a single map-side-combined aggregate (never one scan
per constraint); key uniqueness is a groupBy on the key; referential
integrity is an anti-join on the FK (broadcast when the parent is
dimension-sized, shuffle-on-key when both sides are facts). The report
itself is a union of one-row aggregates — driver-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


def _check(name: str, n_checked, n_violations):
    return F.struct(
        F.lit(name).alias("check_name"),
        n_checked.cast("bigint").alias("n_checked"),
        n_violations.cast("bigint").alias("n_violations"),
        (n_violations == 0).alias("ok"),
    )


@query(
    "qa01_constraint_audit",
    oracle="""
    SELECT check_name, n_checked, n_violations, n_violations = 0 AS ok
    FROM (
    SELECT 'orders.o_custkey_not_null' AS check_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_custkey IS NULL) AS n_violations
    UNION ALL
    SELECT 'orders.o_totalprice_positive',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'orders.o_orderkey_unique',
           (SELECT COUNT(*) FROM orders),
           (SELECT COALESCE(SUM(n - 1), 0) FROM
               (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey) g
            WHERE n > 1)
    UNION ALL
    SELECT 'orders.o_custkey_in_customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
    UNION ALL
    SELECT 'lineitem.l_orderkey_in_orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
    UNION ALL
    SELECT 'lineitem.l_discount_in_0_1',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1)
    ) checks
    """,
)
def qa01_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit over the star schema: NOT NULL, domain range,
    PK uniqueness, and two FK referential-integrity checks, reported as
    (check, n_checked, n_violations, ok) rows. The three row-local
    orders checks share ONE scan/aggregate; uniqueness piggybacks on a
    key groupBy; RI orphans are anti-joins (customer side broadcast —
    it is the dimension; lineitem⋈orders shuffles on the key, the
    correct shape when both sides are facts)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # one pass: every row-local orders check in a single aggregate.
    # The one-row result feeds o_checks AND the RI totals — materialize
    # it so the second consumer reuses the row instead of re-expanding
    # the full orders scan (round-5 multi-scan audit)
    o = orders.agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_custkey").isNull().cast("bigint")).alias("n_null_cust"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias("n_bad_price"),
    ).localCheckpoint()
    o_checks = o.select(
        F.explode(
            F.array(
                _check("orders.o_custkey_not_null", F.col("n"), F.col("n_null_cust")),
                _check("orders.o_totalprice_positive", F.col("n"), F.col("n_bad_price")),
            )
        ).alias("c")
    )

    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("k"))
        .agg(
            F.sum("k").alias("n"),
            F.coalesce(F.sum(F.when(F.col("k") > 1, F.col("k") - 1)), F.lit(0)).alias(
                "extra"
            ),
        )
        .select(_check("orders.o_orderkey_unique", F.col("n"), F.col("extra")).alias("c"))
    )

    # RI checks reuse the totals already computed by the single-pass
    # aggregates (o above, li below) — no count-only re-scan of either
    # table; both one-row sides join by broadcast.
    orphan_orders = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("orphans"))
        .join(F.broadcast(o.select("n")))
        .select(
            _check("orders.o_custkey_in_customer", F.col("n"), F.col("orphans")).alias("c")
        )
    )

    li = lineitem.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("bigint")).alias(
            "bad"
        ),
    ).localCheckpoint()  # one row, doubly consumed (li_checks + RI total)

    orphan_li = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("orphans"))
        .join(F.broadcast(li.select("n")))
        .select(
            _check("lineitem.l_orderkey_in_orders", F.col("n"), F.col("orphans")).alias("c")
        )
    )

    li_checks = li.select(
        _check("lineitem.l_discount_in_0_1", F.col("n"), F.col("bad")).alias("c")
    )

    report = o_checks.unionByName(dup).unionByName(orphan_orders).unionByName(
        orphan_li
    ).unionByName(li_checks)
    return report.select("c.check_name", "c.n_checked", "c.n_violations", "c.ok")


@query(
    "qa02_event_conformance",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT) AS n_null_user,
           CAST(COUNT(CASE WHEN event_type NOT IN
                ('view','click','purchase','signup','error') THEN 1 END) AS BIGINT)
               AS n_unknown_type,
           CAST(COUNT(CASE WHEN ts < TIMESTAMP '2020-01-01'
                             OR ts >= TIMESTAMP '2030-01-01' THEN 1 END) AS BIGINT)
               AS n_ts_out_of_range,
           CAST(COUNT(CASE WHEN props IS NULL OR NOT json_valid(props)
                             OR json_extract_string(props, '$.k') IS NULL
                           THEN 1 END) AS BIGINT)
               AS n_missing_prop_k
    FROM events
    """,
)
def qa02_event_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-feed conformance: null keys, unknown event types, timestamp
    sanity range, and required-JSON-property presence — all folded into
    ONE map-side-combined aggregate over one scan (the shape that audits
    100 TB of landed events at scan speed). JSON presence uses the same
    ``get_json_object`` path st05 lands data with, so the audit checks
    what the pipeline would actually read."""
    e = load_table(spark, sf_dir, "events")
    known = ("view", "click", "purchase", "signup", "error")
    return e.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_null_user"),
        F.count(F.when(~F.col("event_type").isin(*known), 1)).alias("n_unknown_type"),
        F.count(
            F.when(
                (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2030-01-01").cast("timestamp")),
                1,
            )
        ).alias("n_ts_out_of_range"),
        F.count(
            F.when(F.get_json_object("props", "$.k").isNull(), 1)
        ).alias("n_missing_prop_k"),
    )


#: qa03: header/detail totals agreeing within this many cents pass
RECON_TOLERANCE_CENTS = 1


@query(
    "qa03_header_detail_reconciliation",
    oracle=f"""
    WITH line_sums AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT)) AS line_micros
        FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
        SELECT o.o_orderstatus,
               CAST(ROUND(o.o_totalprice * 1000000) AS BIGINT) AS header_micros,
               ls.line_micros
        FROM orders o LEFT JOIN line_sums ls ON ls.l_orderkey = o.o_orderkey
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN line_micros IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_childless,
           CAST(SUM(CASE WHEN line_micros IS NOT NULL
                          AND ABS(header_micros - line_micros)
                              > {RECON_TOLERANCE_CENTS} * 10000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           CAST(MAX(CASE WHEN line_micros IS NOT NULL
                         THEN ABS(header_micros - line_micros) END) // 10000
                AS BIGINT) AS max_abs_diff_cents
    FROM joined GROUP BY o_orderstatus
    """,
)
def qa03_header_detail_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation — the cross-table audit every
    finance-adjacent warehouse runs: each order's header total compared
    against the sum of its line items, reported per status as childless
    headers, tolerance-breaking mismatches (> {RECON_TOLERANCE_CENTS}
    cent), and the worst absolute gap. The comparison runs entirely in
    micro-unit integers (functions/money.py recipe), so the mismatch
    classification is exact and engine-identical — a double-sum
    comparison would flag phantom half-cent mismatches at scale. Scale
    shape: lineitem pre-aggregates to order grain FIRST (the shuffle
    carries one long per order, not line rows), then a key-partitioned
    fact⋈fact join with the header; per-status report is driver-sized.
    The fixture's generator does not enforce the invariant, so non-zero
    mismatch counts are the *finding*, not an error — the audit report
    is the operator under test."""
    from kt_sql_hbase_ex_spark.functions.money import _micros

    li = load_table(spark, sf_dir, "lineitem")
    line_sums = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(_micros(F.col("l_extendedprice"))).alias("line_micros")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", _micros(F.col("o_totalprice")).alias("header_micros")
    )
    joined = o.join(line_sums, "o_orderkey", "left")
    diff = F.abs(F.col("header_micros") - F.col("line_micros"))
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("line_micros").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_childless"),
        F.sum(
            F.when(
                F.col("line_micros").isNotNull()
                & (diff > RECON_TOLERANCE_CENTS * 10000),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mismatched"),
        (F.max(F.when(F.col("line_micros").isNotNull(), diff)) / F.lit(10000))
        .cast("bigint")
        .alias("max_abs_diff_cents"),
    )


#: qa04 drift monitor: fixed equi-width value buckets (the a15 rule —
#: data-independent, so bucketing is pure row-local arithmetic and the
#: two periods are bucketed identically), Laplace-smoothed shares.
PSI_BUCKETS = 10
PSI_LO, PSI_HI = 0.0, 500.0
_PSI_W = (PSI_HI - PSI_LO) / PSI_BUCKETS
_PSI_EPS = 0.5  # Laplace pseudo-count: keeps ln() finite on empty buckets


@query(
    "qa04_distribution_drift",
    oracle=f"""
    WITH bucketed AS (
        SELECT LEAST(CAST(FLOOR((value - {PSI_LO}) / {_PSI_W}) AS INT),
                     {PSI_BUCKETS - 1}) AS bucket,
               CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) % 2 AS period
        FROM events
    ),
    counts AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
               CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        FROM bucketed GROUP BY bucket
    ),
    tot AS (
        SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts
    ),
    shares AS (
        SELECT bucket, n_ref, n_cur,
               (n_ref + {_PSI_EPS}) / (t_ref + {_PSI_EPS} * {PSI_BUCKETS}) AS p_ref,
               (n_cur + {_PSI_EPS}) / (t_cur + {_PSI_EPS} * {PSI_BUCKETS}) AS p_cur
        FROM counts CROSS JOIN tot
    )
    SELECT bucket, n_ref, n_cur,
           ROUND(p_ref, 6) AS p_ref,
           ROUND(p_cur, 6) AS p_cur,
           ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_contrib
    FROM shares
    """,
)
def qa04_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor — the data-quality gate
    a training/scoring pipeline runs before trusting a new data window:
    the event-value distribution of the CURRENT period (odd epoch-days)
    against the REFERENCE period (even epoch-days), per fixed
    equi-width bucket, with each bucket's PSI contribution
    ``(p_cur − p_ref)·ln(p_cur/p_ref)`` (sum = the PSI; > 0.2 is the
    conventional act threshold). Laplace smoothing ({_PSI_EPS}
    pseudo-count over {PSI_BUCKETS} fixed buckets) keeps the log finite
    when a bucket empties in one period — and a bucket empty in BOTH
    periods contributes exactly 0, so reporting observed buckets only
    loses nothing. Shapes: bucketing and period assignment are
    row-local arithmetic (data-independent bounds, the a15 rule), both
    periods fold into ONE conditional map-side-combined aggregate (one
    corpus pass, never a scan per period), and the totals broadcast
    back onto the {PSI_BUCKETS}-row bucket relation — every post-scan
    operator is bucket-cardinality-sized at any corpus scale."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor((F.col("value") - PSI_LO) / _PSI_W).cast("int"),
        F.lit(PSI_BUCKETS - 1),
    )
    period = (F.unix_timestamp("ts") / 86400).cast("bigint") % 2
    counts = (
        e.select(bucket.alias("bucket"), period.alias("period"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("n_cur"),
        )
        # feeds BOTH the totals and the shares: materialize the
        # bucket-cardinality relation once so the corpus is scanned
        # once (the d03/ev07 multi-consumer discipline; plan-pinned)
        .localCheckpoint()
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    shares = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + _PSI_EPS) / (F.col("t_ref") + _PSI_EPS * PSI_BUCKETS)).alias(
            "p_ref"
        ),
        ((F.col("n_cur") + _PSI_EPS) / (F.col("t_cur") + _PSI_EPS * PSI_BUCKETS)).alias(
            "p_cur"
        ),
    )
    return shares.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_ref"))
            * F.log(F.col("p_cur") / F.col("p_ref")),
            6,
        ).alias("psi_contrib"),
    )
