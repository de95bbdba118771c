"""Batch event analytics over ``events`` — sessionization, funnel
conversion, cohort retention, session path transitions.

No reference analog (the reference stops at SQL-over-HBase scans,
``hbase/HBaseFilterableTable.kt:28-45``); these are the product-analytics
operators every event warehouse layers on top of a raw event table, and
none of them is a Spark built-in — each is expressed as the composition
of DataFrame ops with the right shuffle profile for 100 TB of events.

Scale design:
* sessionization — the naive formulation is a self-join per event pair;
  implemented instead as ONE shuffle on ``user_id`` + a lag/cumsum
  window to assign session ids, and the per-session aggregate reuses the
  window's hash partitioning (grouping keys are a superset of the
  partition key, so EnsureRequirements inserts no second exchange).
  Linear state, no join.
* funnel — the textbook formulation is one aggregate+join per step
  (K shuffles for a K-step funnel). Implemented as a single groupBy
  that collects each user's step events into a sorted array and runs
  the step state machine as an ``aggregate`` lambda (JVM higher-order,
  no Python): ONE shuffle regardless of K. Greedy earliest-match is
  exact for "did an increasing step subsequence exist" semantics. The
  oracle replays the K-join chain — two independent formulations, one
  answer. Per-user arrays hold only funnel-step events (bounded per
  user); a pathological power user degrades one task, not the stage.
* retention — DISTINCT (user, week) first (shrinks events to at most
  users x weeks before anything joins), then the per-user cohort week
  and the activity join both reuse the ``user_id`` hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.functions.money import exact_sum_sql
from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table

#: Inactivity gap that closes a session.
SESSION_GAP_MINUTES = 60

#: Ordered funnel steps (event_type values in the events fixture).
FUNNEL_STEPS = ("view", "click", "purchase")


def session_assignments(e: DataFrame, *carry: str) -> DataFrame:
    """(user_id, ts, session_seq, *carry) with gap-based session
    numbering — the shared first stage of ev01/ev04: one shuffle on
    user_id, lag() marks session starts, a running sum over the same
    window numbers them."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MINUTES * 60 * 1_000_000
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > gap_us), 1
    ).otherwise(0)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        *carry,
        F.sum(new_sess)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_seq"),
    )


@query(
    "ev01_sessionize",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP_MINUTES} minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM seq
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def ev01_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session ends after
    {SESSION_GAP_MINUTES} minutes of inactivity. lag() marks session
    starts, a running sum over the same window numbers them, and the
    per-session rollup groups on (user_id, session_seq) — a superset of
    the window's user_id hash partitioning, so the whole operator is ONE
    shuffle end to end. This is the batch twin of st03's streaming
    session window (state-store sessions vs. window-function sessions)."""
    e = load_table(spark, sf_dir, "events")
    sess = session_assignments(e, "value")
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _funnel_oracle(window_hours: int | None = None) -> str:
    """Greedy MIN-chain funnel oracle; with ``window_hours`` each step
    additionally binds to within that many hours of the previous match
    (first-touch attribution — the same rule the Spark state machine
    implements, so both variants generate from one recipe)."""
    v, c, p = FUNNEL_STEPS

    def bound(prev: str) -> str:
        if window_hours is None:
            return ""
        return f" AND e.ts <= {prev} + INTERVAL '{window_hours} hours'"

    return f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = '{v}' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1{bound("s1.t1")}
        WHERE e.event_type = '{c}' GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2{bound("s2.t2")}
        WHERE e.event_type = '{p}' GROUP BY e.user_id
    ),
    counts AS (
                  SELECT 1 AS step_idx, '{v}' AS step, COUNT(*) AS n FROM s1
        UNION ALL SELECT 2, '{c}', COUNT(*) FROM s2
        UNION ALL SELECT 3, '{p}', COUNT(*) FROM s3
    )
    SELECT step_idx, step, CAST(n AS BIGINT) AS n_users,
           ROUND(CAST(n AS DOUBLE)
                 / NULLIF(MAX(CASE WHEN step_idx = 1 THEN n END) OVER (), 0),
                 4) AS pct_of_first
    FROM counts
    """


def _run_funnel(spark: SparkSession, sf_dir: str, win_us: int | None = None) -> DataFrame:
    """Shared funnel engine behind ev02/ev06: one groupBy collects each
    user's step events time-sorted (ties broken by step rank), an
    ``aggregate`` lambda runs the greedy state machine — with an
    optional per-step conversion window checked against the
    accumulator's last-match timestamp — and the counts explode into
    the 3-row report. ONE event shuffle either way."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*FUNNEL_STEPS)
    )
    rank_col = F.when(F.col("event_type") == FUNNEL_STEPS[0], 0)
    for i, st in list(enumerate(FUNNEL_STEPS))[1:]:
        rank_col = rank_col.when(F.col("event_type") == st, i)
    per_user = e.select(
        "user_id", F.struct(F.col("ts"), rank_col.alias("step")).alias("ev")
    ).groupBy("user_id").agg(F.sort_array(F.collect_list("ev")).alias("evs"))

    def _advance(acc, ev):
        out = acc
        # innermost-first: later whens win only if earlier didn't match
        for i in range(len(FUNNEL_STEPS)):
            in_window = (
                F.lit(True)
                if win_us is None or i == 0
                else F.unix_micros(ev["ts"]) - F.unix_micros(acc["t"]) <= win_us
            )
            out = F.when(
                (acc["depth"] == i) & (ev["step"] == i) & in_window,
                F.struct(F.lit(i + 1).alias("depth"), ev["ts"].alias("t")),
            ).otherwise(out)
        return out

    depth = per_user.select(
        "user_id",
        F.aggregate(
            "evs",
            F.struct(
                F.lit(0).alias("depth"), F.lit(None).cast("timestamp").alias("t")
            ),
            _advance,
        )["depth"].alias("depth"),
    )
    counts = depth.agg(
        *[
            # coalesce: with zero funnel users the report must say 0
            # (the oracle's COUNT does), not a sum-over-empty NULL
            F.coalesce(
                F.sum((F.col("depth") >= i + 1).cast("bigint")), F.lit(0)
            ).alias(f"n{i + 1}")
            for i in range(len(FUNNEL_STEPS))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_idx"),
                        F.lit(st).alias("step"),
                        F.col(f"n{i + 1}").alias("n_users"),
                        F.round(
                            F.col(f"n{i + 1}") / F.nullif(F.col("n1"), F.lit(0)), 4
                        ).alias("pct_of_first"),
                    )
                    for i, st in enumerate(FUNNEL_STEPS)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step_idx", "r.step", "r.n_users", "r.pct_of_first")


@query("ev02_funnel", oracle=_funnel_oracle())
def ev02_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): how many users reached
    each step via an increasing-timestamp subsequence. Greedy earliest-
    match per step is exact for subsequence-existence semantics; the
    oracle replays the K-join chain — two independent formulations, one
    answer. ONE shuffle for any number of steps vs the oracle's
    aggregate+join per step; at 100 TB the difference is K-1 full event
    shuffles. Engine shared with ev06 (``_run_funnel``)."""
    return _run_funnel(spark, sf_dir)


@query(
    "ev03_retention_cohorts",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
    )
    SELECT cohort.cohort_week,
           CAST(date_diff('day', cohort.cohort_week, activity.week) / 7 AS INT)
               AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity JOIN cohort ON activity.user_id = cohort.user_id
    GROUP BY 1, 2
    """,
)
def ev03_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-activity week,
    counted in each later activity week (offset in weeks). DISTINCT
    (user, week) runs FIRST so everything downstream is at most
    users × weeks — at 100 TB that single projection is what makes the
    operator feasible; the cohort aggregate and the activity⋈cohort join
    then reuse the same user_id hash partitioning (no extra exchange
    for the join's left side)."""
    e = load_table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "ev04_session_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '{SESSION_GAP_MINUTES} minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, ts, event_type,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM seq
    ),
    steps AS (
        SELECT event_type AS to_type,
               lag(event_type) OVER (PARTITION BY user_id, session_seq
                                     ORDER BY ts, event_id) AS from_type
        FROM sess
    ),
    trans AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM steps WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6)
               AS p_transition
    FROM trans
    """,
)
def ev04_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: the within-session event-type transition
    matrix (empirical first-order Markov chain — P(next step | step),
    the input to flow/sankey views and next-action models). Reuses
    ev01's session assignment; the transition lag partitions by
    (user_id, session_seq) — a superset of the session window's user_id
    hash partitioning, so no second event shuffle, just a re-sort; the
    final count shuffles only the |types|² transition matrix. The
    per-from normalization windows over that matrix (driver-scale)."""
    e = load_table(spark, sf_dir, "events")
    sess = session_assignments(e, "event_type")
    w2 = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    steps = sess.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w2).alias("from_type"),
    )
    trans = (
        steps.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    w_from = W.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("p_transition"),
    )


#: trailing window (days) for the anomaly baseline, and the z threshold
ANOMALY_BASELINE_DAYS = 7
ANOMALY_Z = 2.0


@query(
    "ev05_volume_anomalies",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, day, n,
               AVG(n) OVER w AS mu,
               STDDEV_SAMP(n) OVER w AS sigma,
               COUNT(*) OVER w AS n_baseline
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {ANOMALY_BASELINE_DAYS} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n,
           ROUND(mu, 4) AS baseline_mean,
           CASE WHEN sigma > 0 THEN ROUND((n - mu) / sigma, 4) END AS z,
           (n_baseline >= 3 AND sigma > 0
            AND ABS((n - mu) / sigma) > {ANOMALY_Z}) AS is_anomaly
    FROM scored
    """,
)
def ev05_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection: each day's event count per type scored
    against the TRAILING {ANOMALY_BASELINE_DAYS}-day baseline (mean/
    stddev over a ROWS frame ending at the PREVIOUS day — the day under
    test never contaminates its own baseline). One shuffle to the daily
    aggregate, one series-key window over the (types × days)-sized
    result — monitoring 100 TB/day of events costs the daily rollup,
    which the st07-style incremental MV already maintains. Warm-up days
    (baseline < 3 points) and zero-variance baselines are explicitly
    not-anomalous rather than NaN."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ANOMALY_BASELINE_DAYS, -1)
    )
    mu = F.avg("n").over(w)
    sigma = F.stddev_samp("n").over(w)
    n_base = F.count("*").over(w)
    z = (F.col("n") - mu) / sigma
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(mu, 4).alias("baseline_mean"),
        F.when(sigma > 0, F.round(z, 4)).alias("z"),
        (
            (n_base >= 3) & sigma.isNotNull() & (sigma > 0) & (F.abs(z) > ANOMALY_Z)
        ).alias("is_anomaly"),
    )


#: max gap between consecutive funnel steps for ev06 (hours)
CONVERSION_WINDOW_HOURS = 24


@query("ev06_funnel_windowed", oracle=_funnel_oracle(CONVERSION_WINDOW_HOURS))
def ev06_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: each next step must land within
    {CONVERSION_WINDOW_HOURS}h of the previous step's match — the form
    product funnels actually ship (first-touch attribution: the chain
    anchors on the user's FIRST step-1 event, matching the oracle's
    greedy MIN chain; both sides implement the same attribution rule).
    Same single-shuffle state machine as ev02 (``_run_funnel``), with
    the window bound checked against the accumulator's last match."""
    return _run_funnel(
        spark, sf_dir, win_us=CONVERSION_WINDOW_HOURS * 3600 * 1_000_000
    )


@query(
    "ev07_rfm_segments",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               epoch_us(MAX(ts)) AS recency,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS monetary_c
        FROM events GROUP BY user_id
    ),
    cuts AS (
        SELECT PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY recency)   AS r1,
               PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY recency)   AS r2,
               PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY recency)   AS r3,
               PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY frequency) AS f1,
               PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY frequency) AS f2,
               PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY frequency) AS f3,
               PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY monetary_c) AS m1,
               PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY monetary_c) AS m2,
               PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY monetary_c) AS m3
        FROM per_user
    )
    SELECT CASE WHEN recency <= r1 THEN 1 WHEN recency <= r2 THEN 2
                WHEN recency <= r3 THEN 3 ELSE 4 END AS r_q,
           CASE WHEN frequency <= f1 THEN 1 WHEN frequency <= f2 THEN 2
                WHEN frequency <= f3 THEN 3 ELSE 4 END AS f_q,
           CASE WHEN monetary_c <= m1 THEN 1 WHEN monetary_c <= m2 THEN 2
                WHEN monetary_c <= m3 THEN 3 ELSE 4 END AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user CROSS JOIN cuts
    GROUP BY 1, 2, 3
    """,
)
def ev07_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: users quartiled on recency / frequency /
    monetary and counted per (R,F,M) cell. Scale-right form: NOT a
    global ntile (single-task sort over every user) — per-user metrics
    aggregate first (one shuffle), the three quartile cut-points reduce
    to ONE row that broadcasts back, and bucket assignment is a
    map-side CASE. Cross-engine exactness: all three metrics are
    INTEGERS (epoch micros, counts, exact money micros), and the cuts
    are PERCENTILE_DISC — an actual data value, so each cut is an exact
    integer in both engines with no interpolation formula to diverge by
    an ulp (a CONT cut computed as lo+(hi-lo)·f vs (1-f)·lo+f·hi can
    differ in the last bit, and an integer metric equal to a cut
    boundary would then land in different cells per engine)."""
    from kt_sql_hbase_ex_spark.functions.money import _micros

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("recency"),
        F.count("*").alias("frequency"),
        F.sum(_micros(F.col("value"))).alias("monetary_c"),
    ).localCheckpoint()  # feeds cuts AND assignment: aggregate events once
    cuts = per_user.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m})"
            ).alias(f"{m[0]}{i + 1}")
            for m in ("recency", "frequency", "monetary_c")
            for i, p in enumerate((0.25, 0.50, 0.75))
        ]
    )

    def bucket(metric, c1, c2, c3):
        return (
            F.when(F.col(metric) <= F.col(c1), 1)
            .when(F.col(metric) <= F.col(c2), 2)
            .when(F.col(metric) <= F.col(c3), 3)
            .otherwise(4)
        )

    return (
        per_user.join(F.broadcast(cuts))
        .groupBy(
            bucket("recency", "r1", "r2", "r3").alias("r_q"),
            bucket("frequency", "f1", "f2", "f3").alias("f_q"),
            bucket("monetary_c", "m1", "m2", "m3").alias("m_q"),
        )
        .agg(F.count("*").alias("n_users"))
    )


#: rolling-active window (days) for ev08's WAU
STICKINESS_WINDOW_DAYS = 7


@query(
    "ev08_engagement_stickiness",
    oracle=f"""
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
    ),
    contrib AS (
        SELECT DISTINCT user_id, day + i * INTERVAL 1 DAY AS day
        FROM activity,
             LATERAL (SELECT unnest(generate_series(0, {STICKINESS_WINDOW_DAYS - 1})) AS i)
    ),
    wau AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM contrib GROUP BY day
    ),
    dau AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM activity GROUP BY day
    )
    SELECT d.day, d.dau, w.wau,
           ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON w.day = d.day
    """,
)
def ev08_engagement_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU engagement stickiness — the product-health ratio every
    event pipeline reports. The rolling {STICKINESS_WINDOW_DAYS}-day
    distinct-user count is NOT a window function (COUNT(DISTINCT) over
    a moving frame would hold per-frame user sets in window state):
    each (user, active-day) row EXPLODES forward onto the
    {STICKINESS_WINDOW_DAYS} days it keeps the user "weekly active" —
    a map-side ×{STICKINESS_WINDOW_DAYS} expand of the already
    day-deduped activity — and one distinct-aggregate per day does the
    rest. Scale: activity is (users × days)-sized, the expand is linear
    in it, shuffles are keyed by day; the inner join to DAU days drops
    the phantom tail past the last observed day. The oracle replays
    the identical expand with generate_series."""
    e = load_table(spark, sf_dir, "events")
    activity = (
        e.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        # (users x days)-sized and consumed by BOTH dau and the wau
        # expand: materialize once or the events scan + distinct shuffle
        # run twice (the d03/ev07 double-consumption discipline)
        .localCheckpoint()
    )
    contrib = activity.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(day, day + interval {STICKINESS_WINDOW_DAYS - 1} days,"
                " interval 1 day)"
            )
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = activity.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )


@query(
    "ev09_native_session_window",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '{SESSION_GAP_MINUTES} minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM seq
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_last,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {exact_sum_sql("value")} AS total_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def ev09_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's BUILT-IN ``session_window`` — the
    same gap sessions ev01 derives with lag/cumsum window functions,
    expressed as one declarative aggregate Catalyst plans natively
    (``SessionWindow`` + ``MergingSessionsExec``: sessions merge during
    aggregation, no analytic-window pass at all). This is the batch
    twin of st03's streaming session window, and the A/B against ev01
    pins the two formulations' one semantic difference: the built-in
    window is half-open, so a gap of EXACTLY {SESSION_GAP_MINUTES}
    minutes starts a new session (>= in the oracle) where ev01's
    strict-> keeps it. Scale: one shuffle on the session keys, sessions
    merge map-side within partitions first; at 100 TB this is the form
    that also runs incrementally under Structured Streaming unchanged.
    Money totals are exact micro-unit fixed point."""
    from kt_sql_hbase_ex_spark.functions.money import exact_sum

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MINUTES} minutes"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count("*").alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
        .select(
            "user_id", "session_start", "session_last", "n_events", "total_value"
        )
    )


@query(
    "ev10_cohort_ltv",
    oracle=f"""
    WITH cohort AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ),
    weekly AS (
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
               SUM(CAST(ROUND(e.value * 1000000) AS BIGINT)) AS rev_micros
        FROM events e JOIN cohort c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ),
    sized AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM cohort GROUP BY cohort_week
    )
    SELECT w.cohort_week, w.week_offset, s.cohort_users,
           CAST(SUM(w.rev_micros) OVER (PARTITION BY w.cohort_week
                ORDER BY w.week_offset
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_micros,
           ROUND(CAST(SUM(w.rev_micros) OVER (PARTITION BY w.cohort_week
                ORDER BY w.week_offset ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / 1000000 / s.cohort_users, 4) AS ltv_per_user
    FROM weekly w JOIN sized s ON s.cohort_week = w.cohort_week
    """,
)
def ev10_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — ev03's retention grid with money
    on it: purchase revenue per (signup-week cohort × week offset),
    accumulated into the running LTV-per-user a growth team reads off.
    Scale shape: the per-user cohort week is ONE user_id aggregate that
    joins back on the same key partitioning; revenue buckets to the
    (cohorts × offsets)-sized grid BEFORE the cumulative window, so the
    running sum and the per-user division run over a driver-scale
    relation. Revenue accumulates in exact micro-unit integers
    (functions/money.py) — a cumulative double window compounds
    reordering error with every step — and only the final per-user
    ratio is a rounded double of an exact integer."""
    from kt_sql_hbase_ex_spark.functions.money import _micros

    e = load_table(spark, sf_dir, "events")
    # (user_id, cohort_week) feeds BOTH the revenue join and the cohort
    # sizing — materialize the user-cardinality relation once instead of
    # re-running the corpus-wide user aggregate per consumer (multi-scan
    # audit). One slim row per user is far cheaper than a second events
    # pass; on a lossy cluster swap localCheckpoint for a replicated
    # persist/reliable checkpoint (SCALE.md §6 note) — localCheckpoint
    # trades executor-loss recoverability for speed.
    cohort = (
        e.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
        .localCheckpoint()
    )
    weekly = (
        e.filter(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.sum(_micros(F.col("value"))).alias("rev_micros"))
    )
    sized = cohort.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    w_cum = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("rev_micros").over(w_cum)
    return weekly.join(sized, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "cohort_users",
        cum.alias("cum_rev_micros"),
        F.round(
            cum.cast("double") / F.lit(1_000_000) / F.col("cohort_users"), 4
        ).alias("ltv_per_user"),
    )


#: ev11: deterministic experiment assignment — content-stable user-hash
#: parity (the tr01 split rule at 2 buckets): stable across engines,
#: layouts, and re-runs, which is what makes the analysis replayable.
_AB_ARM_SQL = (
    "CAST(('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2"
)
_AB_ARM_SPARK = (
    "pmod(conv(substring(md5(concat('ab:', cast(user_id AS STRING))), 1, 8), 16, 10), 2)"
)


@query(
    "ev11_ab_test_lift",
    oracle=f"""
    WITH assigned AS (
        SELECT user_id, {_AB_ARM_SQL} AS arm,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       > SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
        FROM assigned
    )
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(conv_a * 1.0 / n_a, 6) AS cvr_a,
           ROUND(conv_b * 1.0 / n_b, 6) AS cvr_b,
           ROUND(conv_b * 1.0 / n_b - conv_a * 1.0 / n_a, 6) AS abs_lift,
           ROUND((conv_b * 1.0 / n_b - conv_a * 1.0 / n_a)
                 / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
    FROM arms
    """,
)
def ev11_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned to
    two arms, per-arm conversion (more purchases than clicks — a
    scale-invariant per-user predicate, interior at every fixture sf),
    absolute lift, and the pooled two-proportion z-statistic — the
    significance number an experimentation platform serves. Shapes: ONE
    user-keyed aggregate collapses events to (user, arm, converted) —
    two conditional counts, map-side combined — then a conditional
    one-row rollup (the a09 pivot pattern) computes both arms without a
    second pass or a join; the z formula is pure arithmetic on that
    driver-sized row, with ``try_divide`` so a degenerate pool (all or
    none converted) yields NULL in BOTH engines (DuckDB float division
    by zero is NULL) instead of an ANSI error. At 100 TB: shuffle ∝
    users, never events; assignment is the same content-stable hash the
    split/sample family uses, so the experiment population is
    reproducible anywhere (``rand()`` assignment would resample per
    run — the classic invalid-experiment bug)."""
    e = load_table(spark, sf_dir, "events")
    assigned = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                > F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            )
            .cast("int")
            .alias("converted")
        )
        .withColumn("arm", F.expr(_AB_ARM_SPARK))
    )
    arms = assigned.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    cvr_a = F.try_divide(F.col("conv_a"), F.col("n_a"))
    cvr_b = F.try_divide(F.col("conv_b"), F.col("n_b"))
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    z = F.try_divide(
        cvr_b - cvr_a,
        F.sqrt(pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))),
    )
    return arms.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(cvr_a, 6).alias("cvr_a"),
        F.round(cvr_b, 6).alias("cvr_b"),
        F.round(cvr_b - cvr_a, 6).alias("abs_lift"),
        F.round(z, 6).alias("z_score"),
    )
