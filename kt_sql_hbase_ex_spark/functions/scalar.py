"""Scalar functions: string / math / datetime / conditional — SURVEY.md §2.3.

Reference analog: Calcite's ``SqlStdOperatorTable`` scalar set evaluated
by the Enumerable engine / RexExecutor (``build.gradle:28``). The Spark
builtin library is a superset; these queries pin the shared core with
oracle checks so semantics (1-based SUBSTRING, HALF_UP ROUND, EXTRACT
fields, CASE/COALESCE/NULLIF null behavior) provably match ANSI.

All expressions are JVM-side builtins — whole-stage-codegen'd, no Python
in the row path (UDF registration itself is exercised in
functions/text.py where Python is genuinely needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


@query(
    "f01_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                       AS name_upper,
           LOWER(p_brand)                      AS brand_lower,
           SUBSTRING(p_type, 1, 4)             AS type_prefix,
           CAST(LENGTH(p_name) AS INTEGER)     AS name_len,
           TRIM(CONCAT('  ', p_brand, '  '))   AS brand_trimmed,
           CONCAT(p_brand, ':', p_type)        AS brand_type,
           REPLACE(p_brand, 'Brand#', 'B')     AS brand_short,
           CAST(POSITION('#' IN p_brand) AS INTEGER) AS hash_pos,
           (p_type LIKE 'PROMO%')              AS is_promo
    FROM part WHERE p_partkey <= 50
    """,
)
def f01_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPPER/LOWER/SUBSTRING(1-based)/LENGTH/TRIM/CONCAT/REPLACE/
    POSITION/LIKE — the reference's Calcite string set."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trimmed"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.instr(F.col("p_brand"), "#").cast("int").alias("hash_pos"),
        F.col("p_type").like("PROMO%").alias("is_promo"),
    )


@query(
    "f02_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice - 1000.0), 2)      AS abs_diff,
           CAST(MOD(CAST(l_quantity AS INTEGER), 7) AS INTEGER) AS qty_mod7,
           FLOOR(l_extendedprice / 100.0)               AS price_bucket,
           CEIL(l_discount * 100.0)                     AS disc_pct_ceil,
           ROUND(POWER(l_quantity, 2.0), 2)             AS qty_sq,
           ROUND(LN(l_extendedprice + 1.0), 6)          AS log_price,
           ROUND(SQRT(l_quantity), 6)                   AS sqrt_qty,
           ROUND(EXP(l_discount), 6)                    AS exp_disc
    FROM lineitem WHERE l_orderkey <= 50
    """,
)
def f02_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABS/MOD/FLOOR/CEIL/POWER/LN/SQRT/EXP/ROUND — Calcite math set.
    Transcendentals rounded to 6dp: libm ulp differences across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 50)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 2).alias("abs_diff"),
        (F.col("l_quantity").cast("int") % 7).cast("int").alias("qty_mod7"),
        F.floor(F.col("l_extendedprice") / 100.0).alias("price_bucket"),
        F.ceil(F.col("l_discount") * 100.0).alias("disc_pct_ceil"),
        F.round(F.pow(F.col("l_quantity"), 2.0), 2).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("log_price"),
        F.round(F.sqrt(F.col("l_quantity")), 6).alias("sqrt_qty"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
    )


@query(
    "f03_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR  FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(DAY   FROM o_orderdate) AS INTEGER) AS order_day,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY                    AS due_date,
           CAST(o_orderdate AS DATE)                        AS order_date_d,
           CAST(DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start
    FROM orders WHERE o_orderkey <= 100
    """,
)
def f03_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT/DATE_TRUNC/interval arithmetic/CAST-to-DATE/day difference
    — Calcite temporal set (reference stored these as epoch ints,
    SURVEY §1.3; Spark uses real temporal types)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.col("o_orderdate").cast("date").alias("order_date_d"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@query(
    "f04_conditional_functions",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                                  AS balance_tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment_or_default,
           (c_acctbal > 0)                                       AS is_positive,
           CAST(c_nationkey AS BIGINT)                           AS nationkey_big,
           ROUND(CAST(c_acctbal AS DOUBLE) / 100.0, 4)           AS acctbal_hundreds
    FROM customer WHERE c_custkey <= 200
    """,
)
def f04_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/CAST — Calcite conditional set. NULLIF
    manufactures NULLs (fixtures have none) so COALESCE's null handling
    is actually exercised."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "segment_or_default"
        ),
        (F.col("c_acctbal") > 0).alias("is_positive"),
        F.col("c_nationkey").cast("bigint").alias("nationkey_big"),
        F.round(F.col("c_acctbal").cast("double") / 100.0, 4).alias("acctbal_hundreds"),
    )


@query(
    "f09_null_semantics",
    oracle="""
    WITH w AS (
        SELECT o_orderkey,
               NULLIF(o_orderpriority, '1-URGENT') AS pri,
               CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey <= 2000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(pri) AS BIGINT) AS n_pri,
           CAST(COUNT(DISTINCT pri) AS BIGINT) AS n_pri_distinct,
           CAST(SUM(CASE WHEN pri IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           ROUND(SUM(price), 2) AS sum_price,
           ROUND(AVG(price), 2) AS avg_price,
           CAST(SUM(CASE WHEN pri IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nullsafe_eq
    FROM w
    """,
)
def f09_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics pinned against the oracle: COUNT(*) vs COUNT(col)
    vs COUNT(DISTINCT col) under nulls, SUM/AVG null-skipping, and
    null-safe equality (Spark ``<=>`` ≡ SQL ``IS NOT DISTINCT FROM``).
    The fixtures carry no nulls, so this query *manufactures* them with
    NULLIF/CASE — the corner where engines classically disagree and the
    reference's row decoder simply crashed (``HBaseTable.kt:306``)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = o.select(
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("pri"),
        F.when(F.col("o_orderstatus") == "F", None)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    return w.agg(
        F.count("*").alias("n_rows"),
        F.count("pri").alias("n_pri"),
        F.countDistinct("pri").alias("n_pri_distinct"),
        F.sum(F.when(F.col("pri").isNull(), 1).otherwise(0)).alias("n_null"),
        F.round(F.sum("price"), 2).alias("sum_price"),
        F.round(F.avg("price"), 2).alias("avg_price"),
        F.sum(F.when(F.col("pri").eqNullSafe(F.lit(None)), 1).otherwise(0)).alias(
            "n_nullsafe_eq"
        ),
    )


@query(
    "f10_decimal_arithmetic",
    oracle="""
    SELECT l_returnflag,
           SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS gross,
           SUM(CAST(l_extendedprice AS DECIMAL(14,2))
               * CAST(l_discount AS DECIMAL(5,3))) AS discount_amt,
           CAST(MIN(CAST(l_quantity AS DECIMAL(8,2))) AS DECIMAL(8,2)) AS min_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def f10_decimal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL arithmetic — exact fixed-point aggregation (SURVEY §1.3:
    the reference round-trips DECIMAL through ``Bytes.toBigDecimal``).
    Sums over DECIMAL are exact, so this parity check needs NO float
    rounding: any engine drift is a hard mismatch. At scale decimals
    cost ~2× double math but are unconditionally reproducible — the
    right choice for money columns."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(14,2)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).alias("gross"),
        F.sum(price * disc).alias("discount_amt"),
        F.min(F.col("l_quantity").cast("decimal(8,2)")).alias("min_qty"),
    )


@query(
    "f11_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 90 DAY AS due_90d,
           o_orderdate + INTERVAL '1 year 6 months' AS plus_1y6m,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER)
               AS days_to_cutoff,
           CAST((2002 - year(o_orderdate)) * 12 - month(o_orderdate) + 1
                AS INTEGER) AS months_to_cutoff
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def f11_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic — the reference's §1.3 type surface carries
    all 13 SQL INTERVAL types (year-month as int months, day-time as
    long millis, ``HBaseTable.kt:274-286``); Spark's typed intervals
    (``YearMonthIntervalType``/``DayTimeIntervalType``) replace them.
    Day-time (+90 days), year-month (+1-6), and whole-unit datediffs,
    all oracle-replayed. (Fractional ``months_between`` is deliberately
    absent: its day-fraction convention is engine-specific.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    cutoff = F.lit("2002-01-01").cast("timestamp")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_90d"),
        (F.col("o_orderdate") + F.expr("INTERVAL '1-6' YEAR TO MONTH")).alias(
            "plus_1y6m"
        ),
        F.datediff(cutoff.cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_cutoff"
        ),
        (
            (F.lit(2002) - F.year("o_orderdate")) * 12
            - F.month("o_orderdate")
            + 1
        ).cast("int").alias("months_to_cutoff"),
    )


@query(
    "f12_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey <= 50
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
    FROM part WHERE p_partkey <= 50
    """,
)
def f12_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): ``DataFrame.unpivot`` melts N metric
    columns into (metric, value) rows — the inverse of a09's
    conditional-agg pivot. Value columns are cast to a common type
    first (ANSI UNPIVOT requires it). Scale shape: unpivot is a
    narrow map-side Expand (one input row → N output rows), no
    shuffle; the oracle replays it as the equivalent UNION ALL."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 50)
        .select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
    )
    return p.unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


@query(
    "f13_error_safe_functions",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_type AS INTEGER)                AS bad_int,
           TRY_CAST(substr(p_brand, 7, 2) AS INTEGER) AS brand_num,
           ROUND(CASE WHEN p_size - 5 = 0 THEN NULL
                      ELSE p_retailprice / (p_size - 5) END, 6) AS safe_div,
           (string_split(p_type, ' '))[5]             AS word5
    FROM part WHERE p_partkey <= 100
    """,
)
def f13_error_safe_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe evaluation: TRY_CAST (invalid → NULL), try_divide
    (÷0 → NULL), try_element_at (out of bounds → NULL). Under ANSI mode
    (Spark 4 default) the non-try forms *fail the job* — at 100 TB a
    single malformed row must not kill a 1000-executor pipeline, so
    hot-path casts over untrusted data use the try_ family and route
    NULLs to a quarantine filter instead of a retry storm."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.expr("try_cast(p_type AS int)").alias("bad_int"),
        F.expr("try_cast(substr(p_brand, 7, 2) AS int)").alias("brand_num"),
        F.round(F.expr("try_divide(p_retailprice, p_size - 5)"), 6).alias("safe_div"),
        F.expr("try_element_at(split(p_type, ' '), 5)").alias("word5"),
    )


@query(
    "f14_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS max_k,
           CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def f14_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns via Spark 4's VARIANT type: ``parse_json``
    once into a binary-encoded variant, then typed ``variant_get`` path
    extraction — unlike ``get_json_object`` (re-parses the string per
    access) the parse cost is paid once per row however many paths are
    read, and the encoding is columnar-shreddable. ``try_variant_get``
    on an absent path yields NULL instead of failing the job (same
    untrusted-data rule as f13). The reference stored JSON as opaque
    HBase qualifiers with no path access at all (SURVEY §1.3)."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("pv")
    ).select(
        "event_type",
        F.expr("variant_get(pv, '$.k', 'int')").alias("k"),
        F.expr("try_variant_get(pv, '$.missing', 'string')").alias("missing"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing"),
    )


@query(
    "f15_map_functions",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents WHERE doc_id < 50
    ),
    cnt AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY doc_id, t)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           COALESCE(list_sort(list(t) FILTER (WHERE c >= 3)), []) AS rep_tokens,
           CAST(COALESCE(SUM(c) FILTER (WHERE c >= 3), 0) AS BIGINT) AS rep_count
    FROM cnt GROUP BY doc_id
    """,
)
def f15_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed columns + map higher-order functions — the last nested
    type alongside arrays (f06), structs (st08) and VARIANT (f14); the
    reference's type system had no nested types at all (SURVEY §1.3).
    Per doc: build a token→count MAP in one projection
    (``map_from_arrays`` over the distinct-token array), then
    ``map_filter`` keeps tokens repeated >=3×, ``map_keys`` lists them,
    and an ``aggregate`` lambda folds their counts. Everything is a
    JVM-side codegen'd expression — no explode, no shuffle, no Python;
    the oracle recomputes the same facts from first principles with
    DuckDB list aggregation."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = "split(text, ' ')"
    keys = f"array_sort(array_distinct({toks}))"
    m = (
        f"map_from_arrays({keys},"
        f" transform({keys}, k -> CAST(size(filter({toks}, t -> t = k)) AS BIGINT)))"
    )
    rep = f"map_filter({m}, (k, v) -> v >= 3)"
    return d.select(
        "doc_id",
        F.expr(f"CAST(size(map_keys({m})) AS BIGINT)").alias("n_distinct"),
        F.expr(f"array_sort(map_keys({rep}))").alias("rep_tokens"),
        F.expr(f"aggregate(map_values({rep}), 0L, (acc, v) -> acc + v)").alias(
            "rep_count"
        ),
    )


@query(
    "f16_collation_semantics",
    oracle="""
    SELECT lower(val) AS type_key, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM (
        SELECT p_type AS val FROM part
        UNION ALL SELECT lower(p_type) FROM part
    )
    GROUP BY lower(val)
    """,
)
def f16_collation_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 ``collate``): a mixed-case
    feed (each part type plus its lowercase variant) grouped under the
    UTF8_LCASE collation merges case variants in the comparator itself —
    hash aggregate, joins, and ORDER BY all honor the collation, so the
    per-expression ``lower()`` scattering a case-insensitive pipeline
    otherwise needs disappears (and at 100 TB, collation lives in the
    column's type, declared once at DDL time). This is the query-level
    analog of the reference's per-table CHARSET attribute
    (``hbase/HBaseTable.kt:209-219``, surfaced in ``describe_table``).
    The emitted group key is normalized explicitly — which case variant
    represents a collated group is engine-internal, the one
    nondeterminism a portable query must not expose."""
    p = load_table(spark, sf_dir, "part").select("p_type")
    mixed = p.unionAll(p.select(F.lower("p_type").alias("p_type")))
    key = F.expr("collate(p_type, 'UTF8_LCASE')")
    return (
        mixed.groupBy(key.alias("k"))
        .agg(F.count("*").alias("n_rows"))
        .select(F.lower(F.col("k").cast("string")).alias("type_key"), "n_rows")
    )


@query(
    "f17_time_type",
    oracle="""
    WITH t AS (
        SELECT event_type,
               CAST((epoch_us(ts) - epoch_us(date_trunc('day', ts))) // 1000
                    AS INT) AS t_ms
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_business_hours,
           strftime(make_timestamp(CAST(MIN(t_ms) AS BIGINT) * 1000),
                    '%H:%M:%S') AS earliest,
           strftime(make_timestamp(CAST(MAX(t_ms) AS BIGINT) * 1000),
                    '%H:%M:%S') AS latest,
           CAST(MIN(t_ms) AS INT) AS earliest_ms
    FROM t
    WHERE t_ms BETWEEN 9 * 3600000 AND 17 * 3600000
    GROUP BY event_type
    """,
)
def f17_time_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TIME type via the engine's documented convention
    (``sources/catalog.py`` module doc; reference
    ``hbase/HBaseTable.kt:274-277`` stores TIME as its millis-of-day
    int): encode as **IntegerType milliseconds-since-midnight**
    (Calcite's TIME physical representation), compare NUMERICALLY
    (business-hours range predicate on the int — sargable, pushable),
    and render with ``date_format(timestamp_millis(t), 'HH:mm:ss')``
    only at the output edge. The oracle derives the same millis-of-day
    int with DuckDB epoch arithmetic and renders via strftime — both
    engines print from the identical integer, so the strings cannot
    diverge."""
    e = load_table(spark, sf_dir, "events")
    # integer division (div), not double /: a double quotient can round
    # up across an integer boundary before the cast truncates, diverging
    # from the oracle's exact floor-division
    t_ms = F.expr(
        "CAST((unix_micros(ts) - unix_micros(date_trunc('DAY', ts))) div 1000 AS INT)"
    )
    render = lambda c: F.date_format(F.timestamp_millis(c), "HH:mm:ss")  # noqa: E731
    return (
        e.select("event_type", t_ms.alias("t_ms"))
        .filter(F.col("t_ms").between(9 * 3600000, 17 * 3600000))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_business_hours"),
            render(F.min("t_ms")).alias("earliest"),
            render(F.max("t_ms")).alias("latest"),
            F.min("t_ms").cast("int").alias("earliest_ms"),
        )
    )


#: f18's bound parameter values — shared by the Spark call (as real
#: bindings) and the oracle (as inlined literals), so the parity check
#: proves binding ≡ inlining
F18_SEGMENT = "BUILDING"
F18_MIN_BAL = 1000.0
F18_TOP_NATIONS = 5


from kt_sql_hbase_ex_spark.functions.money import exact_sum, exact_sum_sql


@query(
    "f18_parameterized_sql",
    oracle=f"""
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
           {exact_sum_sql("c_acctbal")} AS total_bal
    FROM customer
    WHERE c_mktsegment = '{F18_SEGMENT}' AND c_acctbal > {F18_MIN_BAL}
    GROUP BY c_nationkey
    ORDER BY total_bal DESC, c_nationkey
    LIMIT {F18_TOP_NATIONS}
    """,
)
def f18_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — the PreparedStatement surface. The reference
    was consumed through Calcite-JDBC (``HBaseSchemaFactory`` wired
    into a JDBC connection, SURVEY §0), where applications bind
    parameters instead of splicing literals; Spark's analog is
    ``spark.sql(text, args=...)`` — NAMED (``:seg``) markers here, with
    positional ``?`` equally supported — which binds values as typed
    literal expressions in the ANALYZED plan: no string interpolation,
    no injection surface, and Catalyst constant-folds the bound values
    so pushdown/pruning see them exactly like inline literals (same
    plan, same PushedFilters). The oracle runs the literal-inlined
    text, so the hash match proves binding ≡ inlining. The engine
    facade forwards bindings the same way (``KtSqlEngine.sql(stmt,
    args=...)``)."""
    # the exact micro-unit money recipe (functions/money.py) rides along:
    # an order-dependent double SUM could flip a cent across engines AND,
    # under the total_bal ORDER BY ... LIMIT, swap which nations appear
    df = load_table(spark, sf_dir, "customer")
    df.createOrReplaceTempView("customer")
    agg = (
        spark.sql(
            """
            SELECT c_nationkey, c_acctbal FROM customer
            WHERE c_mktsegment = :seg AND c_acctbal > :minbal
            """,
            args={"seg": F18_SEGMENT, "minbal": F18_MIN_BAL},
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            exact_sum("c_acctbal").alias("total_bal"),
        )
    )
    agg.createOrReplaceTempView("__ktsql_f18_agg")
    return spark.sql(
        """
        SELECT c_nationkey, n_cust, total_bal FROM __ktsql_f18_agg
        ORDER BY total_bal DESC, c_nationkey
        LIMIT :topn
        """,
        args={"topn": F18_TOP_NATIONS},
    )


@query(
    "f19_sql_scripting",
    oracle="""
    WITH RECURSIVE t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders),
    p(v) AS (
        SELECT CAST(1 AS BIGINT)
        UNION ALL
        SELECT p.v * 2 FROM p, t WHERE p.v <= t.total
    ),
    m AS (SELECT MAX(v) AS pow2_above FROM p)
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           t.total // 100 AS threshold, m.pow2_above
    FROM orders o, t, m
    GROUP BY o.o_orderpriority, t.total, m.pow2_above
    HAVING COUNT(*) > t.total // 100
    """,
)
def f19_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 ``BEGIN … END`` blocks): DECLARE'd
    session variables, SET from a scalar subquery, a WHILE loop, and a
    final statement parameterized by the variables — the procedural
    surface a migrating JDBC user reaches for after prepared
    statements (Calcite 1.17 had no scripting at all). Everything the
    script computes is EXACT integer arithmetic (COUNT, integer DIV,
    doubling), and the oracle replays the WHILE loop as the SAME exact
    doubling — a recursive CTE, not a float log2 closed form, whose
    rounding would diverge from the integer loop near totals of 2^47
    (the true log2 of 2^k − 1 rounds up to exactly k there). Scale: the
    script's statements each plan independently through Catalyst
    (variables fold as literals); the loop runs ~log2(n) driver-side
    iterations of pure variable arithmetic, no data pass."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # set/restore discipline (the _write_back pattern): the scripting
    # switch must not leak into every later query on the shared session
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE total BIGINT;
              DECLARE pow2 BIGINT DEFAULT 1;
              SET total = (SELECT COUNT(*) FROM orders);
              WHILE pow2 <= total DO
                SET pow2 = pow2 * 2;
              END WHILE;
              SELECT o_orderpriority, COUNT(*) AS n,
                     total DIV 100 AS threshold,
                     pow2 AS pow2_above
              FROM orders
              GROUP BY o_orderpriority
              HAVING COUNT(*) > total DIV 100;
            END
            """
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)
