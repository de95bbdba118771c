"""DML as pure batch transforms — SURVEY.md §2.1 S9–S11, §2.4.

The reference mutates rows in place over HBase: INSERT = ``Put`` with the
PK as rowkey (``hbase/HBaseModifiableTable.kt:123-130,171-195``), UPDATE =
cell rewrite detected by an oversized row array (``:135-166``), DELETE =
``Delete`` per PK rowkey (``:221-246``), all under a mandatory primary key
(``hbase/HBaseSchema.kt:127-136``).

The analytics re-expression keeps the *semantics* (keyed row identity)
but as immutable-snapshot transforms — the only model that scales to
100 TB of Parquet:

* INSERT  → union of the snapshot with the new-rows relation (append).
* UPDATE  → column recompute under a predicate (every row flows through;
  map-side only, no shuffle).
* DELETE  → anti-join against the delete key set.
* UPSERT  → outer-merge on PK: changed rows replace, new rows append —
  the MERGE INTO pattern, expressed with anti-join + union so the DuckDB
  oracle can state it in ANSI SQL.
* PK dedup → ``dropDuplicates`` on the key columns (the reference's
  "rowkey wins once" semantics for re-ingested data).

Each query returns a verification projection/aggregate of the
transformed table so the oracle can hash-check the end state.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.functions.money import exact_sum, exact_sum_sql
from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import PRIMARY_KEYS, load_table

_ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)

_NEW_ORDERS = [
    (900000001, 1, "O", 111.11, dt.datetime(2001, 9, 1), "1-URGENT"),
    (900000002, 2, "F", 222.22, dt.datetime(2001, 9, 2), "5-LOW"),
    (900000003, 3, "P", 333.33, dt.datetime(2001, 9, 3), "3-MEDIUM"),
]

_NEW_ORDERS_SQL = """
    SELECT * FROM (VALUES
        (900000001, 1, 'O', 111.11, TIMESTAMP '2001-09-01', '1-URGENT'),
        (900000002, 2, 'F', 222.22, TIMESTAMP '2001-09-02', '5-LOW'),
        (900000003, 3, 'P', 333.33, TIMESTAMP '2001-09-03', '3-MEDIUM')
    ) AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
"""


def insert_rows(base: DataFrame, new_rows: DataFrame) -> DataFrame:
    """INSERT = append (``df.write.mode("append")`` against a real sink;
    pure-transform form here). Reference: row array → Put,
    ``HBaseModifiableTable.kt:171-195``."""
    return base.unionByName(new_rows)


def update_where(base: DataFrame, condition, assignments: dict[str, object]) -> DataFrame:
    """UPDATE ... SET assignments WHERE condition, as a column recompute.
    Reference: oversized row array → cell rewrite,
    ``HBaseModifiableTable.kt:135-166``. Narrow (map-side) — no shuffle."""
    out = base
    for col_name, expr in assignments.items():
        out = out.withColumn(col_name, F.when(condition, expr).otherwise(F.col(col_name)))
    return out


def delete_keys(base: DataFrame, keys: DataFrame, on: list[str]) -> DataFrame:
    """DELETE by key set = left-anti join. Reference: Delete per PK rowkey,
    ``HBaseModifiableTable.kt:221-246``."""
    return base.join(keys, on=on, how="left_anti")


def upsert_on_key(
    base: DataFrame, changes: DataFrame, key_cols: list[str], small_changes: bool = True
) -> DataFrame:
    """MERGE/upsert: rows in ``changes`` replace same-key rows of ``base``;
    unmatched keys append.

    ``small_changes=True`` broadcasts the change-key set so the anti-join
    never shuffles ``base`` — merging a statement-sized batch into a
    100 TB table must not move the table. (A local-relation changes side
    has no stats, so without the hint Catalyst assumes it is huge and
    plans a full sort-merge join of the fact table.) Set it False only
    when ``changes`` is itself fact-sized; the join then shuffles both
    sides on the PK, which is the correct plan at that shape.

    On a cluster with a transactional table format this is ``MERGE INTO``;
    formulated relationally so it stays oracle-checkable."""
    keys = changes.select(*key_cols)
    if small_changes:
        keys = F.broadcast(keys)
    survivors = base.join(keys, on=key_cols, how="left_anti")
    return survivors.unionByName(changes)


@query(
    "dml01_insert_append",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {exact_sum_sql("o_totalprice")} AS total
    FROM (SELECT * FROM orders UNION ALL {_NEW_ORDERS_SQL})
    GROUP BY o_orderstatus
    """,
)
def dml01_insert_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT: append 3 literal rows, verify end-state aggregate."""
    base = load_table(spark, sf_dir, "orders")
    new_rows = spark.createDataFrame(_NEW_ORDERS, schema=_ORDERS_SCHEMA)
    return (
        insert_rows(base, new_rows)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), exact_sum("o_totalprice").alias("total"))
    )


@query(
    "dml02_update_where",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {exact_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1 ELSE o_totalprice END")} AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def dml02_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE orders SET o_totalprice = o_totalprice*1.1 WHERE status='O',
    verified by the post-update aggregate."""
    base = load_table(spark, sf_dir, "orders")
    updated = update_where(
        base, F.col("o_orderstatus") == "O", {"o_totalprice": F.col("o_totalprice") * 1.1}
    )
    return updated.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), exact_sum("o_totalprice").alias("total")
    )


@query(
    "dml03_delete_antijoin",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
    GROUP BY l_returnflag
    """,
)
def dml03_delete_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE lineitems of completed ('F') orders via anti-join on the
    FK/PK key set; verified by the survivor aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    done_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        delete_keys(li, done_orders, on=["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "dml04_upsert_merge",
    oracle=f"""
    WITH changes AS (
        SELECT * FROM (VALUES
            (1, 1, 'X', 999.99, TIMESTAMP '2001-10-01', '1-URGENT'),
            (2, 2, 'X', 888.88, TIMESTAMP '2001-10-02', '2-HIGH')
        ) AS t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
        UNION ALL {_NEW_ORDERS_SQL}
    ),
    merged AS (
        SELECT * FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = orders.o_orderkey)
        UNION ALL SELECT * FROM changes
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_orderstatus = 'X' THEN 1 END) AS BIGINT) AS n_updated,
           {exact_sum_sql("o_totalprice")} AS total
    FROM merged
    """,
)
def dml04_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPSERT (MERGE INTO analog): 2 updates to existing PKs 1,2 + 3 new
    PKs; end state checked on count / updated-count / total."""
    base = load_table(spark, sf_dir, "orders")
    changes = spark.createDataFrame(
        [
            (1, 1, "X", 999.99, dt.datetime(2001, 10, 1), "1-URGENT"),
            (2, 2, "X", 888.88, dt.datetime(2001, 10, 2), "2-HIGH"),
        ]
        + _NEW_ORDERS,
        schema=_ORDERS_SCHEMA,
    )
    merged = upsert_on_key(base, changes, key_cols=list(PRIMARY_KEYS["orders"]))
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("o_orderstatus") == "X", 1)).alias("n_updated"),
        exact_sum("o_totalprice").alias("total"),
    )


@query(
    "dml05_dedup_by_pk",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {exact_sum_sql("o_totalprice")} AS total
    FROM (SELECT DISTINCT * FROM (SELECT * FROM orders UNION ALL SELECT * FROM orders))
    GROUP BY o_orderstatus
    """,
)
def dml05_dedup_by_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-uniqueness semantics (reference: one rowkey, one row —
    re-ingesting the same key overwrites, ``HBaseSchema.kt:127-136``):
    double-ingest orders, dedup on the PK, verify the original state is
    restored. Uses orders because its PK is provably unique in the
    fixtures (lineitem's conventional (l_orderkey, l_linenumber) is NOT
    unique in the synthetic data — dedup there would be a nondeterministic
    pick among true duplicates)."""
    o = load_table(spark, sf_dir, "orders")
    doubled = o.unionByName(o)
    deduped = doubled.dropDuplicates(list(PRIMARY_KEYS["orders"]))
    return deduped.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), exact_sum("o_totalprice").alias("total")
    )


# ---------------------------------------------------------------------------
# SCD2 / CDC — the warehouse-side mutation patterns layered on keyed rows

_CUST_COLS = ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

#: SCD2 change batch: updates to keys 1 and 2, one brand-new key. A
#: fourth, attribute-identical row (key 42, selected from the snapshot
#: itself) is appended at runtime — change detection must NOT version it.
_SCD2_CHANGES = [
    (1, "Customer#000000001", 19, 9999.99, "AUTOMOBILE"),
    (2, "Customer#000000002", 7, 1667.32, "FURNITURE"),
    (900000001, "Customer#900000001", 3, 10.0, "HOUSEHOLD"),
]
_SCD2_CHANGES_SQL = """
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'Customer#000000001', CAST(19 AS INT), 9999.99, 'AUTOMOBILE'),
        (2, 'Customer#000000002', 7, 1667.32, 'FURNITURE'),
        (900000001, 'Customer#900000001', 3, 10.0, 'HOUSEHOLD')
    ) AS t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey = 42
"""
_SCD2_AFFECTED = (1, 2, 42, 900000001)


def scd2_probe(base: DataFrame, ch: DataFrame) -> DataFrame:
    """The SCD2 diff probe: change keys broadcast into the dimension
    snapshot (the dimension itself never shuffles). Split out so its
    broadcast shape stays independently plan-pinned — dml06 checkpoints
    the statement-sized result, which hides this join from the
    downstream plan."""
    return base.join(F.broadcast(ch), base.c_custkey == ch.ch_c_custkey, "inner")


@query(
    "dml06_scd2_history",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               TIMESTAMP '2020-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        FROM customer
    ),
    changes AS ({_SCD2_CHANGES_SQL}),
    diff AS (
        SELECT ch.* FROM changes ch LEFT JOIN base b
          ON ch.c_custkey = b.c_custkey
        WHERE b.c_custkey IS NULL
           OR b.c_name      IS DISTINCT FROM ch.c_name
           OR b.c_nationkey IS DISTINCT FROM ch.c_nationkey
           OR b.c_acctbal   IS DISTINCT FROM ch.c_acctbal
           OR b.c_mktsegment IS DISTINCT FROM ch.c_mktsegment
    ),
    closed AS (
        SELECT b.c_custkey, b.c_name, b.c_nationkey, b.c_acctbal,
               b.c_mktsegment, b.valid_from,
               TIMESTAMP '2024-06-01' AS valid_to, FALSE AS is_current
        FROM base b JOIN diff d ON b.c_custkey = d.c_custkey
    ),
    opened AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               TIMESTAMP '2024-06-01', CAST(NULL AS TIMESTAMP), TRUE
        FROM diff
    ),
    keep AS (
        SELECT * FROM base
        WHERE NOT EXISTS (SELECT 1 FROM diff WHERE diff.c_custkey = base.c_custkey)
    ),
    hist AS (
        SELECT * FROM keep UNION ALL SELECT * FROM closed
        UNION ALL SELECT * FROM opened
    )
    SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal,
           valid_from, valid_to, is_current
    FROM hist WHERE c_custkey IN {_SCD2_AFFECTED}
    """,
)
def dml06_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 apply: a change batch versions the customer dimension —
    rows whose attributes actually changed (or are new keys) get their
    current version closed (``valid_to`` = effective date) and a new
    open version appended; attribute-identical change rows are detected
    and dropped (no spurious versions — the batch includes one on
    purpose). Scale: the change batch is broadcast for BOTH the diff
    probe and the touched-key anti-join, so the dimension snapshot never
    shuffles — MERGE-shaped, like dml04. Returns the full version
    history of the affected keys (closed + open + untouched no-op)."""
    eff = F.lit("2024-06-01").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").select(*_CUST_COLS)
    base = cust.select(
        "*",
        F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = spark.createDataFrame(
        _SCD2_CHANGES,
        schema="c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).unionByName(cust.filter(F.col("c_custkey") == 42))

    ch = changes.select([F.col(c).alias(f"ch_{c}") for c in _CUST_COLS])
    # existing keys whose attributes differ: broadcast probe into base.
    # The probe result is STATEMENT-sized (≤ |changes| rows) but its
    # lineage contains a full dimension scan — and it feeds closed,
    # matched_keys, AND (via diff) opened + keep, so unmaterialized it
    # re-expands that scan at every reference (17 customer scans in the
    # executed plan, caught by the round-5 multi-scan audit).
    # localCheckpoint pins the handful of probed rows; the dimension is
    # now scanned once here + once in the keep anti-join. The probe's
    # own broadcast shape is plan-pinned via scd2_probe (the checkpoint
    # hides it from the downstream plan).
    probed = scd2_probe(base, ch).localCheckpoint()
    attr_diff = (
        ~F.col("c_name").eqNullSafe(F.col("ch_c_name"))
        | ~F.col("c_nationkey").eqNullSafe(F.col("ch_c_nationkey"))
        | ~F.col("c_acctbal").eqNullSafe(F.col("ch_c_acctbal"))
        | ~F.col("c_mktsegment").eqNullSafe(F.col("ch_c_mktsegment"))
    )
    diff_existing = probed.filter(attr_diff)
    # new keys = change rows whose key found no base match. Anti-join
    # against the *matched key set* (statement-sized, from the probe
    # above) — NOT against base, which would put the whole dimension on
    # the broadcast/build side of the anti-join at scale.
    matched_keys = probed.select(F.col("ch_c_custkey").alias("mk"))
    new_rows = ch.join(
        F.broadcast(matched_keys), ch.ch_c_custkey == F.col("mk"), "left_anti"
    )
    # statement-sized and doubly consumed (opened + keep): materialize
    diff = (
        diff_existing.select(*[F.col(f"ch_{c}").alias(c) for c in _CUST_COLS])
        .unionByName(new_rows.select(*[F.col(f"ch_{c}").alias(c) for c in _CUST_COLS]))
        .localCheckpoint()
    )

    closed = diff_existing.select(
        *_CUST_COLS, "valid_from", eff.alias("valid_to"), F.lit(False).alias("is_current")
    )
    opened = diff.select(
        "*",
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).select(*base.columns)
    keep = base.join(
        F.broadcast(diff.select("c_custkey")), "c_custkey", "left_anti"
    ).select(*base.columns)

    hist = keep.unionByName(closed.select(*base.columns)).unionByName(opened)
    return hist.filter(F.col("c_custkey").isin(*_SCD2_AFFECTED)).select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        "valid_from",
        "valid_to",
        "is_current",
    )


def apply_cdc(
    base, log, key_cols, seq_col: str = "seq", op_col: str = "op"
):
    """CDC apply, the production helper dml07 and the property tests
    share: compact the I/U/D change log to one winner per key
    (ROW_NUMBER by seq DESC — last-wins), then merge MERGE-style —
    delete winners drop the key, insert/update winners replace-or-
    append. The compacted key set broadcasts into the base anti-join,
    so the base never shuffles for a statement-sized log."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    )
    latest = log.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
    survivors = base.join(
        F.broadcast(latest.select(*key_cols)), key_cols, "left_anti"
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    return survivors.unionByName(upserts)


#: CDC change log: (seq, op, full-row payload). Exercises every
#: last-wins shape — repeated updates (key 1), plain delete (key 2),
#: update-then-delete (key 3), insert-then-update of a new key, and
#: delete-then-reinsert revival (key 4) — the same tombstone/Put
#: ordering the KV connector enforces (src04).
_CDC_LOG = [
    (1, "U", 1, 1, "X", 500.0, dt.datetime(2001, 11, 1), "1-URGENT"),
    (2, "U", 1, 1, "X", 600.0, dt.datetime(2001, 11, 2), "1-URGENT"),
    (3, "D", 2, None, None, None, None, None),
    (4, "U", 3, 3, "X", 700.0, dt.datetime(2001, 11, 3), "2-HIGH"),
    (5, "D", 3, None, None, None, None, None),
    (6, "I", 900000001, 1, "X", 111.11, dt.datetime(2001, 11, 4), "5-LOW"),
    (7, "U", 900000001, 1, "X", 112.12, dt.datetime(2001, 11, 5), "5-LOW"),
    (8, "D", 4, None, None, None, None, None),
    (9, "I", 4, 4, "X", 800.0, dt.datetime(2001, 11, 6), "3-MEDIUM"),
]
_CDC_LOG_SQL = """
    SELECT * FROM (VALUES
        (1, 'U', CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'X', 500.0, TIMESTAMP '2001-11-01', '1-URGENT'),
        (2, 'U', 1, 1, 'X', 600.0, TIMESTAMP '2001-11-02', '1-URGENT'),
        (3, 'D', 2, NULL, NULL, NULL, NULL, NULL),
        (4, 'U', 3, 3, 'X', 700.0, TIMESTAMP '2001-11-03', '2-HIGH'),
        (5, 'D', 3, NULL, NULL, NULL, NULL, NULL),
        (6, 'I', 900000001, 1, 'X', 111.11, TIMESTAMP '2001-11-04', '5-LOW'),
        (7, 'U', 900000001, 1, 'X', 112.12, TIMESTAMP '2001-11-05', '5-LOW'),
        (8, 'D', 4, NULL, NULL, NULL, NULL, NULL),
        (9, 'I', 4, 4, 'X', 800.0, TIMESTAMP '2001-11-06', '3-MEDIUM')
    ) AS t(seq, op, o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority)
"""


@query(
    "dml07_cdc_apply",
    oracle=f"""
    WITH log AS ({_CDC_LOG_SQL}),
    latest AS (
        SELECT * FROM log
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) = 1
    ),
    applied AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM latest WHERE latest.o_orderkey = orders.o_orderkey)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM latest WHERE op <> 'D'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_orderstatus = 'X' THEN 1 END) AS BIGINT) AS n_changed,
           {exact_sum_sql("o_totalprice")} AS total
    FROM applied
    """,
)
def dml07_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: an ordered I/U/D change log collapses to one winner per
    key (ROW_NUMBER by seq DESC — the same last-wins rule a Debezium/
    binlog compaction uses), then merges MERGE-style: delete winners
    drop the key, insert/update winners replace-or-append. Scale: the
    log compacts FIRST (shuffle ∝ changelog size, grouped by key), the
    compacted key set broadcasts into the base anti-join — a 100 TB base
    never moves; re-applying any suffix of the log is idempotent because
    last-wins is. End state checked on count / changed-count / total."""
    base = load_table(spark, sf_dir, "orders")
    log = spark.createDataFrame(
        _CDC_LOG,
        schema="seq int, op string, o_orderkey bigint, o_custkey bigint, "
        "o_orderstatus string, o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    applied = apply_cdc(base, log, key_cols=["o_orderkey"])
    return applied.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("o_orderstatus") == "X", 1)).alias("n_changed"),
        exact_sum("o_totalprice").alias("total"),
    )


@query(
    "dml08_partitioned_cow_update",
    oracle=f"""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {exact_sum_sql(
               "CASE WHEN o_orderstatus = 'P' AND o_orderpriority = '1-URGENT' "
               "THEN o_totalprice * 1.1 ELSE o_totalprice END"
           )} AS total
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_custkey % 10 = 3)
    GROUP BY o_orderstatus
    """,
)
def dml08_partitioned_cow_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned copy-on-write DML through the engine facade
    (round-6 verdict task #1): a status-partitioned catalog table takes
    a literal ``UPDATE`` whose WHERE pins one partition and a literal
    ``DELETE`` that thins another — each rewrites ONLY the partitions
    containing matched rows (matched-partition discovery → pruned
    flagged snapshot → dynamic partition overwrite), never the table.
    The reference's DML was row-scoped Puts/Deletes
    (``hbase/HBaseModifiableTable.kt:135-246``); partition-scoped
    copy-on-write is that contract's batch-analytics form — at 100 TB a
    one-partition UPDATE reads and writes one partition (the 'O'/'F'
    bulk partitions are never opened; proven file-level in
    ``tests/test_engine.py``). The oracle replays the end state
    declaratively over the pristine table. Money sums are exact
    micro-unit fixed point; the update factor is applied identically
    (same IEEE double product) in both engines."""
    from kt_sql_hbase_ex_spark.engine import KtSqlEngine

    tbl = "ktsql_dml08_orders_part"
    eng = KtSqlEngine(spark, sf_dir)
    eng.create_table(
        tbl,
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
        "o_orderpriority STRING, o_orderstatus STRING",
        primary_key="o_orderkey",
        partitioned_by="o_orderstatus",
    )
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    ).write.insertInto(tbl)

    eng.sql(
        f"UPDATE {tbl} SET o_totalprice = o_totalprice * 1.1 "
        "WHERE o_orderstatus = 'P' AND o_orderpriority = '1-URGENT'"
    )
    eng.sql(f"DELETE FROM {tbl} WHERE o_orderstatus = 'F' AND o_custkey % 10 = 3")

    return (
        spark.table(tbl)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), exact_sum("o_totalprice").alias("total"))
    )


@query(
    "dml09_merge_into",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_custkey % 2 = 0 THEN 'u' ELSE 'd' END AS op
        FROM orders WHERE o_custkey % 10 = 3
        UNION ALL SELECT 900000001, 'i'
        UNION ALL SELECT 900000002, 'i'
    ),
    merged AS (
        SELECT o.o_orderkey, o.o_custkey,
               CASE WHEN s.op = 'u' THEN o.o_totalprice * 1.1
                    ELSE o.o_totalprice END AS o_totalprice,
               o.o_orderstatus
        FROM orders o LEFT JOIN src s ON o.o_orderkey = s.k
        WHERE s.k IS NULL OR s.op <> 'd'
        UNION ALL
        SELECT s.k, 0, 999.99, 'N' FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = s.k)
    )
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           {exact_sum_sql("o_totalprice")} AS total
    FROM merged GROUP BY o_orderstatus
    """,
)
def dml09_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal ``MERGE INTO`` through the engine facade (round 7): one
    statement carries a conditional DELETE, an UPDATE over the old
    row, and an INSERT with NULL-free literal fill — the three-way
    merge every warehouse migration script ends up writing (the dml04
    upsert / dml07 CDC transforms are this statement's relational
    bodies; the reference's Calcite 1.17 layer predates MERGE, so the
    facade extends the surface rather than porting it). Semantics
    pinned by the oracle: first-match-wins WHEN ordering (op='d' rows
    must delete even though the UPDATE clause would also match), every
    SET sees the OLD target row, unmatched source rows insert. Scale:
    the ON join shuffles both sides only if the source is fact-sized
    (AQE broadcasts a statement-sized one); the facade raises the ANSI
    cardinality violation instead of silently exploding duplicate
    matches. The target is status-PARTITIONED, so the statement runs
    the partition-pruned MERGE path end-to-end in the gate: scope =
    matched partitions ∪ the INSERT branch's 'N' partition (created by
    dynamic overwrite), proven file-level in ``tests/test_engine.py``.
    End state verified by the status-grouped exact-money aggregate
    over the post-merge table."""
    from kt_sql_hbase_ex_spark.engine import KtSqlEngine

    tbl = "ktsql_dml09_orders_merge"
    eng = KtSqlEngine(spark, sf_dir)
    eng.create_table(
        tbl,
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
        "o_orderstatus STRING",
        primary_key="o_orderkey",
        partitioned_by="o_orderstatus",
    )
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    ).write.insertInto(tbl)

    eng.sql(
        f"""
        MERGE INTO {tbl} t USING (
            SELECT o_orderkey AS k,
                   CASE WHEN o_custkey % 2 = 0 THEN 'u' ELSE 'd' END AS op
            FROM orders WHERE o_custkey % 10 = 3
            UNION ALL SELECT 900000001, 'i'
            UNION ALL SELECT 900000002, 'i'
        ) s ON t.o_orderkey = s.k
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice * 1.1
        WHEN NOT MATCHED THEN INSERT
            (o_orderkey, o_custkey, o_totalprice, o_orderstatus)
            VALUES (s.k, 0, 999.99, 'N')
        """
    )
    return (
        spark.table(tbl)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), exact_sum("o_totalprice").alias("total"))
    )
