"""Mergeable sketch rollup stores — persisted approximate-aggregate state.

The datasketches/Druid ingest-time pre-aggregation pattern, the OLAP
answer to slice-and-dice distinct/frequency queries at 100 TB: each
ingest segment persists a constant-size sketch beside the data, and a
query MERGES sketches (registers max, counters add) instead of
rescanning raw rows — bytes read ∝ sketch size × segments, never corpus
size. The reference computes these queries by full Calcite-delegated
scans (``hbase/HBaseTable.kt:26-38``, no sketch machinery); this module
is what its users would need the day the raw scan stops fitting the
query SLA.

Two sketches, both persisted through the same pointer-published store
discipline as the PQ/IVF stores (``similarity.py``) and both EXACTLY
replayable by the DuckDB oracle — unlike ``a04``'s engine-specific
HLL++, register/counter computation here is pure md5 + integer
arithmetic, identical in Spark and DuckDB, so the driver gate
hash-matches the sketch VALUES (registers, scaled harmonic sums,
counter minima), not just a tolerance flag:

* **HLL register store** (sk01/sk02): Flajolet et al.'s HyperLogLog
  with p=8 (m=256 registers). For a value v: ``h = md5(v)``, register
  index j = first 2 hex chars (8 bits), rank rho = leading-zero count
  of the next 48 bits + 1 (via ``length(bin(w))`` — integer-exact in
  both engines). The store keeps ``(grp, seg, j, max_rho)`` rows
  partitioned by segment; a slice query max-merges registers across
  segments, which equals the registers of the union corpus — the
  mergeability identity max(reg(A), reg(B)) = reg(A ∪ B) is exactly
  what the oracle replays from raw rows. The estimate is the standard
  bias-corrected harmonic mean; the harmonic sum is computed as an
  EXACT BIGINT (Σ 2^(49-M_j), max m·2^48 < 2^63) so no float
  association order can split the engines.
* **count-min store** (sk03): Cormode-Muthukrishnan count-min with
  d=4 rows × w=1024 buckets. ``h_i(tok) = int(md5(i || ':' || tok)[:8
  hex]) mod w``; the store keeps (i, b, cnt) counters — 4096 rows
  regardless of corpus size. Frequency estimate = min_i cnt[i,
  h_i(tok)], never an underestimate. Counters are ADDITIVE-mergeable:
  the fixture build sums two segment builds, and the oracle replays
  the counters from the full corpus — additivity is the proof.

Store layout (per store root)::

    layout.json            {"kind","gen","data","segments"} — atomic
                           os.replace publishes, resolved ONCE per read
    <data>/seg=<s>/*.parquet   HLL registers (appends land as new
                               segment partitions; max-merge at read
                               makes re-appends IDEMPOTENT)
    <data>/*.parquet           CM counters (appends add counter rows;
                               sum-merge at read makes appends additive)

Compaction collapses accumulated segment/append rows into one merged
row set as a fresh generation dir behind the pointer (answers
unchanged — pinned in tests); the superseded dir survives one cycle
for in-flight readers (deferred GC, the kvstore/text_index
discipline). Writers serialize through the shared O_EXCL
``_writer_lock``.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import (
    fan_out,
    load_table,
    table_path,
)

# --- HLL parameters (identical literals ride in both engines' SQL) ----

_HLL_P = 8                      #: register-index bits (2 hex chars)
_HLL_M = 256                    #: register count m = 2^p
_HLL_WHEX = 12                  #: rank-source hex chars (48 bits)
_HLL_RMAX = 49                  #: max rank = 48-bit zeros + 1
_HLL_POW = 2 ** _HLL_RMAX       #: harmonic-sum scale 2^49 (exact BIGINT)
#: alpha_256 as a literal EXPRESSION (not a rounded float) so Spark and
#: DuckDB parse and evaluate the identical IEEE operation sequence
_ALPHA_SQL = "0.7213 / (1.0 + 1.079 / 256.0)"
#: small-range (linear counting) threshold 2.5 * m
_HLL_SMALL = 640.0

# --- count-min parameters ---------------------------------------------

_CM_D = 4                       #: hash rows
_CM_W = 1024                    #: buckets per row
_CM_HEX = 8                     #: hashed hex chars (32 bits) before mod
_CM_TOPK = 20                   #: probe set size for sk03

#: sk02's segment split: base build takes ship years <= this, the
#: incremental batch appends the rest
_SK02_SPLIT_YEAR = 1994


# --- shared store plumbing --------------------------------------------


def _sketch_root(sf_dir: str, table: str, variant: str) -> str:
    """Fingerprinted build-once location for one fixture's sketch store
    (the ``text_index._index_root`` discipline, keyed to the SOURCE
    table the sketch summarizes)."""
    src = os.path.realpath(table_path(sf_dir, table))
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_mtime_ns}|{st.st_size}|sketch-v1|{variant}".encode()
    ).hexdigest()[:16]
    uid = getattr(os, "getuid", lambda: 0)()
    return os.path.join(tempfile.gettempdir(), f"kt_sql_sketch_u{uid}", fp)


def _layout_path(root: str) -> str:
    return os.path.join(root, "layout.json")


def _write_layout(root: str, layout: dict) -> None:
    """Atomic pointer publish (os.replace), the kvstore discipline."""
    tmp = f"{_layout_path(root)}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(layout, f)
    os.replace(tmp, _layout_path(root))


def _read_layout(root: str) -> dict:
    """Resolve the pointer ONCE per operation and thread it through —
    double resolution races a concurrent publish (the round-11/12
    torn-read lesson from the PQ and KV stores)."""
    with open(_layout_path(root)) as f:
        return json.load(f)


def _data_dir(root: str, layout: dict) -> str:
    return os.path.join(root, layout["data"])


# --- HLL: register computation (Spark side) ---------------------------


def _hll_hash(col) -> "F.Column":
    return F.md5(col.cast("string"))


def _hll_registers(df: DataFrame, grp: str, val: str, seg) -> DataFrame:
    """(grp, seg, j, mrho) register rows for one corpus slice: md5 the
    value, take 8 bits of register index and 48 bits of rank source,
    keep each (grp, seg, j)'s max rank. All JVM builtins — the hash,
    conv, and bin run inside whole-stage codegen; the only shuffle is
    the register group-by (output ∝ groups × m, never rows)."""
    h = _hll_hash(F.col(val))
    j = F.conv(F.substring(h, 1, _HLL_P // 4), 16, 10).cast("int")
    w = F.conv(
        F.substring(h, _HLL_P // 4 + 1, _HLL_WHEX), 16, 10
    ).cast("bigint")
    rho = F.when(w == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(_HLL_RMAX) - F.length(F.bin(w))
    )
    return (
        df.select(
            F.col(grp).alias("grp"),
            seg.alias("seg") if not isinstance(seg, str) else F.col(seg).alias("seg"),
            j.alias("j"),
            rho.alias("rho"),
        )
        .groupBy("grp", "seg", "j")
        .agg(F.max("rho").alias("mrho"))
    )


def write_hll_store(
    spark: SparkSession, root: str, df: DataFrame, grp: str, val: str, seg
) -> None:
    """Materialize a fresh HLL register store at ``root`` from one
    corpus slice: registers land partitioned by segment (the append
    unit), the layout pointer publishes last."""
    os.makedirs(root, exist_ok=True)
    data = f"regs.{uuid.uuid4().hex[:12]}"
    (
        _hll_registers(df, grp, val, seg)
        .repartition("seg")
        .write.partitionBy("seg")
        .parquet(os.path.join(root, data))
    )
    _write_layout(root, {"kind": "hll", "gen": 0, "data": data, "prev": []})


def append_hll_segments(
    spark: SparkSession, root: str, df: DataFrame, grp: str, val: str, seg
) -> None:
    """Admit one corpus slice's registers into the standing store —
    work ∝ slice, no existing file is touched, and because readers
    max-merge, re-appending the SAME slice is idempotent (at-least-once
    ingest needs no dedup ledger). The layout resolves once; files land
    inside the live generation's ``seg=`` partitions."""
    from kt_sql_hbase_ex_spark.functions.text_index import _writer_lock

    with _writer_lock(root):
        layout = _read_layout(root)
        (
            _hll_registers(df, grp, val, seg)
            .repartition("seg")
            .write.mode("append")
            .partitionBy("seg")
            .parquet(_data_dir(root, layout))
        )


def compact_hll_store(spark: SparkSession, root: str) -> dict:
    """Fold accumulated per-segment/per-append register rows into ONE
    merged register set (seg = -1) as a fresh generation behind the
    pointer — answers unchanged (max is associative/commutative/
    idempotent), bytes ∝ groups × m afterwards regardless of how many
    segments accreted. The superseded data dir is retained one cycle
    for in-flight readers, then swept (deferred GC)."""
    from kt_sql_hbase_ex_spark.functions.text_index import _writer_lock

    with _writer_lock(root):
        layout = _read_layout(root)
        merged = (
            spark.read.parquet(_data_dir(root, layout))
            .groupBy("grp", "j")
            .agg(F.max("mrho").alias("mrho"))
            .withColumn("seg", F.lit(-1))
        )
        data = f"regs.{uuid.uuid4().hex[:12]}"
        merged.repartition("seg").write.partitionBy("seg").parquet(
            os.path.join(root, data)
        )
        for stale in layout.get("prev", []):
            shutil.rmtree(os.path.join(root, stale), ignore_errors=True)
        _write_layout(
            root,
            {
                "kind": "hll",
                "gen": layout["gen"] + 1,
                "data": data,
                "prev": [layout["data"]],
            },
        )
        return {"gen": layout["gen"] + 1, "data": data}


def read_hll_registers(spark: SparkSession, root: str) -> DataFrame:
    """The live generation's register rows (layout resolved once)."""
    return spark.read.parquet(_data_dir(root, _read_layout(root)))


def hll_estimates(registers: DataFrame) -> DataFrame:
    """(grp, est, s_scaled, zero_regs) from register rows: max-merge
    across segments, then the standard bias-corrected harmonic
    estimate. ``s_scaled`` is the EXACT integer Σ 2^(49-M_j) (absent
    registers count 2^49 each), so the relation's integer columns are
    a complete functional of the merged registers — the oracle's
    hash-match over them IS register-level equality."""
    merged = registers.groupBy("grp", "j").agg(F.max("mrho").alias("mr"))
    per = merged.groupBy("grp").agg(
        (
            F.sum(F.expr(f"cast(power(2, {_HLL_RMAX} - mr) as bigint)"))
            + (F.lit(_HLL_M) - F.count("*")) * F.lit(_HLL_POW)
        ).cast("long").alias("s_scaled"),
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("zero_regs"),
    )
    return per.select(
        "grp",
        F.expr(
            f"round(case when (({_ALPHA_SQL}) * {_HLL_M * _HLL_M}.0)"
            f" * {_HLL_POW}.0 / cast(s_scaled as double) <= {_HLL_SMALL}"
            f" and zero_regs > 0"
            f" then {_HLL_M}.0 * ln({_HLL_M}.0 / cast(zero_regs as double))"
            f" else (({_ALPHA_SQL}) * {_HLL_M * _HLL_M}.0)"
            f" * {_HLL_POW}.0 / cast(s_scaled as double) end, 2)"
        ).alias("est"),
        "s_scaled",
        "zero_regs",
    )


# --- HLL: oracle-side SQL (identical arithmetic, DuckDB spelling) -----


def _hll_oracle(val_sql: str, grp_sql: str, source_sql: str) -> str:
    """The register + estimate computation in DuckDB SQL over raw rows.
    Max-merge over segments = registers over the union, so the oracle
    needs no segment model — replaying from the unsegmented corpus IS
    the mergeability proof."""
    h = f"md5(CAST({val_sql} AS VARCHAR))"
    j = f"('0x' || substr({h}, 1, {_HLL_P // 4}))::BIGINT"
    w = f"('0x' || substr({h}, {_HLL_P // 4 + 1}, {_HLL_WHEX}))::BIGINT"
    e_raw = (
        f"(({_ALPHA_SQL}) * {_HLL_M * _HLL_M}.0) * {_HLL_POW}.0"
        f" / CAST(s_scaled AS DOUBLE)"
    )
    return f"""
    WITH reg AS (
        SELECT {grp_sql} AS grp, {j} AS j,
               CASE WHEN {w} = 0 THEN {_HLL_RMAX}
                    ELSE {_HLL_RMAX} - length(bin({w})) END AS rho
        FROM {source_sql}
    ),
    m AS (SELECT grp, j, MAX(rho) AS mr FROM reg GROUP BY grp, j),
    s AS (SELECT grp,
                 CAST(SUM(CAST(pow(2, {_HLL_RMAX} - mr) AS BIGINT))
                      + ({_HLL_M} - COUNT(*)) * {_HLL_POW} AS BIGINT)
                     AS s_scaled,
                 CAST({_HLL_M} - COUNT(*) AS BIGINT) AS zero_regs
          FROM m GROUP BY grp)
    SELECT grp, s_scaled, zero_regs,
           ROUND(CASE WHEN {e_raw} <= {_HLL_SMALL} AND zero_regs > 0
                      THEN {_HLL_M}.0
                           * ln({_HLL_M}.0 / CAST(zero_regs AS DOUBLE))
                      ELSE {e_raw} END, 2) AS est
    FROM s
    """


# --- HLL: fixture provisioning + registered queries -------------------


def _li_slice(spark: SparkSession, sf_dir: str):
    """lineitem projected to the store's (grp, val, seg) shape:
    distinct orders per ship mode, segmented by ship year (the
    ingest-partition analog)."""
    return fan_out(load_table(spark, sf_dir, "lineitem")).select(
        "l_returnflag", "l_orderkey", F.year("l_shipdate").alias("ship_year")
    )


def ensure_hll_store(spark: SparkSession, sf_dir: str) -> str:
    """sk01's store: registers over the full fixture, one segment per
    ship year (1992..1998 at TPC-H dates) — the shape an ingest
    pipeline would leave behind."""
    from kt_sql_hbase_ex_spark.functions.text_index import _build_once

    def build(staging: str) -> None:
        write_hll_store(
            spark, staging, _li_slice(spark, sf_dir),
            "l_returnflag", "l_orderkey", "ship_year",
        )

    return _build_once(_sketch_root(sf_dir, "lineitem", "hll-year"), build)


def ensure_hll_incremental_store(spark: SparkSession, sf_dir: str) -> str:
    """sk02's store: built through the full maintenance lifecycle —
    base build (ship years <= {split}), incremental append (later
    years), then compaction to one merged register set. The oracle
    stays blind to the lifecycle (it replays the union corpus), so a
    green sk02 proves base + append + compact ≡ one-shot build."""
    from kt_sql_hbase_ex_spark.functions.text_index import _build_once

    def build(staging: str) -> None:
        rows = _li_slice(spark, sf_dir)
        write_hll_store(
            spark, staging,
            rows.filter(F.col("ship_year") <= _SK02_SPLIT_YEAR),
            "l_returnflag", "l_orderkey", "ship_year",
        )
        append_hll_segments(
            spark, staging,
            rows.filter(F.col("ship_year") > _SK02_SPLIT_YEAR),
            "l_returnflag", "l_orderkey", "ship_year",
        )
        compact_hll_store(spark, staging)

    return _build_once(
        _sketch_root(sf_dir, "lineitem", f"hll-incr{_SK02_SPLIT_YEAR}"),
        build,
    )


def _hll_query_relation(
    spark: SparkSession, sf_dir: str, root: str
) -> DataFrame:
    """Shared sk01/sk02 tail: estimates served from the persisted
    registers, exact COUNT(DISTINCT) joined beside them for grading
    (the a04 companion-column discipline — at 100 TB the exact side is
    precisely the scan the store exists to avoid; it rides here so the
    driver gate can grade estimate quality as data, not just shape)."""
    est = hll_estimates(read_hll_registers(spark, root))
    exact = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("exact_orders"))
    )
    return est.join(
        exact, est.grp == exact.l_returnflag, "inner"
    ).select(
        F.col("l_returnflag"),
        F.col("est").alias("est_orders"),
        "exact_orders",
        "s_scaled",
        "zero_regs",
        (
            F.abs(F.col("est") - F.col("exact_orders"))
            <= 0.20 * F.col("exact_orders")
        ).alias("within_tolerance"),
    )


_HLL_ORACLE_TAIL = f"""
    SELECT x.grp AS l_returnflag,
           x.est AS est_orders,
           e.exact_orders,
           x.s_scaled,
           x.zero_regs,
           ABS(x.est - e.exact_orders) <= 0.20 * e.exact_orders
               AS within_tolerance
    FROM x JOIN (
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders
        FROM lineitem GROUP BY l_returnflag
    ) e ON e.l_returnflag = x.grp
"""


@query(
    "sk01_hll_rollup",
    oracle=f"""
    WITH x AS ({_hll_oracle("l_orderkey", "l_returnflag", "lineitem")})
    {_HLL_ORACLE_TAIL}
    """,
)
def sk01_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted HLL rollup: distinct orders per ship mode, answered by
    MAX-MERGING the store's per-ship-year register segments — the
    ingest-time sketch pattern (Druid/datasketches) where a 100 TB
    distinct-count slice reads m × groups × segments register rows
    (kilobytes) instead of the raw corpus. Registers are md5-derived
    integer state identical in both engines, so the oracle — which
    recomputes them from raw lineitem — hash-matches the estimate AND
    the exact scaled harmonic sum ``s_scaled``: a green row is
    register-level equality between the persisted-store merge and a
    from-scratch build, which is precisely HLL's mergeability identity
    reg(A) max reg(B) = reg(A ∪ B). The exact count and a ±20%
    tolerance flag ride beside the estimate (p=8 → 6.5% standard
    error) exactly as in a04."""
    return _hll_query_relation(
        spark, sf_dir, ensure_hll_store(spark, sf_dir)
    )


@query(
    "sk02_hll_incremental_merge",
    oracle=f"""
    WITH x AS ({_hll_oracle("l_orderkey", "l_returnflag", "lineitem")})
    {_HLL_ORACLE_TAIL}
    """,
)
def sk02_hll_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL store's full maintenance lifecycle, graded end to end:
    base build over ship years <= 1994, an INCREMENTAL APPEND of the
    later years (work ∝ batch; no existing file touched; re-appends
    idempotent under max-merge), then COMPACTION collapsing the
    accreted segments into one merged register set behind the atomic
    layout pointer (deferred GC keeps the superseded dir one cycle for
    in-flight readers). The oracle is the same unsegmented replay as
    sk01 — it never sees the lifecycle, so a green row proves
    build + append + compact ≡ one-shot registers over the union,
    the property that lets a 100 TB deployment sketch each ingest
    batch independently and still answer global distincts
    exactly-as-if-rebuilt."""
    return _hll_query_relation(
        spark, sf_dir, ensure_hll_incremental_store(spark, sf_dir)
    )


# --- count-min ---------------------------------------------------------


def _cm_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok) — the t-family whitespace tokenization (identical
    ``split`` semantics in Spark and DuckDB ``string_split``)."""
    return (
        fan_out(load_table(spark, sf_dir, "documents"))
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    )


def cm_counters(tokens: DataFrame) -> DataFrame:
    """(i, b, cnt) count-min counters for one token slice: every
    occurrence increments one bucket per hash row. The posexplode
    emits d rows per token inside codegen; the only shuffle is the
    (i, b) group-by whose output is d × w rows regardless of corpus
    size."""
    hashes = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("tok"))),
                    1,
                    _CM_HEX,
                ),
                16,
                10,
            ).cast("bigint") % _CM_W
            for i in range(_CM_D)
        ]
    )
    return (
        tokens.select(F.posexplode(hashes).alias("i", "b"))
        .groupBy("i", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def write_cm_store(spark: SparkSession, root: str, counters: DataFrame) -> None:
    os.makedirs(root, exist_ok=True)
    data = f"counters.{uuid.uuid4().hex[:12]}"
    counters.coalesce(1).write.parquet(os.path.join(root, data))
    _write_layout(root, {"kind": "cm", "gen": 0, "data": data, "prev": []})


def append_cm_counters(
    spark: SparkSession, root: str, counters: DataFrame
) -> None:
    """Admit one slice's counters — counters are ADDITIVE, so appends
    just land counter rows and readers sum-merge; merging per-segment
    sketches equals the sketch of the union corpus (the linearity that
    makes count-min shard-friendly: every ingest partition sketches
    independently, no coordination)."""
    from kt_sql_hbase_ex_spark.functions.text_index import _writer_lock

    with _writer_lock(root):
        layout = _read_layout(root)
        counters.coalesce(1).write.mode("append").parquet(
            _data_dir(root, layout)
        )


def compact_cm_store(spark: SparkSession, root: str) -> dict:
    """Fold accumulated counter rows into one summed (i, b) set as a
    fresh generation — the fixed d × w footprint a standing store
    returns to after any number of appends."""
    from kt_sql_hbase_ex_spark.functions.text_index import _writer_lock

    with _writer_lock(root):
        layout = _read_layout(root)
        merged = (
            spark.read.parquet(_data_dir(root, layout))
            .groupBy("i", "b")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        data = f"counters.{uuid.uuid4().hex[:12]}"
        merged.coalesce(1).write.parquet(os.path.join(root, data))
        for stale in layout.get("prev", []):
            shutil.rmtree(os.path.join(root, stale), ignore_errors=True)
        _write_layout(
            root,
            {
                "kind": "cm",
                "gen": layout["gen"] + 1,
                "data": data,
                "prev": [layout["data"]],
            },
        )
        return {"gen": layout["gen"] + 1, "data": data}


def read_cm_counters(spark: SparkSession, root: str) -> DataFrame:
    """The live counters, sum-merged across whatever append rows have
    accreted (so reads are correct between compactions)."""
    layout = _read_layout(root)
    return (
        spark.read.parquet(_data_dir(root, layout))
        .groupBy("i", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def ensure_cm_store(spark: SparkSession, sf_dir: str) -> str:
    """sk03's store, built through the mergeable lifecycle: two
    doc_id-parity segment builds (each sketching HALF the corpus
    independently — the shard-local ingest shape), appended then
    compacted to the canonical d × w counter set. The oracle replays
    counters from the FULL corpus, so a green sk03 proves segment
    addition ≡ whole-corpus sketch (count-min's linearity)."""
    from kt_sql_hbase_ex_spark.functions.text_index import _build_once

    def build(staging: str) -> None:
        toks = _cm_tokens(spark, sf_dir)
        write_cm_store(
            spark, staging, cm_counters(toks.filter(F.col("doc_id") % 2 == 0))
        )
        append_cm_counters(
            spark, staging, cm_counters(toks.filter(F.col("doc_id") % 2 == 1))
        )
        compact_cm_store(spark, staging)

    return _build_once(_sketch_root(sf_dir, "documents", "cm-parity"), build)


@query(
    "sk03_cm_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ),
    cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    top AS (SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT {_CM_TOPK}),
    counters AS (
        SELECT ii.i AS i,
               ('0x' || substr(md5(ii.i || ':' || tok.t), 1, {_CM_HEX}))::BIGINT
                   % {_CM_W} AS b,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok, (VALUES ('0'), ('1'), ('2'), ('3')) ii(i)
        GROUP BY 1, 2
    ),
    probes AS (
        SELECT top.t, top.c, ii.i AS i,
               ('0x' || substr(md5(ii.i || ':' || top.t), 1, {_CM_HEX}))::BIGINT
                   % {_CM_W} AS b
        FROM top, (VALUES ('0'), ('1'), ('2'), ('3')) ii(i)
    )
    SELECT p.t AS token,
           CAST(MIN(c2.cnt) AS BIGINT) AS cm_est,
           CAST(MAX(p.c) AS BIGINT) AS exact_n,
           MIN(c2.cnt) >= MAX(p.c) AS never_underestimates
    FROM probes p JOIN counters c2 ON c2.i = p.i AND c2.b = p.b
    GROUP BY p.t
    """,
)
def sk03_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted count-min heavy-hitter readout: the top-20 corpus
    tokens' frequencies estimated from the 4 × 1024 counter store
    (min over the token's d buckets) beside their exact counts. The
    store was built as TWO independent half-corpus sketches summed —
    count-min's additive mergeability, replayed blind by the oracle's
    whole-corpus counters — and the estimate's one-sided error
    guarantee (never an underestimate) is emitted as a graded column.
    Scale: the counter table is d × w rows whatever the corpus; the
    probe joins are broadcast-sized; the exact-count companion is the
    full scan the sketch replaces, carried for grading exactly as in
    sk01/a04."""
    root = ensure_cm_store(spark, sf_dir)
    counters = read_cm_counters(spark, root)
    toks = _cm_tokens(spark, sf_dir)
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(_CM_TOPK)
    )
    probes = top.select(
        "tok",
        "c",
        F.posexplode(
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{i}:"), F.col("tok"))),
                            1,
                            _CM_HEX,
                        ),
                        16,
                        10,
                    ).cast("bigint") % _CM_W
                    for i in range(_CM_D)
                ]
            )
        ).alias("i", "b"),
    )
    return (
        probes.join(F.broadcast(counters).alias("ctr"), ["i", "b"], "inner")
        .groupBy("tok")
        .agg(
            F.min("cnt").cast("long").alias("cm_est"),
            F.max("c").cast("long").alias("exact_n"),
            (F.min("cnt") >= F.max("c")).alias("never_underestimates"),
        )
        .select(
            F.col("tok").alias("token"),
            "cm_est",
            "exact_n",
            "never_underestimates",
        )
    )
