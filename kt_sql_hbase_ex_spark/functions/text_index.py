"""Persisted, incrementally-maintained positional postings index.

This is the durable half of the reference's Lucene subsystem: the
reference stored Lucene index *files* in HBase rows so the index
survived across queries (``hbase/index/lucene/HBaseDirectory.kt:24-165``,
``HBaseIndexInput.kt:20-73``), while t05/t06/t11/t12 originally
re-derived postings from ``documents`` on every call. Here the index is
a Spark-native layout written ONCE and read by the search queries with
partition pruning:

* ``postings/`` — positional postings ``(term, doc_id, pos)``,
  parquet **partitioned by ``term_pfx``** (term's first character —
  the opt03 layout pattern). A term lookup reads only its prefix
  partitions: the directory pruning IS the index seek, exactly the
  two-partition read t11's docstring promised. At 100 TB the prefix
  widens (2–3 chars) so each partition stays file-system-friendly;
  hot-prefix skew is bounded by Zipf on the first character and by the
  parquet writer splitting large partitions into many files.
* ``doclen/`` — ``(doc_id, dl)`` document lengths (BM25's length
  normalization), a slim two-column table.
* ``stats/`` — per-build/per-batch partial rows ``(pn_docs, pdl_sum)``
  — the st07 log+compaction convention: readers compact the partials
  with a one-row aggregate, so appends never rewrite published data.

Incremental maintenance follows the st07 foreachBatch-upsert pattern:
:func:`upsert_index_batch` appends one batch of new documents' postings
/ doclens / stats partials into the layout — partial files are
group-sized, append-only, and idempotent under the streaming
checkpoint's exactly-once file tracking. ``t13`` proves the composition:
an index built from 90% of the corpus, one maintenance batch appending
the remaining 10%, and term statistics read back from the maintained
index hash-matching the full-corpus oracle.

Provisioning discipline (fixture-only): the index is fingerprinted by
the documents file's identity and built under a staging dir published
by one atomic rename — concurrent test shards never see a half-built
index (the ``_chunked_events_dir`` pattern). In production the build is
a one-time backfill job and batches land live; compaction rewrites a
prefix partition at a time under dynamic partition overwrite.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import fan_out, load_table, table_path

#: bump to invalidate previously-built index layouts on disk
_LAYOUT_VERSION = 2


def term_prefix(term_col):
    """Partition key of a term: its first character (widened at real
    scale). Empty-string tokens (doubled separators) map to ``_`` so the
    partition value is never the Hive default-partition sentinel."""
    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return F.coalesce(F.nullif(F.substring(c, 1, 1), F.lit("")), F.lit("_"))


def _index_root(sf_dir: str, variant: str) -> str:
    """Fingerprinted location for one fixture's index: documents file
    identity + layout version + variant (full corpus vs t13's split)."""
    src = os.path.realpath(table_path(sf_dir, "documents"))
    st = os.stat(src)
    fp = hashlib.sha256(
        f"{src}|{st.st_mtime_ns}|{st.st_size}|v{_LAYOUT_VERSION}|{variant}".encode()
    ).hexdigest()[:16]
    uid = getattr(os, "getuid", lambda: 0)()
    return os.path.join(tempfile.gettempdir(), f"kt_sql_text_index_u{uid}", fp)


def _postings_of(docs: DataFrame) -> DataFrame:
    """(term_pfx, term, doc_id, pos) positional postings — 0-based
    positions, one row per token occurrence (what phrase/NEAR need;
    frequency-only consumers aggregate)."""
    from kt_sql_hbase_ex_spark.functions.text import tokens_col

    pos = docs.select("doc_id", F.posexplode(tokens_col()).alias("pos", "term"))
    return pos.select(term_prefix("term").alias("term_pfx"), "term", "doc_id", "pos")


def _write_index_parts(docs: DataFrame, root: str) -> None:
    """Write one batch of documents into an index layout at ``root`` —
    used by both the initial build (into staging) and incremental
    maintenance (append into the live layout). Postings append as new
    files inside their term_pfx partitions; doclen rows are new docs
    only, so plain file appends ARE the upsert; stats land as a partial
    row compacted at read (st07's log+compaction)."""
    postings = _postings_of(docs)
    # co-locate each prefix before the partitioned write: one file per
    # prefix partition per batch instead of (writer-partitions × prefix)
    # small files — file count is what query-time listing and task
    # scheduling pay for. At real scale the same shuffle keys the write
    # to target file sizes (maxRecordsPerFile), not one-file-per-prefix.
    postings.repartition("term_pfx").write.mode("append").partitionBy(
        "term_pfx"
    ).parquet(os.path.join(root, "postings"))
    doclen = postings.groupBy("doc_id").agg(F.count("*").alias("dl"))
    doclen.write.mode("append").parquet(os.path.join(root, "doclen"))
    stats = doclen.agg(
        F.count("*").alias("pn_docs"), F.sum("dl").alias("pdl_sum")
    )
    stats.write.mode("append").parquet(os.path.join(root, "stats"))


def upsert_index_batch(batch_df: DataFrame, root: str) -> None:
    """The foreachBatch maintenance hook: append one microbatch of NEW
    documents to a published index. Wire as
    ``stream.writeStream.foreachBatch(lambda df, _id:
    upsert_index_batch(df, root))`` — the checkpoint's file tracking
    gives exactly-once batch application, so re-delivered batches are
    never double-appended (the st07/st10 contract). Updating an
    EXISTING doc needs a tombstone alongside (delete-then-append);
    append-only covers the corpus-growth case an ingest pipeline hits."""
    _write_index_parts(batch_df, root)


def _build_once(base: str, build_fn) -> str:
    """Marker-checked build-and-atomically-publish (shared by the full
    index and t13's split variant): run ``build_fn(staging_dir)`` in a
    per-process staging dir, stamp ``_SUCCESS``, publish with ONE atomic
    rename. Losing the publish race is fine — the competing build is
    deterministic-identical, so the loser just discards its staging."""
    marker = os.path.join(base, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(os.path.dirname(base), exist_ok=True)
        staging = f"{base}.tmp.{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        build_fn(staging)
        with open(os.path.join(staging, "_SUCCESS"), "w"):
            pass
        try:
            os.rename(staging, base)
        except OSError:  # lost the publish race — the other build is identical
            shutil.rmtree(staging, ignore_errors=True)
    return base


def ensure_text_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) and return the full-corpus index root for a fixture.
    Build = one backfill over ``documents`` into staging + atomic
    publish; every later call is a marker check."""

    def build(staging: str) -> None:
        _write_index_parts(fan_out(load_table(spark, sf_dir, "documents")), staging)

    return _build_once(_index_root(sf_dir, "full"), build)


def read_postings(spark: SparkSession, root: str, terms: tuple[str, ...]) -> DataFrame:
    """Index seek for a term set: the ``term_pfx`` IN-filter prunes at
    the DIRECTORY level (PartitionFilters — plan-pinned in
    tests/test_plans.py), the term equality prunes row groups inside
    the surviving partitions via the pushed filter. Only the queried
    terms' postings are ever read or shuffled."""
    prefixes = sorted({(t[:1] or "_") for t in terms})
    return (
        spark.read.parquet(os.path.join(root, "postings"))
        .filter(F.col("term_pfx").isin(prefixes) & F.col("term").isin(list(terms)))
        .select("term", "doc_id", "pos")
    )


def read_doclen(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "doclen"))


def read_corpus_stats(spark: SparkSession, root: str) -> DataFrame:
    """One-row (n_docs, avgdl) compacted from the stats partials."""
    return (
        spark.read.parquet(os.path.join(root, "stats"))
        .agg(
            F.sum("pn_docs").cast("double").alias("n_docs"),
            (F.sum("pdl_sum") / F.sum("pn_docs")).alias("avgdl"),
        )
    )


def compact_text_index(spark: SparkSession, root: str) -> None:
    """Compaction — the other half of log+append maintenance (opt09's
    small-file story applied to the index): every maintenance batch
    appends one file per touched prefix partition plus doclen/stats
    partials, so a long-lived index accretes small files that query-time
    listing and task scheduling pay for. Compaction rewrites each layer
    to its minimal file count without changing a single row:

    * ``postings``: one shuffle keyed by ``term_pfx`` → one file per
      prefix partition, swapped in under DYNAMIC partition overwrite so
      only rewritten partitions are touched (readers of other prefixes
      are never disturbed — the opt08 backfill idiom);
    * ``doclen``: coalesced rewrite via staging + atomic rename;
    * ``stats``: the partial rows fold to ONE row (the same compaction
      the readers do on the fly, made durable).

    At 100 TB this runs per-prefix on a size trigger (files-per-partition
    or bytes threshold), not corpus-wide; the shuffle keys to target
    file sizes instead of one-file-per-prefix."""
    import shutil

    postings_dir = os.path.join(root, "postings")
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(mode_key)
    spark.conf.set(mode_key, "dynamic")
    try:
        compacted = spark.read.parquet(postings_dir).repartition("term_pfx")
        # self-overwrite is safe under dynamic mode only via a staged
        # read: localCheckpoint materializes the rows before the
        # overwrite drops the source files
        compacted.localCheckpoint(eager=True).write.mode(
            "overwrite"
        ).partitionBy("term_pfx").parquet(postings_dir)
    finally:
        spark.conf.set(mode_key, old)

    for layer, ncoalesce in (("doclen", 1), ("stats", 1)):
        src = os.path.join(root, layer)
        staging = f"{src}.compact.{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        df = spark.read.parquet(src)
        if layer == "stats":
            df = df.agg(
                F.sum("pn_docs").alias("pn_docs"), F.sum("pdl_sum").alias("pdl_sum")
            )
        df.coalesce(ncoalesce).write.parquet(staging)
        old_dir = f"{src}.old.{os.getpid()}"
        os.rename(src, old_dir)
        os.rename(staging, src)
        shutil.rmtree(old_dir, ignore_errors=True)


#: t13: term statistics queried from the MAINTAINED index. Bucket 9 of
#: the tr01 split rule plays the 'newly arrived batch'.
T13_TERMS = ("customer", "join", "hash")
#: Spark-side only: the base/batch split is index-build provisioning the
#: oracle never sees (it computes term stats over the FULL documents
#: table — that blindness is the point: maintained index ≡ full build).
_T13_BUCKET_SPARK = (
    "pmod(conv(substring(md5(cast(doc_id AS STRING)), 1, 8), 16, 10), 10)"
)


@query(
    "t13_incremental_index_maintenance",
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM pos WHERE term IN {T13_TERMS}
        GROUP BY doc_id, term
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM tf GROUP BY term
    """,
)
def t13_incremental_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained index answers like the full corpus: build the
    postings index from ~90% of ``documents`` (hash buckets 0–8), apply
    ONE :func:`upsert_index_batch` with the remaining ~10% (bucket 9 —
    the 'new arrivals' a live ingest lands), then read per-term document
    frequency / total term frequency / doc-id extremes for the query
    terms from the index alone. The oracle computes the same statistics
    straight from the full ``documents`` table, so a hash match proves
    the incremental append converged to the batch build — the property
    that lets a 100 TB deployment build the index once and stream the
    rest (``HBaseDirectory.kt``'s durable-index role, log+compaction
    style). Fixture provisioning publishes base+batch atomically; the
    batch append itself runs against the already-laid-out index tree,
    exactly as a foreachBatch call would."""
    def build(staging: str) -> None:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        bucket = F.expr(_T13_BUCKET_SPARK)
        _write_index_parts(docs.filter(bucket != 9), staging)  # the backfill
        upsert_index_batch(docs.filter(bucket == 9), staging)  # the batch

    base = _build_once(_index_root(sf_dir, "split"), build)
    tf = (
        read_postings(spark, base, T13_TERMS)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
