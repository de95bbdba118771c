"""Training-data pipeline operators — deterministic splits and corpus
curation, composed from the engine's text/dedup primitives.

No reference analog (LLM-pipeline extension). These are the two
operations every pretraining-data run does last:

* tr01 — a *deterministic, content-stable* train/val/test split. Hash
  the primary key (never ``rand()``: re-runs and backfills must land
  every document in the same split) and bucket 8/1/1. Map-side only:
  the split adds zero shuffles to whatever pipeline feeds it.
* tr02 — corpus curation stats after quality + language filtering: the
  sizing numbers (docs, tokens) a training run is provisioned from.

Both reuse the portable md5-prefix hash (see dedup.py) so the DuckDB
oracle replays the exact bucketing, not a statistical approximation.

Scale notes: at 100 TB the split column is written once as a partition
column (``partitionBy("split")``, cf. opt03) so training jobs read
their split by directory; the hash-bucket rule here is that write's
defining expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.functions.dedup import (
    SPAN_W,
    _SPAN_TOKENS_SPARK,
    _SPAN_WINDOWS_SQL,
)
from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import fan_out, load_table

#: hash buckets 0-7 train, 8 val, 9 test
N_BUCKETS = 10
_BUCKET_SPARK = "pmod(conv(substring(md5(cast(doc_id AS STRING)), 1, 8), 16, 10), 10)"
_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10"
)


@query(
    "tr01_train_val_test_split",
    oracle=f"""
    WITH b AS (
        SELECT lang, n_chars, {_BUCKET_SQL} AS bucket FROM documents
    )
    SELECT CASE WHEN bucket <= 7 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM b GROUP BY 1, 2
    """,
)
def tr01_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8/1/1 train/val/test split by content-stable PK hash (doc_id →
    md5 bucket), reported as per-split per-language doc and char counts.
    Deterministic across runs, engines and partitionings — the property
    ``rand(seed)`` does NOT have under repartitioning, which is why
    hash-bucketing is the only defensible split rule at 100 TB."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    bucket = F.expr(_BUCKET_SPARK)
    split = (
        F.when(bucket <= 7, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )


@query(
    "tr02_corpus_curation_stats",
    oracle="""
    WITH feat AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_uniq
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           ROUND(AVG(CAST(n_uniq AS DOUBLE) / n_tok), 6) AS avg_ttr
    FROM feat
    WHERE n_tok >= 20 AND CAST(n_uniq AS DOUBLE) / n_tok >= 0.4
    GROUP BY lang
    """,
)
def tr02_corpus_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation: C4/Gopher-style keep rules (min length, min
    lexical diversity) then the per-language sizing a training run is
    provisioned from (docs, tokens, mean type-token ratio). Map-side
    filter → one aggregation shuffle; the filter columns derive from
    ``text`` in codegen, so rejected documents cost a scan, never a
    shuffle."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    feat = d.select(
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    ttr = F.col("n_uniq").cast("double") / F.col("n_tok")
    return (
        feat.filter((F.col("n_tok") >= 20) & (ttr >= 0.4))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.round(F.avg(ttr), 6).alias("avg_ttr"),
        )
    )


_PCT_BUCKET_SQL = (
    "CAST(('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
)
_PCT_BUCKET_SPARK = (
    "pmod(conv(substring(md5(concat('s:', cast(doc_id AS STRING))), 1, 8), 16, 10), 100)"
)
SAMPLE_PCT = 10


@query(
    "tr03_stratified_sample",
    oracle=f"""
    WITH sampled AS (
        SELECT * FROM documents WHERE {_PCT_BUCKET_SQL} < {SAMPLE_PCT}
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM sampled GROUP BY lang
    """,
)
def tr03_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~{SAMPLE_PCT}% sample by salted PK-hash threshold,
    reported per language. Unlike ``TABLESAMPLE``/``df.sample`` (seeded
    per-partition → resample under repartitioning), the hash rule gives
    the same sample membership on any cluster layout, any engine, any
    re-run — the property eval-set carve-outs require. The salt ('s:')
    decorrelates this bucketing from tr01's split buckets so sampling
    within a split stays unbiased."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    sampled = d.filter(F.expr(_PCT_BUCKET_SPARK) < SAMPLE_PCT)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


N_SHARDS = 8


def striped_global_rank(df: DataFrame, sort_cols) -> DataFrame:
    """Exact global 1-based rank over ``sort_cols`` (a total order)
    WITHOUT a global window — the scale-safe two-pass form tr04 uses:

    1. range-repartition on the sort key (the exchange any total ORDER
       BY pays; partitions are range-disjoint and ordered);
    2. per-partition local rank (window partitioned by partition id) +
       per-partition counts → prefix offsets via a broadcast triangular
       self-join (#partitions² tiny rows);
    3. global rank = offset + local rank.

    Correct for ANY sampled range boundaries because the sort key is a
    total order; ``localCheckpoint`` pins one materialization of the
    partitioning so the count pass and the rank pass can never see
    different layouts. Adds a ``rank`` column; drops none."""
    from pyspark.sql import Window as W

    parted = (
        df.repartitionByRange(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = parted.groupBy("__pid").agg(F.count("*").alias("__n"))
    lower = counts.select(F.col("__pid").alias("__lpid"), F.col("__n").alias("__ln"))
    offsets = (
        counts.join(F.broadcast(lower), F.col("__lpid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__ln"), F.lit(0)).alias("__offset"))
    )
    lrank = F.row_number().over(W.partitionBy("__pid").orderBy(*sort_cols))
    return (
        parted.withColumn("__lrank", lrank)
        .join(F.broadcast(offsets), "__pid")
        .withColumn("rank", F.col("__offset") + F.col("__lrank"))
        .drop("__pid", "__lrank", "__offset")
    )


@query(
    "tr04_token_balanced_shards",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    sharded AS (
        SELECT doc_id, n_tok,
               1 + (ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1)
                   % {N_SHARDS} AS shard
    FROM toks
    )
    SELECT CAST(shard AS INTEGER) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM sharded GROUP BY shard
    """,
)
def tr04_token_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output sharding: documents striped round-robin
    into {N_SHARDS} shards by global rank over descending token count
    (longest-first deal-out ≈ equal tokens per shard) — the
    write-layout step before ``partitionBy(shard)`` materializes
    training files. The report shows per-shard doc and token totals,
    the balance a trainer's data loader sees.

    The global rank is computed WITHOUT a global window (the r4 NTILE
    form moved all documents through one task — the Exchange
    SinglePartition anti-pattern, now banned sweep-wide in
    tests/test_plans.py). Scale-safe two-pass striping instead:

    1. range-repartition on the sort key — the same exchange any total
       ORDER BY needs, every partition range-disjoint;
    2. per-partition local rank (window partitioned by partition id) +
       per-partition row counts (a #partitions-row aggregate) turned
       into prefix offsets via a broadcast triangular self-join;
    3. global rank = offset + local rank; shard = 1 + (rank-1) mod N.

    The result is exact (the oracle's ROW_NUMBER) because the sort key
    (n_tok DESC, doc_id) is a total order and range partitions are
    ordered; it is deterministic regardless of where the sampled range
    boundaries fall. ``localCheckpoint`` pins one materialization of
    the partitioning so the count pass and the rank pass can never see
    different layouts."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    ranked = striped_global_rank(toks, [F.desc("n_tok"), F.asc("doc_id")])
    sharded = ranked.withColumn(
        "shard", (F.lit(1) + (F.col("rank") - 1) % N_SHARDS).cast("int")
    )
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )


GRAM_N = 8  # contamination n-gram length: long enough that random
#             31-word-vocab text can't collide; only real shared
#             passages (the planted near-dups) overlap

# One source of truth for the contamination-gram hash (tr05's rule,
# reused verbatim by tr12's composed pipeline): {GRAM_N}-token gram ->
# portable 32-bit hash, over a token-array column named ``t``.
_GRAM_HASH_SPARK = (
    f"transform(sequence(1, size(t) - {GRAM_N - 1}),"
    f" i -> cast(conv(substring(md5(concat_ws(' ', slice(t, i, {GRAM_N}))), 1, 8), 16, 10) AS bigint))"
)
_GRAM_HASH_SQL = (
    f"list_transform(generate_series(1, len(t) - {GRAM_N - 1}),"
    f" i -> CAST(('0x' || substr(md5(array_to_string(t[i:i+{GRAM_N - 1}], ' ')), 1, 8)) AS BIGINT))"
)


@query(
    "tr05_decontamination",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {_BUCKET_SQL} AS bucket, string_split(text, ' ') AS t
        FROM documents WHERE len(string_split(text, ' ')) >= {GRAM_N}
    ),
    grams AS (
        SELECT doc_id, bucket, unnest({_GRAM_HASH_SQL}) AS g
        FROM docs
    ),
    test_g AS (SELECT DISTINCT g FROM grams WHERE bucket = 9)
    SELECT grams.doc_id, CAST(COUNT(DISTINCT grams.g) AS BIGINT) AS n_shared_grams
    FROM grams JOIN test_g USING (g)
    WHERE grams.bucket <= 7
    GROUP BY grams.doc_id
    """,
)
def tr05_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag *train*-split documents sharing
    any {GRAM_N}-gram with the held-out *test* split (tr01's bucket
    rule), reporting the count of shared grams per contaminated doc —
    the standard n-gram-overlap decontamination step before a training
    run. Scale shape: grams are hashed 32-bit (shuffle carries longs,
    never text); the test-split gram set is DISTINCT-reduced and
    broadcast (benchmarks are tiny next to the corpus), so the train
    side is a map-side semi-join — no corpus-wide shuffle at all."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    bucket = F.expr(_BUCKET_SPARK)
    docs = (
        d.filter(F.expr(f"size(split(text, ' ')) >= {GRAM_N}"))
        .select("doc_id", bucket.alias("bucket"), F.split("text", " ").alias("t"))
    )
    grams = docs.select(
        "doc_id", "bucket", F.explode(F.expr(_GRAM_HASH_SPARK)).alias("g")
    )
    test_g = grams.filter(F.col("bucket") == 9).select("g").distinct()
    return (
        grams.filter(F.col("bucket") <= 7)
        .join(F.broadcast(test_g), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )


_EMAIL_PAT = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_PAT = "\\+1-555-[0-9]{4}-[0-9]{4}"


@query(
    "tr06_pii_redaction",
    oracle=f"""
    WITH notes AS (
        SELECT c_custkey,
               'user_' || CAST(CAST(('0x' || substr(md5(c_name), 1, 8)) AS BIGINT) AS VARCHAR) AS pseudonym,
               c_name,
               'Reach ' || c_name || ' at customer' || CAST(c_custkey AS VARCHAR)
                 || '@example.com or +1-555-'
                 || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || '-'
                 || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') AS note
        FROM customer
    )
    SELECT c_custkey, pseudonym,
           regexp_replace(
               regexp_replace(
                   regexp_replace(note, 'Customer#[0-9]+', pseudonym, 'g'),
                   '{_EMAIL_PAT}', '[EMAIL]', 'g'),
               '{_PHONE_PAT}', '[PHONE]', 'g') AS scrubbed_note
    FROM notes
    """,
)
def tr06_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over free text: pseudonymize names (portable
    content hash → stable 'user_NNN' token, joinable across datasets),
    then regex-scrub emails and phone numbers — the standard scrub pass
    before text enters a training corpus. The contact note is
    *synthesized deterministically* from fixture columns (the corpus has
    no real PII); the redaction chain is the real, reusable operator.
    Scale shape: pure per-row regexp/codegen projection, zero shuffle;
    regexes are RE2-safe (no lookaround) so they run identically on any
    engine."""
    c = load_table(spark, sf_dir, "customer")
    pseudonym = F.concat(
        F.lit("user_"),
        F.conv(F.substring(F.md5("c_name"), 1, 8), 16, 10).cast("bigint").cast("string"),
    )
    note = F.concat(
        F.lit("Reach "), F.col("c_name"),
        F.lit(" at customer"), F.col("c_custkey").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(((F.col("c_custkey") * 7) % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(note, "Customer#[0-9]+", "{PSEUDONYM}"),
            _EMAIL_PAT, "[EMAIL]",
        ),
        _PHONE_PAT, "[PHONE]",
    )
    # Spark regexp_replace takes a literal replacement, not a column —
    # splice the per-row pseudonym via replace() of the placeholder
    return c.select(
        "c_custkey",
        pseudonym.alias("pseudonym"),
        F.replace(scrubbed, F.lit("{PSEUDONYM}"), pseudonym).alias("scrubbed_note"),
    )


@query(
    "tr07_domain_mixture",
    oracle="""
    WITH per_source AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_chars_total,
           ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 6) AS actual_frac,
           ROUND((1.0 / COUNT(*) OVER ())
                 / (n_docs * 1.0 / SUM(n_docs) OVER ()), 6) AS mix_weight
    FROM per_source
    """,
)
def tr07_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source corpus shares and the
    sampling weight that rebalances them to a target mixture (uniform
    here; any target vector drops in the same way). weight > 1 means
    the source must be upsampled/repeated, < 1 downsampled — the knob
    training-data pipelines tune (cf. DoReMi / The Pile's mixture
    tables). The global window runs AFTER aggregation, over one row per
    source (~tens) — a driver-sized relation, so the single-partition
    window is free; the only real shuffle is the groupBy(source)
    partial-agg."""
    from pyspark.sql import Window as W

    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )
    w = W.partitionBy()
    actual = F.col("n_docs") / F.sum("n_docs").over(w)
    target = F.lit(1.0) / F.count("*").over(w)
    return per.select(
        "source",
        "n_docs",
        "n_chars_total",
        F.round(actual, 6).alias("actual_frac"),
        F.round(target / actual, 6).alias("mix_weight"),
    )


PACK_BUDGET = 256  # tokens per training sequence (context-window budget)


@query(
    "tr08_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source,
           CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN (cum - 1) // {PACK_BUDGET}
                              > (cum - n_tok) // {PACK_BUDGET}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_spillover
    FROM c
    GROUP BY source, pack_id
    """,
)
def tr08_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents are packed into {PACK_BUDGET}-token
    training sequences by contiguous fill — a doc belongs to the pack
    its starting offset falls in (cumulative tokens over a deterministic
    doc_id order), so packs fill to the budget and a straddling doc
    spills into the next. Packing runs PER SOURCE (window partitioned by
    source, not global): that is the form that scales — each source's
    docs pack independently on its own executor group, no total order
    over 100 TB, and it matches how pipelines shard packing by domain or
    file anyway. Report: docs and tokens per pack (the trainer's
    sequence-fill profile), plus ``n_spillover`` (round-9): how many of
    the pack's documents straddle into the NEXT pack — the
    attention-contamination count that packing with document masking
    exists to neutralize, derived arithmetically from the same
    cumulative offsets (a doc spills iff its last token's pack differs
    from its first's — no per-sequence explode, no extra shuffle)."""
    from pyspark.sql import Window as W

    d = fan_out(load_table(spark, sf_dir, "documents"))
    t = d.select("source", "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tok")) / PACK_BUDGET).cast("bigint"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(
                    F.floor((F.col("cum") - 1) / PACK_BUDGET)
                    > F.floor((F.col("cum") - F.col("n_tok")) / PACK_BUDGET),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_spillover"),
        )
    )


#: token-window chunking geometry: 64-token windows, stride 48 (16-token
#: overlap) — the embedding/pretraining chunker's shape.
CHUNK_W = 64
CHUNK_S = 48


@query(
    "tr09_token_window_chunking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks, n,
               unnest(generate_series(
                   0,
                   GREATEST(CAST(CEIL((n - {CHUNK_W}) / {CHUNK_S}.0) AS INT) + 1, 1) - 1
               )) AS i
        FROM t
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           CAST(i * {CHUNK_S} + 1 AS INT) AS chunk_start,
           CAST(LEAST({CHUNK_W}, n - i * {CHUNK_S}) AS INT) AS n_tokens,
           CAST(('0x' || substr(md5(array_to_string(
               toks[i * {CHUNK_S} + 1 : i * {CHUNK_S} + LEAST({CHUNK_W}, n - i * {CHUNK_S})],
               ' ')), 1, 8)) AS BIGINT) AS chunk_hash
    FROM c
    """,
)
def tr09_token_window_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking: every document split into {CHUNK_W}-token
    windows advancing by {CHUNK_S} tokens (overlap {CHUNK_W - CHUNK_S}),
    the shape embedding indexes and long-context pretraining use. A doc
    shorter than one window emits exactly one (partial) chunk; the last
    window is truncated, never padded. Entirely map-side — the window
    arithmetic and the per-chunk content hash are one ``transform`` +
    ``explode`` projection inside codegen, zero shuffles, so chunking
    adds nothing to whatever pipeline consumes it at 100 TB. The chunk
    hash (portable md5-prefix, cf. dedup.py) is what downstream
    chunk-level dedup keys on."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = "split(text, ' ')"
    chunks = (
        f"transform(sequence(0, greatest(CAST(ceil((size({toks}) - {CHUNK_W}) / {CHUNK_S}.0) AS INT) + 1, 1) - 1),"
        f" i -> named_struct("
        f"   'chunk_id', i,"
        f"   'chunk_start', i * {CHUNK_S} + 1,"
        f"   'n_tokens', least({CHUNK_W}, size({toks}) - i * {CHUNK_S}),"
        f"   'chunk_hash', CAST(conv(substring(md5(concat_ws(' ',"
        f"       slice({toks}, i * {CHUNK_S} + 1,"
        f"             least({CHUNK_W}, size({toks}) - i * {CHUNK_S})))), 1, 8), 16, 10) AS BIGINT)))"
    )
    return (
        d.select("doc_id", F.explode(F.expr(chunks)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_start").alias("chunk_start"),
            F.col("c.n_tokens").alias("n_tokens"),
            F.col("c.chunk_hash").alias("chunk_hash"),
        )
    )


@query(
    "tr10_filter_cascade_funnel",
    oracle="""
    WITH flags AS (
        SELECT n_chars BETWEEN 50 AND 5000 AS k1,
               len(string_split(text, ' ')) >= 10 AS k2,
               len(list_distinct(string_split(text, ' ')))
                   >= 0.15 * len(string_split(text, ' ')) AS k3
        FROM documents
    )
    SELECT stage, n_in, n_kept,
           ROUND(CAST(n_kept AS DOUBLE) / n_in, 6) AS kept_frac
    FROM (
        SELECT '1_length' AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_in,
               CAST(SUM(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM flags
        UNION ALL
        SELECT '2_min_tokens',
               CAST(SUM(CASE WHEN k1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT '3_repetition',
               CAST(SUM(CASE WHEN k1 AND k2 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN k1 AND k2 AND k3 THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
    )
    """,
)
def tr10_filter_cascade_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter cascade with attrition accounting — the funnel
    report every curation run publishes: length gate → minimum-token
    gate → repetition gate (distinct-token ratio), each stage reporting
    how many docs entered and survived. One corpus pass: all stage
    flags are computed as map-side boolean columns, then a single
    global aggregate emits the whole funnel (conditional sums), so
    adding a stage adds a column, never a scan. This is the composition
    layer over the t02/t03/t09 per-doc scores; at 100 TB the same
    flags-then-aggregate shape also writes the per-stage reject streams
    via multi-column filters without re-reading the corpus."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    flags = d.select(
        F.col("n_chars").between(50, 5000).alias("k1"),
        (F.size(toks) >= 10).alias("k2"),
        (
            F.size(F.array_distinct(toks)) >= 0.15 * F.size(toks)
        ).alias("k3"),
    )
    n = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    agg = flags.agg(
        F.count("*").alias("n0"),
        n(F.col("k1")).alias("n1"),
        n(F.col("k1") & F.col("k2")).alias("n2"),
        n(F.col("k1") & F.col("k2") & F.col("k3")).alias("n3"),
    )
    stages = agg.selectExpr(
        "stack(3, '1_length', n0, n1, '2_min_tokens', n1, n2,"
        " '3_repetition', n2, n3) AS (stage, n_in, n_kept)"
    )
    return stages.select(
        "stage",
        "n_in",
        "n_kept",
        F.round(F.col("n_kept").cast("double") / F.col("n_in"), 6).alias("kept_frac"),
    )


@query(
    "tr11_curriculum_bins",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks
        FROM documents
    ),
    cuts AS (
        SELECT PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY n_toks) AS q1,
               PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY n_toks) AS q2,
               PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY n_toks) AS q3
        FROM d
    )
    SELECT CASE WHEN n_toks <= q1 THEN 1 WHEN n_toks <= q2 THEN 2
                WHEN n_toks <= q3 THEN 3 ELSE 4 END AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(MIN(n_toks) AS BIGINT) AS min_toks,
           CAST(MAX(n_toks) AS BIGINT) AS max_toks,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM d CROSS JOIN cuts
    GROUP BY 1
    """,
)
def tr11_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: order the corpus easy → hard by a difficulty
    proxy (token count — the standard length-curriculum heuristic) and
    cut it into 4 training stages at the corpus quartiles. Same
    scale-right shape as ev07's RFM: the cut-points are ONE
    PERCENTILE_DISC row broadcast back onto the corpus (no global sort,
    no ntile over n rows), stage assignment is a map-side CASE, and
    the per-stage report is one aggregate. DISC cuts are actual integer
    data values — engine-identical, no interpolation ulp (the ev07
    lesson). At 100 TB the stage becomes a write-time partition column
    (opt03) so each curriculum phase reads its own directory."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_toks"))
        # slim (id, lang, int) projection consumed by BOTH the cuts agg
        # and the stage assignment: materialize once (ev07 discipline)
        .localCheckpoint()
    )
    cuts = d.agg(
        *[
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY n_toks)").alias(q)
            for q, p in (("q1", 0.25), ("q2", 0.50), ("q3", 0.75))
        ]
    )
    stage = (
        F.when(F.col("n_toks") <= F.col("q1"), 1)
        .when(F.col("n_toks") <= F.col("q2"), 2)
        .when(F.col("n_toks") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        d.join(F.broadcast(cuts))
        .groupBy(stage.alias("stage"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("n_toks").cast("bigint").alias("min_toks"),
            F.max("n_toks").cast("bigint").alias("max_toks"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


#: tr12 quality gate: minimum tokens to survive curation
CURATION_MIN_TOKS = 20


@query(
    "tr12_curation_pipeline",
    oracle=f"""
    WITH ingest AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL SELECT doc_id, lang, text FROM documents
    ),
    dedup AS (
        SELECT doc_id, lang, text FROM ingest
        QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    tagged AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_toks,
               {_BUCKET_SQL} AS bucket, string_split(text, ' ') AS t
        FROM dedup
        WHERE len(string_split(text, ' ')) >= {CURATION_MIN_TOKS}
    ),
    grams AS (
        SELECT doc_id, bucket, unnest({_GRAM_HASH_SQL}) AS g FROM tagged
    ),
    test_g AS (SELECT DISTINCT g FROM grams WHERE bucket = 9),
    contaminated AS (
        SELECT DISTINCT grams.doc_id FROM grams JOIN test_g USING (g)
        WHERE bucket <= 7
    ),
    clean AS (
        SELECT * FROM tagged
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT CASE WHEN bucket <= 7 THEN 'train'
                WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens
    FROM clean GROUP BY 1, 2
    """,
)
def tr12_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation run, composed end to end — the chain a
    pretraining-data job actually executes, as ONE lazy plan: simulated
    double-ingest → exact dedup (min-doc_id survivor per content
    digest, d01's rule) → quality gate (≥ {CURATION_MIN_TOKS} tokens)
    → content-stable split assignment (tr01's hash-bucket rule) →
    train-split decontamination against the held-out test split
    (tr05's hashed {GRAM_N}-gram overlap, test grams broadcast) →
    per-(split, lang) sizing report. Scale shape is the sum of its
    parts: digest shuffle carries (digest, id) only, the gate and
    bucketing are map-side, the benchmark gram set broadcasts, and the
    contaminated-id set drops out via a broadcast anti-join — end to
    end, document text never shuffles after the dedup stage."""
    from pyspark.sql import Window as W

    d = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "text"
    )
    ingest = d.unionByName(d)
    rn = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
    dedup = ingest.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")
    tagged = (
        dedup.withColumn("n_toks", F.size(F.split("text", " ")))
        .filter(F.col("n_toks") >= CURATION_MIN_TOKS)
        .select(
            "doc_id",
            "lang",
            "n_toks",
            F.expr(_BUCKET_SPARK).alias("bucket"),
            F.split("text", " ").alias("t"),
        )
        # consumed by the gram explode AND the final report: materialize
        # the post-gate corpus once (ev07/d03 discipline)
        .localCheckpoint()
    )
    grams = tagged.select(
        "doc_id", "bucket", F.explode(F.expr(_GRAM_HASH_SPARK)).alias("g")
    )
    test_g = grams.filter(F.col("bucket") == 9).select("g").distinct()
    contaminated = (
        grams.filter(F.col("bucket") <= 7)
        .join(F.broadcast(test_g), "g")
        .select("doc_id")
        .distinct()
    )
    clean = tagged.join(F.broadcast(contaminated), "doc_id", "left_anti")
    split = (
        F.when(F.col("bucket") <= 7, "train")
        .when(F.col("bucket") == 8, "val")
        .otherwise("test")
    )
    return clean.groupBy(split.alias("split"), "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )


#: tr13 — a pretend-trained linear quality classifier (the fastText-/
#: logistic-shaped model every modern curation run scores with). The
#: weights are FROZEN constants: inference, not training, is the
#: operator. Feature order is the contract — both engines compute the
#: margin in this exact term order, so the doubles are bit-identical.
QUALITY_WEIGHTS = {
    "len_sat": 1.8,     # saturated length: least(n_tok/50, 1)
    "ttr": 2.2,         # type-token ratio (lexical diversity)
    "stop_ratio": -3.0, # stopword overload penalizes
    "marker_ratio": 1.1,  # domain-marker density rewards
    "avg_len": -0.7,    # very long tokens look like noise
}
QUALITY_BIAS = -1.9
_QUALITY_MARKERS = ("data", "hash")


@query(
    "tr13_classifier_quality_filter",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_uniq,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ('the', 'a'))) AS n_stop,
               len(list_filter(string_split(text, ' '),
                   x -> x IN ('data', 'hash'))) AS n_marker,
               length(text) AS n_ch
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               {QUALITY_BIAS}
               + {QUALITY_WEIGHTS["len_sat"]} * LEAST(n_tok / 50.0, 1.0)
               + {QUALITY_WEIGHTS["ttr"]} * (CAST(n_uniq AS DOUBLE) / n_tok)
               + {QUALITY_WEIGHTS["stop_ratio"]} * (CAST(n_stop AS DOUBLE) / n_tok)
               + {QUALITY_WEIGHTS["marker_ratio"]} * (CAST(n_marker AS DOUBLE) / n_tok)
               + {QUALITY_WEIGHTS["avg_len"]} * (CAST(n_ch AS DOUBLE) / n_tok / 10.0)
                   AS margin
        FROM feat
    )
    SELECT doc_id, lang, ROUND(margin, 6) AS quality_margin, margin > 0 AS keep
    FROM scored
    """,
)
def tr13_classifier_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the CLASSIFIER stage modern
    curation runs put beside the rule-based gates (t03/t09/tr02 are
    hand-written rules; pretraining pipelines additionally score every
    document with a trained quality model, fastText- or
    logistic-regression-shaped, and keep by margin). Inference is
    expressed as pure columnar arithmetic: the frozen weight vector is
    a set of literals folded into ONE codegen'd projection — features
    (saturated length, type-token ratio, stopword ratio, domain-marker
    density, mean token length) and the linear margin all evaluate
    map-side in a single pass, zero shuffles, composing with the scan
    exactly like the rule gates. The keep decision thresholds the raw
    LINEAR margin (no sigmoid: the logistic is monotone, so margin>0 ≡
    p>0.5, and avoiding transcendentals keeps the doubles bit-identical
    cross-engine; term order is pinned in both expressions). At 100 TB
    the weights come from a trained model instead of constants and the
    same projection serves; a deep scorer swaps in as an Arrow-batched
    Pandas-UDF forward pass (mm01's extension point) with this exact
    plan shape around it."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    feat = d.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.filter(toks, lambda x: x.isin("the", "a"))).alias("n_stop"),
        F.size(F.filter(toks, lambda x: x.isin(*_QUALITY_MARKERS))).alias(
            "n_marker"
        ),
        F.length("text").alias("n_ch"),
    )
    w = QUALITY_WEIGHTS
    margin = (
        F.lit(QUALITY_BIAS)
        + w["len_sat"] * F.least(F.col("n_tok") / 50.0, F.lit(1.0))
        + w["ttr"] * (F.col("n_uniq").cast("double") / F.col("n_tok"))
        + w["stop_ratio"] * (F.col("n_stop").cast("double") / F.col("n_tok"))
        + w["marker_ratio"] * (F.col("n_marker").cast("double") / F.col("n_tok"))
        + w["avg_len"] * (F.col("n_ch").cast("double") / F.col("n_tok") / 10.0)
    )
    return feat.select(
        "doc_id",
        "lang",
        F.round(margin, 6).alias("quality_margin"),
        (margin > 0).alias("keep"),
    )


#: tr14's sampling budget as a fraction of the corpus: 2/5, kept as an
#: exact integer ratio so the allocation is integer arithmetic end to
#: end (see the docstring's exactness argument).
MIX_BUDGET_NUM, MIX_BUDGET_DEN = 2, 5


@query(
    "tr14_temperature_mixture",
    oracle=f"""
    WITH per AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(SUM(CAST(FLOOR(SQRT(n)) AS BIGINT)) AS BIGINT) AS wsum
        FROM per
    ),
    alloc AS (
        SELECT source, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS w,
               CAST(({MIX_BUDGET_NUM}*total
                     - ({MIX_BUDGET_NUM}*total) % {MIX_BUDGET_DEN})
                    / {MIX_BUDGET_DEN} AS BIGINT) AS budget,
               wsum
        FROM per, tot
    ),
    base AS (
        SELECT source, n, budget,
               CAST((budget*w - (budget*w) % wsum) / wsum AS BIGINT) AS base,
               (budget*w) % wsum AS rem
        FROM alloc
    ),
    quota AS (
        SELECT source, n,
               base + (CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                                 <= budget - SUM(base) OVER ()
                       THEN 1 ELSE 0 END) AS q
        FROM base
    ),
    ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT r.source, CAST(LEAST(q.q, q.n) AS BIGINT) AS quota, r.doc_id
    FROM ranked r JOIN quota q ON r.source = q.source
    WHERE r.rn <= LEAST(q.q, q.n)
    """,
)
def tr14_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture SAMPLING — the step after tr07's
    weight table: actually draw the per-domain sample that realizes a
    temperature-flattened mixture (UniMax/mT5-style τ≈0.5: domain
    share ∝ n_d^τ, so small domains are upweighted without repeating
    them past one epoch). Budget = {MIX_BUDGET_NUM}/{MIX_BUDGET_DEN} of
    the corpus; per-domain quotas by LARGEST-REMAINDER apportionment
    (exact: Σ quotas = budget before the epoch cap); within a domain,
    documents are picked by md5-hash order — a deterministic uniform
    draw both engines replay bit-for-bit.

    Exactness: τ=0.5 is realized as w_d = floor(sqrt(n_d)) — IEEE sqrt
    is correctly rounded in BOTH engines and floor(sqrt(int)) can never
    straddle a rounding boundary (sqrt of a perfect square is exact; of
    a non-square, never an integer) — so weights, the weight sum, the
    budget, base quotas (modulo-subtraction division, no engine
    integer-division semantics involved), remainders, and the
    largest-remainder top-up are ALL exact integer arithmetic: no
    cross-engine double drift can flip an allocation, unlike a pow(n,τ)
    formulation whose libm differs in the last ulp between JVM and C.

    Scale: quota math runs over one row per domain (~tens — the
    allowlisted tiny-relation window, tr07's shape); the per-document
    hash rank uses the striped two-pass global rank (tr04's primitive)
    over (source, hash) — range-partitioned, NO per-source
    single-partition window, so one dominant domain cannot hot-spot a
    task; per-source rank = global rank − the domain's broadcast
    min-rank. Selection is then a broadcast quota join + filter —
    map-side, shuffle-free past the rank."""
    from pyspark.sql import Window as W

    d = fan_out(load_table(spark, sf_dir, "documents"))
    per = d.groupBy("source").agg(F.count("*").alias("n"))
    w_all = W.partitionBy()
    BN, BD = MIX_BUDGET_NUM, MIX_BUDGET_DEN
    alloc = per.select(
        "source",
        "n",
        F.floor(F.sqrt("n")).cast("bigint").alias("w"),
        F.sum("n").over(w_all).alias("total"),
        F.sum(F.floor(F.sqrt("n")).cast("bigint")).over(w_all).alias("wsum"),
    ).withColumn(
        "budget",
        ((BN * F.col("total") - (BN * F.col("total")) % BD) / BD).cast("bigint"),
    )
    num = F.col("budget") * F.col("w")
    base = alloc.select(
        "source",
        "n",
        "budget",
        ((num - num % F.col("wsum")) / F.col("wsum")).cast("bigint").alias("base"),
        (num % F.col("wsum")).alias("rem"),
    )
    rrank = F.row_number().over(w_all.orderBy(F.desc("rem"), F.asc("source")))
    leftover = F.col("budget") - F.sum("base").over(w_all)
    quota = base.select(
        "source",
        "n",
        (
            F.col("base")
            + F.when(rrank <= leftover, F.lit(1)).otherwise(F.lit(0))
        ).alias("q"),
    ).select(
        "source", F.least(F.col("q"), F.col("n")).cast("bigint").alias("quota")
    )
    ranked = striped_global_rank(
        d.select("source", "doc_id").withColumn(
            "__h", F.md5(F.col("doc_id").cast("string"))
        ),
        ["source", "__h", "doc_id"],
    )
    src_min = ranked.groupBy("source").agg(F.min("rank").alias("__min_rank"))
    return (
        ranked.join(F.broadcast(src_min), "source")
        .withColumn("rn", F.col("rank") - F.col("__min_rank") + 1)
        .join(F.broadcast(quota), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select("source", "quota", "doc_id")
    )


@query(
    "tr15_span_scrub",
    oracle=f"""
    WITH {_SPAN_WINDOWS_SQL},
    dup AS (SELECT gram_hash FROM w GROUP BY gram_hash
            HAVING COUNT(DISTINCT doc_id) >= 2),
    cov AS (SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS removed
            FROM (SELECT w.doc_id,
                         unnest(generate_series(w.i, w.i + {SPAN_W - 1})) AS p
                  FROM w JOIN dup USING (gram_hash))
            GROUP BY doc_id),
    d AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tok FROM toks)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(COALESCE(removed, 0)) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN COALESCE(removed, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_affected
    FROM d LEFT JOIN cov USING (doc_id)
    GROUP BY source
    """,
)
def tr15_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCRUB half of substring-level dedup (d17 is the detection
    half; Lee et al.'s remedy): token positions covered by any
    cross-document repeated window are dropped, reported here as exact
    per-source accounting — documents, total tokens, tokens a scrub
    would remove, documents affected — the before/after ledger a
    curation pipeline logs for the stage. Plan: the d17 window pass
    (one linear explode, one hash shuffle) produces the duplicated-
    window set, which is corpus-DUPLICATION-sized (Lee et al. measured
    ~1% of C4's tokens inside repeated substrings — billions of
    distinct hashes at 100 TB), so the probe back onto the windows is
    SIZE-GUARDED (:func:`~kt_sql_hbase_ex_spark.functions.dedup.
    probe_duplicated_spans`): counted first, broadcast under the
    budget, shuffled hash join on the already-hashed key above it;
    covered positions explode only from MATCHED windows (∝ duplicated
    occurrences × W, not corpus) and dedupe per document. All counts
    are exact integers — no float can drift between engines. The
    actual text rewrite (filtering the covered positions out and
    re-joining tokens) is the tr16 query."""
    from kt_sql_hbase_ex_spark.functions.dedup import (
        _span_windows,
        probe_duplicated_spans,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    # one row per DOCUMENT (not per token): the ledger's denominator,
    # tokenized by the SAME shared expression the window pass uses
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.expr(_SPAN_TOKENS_SPARK)).alias("n_tok"),
    )
    # two linear window passes, NOT a corpus-sized checkpoint: the
    # exploded window set is ∝ corpus tokens, so materializing it would
    # contradict the stage's documented shape — recomputing the
    # codegen'd projection for the second consumer is the cheap form
    dup = (
        _span_windows(docs)
        .groupBy("gram_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram_hash")
    )
    covered = (
        probe_duplicated_spans(_span_windows(docs), dup)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SPAN_W - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("p").alias("removed"))
    )
    return (
        toks.join(covered, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce(F.col("removed"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.sum(
                F.when(F.coalesce(F.col("removed"), F.lit(0)) > 0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("docs_affected"),
        )
    )


@query(
    "tr16_span_scrubbed_corpus",
    oracle=f"""
    WITH {_SPAN_WINDOWS_SQL},
    dup AS (SELECT gram_hash FROM w GROUP BY gram_hash
            HAVING COUNT(DISTINCT doc_id) >= 2),
    cov AS (SELECT DISTINCT doc_id, p FROM (
              SELECT w.doc_id,
                     unnest(generate_series(w.i, w.i + {SPAN_W - 1})) AS p
              FROM w JOIN dup USING (gram_hash))),
    posn AS (SELECT doc_id, source, t,
                    unnest(generate_series(1, len(t))) AS pos
             FROM toks),
    keep AS (SELECT p.doc_id, p.pos, p.t[p.pos] AS tok
             FROM posn p ANTI JOIN cov c
               ON c.doc_id = p.doc_id AND c.p = p.pos),
    scrub AS (SELECT doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_tok_after,
                     md5(string_agg(tok, ' ' ORDER BY pos)) AS content_md5
              FROM keep GROUP BY doc_id)
    SELECT tk.doc_id, tk.source,
           COALESCE(s.n_tok_after, CAST(0 AS BIGINT)) AS n_tok_after,
           COALESCE(s.content_md5, md5('')) AS content_md5
    FROM toks tk LEFT JOIN scrub s USING (doc_id)
    """,
)
def tr16_span_scrubbed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrub REWRITE tr15 only accounts for (round-9 — the
    transform a curation pipeline actually ships): tokens at positions
    covered by any cross-document repeated window are filtered out of
    each document, the survivors re-join into the scrubbed text, and
    the result reports per document the post-scrub token count and the
    md5 of the surviving text — the oracle replays the identical
    position-level pass in DuckDB, so a rewrite that dropped the wrong
    token, reordered, or lost a document hash-mismatches. Plan: the
    covered-position sets aggregate per document (collect_set — sets
    are ∝ duplicated occurrences × W per doc, bounded by doc length),
    join back onto the token arrays on doc_id, and the rewrite itself
    is ONE codegen'd higher-order filter over the token array — order-
    preserving, map-side, no UDF; the md5 runs on the executors before
    anything shuffles. The probe onto the duplicated-window set is the
    same size-guarded strategy as tr15."""
    from kt_sql_hbase_ex_spark.functions.dedup import (
        _span_windows,
        probe_duplicated_spans,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    toks = docs.select(
        "doc_id", "source", F.expr(_SPAN_TOKENS_SPARK).alias("t")
    )
    dup = (
        _span_windows(docs)
        .groupBy("gram_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram_hash")
    )
    cov = (
        probe_duplicated_spans(_span_windows(docs), dup)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SPAN_W - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("cov"))
    )
    return (
        toks.join(cov, "doc_id", "left")
        .withColumn(
            "cov", F.coalesce(F.col("cov"), F.expr("CAST(array() AS array<int>)"))
        )
        .withColumn(
            "kept",
            F.expr("filter(t, (x, i) -> NOT array_contains(cov, i + 1))"),
        )
        .select(
            "doc_id",
            "source",
            F.size("kept").cast("bigint").alias("n_tok_after"),
            F.md5(F.concat_ws(" ", F.col("kept"))).alias("content_md5"),
        )
    )

