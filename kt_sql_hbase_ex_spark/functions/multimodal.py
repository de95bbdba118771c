"""Multimodal column handling: opaque binary payloads + typed metadata.

No reference analog (the reference's only binary support was raw
``BINARY/VARBINARY`` cells with a decode ``fixme``,
``hbase/HBaseTable.kt:303-305``). This module supplies the pattern a
100 TB multimodal pipeline needs:

* media as **opaque ``binary`` columns** riding next to typed metadata —
  Parquet stores them column-separated, so metadata-only queries never
  touch the bytes (column pruning is the whole game at this scale);
* decode / feature-extraction as **Arrow-batched ``mapInPandas``**
  operators — the Python boundary crossed once per batch, not per row;
* the actual image/audio codec **stubbed deterministically** (the
  container ships no media libraries): ``try: import PIL`` gates the
  real path, and the fallback derives features from the bytes
  themselves, keeping schema, batching and partitioning real and
  testable.

The fixture has no media files, so payloads are synthesized
deterministically from ``documents.text`` (UTF-8 bytes = the "blob").
Every derived quantity is arithmetic on those bytes, which is why all
three queries — including mm02's Pandas-UDF path — are oracle-checkable
(the DuckDB oracle replays the byte arithmetic via hex-pair parsing).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import fan_out, load_table

FRAME_STRIDE = 30  # sample one frame per stride


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic media table: payload binary + typed metadata
    (the schema a real ingest would produce: media_id, payload, format,
    declared dims, frame count)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    h = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_format"),
        (h % 1280).cast("int").alias("width"),
        (h % 720).cast("int").alias("height"),
        (1 + h % 90).cast("int").alias("n_frames"),
    )


@query(
    "mm01_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_format,
           CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1280 AS INTEGER) AS width,
           CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 720 AS INTEGER) AS height
    FROM documents
    """,
)
def mm01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the media table: byte size, checksum and
    typed attributes — all computable without decoding, and (because the
    payload is its own Parquet column) without *reading* the payload
    when only metadata is selected."""
    m = media_table(spark, sf_dir)
    return m.select(
        "media_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5(F.decode("payload", "UTF-8")).alias("checksum"),
        "media_format",
        "width",
        "height",
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction. When a codec library is present
    a real per-payload decode would slot in here; the fixture payloads
    are synthetic UTF-8 blobs, so the executed path is always the
    deterministic byte-level features (which is what the DuckDB oracle
    replays) — logged, never raised, so a codec-equipped environment
    degrades gracefully instead of failing the pipeline."""
    try:  # pragma: no cover - container has no media codecs
        import PIL.Image  # noqa: F401

        import logging

        logging.getLogger(__name__).info(
            "codec available but payloads are synthetic byte blobs; "
            "using deterministic byte-level features"
        )
    except ImportError:
        pass

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                # raw quotient, deliberately unrounded: sum and length are
                # exact ints, so the IEEE division is bit-identical in every
                # engine — pre-rounding here hit genuine 7-decimal ties
                # (power-of-two byte counts), where Python rounds half-even
                # but SQL engines round half-away
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
                "head_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                "media_format": pdf["media_format"],
            }
        )


@query(
    "mm02_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                ELSE list_aggregate(
                    list_transform(generate_series(1, octet_length(encode(text))),
                        i -> CAST(('0x' || substr(hex(encode(text)), 2*i-1, 2)) AS BIGINT)),
                    'sum')
                    / CAST(octet_length(encode(text)) AS DOUBLE)
           END AS mean_byte,
           lower(substr(hex(encode(text)), 1, 8)) AS head_hex,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_format
    FROM documents
    """,
)
def mm02_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    the operator shape for any real decode/resize/embed step. One Arrow
    batch in, one out; executors run batches in parallel; nothing ever
    collects to the driver. The emitted features are pure arithmetic on
    the payload bytes, so the DuckDB oracle replays them exactly
    (hex-pair parsing of the UTF-8 blob) — the Pandas-UDF path is fully
    hash-checked, not rows-only."""
    m = media_table(spark, sf_dir)
    return m.select("media_id", "payload", "media_format").mapInPandas(
        _extract_features,
        schema=(
            "media_id bigint, n_bytes bigint, mean_byte double, "
            "head_hex string, media_format string"
        ),
    )


@query(
    "mm03_frame_sample",
    oracle=f"""
    SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx
    FROM (
        SELECT doc_id AS media_id,
               unnest(generate_series(0,
                   CAST(1 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 90 AS INTEGER) - 1,
                   {FRAME_STRIDE})) AS frame_idx
        FROM documents
        WHERE doc_id % 3 = 2
    )
    """,
)
def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video rows: explode a strided frame-index
    sequence per media item (every {FRAME_STRIDE}th frame) — the row
    multiplication step that precedes per-frame decode in a video
    pipeline. Pure ``sequence``+``explode``: map-side, no shuffle."""
    m = media_table(spark, sf_dir).filter(F.col("media_format") == "video/mp4")
    return m.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(FRAME_STRIDE))
        ).alias("fi"),
    ).select("media_id", F.col("fi").cast("bigint").alias("frame_idx"))


@query(
    "mm04_payload_dedup",
    oracle="""
    WITH d AS (
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_format,
               sha256(text) AS digest
        FROM documents
    ),
    per AS (
        SELECT media_format, digest, COUNT(*) AS c FROM d GROUP BY 1, 2
    )
    SELECT media_format,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_payloads,
           CAST(SUM(c) AS BIGINT) AS n_payloads,
           CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
               AS n_redundant_copies
    FROM per GROUP BY media_format
    """,
)
def mm04_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable payload dedup — d01's exact-dedup pattern
    applied to the binary modality: payloads are identified by their
    sha-256 digest, so only (format, 32-byte digest) pairs ever shuffle,
    never the payload bytes — at 100 TB of media that is the difference
    between shuffling kilobytes and shuffling the archive. The report
    gives per-format distinct/total/redundant counts (the storage-
    reclaim number a dedup pass is run for). Exact byte-equality is the
    right first pass for media (re-uploads, mirrors); perceptual near-
    dup is the mm02 feature path's job downstream."""
    m = media_table(spark, sf_dir)
    per = (
        m.select("media_format", F.sha2("payload", 256).alias("digest"))
        .groupBy("media_format", "digest")
        .agg(F.count("*").alias("c"))
    )
    return per.groupBy("media_format").agg(
        F.count("*").alias("n_distinct_payloads"),
        F.sum("c").cast("bigint").alias("n_payloads"),
        F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0))
        .cast("bigint")
        .alias("n_redundant_copies"),
    )


#: mm05 audio framing: bytes per analysis frame (a stand-in for the
#: fixed sample windows an audio pipeline cuts PCM into)
FRAME_BYTES = 64


def _frame_energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched per-frame energy extraction — the audio analog of
    mm02's decode: payload bytes framed into {FRAME_BYTES}-byte windows,
    per-frame energy = Σ (byte−128)², all int64 (exact in every engine).
    numpy vectorizes whole frames per payload; the Python boundary is
    crossed once per Arrow batch."""
    import numpy as np

    for pdf in batches:
        out = {
            "media_id": [],
            "n_frames": [],
            "peak_frame": [],
            "peak_energy": [],
            "total_energy": [],
        }
        for mid, payload in zip(pdf["media_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_full = len(b) // FRAME_BYTES
            out["media_id"].append(mid)
            out["n_frames"].append(n_full)
            if n_full == 0:  # trailing partial frames are not analyzed
                out["peak_frame"].append(None)
                out["peak_energy"].append(None)
                out["total_energy"].append(0)
                continue
            frames = b[: n_full * FRAME_BYTES].reshape(n_full, FRAME_BYTES)
            e = ((frames - 128) ** 2).sum(axis=1)
            peak = int(e.argmax())  # numpy argmax = first max: min-index tie rule
            out["peak_frame"].append(peak)
            out["peak_energy"].append(int(e[peak]))
            out["total_energy"].append(int(e.sum()))
        yield pd.DataFrame(out)


@query(
    "mm05_audio_frame_energy",
    oracle=f"""
    WITH audio AS (
        SELECT doc_id AS media_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n_bytes
        FROM documents WHERE doc_id % 3 = 1
    ),
    bytes AS (
        SELECT media_id, (i - 1) // {FRAME_BYTES} AS frame,
               CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS byte
        FROM audio,
             LATERAL (SELECT unnest(generate_series(
                 1, (n_bytes // {FRAME_BYTES}) * {FRAME_BYTES})) AS i)
    ),
    energies AS (
        SELECT media_id, frame,
               SUM((byte - 128) * (byte - 128)) AS e
        FROM bytes GROUP BY media_id, frame
    ),
    agg AS (
        SELECT media_id,
               CAST(frame AS BIGINT) AS peak_frame,
               CAST(e AS BIGINT) AS peak_energy,
               CAST(SUM(e) OVER (PARTITION BY media_id) AS BIGINT) AS total_energy
        FROM energies
        QUALIFY ROW_NUMBER() OVER (PARTITION BY media_id
                                   ORDER BY e DESC, frame) = 1
    )
    SELECT a.media_id,
           CAST(a.n_bytes // {FRAME_BYTES} AS BIGINT) AS n_frames,
           agg.peak_frame, agg.peak_energy,
           COALESCE(agg.total_energy, 0) AS total_energy
    FROM audio a LEFT JOIN agg ON agg.media_id = a.media_id
    """,
)
def mm05_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality feature extraction: the payload framed into
    {FRAME_BYTES}-byte analysis windows with per-frame energy
    Σ (byte−128)² — the mm02 pattern applied to the audio rows of the
    media table (a real pipeline swaps the byte arithmetic for a PCM
    decode behind the same ``mapInPandas`` signature; schema, batching
    and partitioning stay identical). Reported per clip: full-frame
    count, the peak frame (first-max tie rule, matching the oracle's
    min-index QUALIFY), its energy, and total energy — everything
    int64, so cross-engine parity is exact with no rounding at all.
    Scale: embarrassingly parallel map over payload bytes; only the
    five-number summary ever leaves the executor."""
    m = media_table(spark, sf_dir).filter(F.col("media_format") == "audio/wav")
    return m.select("media_id", "payload").mapInPandas(
        _frame_energies,
        schema=(
            "media_id bigint, n_frames bigint, peak_frame bigint, "
            "peak_energy bigint, total_energy bigint"
        ),
    )
