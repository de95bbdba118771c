"""File-format connectors — Parquet, CSV, JSON, ORC round-trips.

Reference analog: S13 — the reference's only connector is the HBase
client bootstrapped from a ZooKeeper quorum
(``hbase/HBaseConnection.kt:28-44``); every byte enters and leaves
through HBase RPC. Spark-first, the connector surface is
``spark.read.<format>`` / ``df.write.<format>``: each format below is a
distributed scan/sink with its own pushdown profile (Parquet: predicate
+ projection pushdown; ORC: same; CSV/JSON: projection-only via schema,
predicates evaluate post-parse).

Scale notes: columnar formats (Parquet/ORC) are the 100 TB interchange —
splittable, compressed, min/max-indexed. CSV/JSON exist as *ingest*
formats: read once with an explicit schema (inference is a full extra
pass), convert to Parquet, never re-scan raw text. The round-trip
below is the conversion job in miniature.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table

NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


def _roundtrip_dir(fmt: str) -> str:
    return os.path.join(tempfile.gettempdir(), "kt_sql_formats", fmt)


@query(
    "src01_multi_format_roundtrip",
    oracle="""
    SELECT fmt, CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name
    FROM (
        SELECT 'csv' AS fmt, n_nationkey, n_name FROM nation
        UNION ALL SELECT 'json', n_nationkey, n_name FROM nation
        UNION ALL SELECT 'orc',  n_nationkey, n_name FROM nation
    )
    """,
)
def src01_multi_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 analog: the same relation written to and read back from CSV,
    JSON and ORC (Parquet is the fixtures' native format, exercised by
    every other query). Reads use explicit schemas — at scale, schema
    inference on raw text is a second full pass over the data."""
    nation = load_table(spark, sf_dir, "nation")
    out = []
    for fmt in ("csv", "json", "orc"):
        path = _roundtrip_dir(fmt)
        nation.write.mode("overwrite").format(fmt).save(path)
        back = (
            spark.read.format(fmt).schema(NATION_SCHEMA).load(path)
            if fmt != "orc"
            else spark.read.orc(path)
        )
        out.append(back.select(F.lit(fmt).alias("fmt"), "n_nationkey", "n_name"))
    a, b, c = out
    return a.unionByName(b).unionByName(c)
