"""User-defined functions — the vectorized extension surface.

Reference analog: Calcite supports schema-registered functions but the
reference registers none (no ``SqlFunction``/``ScalarFunction`` anywhere
under ``src/``, SURVEY.md §2.3) — UDFs are a capability *extension*
here, expressed the way they must be at 100 TB:

* ``@pandas_udf`` — Arrow-batched, columnar transfer, numpy kernel:
  ~10–100× a row-at-a-time Python UDF. This is the only sanctioned way
  to put Python in a hot path.
* ``spark.udf.register`` exposes the same kernel to the SQL surface, so
  ``spark.sql`` queries and DataFrame code share one implementation.

Row-at-a-time ``F.udf`` is deliberately absent from this repo: anything
expressible as column algebra stays JVM-side in codegen, and anything
that truly needs Python gets Arrow batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from kt_sql_hbase_ex_spark.registry import query
from kt_sql_hbase_ex_spark.sources.catalog import load_table


# DoubleType() instance, not the "double" DDL string: the string form is
# parsed through the active session at decoration time, which would make
# importing this module require a running SparkContext.
@pandas_udf(DoubleType())
def revenue_score(price: pd.Series, discount: pd.Series) -> pd.Series:
    """log1p-scaled net revenue — a numpy kernel over Arrow batches."""
    import numpy as np

    return pd.Series(np.log1p(price.to_numpy() * (1.0 - discount.to_numpy())))


@query(
    "f05_vectorized_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(LN(1 + l_extendedprice * (1 - l_discount)), 6) AS score
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def f05_vectorized_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow/pandas) UDF applied both through the DataFrame
    API and — registered — through SQL; the plan shows a single
    ``ArrowEvalPython`` stage fused over the scan, no per-row pickling.
    The oracle replays the same math in SQL, pinning the kernel's
    semantics, not just its shape."""
    spark.udf.register("revenue_score", revenue_score)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(revenue_score("l_extendedprice", "l_discount"), 6).alias("score"),
    )


@query(
    "f06_array_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(v) AS INTEGER) AS dim,
           ROUND(list_aggregate(v, 'sum'), 6) AS vec_sum,
           ROUND(list_aggregate(list_transform(v, x -> x*x), 'sum'), 6) AS vec_norm2,
           CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
           ROUND(list_sort(v)[1], 6) AS vec_min
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) t
    WHERE vec_id < 100
    """,
)
def f06_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order functions — transform, filter, aggregate,
    sort — over the embedding vectors. The reference's type system had
    no ARRAY/MAP at all (decode throws ``AssertionError('unknown column
    type')``, ``hbase/HBaseTable.kt:306``); Spark evaluates these
    lambda expressions inside codegen, JVM-side — per-element work with
    zero Python cost, the 100 TB way to do vector arithmetic short of
    a numpy pandas UDF."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 6).alias("vec_sum"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x), 6
        ).alias("vec_norm2"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_min(v), 6).alias("vec_min"),
    )


@pandas_udf(DoubleType())
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-aggregate pandas UDF (UDAF): quantity-weighted mean price.
    Whole groups arrive as Arrow batches; returns one scalar per group."""
    import numpy as np

    q = qty.to_numpy()
    return float(np.dot(price.to_numpy(), q) / q.sum())


@query(
    "f07_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
               AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def f07_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE function via grouped-agg pandas UDF — the
    second half of the UDF surface (reference registered neither,
    SURVEY.md §2.3). Executes as a real aggregate in the plan (partial
    batches per group, Arrow transfer); the oracle replays the math
    relationally. At 100 TB: groups arrive whole per-reducer, so UDAF
    memory is O(group size) — keep custom aggs algebraic (decomposable)
    when group cardinality is low and groups are huge."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                weighted_avg_price("l_extendedprice", "l_quantity"), 6
            ).alias("w_avg_price")
        )
    )


@query(
    "f08_python_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 20),
    i AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS tok FROM i
    """,
)
def f08_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (UDTF): a tokenizer expanding
    each document into (pos, tok) rows, applied per input row with
    ``LATERAL`` — the extension hook for row-expanding logic that isn't
    a built-in generator (custom parsers, segmenters). ``useArrow``
    makes it an ArrowEvalPythonUDTF — batched Arrow transfer like every
    other Python path in this engine (the plan-sweep invariant bans
    row-at-a-time BatchEvalPython outright); for hot paths still prefer
    the codegen'd ``explode`` (t01) — this query exists to pin the UDTF
    surface itself."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, tok: string", useArrow=True)
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                yield i, t

    spark.udtf.register("ktsql_tokenize", Tokenize)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.select("doc_id", "text").createOrReplaceTempView("f08_docs")
    return spark.sql(
        "SELECT doc_id, pos, tok FROM f08_docs, LATERAL ktsql_tokenize(text)"
    )
