"""Named-query registry — the engine's public query surface.

Every capability row in ``SURVEY.md §2`` is exposed as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an ANSI-SQL oracle string that DuckDB can execute over the same Parquet
tables. The driver's correctness gate compares the two.

Reference analog: the reference's capability surface was "whatever SQL
Calcite accepts over the adapter" (``hbase/HBaseTable.kt:26-38``); here
the surface is enumerated explicitly so it is testable line by line.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = field(default="")


_REGISTRY: dict[str, RegisteredQuery] = {}

# Modules that define queries; imported lazily by load_all() so that
# importing the package stays cheap and has no Spark dependency at
# import time.
_QUERY_MODULES = (
    "kt_sql_hbase_ex_spark.operators.scans",
    "kt_sql_hbase_ex_spark.operators.joins",
    "kt_sql_hbase_ex_spark.operators.aggregates",
    "kt_sql_hbase_ex_spark.operators.windows",
    "kt_sql_hbase_ex_spark.operators.setops",
    "kt_sql_hbase_ex_spark.operators.sort_limit",
    "kt_sql_hbase_ex_spark.operators.dml",
    "kt_sql_hbase_ex_spark.operators.timeseries",
    "kt_sql_hbase_ex_spark.operators.events_analytics",
    "kt_sql_hbase_ex_spark.operators.quality",
    "kt_sql_hbase_ex_spark.operators.ddl",
    "kt_sql_hbase_ex_spark.operators.optimize",
    "kt_sql_hbase_ex_spark.operators.flagship",
    "kt_sql_hbase_ex_spark.operators.composite",
    "kt_sql_hbase_ex_spark.functions.scalar",
    "kt_sql_hbase_ex_spark.functions.udf",
    "kt_sql_hbase_ex_spark.sources.formats",
    "kt_sql_hbase_ex_spark.sources.kvstore",
    "kt_sql_hbase_ex_spark.functions.text",
    "kt_sql_hbase_ex_spark.functions.text_index",
    "kt_sql_hbase_ex_spark.functions.dedup",
    "kt_sql_hbase_ex_spark.functions.pipeline",
    "kt_sql_hbase_ex_spark.functions.similarity",
    "kt_sql_hbase_ex_spark.functions.sketches",
    "kt_sql_hbase_ex_spark.functions.multimodal",
    "kt_sql_hbase_ex_spark.streaming.events",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as named query ``name``.

    ``oracle`` is the DuckDB-runnable ANSI SQL equivalent. Omit it only
    for genuinely non-SQL-expressible operators (streaming state,
    iterative algorithms) — those get a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, RegisteredQuery]:
    load_all()
    return dict(_REGISTRY)


def queries_dict() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in all_queries().items()}


def oracle_dict() -> dict[str, str]:
    return {
        name: rq.oracle for name, rq in all_queries().items() if rq.oracle is not None
    }


def _main() -> None:
    """``python -m kt_sql_hbase_ex_spark.registry`` — print the query
    surface (name, oracle-checked?, first doc line)."""
    for name, rq in sorted(all_queries().items()):
        doc = (rq.doc or "").strip().splitlines()
        first = doc[0] if doc else ""
        oracle = "oracle" if rq.oracle else "rows-only"
        print(f"{name:36s} {oracle:9s} {first}")


if __name__ == "__main__":
    # under ``python -m`` this file runs as ``__main__`` while the query
    # modules register into the canonical ``kt_sql_hbase_ex_spark.registry``
    # instance — delegate so both read the same registry
    from kt_sql_hbase_ex_spark import registry as _canonical

    _canonical._main()
