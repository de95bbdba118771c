"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``kt_sql_hbase_ex_spark`` package; this file
just adapts the package's query registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kt_sql_hbase_ex_spark import registry
from kt_sql_hbase_ex_spark.operators.flagship import revenue_all_regions


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The all-regions (region, nation) revenue grid: the same five-way
    join + aggregate as the filtered flagship, but with every group
    surviving, so even at sf0.001 the smoke check sees a multi-row
    result with a stable schema."""
    return revenue_all_regions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; omitted entries get a
    rows-only check (non-SQL-expressible ops only)."""
    return registry.oracle_dict()
