"""Plan inspection helpers.

The reference's only "plan quality" tooling was a config knob comparing
pushdown flavors (``hbase/HBaseTable.kt:198-207``). Here plans are
first-class: these helpers extract the formatted physical plan so tests
can assert the properties that matter at 100 TB — filters reached the
Parquet reader (PushedFilters), projection pruned the read schema
(ReadSchema), dimension joins broadcast, top-k avoided a global sort,
aggregates have a map-side partial phase.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The physical plan in `formatted` mode (operator tree + details)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in a scan's PushedFilters list."""
    plan = formatted_plan(df)
    return any(
        fragment in line for line in plan.splitlines() if "PushedFilters" in line
    )


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each Parquet scan's ReadSchema (projection pruning)."""
    out: list[list[str]] = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            _, _, schema = line.partition("struct<")
            cols = [c.split(":")[0].strip() for c in schema.rstrip(">").split(",") if c]
            out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators — the unit of 100 TB pain."""
    return formatted_plan(df).count("Exchange")
