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


def executed_plan(df: DataFrame) -> str:
    """The (possibly adaptive) physical plan tree as a string. Planning
    does not run the query's own action — but queries whose CONSTRUCTION
    eagerly materializes intermediates (``localCheckpoint``) have
    already run those jobs by the time the DataFrame exists, so calling
    the query fn to get a plan is not free for them."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_unbounded_global_window(df: DataFrame) -> bool:
    """True if the plan contains a Window whose input is an ``Exchange
    SinglePartition`` over an UNBOUNDED relation — the scale-killer where
    one task must hold the whole windowed set (Spark itself warns "Moving
    all data to a single partition").

    A single-partition window is *bounded* — and therefore acceptable —
    when a Limit/TakeOrderedAndProject sits below the exchange (the t12
    shape: rank the K rows surviving a top-k cut). Detection walks the
    plan tree by indentation: for each ``Exchange SinglePartition``, find
    whether a Window node is among its ancestors with no other Exchange
    in between, and whether any limit node appears in its subtree.
    """
    lines = executed_plan(df).splitlines()

    def indent(s: str) -> int:
        # tree glyphs (":", "+-", "-", spaces) form the indent prefix
        i = 0
        while i < len(s) and s[i] in " :+-*":
            i += 1
        return i

    for n, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        here = indent(line)
        # subtree below: deeper-indented lines until indent falls back.
        # A limit bounds the exchange only if it sits on the exchange's
        # single-child SPINE — a limit inside one input of a join/union
        # does NOT bound the join's output, so stop accepting at the
        # first multi-child node (DFS order: the join line precedes its
        # children, so breaking there rejects limits in either input).
        bounded = False
        for sub in lines[n + 1 :]:
            if indent(sub) <= here:
                break
            if any(
                k in sub
                for k in ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")
            ):
                bounded = True
                break
            # stop at multi-child nodes (a limit inside one join/union
            # input doesn't bound the output) AND at row-expanding
            # single-child nodes (a limit below an explode/Expand bounds
            # input rows, not the expanded set)
            if any(
                k in sub
                for k in ("Join", "Union", "Cartesian", "Generate", "Expand")
            ):
                break
        if bounded:
            continue
        # ancestors above: first shallower line chain; a Window before any
        # other Exchange means this exchange feeds the window directly.
        # Node NAMES are matched (leading alpha token), not substrings:
        # WindowGroupLimit is a top-k pre-filter, not a Window, and ANY
        # aggregate flavor (HashAggregate / SortAggregate /
        # ObjectHashAggregate) repartitions its output semantics, so the
        # walk must stop there — substring "HashAggregate" alone let a
        # SortAggregate ancestor leak an unrelated higher Window into a
        # false positive.
        cur = here
        for up in reversed(lines[:n]):
            ui = indent(up)
            if ui >= cur:
                continue
            cur = ui
            name = _node_name(up)
            if name in ("Window", "WindowInPandas"):
                return True
            if "Exchange" in name or "Aggregate" in name or "Join" in name:
                break
    return False


def _node_name(line: str) -> str:
    """Leading operator name of one executed-plan tree line — 'Window',
    'WindowGroupLimit', 'SortAggregate'… Strips the tree glyphs AND the
    whole-stage-codegen stage marker: an executed plan prints codegen'd
    nodes as ``*(2) HashAggregate(...)``, and a matcher that stops at
    the ``(2)`` would return '' and silently skip the node — exactly
    the ancestor-walk break this helper exists to make precise."""
    import re

    m = re.match(r"[\s:+\-*]*(?:\(\d+\)\s*)?([A-Za-z]+)", line)
    return m.group(1) if m else ""
