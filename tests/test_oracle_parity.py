"""The core gate: every registered query hash-matches its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row-count + schema +
order-insensitive value compare) at the same scale factor (sf0.01).
"""

from __future__ import annotations

import os

import pytest

from kt_sql_hbase_ex_spark import registry
from kt_sql_hbase_ex_spark.testing import check_query, duckdb_connect

from .conftest import SF_ORACLE

ALL = sorted(registry.all_queries())

# Process-level sharding (pytest-xdist is not shipped in this env):
# SPARK_GRAFT_SHARD="i/n" keeps every n-th query starting at i, so
# ``tools/parity_shards.py`` can run n pytest processes in parallel,
# each with its own Spark session and DuckDB connection. Round-robin
# (not contiguous) slicing balances the expensive families across
# shards.
_shard = os.environ.get("SPARK_GRAFT_SHARD")
if _shard:
    _i, _n = (int(x) for x in _shard.split("/"))
    ALL = [q for j, q in enumerate(ALL) if j % _n == _i]

_RESULTS: dict[str, object] = {}


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, con):
    if os.environ.get("SPARK_GRAFT_DOUBLE_RUN"):
        # invocation-idempotence axis: run the query a FIRST time in the
        # same session and require it green, then grade the SECOND run —
        # catches works-only-once bugs (stale temp views, store
        # provisioning that breaks on re-entry, non-hermetic feeds) that
        # per-process axes can never see. Opt-in: it doubles the sweep.
        first = check_query(name, spark, SF_ORACLE, con)
        assert first.ok, f"first invocation: {first}"
    result = check_query(name, spark, SF_ORACLE, con)
    _RESULTS[name] = result
    assert result.ok, str(result)
    # Enforce the ROUND-both-sides convention: the 6-decimal compare is an
    # *absolute* tolerance, so unrounded large-magnitude doubles would pass
    # here by luck and flake at the driver. Fail loudly instead.
    assert not result.precision_risks, str(result)


def test_no_vacuous_queries():
    """Every oracle-checked query must return >0 rows at the gate scale —
    a 0-row match proves nothing about operator semantics. (Reuses the
    results of the parametrized run above; runs after it by definition
    order. Under ``-k`` selection / sharding / xdist only a subset of the
    parametrized tests runs in this process, so check whatever is
    present instead of demanding full coverage.)"""
    if not _RESULTS:
        pytest.skip("no parity results in this process (deselected)")
    try:
        sf = float(os.path.basename(SF_ORACLE.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.01
    if sf < 0.01:
        # below the gate scale highly-selective filters legitimately
        # match on 0 rows (conftest documents sf0.001's 0/1-row cases);
        # the vacuousness guard is calibrated for sf0.01+
        pytest.skip(f"vacuousness guard runs at gate scale (sf>=0.01), got {sf}")
    empty = [
        name
        for name, result in _RESULTS.items()
        if result.spark_rows == 0 and registry.all_queries()[name].oracle is not None
    ]
    assert not empty, f"vacuous (0-row) queries: {empty}"
