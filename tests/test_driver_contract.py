"""Driver-contract smoke: the three deliverables the round driver calls
(`entry`, `queries`/`oracle_sql`, `bench.py`) keep their shapes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import __spark_entry__ as entrymod

from .conftest import SF_SMALL


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert [f.name for f in df.schema.fields] == [
        "r_name",
        "n_name",
        "revenue",
        "n_orders",
    ]
    # the all-regions grid keeps the smoke multi-row even at sf0.001
    assert len(rows) > 1


def test_queries_oracle_alignment():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL; every query callable
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
    assert all(callable(fn) for fn in qs.values())
    # every registered query is oracle-checked — a rows-only addition
    # must be a deliberate decision, so this set staying empty is load-
    # bearing (a04 carries an exact-count tolerance flag, mm02 a
    # byte-arithmetic replay; both became hash-checkable in round 2)
    assert set(qs) - set(oracles) == set()


def test_bench_final_line_is_compact():
    """bench.py at sf0.001 prints a full detail line then a FINAL
    compact (<1 KB) headline JSON line — the driver keeps only the
    tail of stdout (~2.2 KB), so the last line must parse on its own
    (round-11's single ever-growing line arrived truncated and the
    official record was lost; VERDICT r11 task #1). Run in a
    subprocess: bench builds its own session; ~40 s."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_SMALL, SPARK_GRAFT_CPUS="8")
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        # ~7 min standalone at 55 entries (sf0.001); headroom for a
        # loaded host — the full suite runs this beside 600 tests
        timeout=900,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 2, out.stdout
    # final line: valid JSON, < 1 KB, carries headline_total
    assert len(lines[-1].encode()) < 1024, len(lines[-1].encode())
    final = json.loads(lines[-1])
    assert final["metric"] == "headline_total"
    assert final["unit"] == "sec" and final["value"] > 0
    assert final["sf"] == 0.001
    assert final["queries_n"] > 0
    # detail line: per-query timings + lifecycle phases
    detail = json.loads(lines[0])
    assert detail["metric"] == "headline_detail"
    assert len(detail["queries"]) == final["queries_n"]
    assert abs(sum(detail["queries"].values()) - final["value"]) < 0.05
    # round-11: lifecycle entries split into build/serve phases whose
    # sum is the entry's recorded total (headline comparability);
    # round-12 adds the first-call provisioning cost separately.
    assert detail["phases"], "lifecycle phases missing"
    for name, ph in detail["phases"].items():
        assert set(ph) == {"build", "serve", "provision"}, name
        assert abs(ph["build"] + ph["serve"] - detail["queries"][name]) < 0.05, name
        assert ph["provision"] >= 0, name


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md and README.md state the registered-query count in
    prose; keep them honest against the actual registry so doc drift
    can't misreport the surface."""
    import os
    import re

    from kt_sql_hbase_ex_spark import registry

    n = len(registry.all_queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cov = open(os.path.join(root, "COVERAGE.md")).read()
    m = re.search(r"(\d+)\nregistered queries total", cov)
    assert m and int(m.group(1)) == n, (m and m.group(1), n)
    readme = open(os.path.join(root, "README.md")).read()
    m2 = re.search(r"`queries\(\)` → (\d+) named", readme)
    assert m2 and int(m2.group(1)) == n, (m2 and m2.group(1), n)
