#!/usr/bin/env python
"""Run the full oracle-parity sweep as N parallel pytest processes.

pytest-xdist is not available in this environment, so sharding is done
at the process level: each worker gets ``SPARK_GRAFT_SHARD=i/n`` and
``tests/test_oracle_parity.py`` keeps every n-th registered query
(round-robin, so the expensive families spread across shards). Each
worker owns a full Spark session (cpus split evenly across workers,
default 32 total) and its own DuckDB connection — no shared state.

Usage:  python tools/parity_shards.py [-n WORKERS] [--cpus TOTAL]
Exit code 0 iff every shard passed. ~3x faster than the single-process
sweep at n=4 on local[32].
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=4, help="worker processes")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    per = max(2, args.cpus // args.n)
    t0 = time.time()
    procs = []
    for i in range(args.n):
        env = dict(os.environ)
        env["SPARK_GRAFT_SHARD"] = f"{i}/{args.n}"
        env["SPARK_GRAFT_CPUS"] = str(per)
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "tests/test_oracle_parity.py", "-q", "--no-header"],
            cwd=repo,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        procs.append((i, p))

    rc = 0
    for i, p in procs:
        out, _ = p.communicate()
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- shard {i}/{args.n} (rc={p.returncode}) ---\n{tail}")
        if p.returncode != 0:
            rc = 1
            print(out)  # full log for the failing shard
    print(f"total: {round(time.time() - t0, 1)}s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
