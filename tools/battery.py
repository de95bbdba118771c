#!/usr/bin/env python
"""The seven-axis oracle-parity battery (SCALE.md round-9 protocol).

Runs the full sharded parity sweep (tools/parity_shards.py) once per
axis: the default sf0.01 gate, AQE off + a hostile shuffle-partition
count, broadcast joins disabled, whole-stage codegen off, both other
fixture scales, and double-run idempotence. Same answers under every
conf perturbation, every scale, and re-invocation — or a loud exit.

Usage:  python tools/battery.py [axis ...]    (default: all seven)
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

AXES: dict[str, dict[str, str]] = {
    "default": {},
    "aqe_off_shuffle7": {
        "SPARK_GRAFT_TEST_CONF": (
            "spark.sql.adaptive.enabled=false;"
            "spark.sql.shuffle.partitions=7"
        )
    },
    "no_broadcast": {
        "SPARK_GRAFT_TEST_CONF": "spark.sql.autoBroadcastJoinThreshold=-1"
    },
    "codegen_off": {
        "SPARK_GRAFT_TEST_CONF": "spark.sql.codegen.wholeStage=false"
    },
    "sf0001": {"SPARK_GRAFT_SF_ORACLE": "/root/testdata/sf0.001"},
    "sf01": {"SPARK_GRAFT_SF_ORACLE": "/root/testdata/sf0.1"},
    "double_run": {"SPARK_GRAFT_DOUBLE_RUN": "1"},
}


def main() -> int:
    names = sys.argv[1:] or list(AXES)
    unknown = [n for n in names if n not in AXES]
    if unknown:
        print(f"unknown axes {unknown}; choose from {list(AXES)}")
        return 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        env = dict(os.environ)
        env.update(AXES[name])
        t0 = time.time()
        rc = subprocess.call(
            [sys.executable, "tools/parity_shards.py", "-n", "4"],
            cwd=repo,
            env=env,
        )
        if rc:
            # one retry: concurrent-shard Python-worker handshake churn
            # can kill a healthy stream ("failed to connect back") — a
            # repeatable failure is real, a one-off is infra
            print(f"=== axis {name}: rc={rc}, retrying once ===", flush=True)
            rc = subprocess.call(
                [sys.executable, "tools/parity_shards.py", "-n", "4"],
                cwd=repo,
                env=env,
            )
        print(f"=== axis {name}: rc={rc} in {time.time() - t0:.0f}s ===", flush=True)
        if rc:
            return rc
    print("battery: all axes green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
