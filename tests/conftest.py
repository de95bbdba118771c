from __future__ import annotations

import os

import pytest

from kt_sql_hbase_ex_spark.session import get_session

#: sf0.001 for fast unit checks; the oracle-parity sweep uses the same
#: scale the driver gates on (sf0.01) unless overridden.
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_CPUS lets tools/parity_shards.py split the core budget
    # across parallel worker processes (default 8 for single-process runs).
    # SPARK_GRAFT_TEST_CONF ("k=v;k=v") overlays session conf for the
    # robustness sweeps (SCALE.md §11): AQE off, odd shuffle-partition
    # counts, no-auto-broadcast — proving no answer depends on them.
    extra = {}
    for pair in os.environ.get("SPARK_GRAFT_TEST_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            extra[k.strip()] = v.strip()
    return get_session(
        "kt_sql_hbase_ex_spark-tests",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf=extra or None,
    )


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
