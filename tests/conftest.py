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
    # across parallel worker processes (default 8 for single-process runs)
    return get_session(
        "kt_sql_hbase_ex_spark-tests",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
    )


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
