"""DSv2-style KV source: pushdown negotiation, region skipping, column
pruning. (End-to-end oracle parity for src02 is covered by
test_oracle_parity's auto-discovery; these pin the connector semantics
the reference's HBase adapter had — rowkey ranges, server-side filters,
residual handoff.)"""

from __future__ import annotations

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNull,
    LessThanOrEqual,
    StringContains,
)
from pyspark.sql.types import StructType

from kt_sql_hbase_ex_spark.sources.kvstore import (
    KVScanReader,
    customer_store,
)

from .conftest import SF_SMALL


def _reader(store, drop=()):
    sub = StructType([f for f in store.schema.fields if f.name not in drop])
    return KVScanReader(store, sub)


def test_key_range_prunes_regions():
    store = customer_store(SF_SMALL, region_size=16)  # 150 rows -> ~10 regions
    rd = _reader(store)
    residual = list(
        rd.pushFilters(
            [GreaterThanOrEqual(("c_custkey",), 1), LessThanOrEqual(("c_custkey",), 32)]
        )
    )
    assert residual == []
    parts = rd.partitions()
    assert 0 < len(parts) < len(store.regions())
    keys = [t[0] for p in parts for t in p.tuples]
    assert keys == sorted(keys) and min(keys) >= 1 and max(keys) <= 32


def test_point_lookup_single_region():
    store = customer_store(SF_SMALL, region_size=16)
    rd = _reader(store)
    assert list(rd.pushFilters([EqualTo(("c_custkey",), 7)])) == []
    parts = rd.partitions()
    assert len(parts) == 1
    assert [t[0] for t in parts[0].tuples] == [7]


def test_open_bound_excludes_boundary_row():
    store = customer_store(SF_SMALL, region_size=16)
    rd = _reader(store)
    assert list(rd.pushFilters([GreaterThan(("c_custkey",), 10)])) == []
    keys = [t[0] for p in rd.partitions() for t in p.tuples]
    assert min(keys) == 11


def test_server_side_filter_and_residual_split():
    store = customer_store(SF_SMALL, region_size=64)
    rd = _reader(store)
    residual = list(
        rd.pushFilters(
            [
                EqualTo(("c_mktsegment",), "BUILDING"),
                In(("c_nationkey",), (1, 2, 3)),
                GreaterThan(("c_acctbal",), 0.0),  # non-key range: residual
                StringContains(("c_name",), "Customer"),  # unsupported: residual
                IsNull(("c_acctbal",)),  # unsupported: residual
            ]
        )
    )
    assert {type(f).__name__ for f in residual} == {
        "GreaterThan",
        "StringContains",
        "IsNull",
    }
    seg_i = [f.name for f in store.schema.fields].index("c_mktsegment")
    nat_i = [f.name for f in store.schema.fields].index("c_nationkey")
    rows = [t for p in rd.partitions() for t in p.tuples]
    assert rows and all(
        t[seg_i] == "BUILDING" and t[nat_i] in (1, 2, 3) for t in rows
    )


def test_read_schema_prunes_qualifiers():
    store = customer_store(SF_SMALL, region_size=64)
    rd = _reader(store, drop=("c_name", "c_acctbal"))
    rd.pushFilters([EqualTo(("c_custkey",), 3)])
    (part,) = rd.partitions()
    assert len(part.tuples[0]) == len(store.schema.fields) - 2


def test_empty_range_yields_one_empty_partition():
    store = customer_store(SF_SMALL, region_size=16)
    rd = _reader(store)
    rd.pushFilters([GreaterThanOrEqual(("c_custkey",), 10**9)])
    parts = rd.partitions()
    assert len(parts) == 1 and parts[0].tuples == []
