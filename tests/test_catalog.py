"""Catalog metadata contract — the table.sys/column.sys analog.

Reference: ``getRowType`` rebuilds a table's struct type from catalog
attributes ordered by POSITION (``hbase/HBaseTable.kt:101-118,135-165``);
this suite asserts our catalog reports the exact FIXTURES.md schemas
(name, type, nullability, position) through the same public surface.
"""

from __future__ import annotations

import pytest

from kt_sql_hbase_ex_spark.sources import catalog

EXPECTED_SCHEMAS = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),  # parquet ts w/o UTC adjustment
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_small):
    catalog.register_views(spark, sf_small)


@pytest.mark.parametrize("table", catalog.TABLES)
def test_schema_matches_fixtures(spark, table):
    cols = catalog.describe_columns(spark, table)
    got = [(c.name, c.data_type) for c in cols]
    assert got == EXPECTED_SCHEMAS[table]
    assert [c.position for c in cols] == list(range(len(cols)))


def test_all_tables_registered(spark):
    names = {t.name for t in spark.catalog.listTables()}
    assert set(catalog.TABLES) <= names


def test_describe_table_attributes(spark):
    info = catalog.describe_table(spark, "orders")
    assert info["primary"] == ("o_orderkey",)
    assert info["n_columns"] == 6
    assert info["is_transactional"] is None  # OLTP attr: no analytics analog


@pytest.mark.parametrize(
    "table",
    [t for t in catalog.TABLES if t != "lineitem"],  # fixture reuses line numbers
)
def test_primary_keys_unique(spark, table):
    df = spark.table(table)
    keys = list(catalog.PRIMARY_KEYS[table])
    assert df.count() == df.select(*keys).distinct().count()


def test_create_table_rejects_missing_primary_key(spark):
    """Reference: PrimaryKeyMissedException (hbase/HBaseSchema.kt:133-136)."""
    with pytest.raises(catalog.PrimaryKeyMissedError):
        catalog.create_table(spark, "ktsql_test_nopk", [("k", "BIGINT", None)], None)
    with pytest.raises(catalog.PrimaryKeyMissedError):
        catalog.create_table(
            spark, "ktsql_test_badpk", [("k", "BIGINT", None)], ("missing_col",)
        )
    assert not spark.catalog.tableExists("ktsql_test_nopk")


def test_create_table_rejects_reserved_id_column(spark):
    """Reference: IllegalColumnNameException for any-case 'id'
    (hbase/HBaseSchema.kt:113-115)."""
    for bad in ("id", "ID", "Id"):
        with pytest.raises(catalog.IllegalColumnNameError):
            catalog.create_table(
                spark, "ktsql_test_idcol", [(bad, "BIGINT", None)], (bad,)
            )
    assert not spark.catalog.tableExists("ktsql_test_idcol")


def test_create_table_persists_table_attributes(spark):
    """table.sys analog attrs (PRIMARY/CHARSET/COMMENT/CREATE_TIME) must
    round-trip through describe_table (hbase/HBaseTable.kt:209-219)."""
    tbl = "ktsql_test_attrs"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    catalog.create_table(
        spark,
        tbl,
        [("k", "BIGINT", None), ("v", "STRING", "'x'")],
        ("k",),
        comment="attr roundtrip",
    )
    try:
        info = catalog.describe_table(spark, tbl)
        assert info["primary"] == ("k",)
        assert info["charset"] == "UTF-8"
        assert info["comment"] == "attr roundtrip"
        assert info["create_time"]  # recorded at create
        defaults = {c.name: c.default for c in catalog.describe_columns(spark, tbl)}
        assert defaults == {"k": None, "v": "'x'"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_create_table_escapes_quoted_comment(spark):
    """A single quote in a user comment must neither break the generated
    DDL nor inject extra properties (regression: raw interpolation)."""
    from kt_sql_hbase_ex_spark.operators.ddl import _reset_table

    tbl = "ktsql_quote_comment"
    _reset_table(spark, tbl)
    catalog.create_table(
        spark,
        tbl,
        [("k", "BIGINT", None)],
        ("k",),
        comment="O'Brien's table ('x'='y')",
    )
    try:
        info = catalog.describe_table(spark, tbl)
        assert info["comment"] == "O'Brien's table ('x'='y')"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_describe_columns_max_length_and_precision(spark):
    """column.sys MAX_LENGTH / PRECISION attribute analogs
    (hbase/HBaseTable.kt:221-229): char/varchar report their declared
    length (Spark erases both to string and keeps the declared type in
    field metadata), decimal reports precision/scale, everything else
    reports None."""
    tbl = "ktsql_test_lenprec"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    catalog.create_table(
        spark,
        tbl,
        [
            ("k", "BIGINT", None),
            ("code", "CHAR(2)", None),
            ("label", "VARCHAR(25)", None),
            ("amount", "DECIMAL(18,6)", None),
            ("note", "STRING", None),
        ],
        ("k",),
    )
    try:
        by_name = {c.name: c for c in catalog.describe_columns(spark, tbl)}
        assert by_name["code"].max_length == 2
        assert by_name["label"].max_length == 25
        assert (by_name["amount"].precision, by_name["amount"].scale) == (18, 6)
        assert by_name["k"].max_length is None and by_name["k"].precision is None
        assert by_name["note"].max_length is None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_describe_columns_comment(spark):
    """column.sys COMMENT attribute analog (hbase/HBaseTable.kt:221-229):
    a per-column comment set at create surfaces in describe_columns,
    with quotes escaped like the table-level comment path."""
    tbl = "ktsql_test_colcomment"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    catalog.create_table(
        spark,
        tbl,
        [
            ("k", "BIGINT", None, "the key"),
            ("v", "STRING", "'x'", "O'Brien's column"),
            ("w", "INT", None),  # 3-tuple form stays valid
        ],
        ("k",),
    )
    try:
        by_name = {c.name: c for c in catalog.describe_columns(spark, tbl)}
        assert by_name["k"].comment == "the key"
        assert by_name["v"].comment == "O'Brien's column"
        assert by_name["v"].default == "'x'"  # comment does not eat DEFAULT
        assert by_name["w"].comment is None
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
