"""FIXTURES.md F3: nested-schema flatten regression tests — the generic
flatten-to-extension-tables machinery generalizing beyond the token table
(array-of-primitive, array-of-struct, map, nested struct, reassembly, ER dot),
mirroring the reference's golden schemas (TestRecord.a array field,
Interop.mapField, recursive populate)."""

import pytest
from pyspark.sql import Row, functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.nested import (
    flatten_table,
    reassemble_array,
    schema_dot,
)


@pytest.fixture(scope="module")
def nested_df(spark):
    rows = [
        Row(
            id=1,
            name="a",
            tags=["x", "y"],
            address=Row(city="cph", zip="2100"),
            props={"k1": 10, "k2": 20},
            lines=[Row(sku="s1", qty=2), Row(sku="s2", qty=3)],
        ),
        Row(
            id=2,
            name="b",
            tags=[],
            address=None,
            props={},
            lines=[Row(sku="s3", qty=1)],
        ),
    ]
    return spark.createDataFrame(rows)


def test_flatten_produces_extension_tables(nested_df):
    tables = flatten_table(nested_df, root_name="Order")
    assert set(tables) == {
        "Order",
        "Order.Tags",
        "Order.Address",
        "Order.Props",
        "Order.Lines",
    }
    root = tables["Order"]
    # primitive-only projection, system cols first, primitives sorted (O6)
    assert root.columns == ["pj_uid", "pj_pid", "pj_fid", "pj_pos", "id", "name"]
    assert root.count() == 2


def test_array_primitive_child_rows(nested_df):
    tables = flatten_table(nested_df, root_name="Order")
    tags = tables["Order.Tags"]
    assert tags.count() == 2  # row 2 has no tags
    got = {(r["pj_pos"], r["item"]) for r in tags.collect()}
    assert got == {(0, "x"), (1, "y")}
    assert tags.filter(F.col("pj_fid") != "tags").count() == 0


def test_join_contract_fk(nested_df):
    tables = flatten_table(nested_df, root_name="Order")
    root, lines = tables["Order"], tables["Order.Lines"]
    joined = lines.join(
        root.select(F.col("pj_uid").alias("uid"), "id"),
        lines["pj_pid"] == F.col("uid"),
    )
    per_parent = {r["id"]: r["n"] for r in
                  joined.groupBy("id").agg(F.count("*").alias("n")).collect()}
    assert per_parent == {1: 2, 2: 1}
    assert {r["sku"] for r in joined.filter(F.col("id") == 1).collect()} == {"s1", "s2"}


def test_struct_and_map_children(nested_df):
    tables = flatten_table(nested_df, root_name="Order")
    addr = tables["Order.Address"]
    assert addr.count() == 1  # null struct row skipped (nullable-record, A8)
    assert addr.first()["city"] == "cph"
    props = tables["Order.Props"]
    got = {(r["key"], r["value"]) for r in props.collect()}
    assert got == {("k1", 10), ("k2", 20)}


def test_flatten_deterministic(nested_df):
    a = flatten_table(nested_df, root_name="Order")
    b = flatten_table(nested_df, root_name="Order")
    for name in a:
        assert a[name].exceptAll(b[name]).count() == 0


def test_reassemble_array_roundtrip(nested_df):
    tables = flatten_table(nested_df, root_name="Order")
    back = reassemble_array(tables["Order"], tables["Order.Tags"], "tags")
    got = {r["id"]: list(r["tags"]) for r in back.collect()}
    assert got == {1: ["x", "y"], 2: []}


def test_schema_dot(nested_df):
    dot = schema_dot(flatten_table(nested_df, root_name="Order"))
    assert dot.startswith("digraph tables {")
    assert 'Order -> Order_Tags [label="tags (1-n)"]' in dot
    assert "item: string" in dot


def test_schema_dot_cardinality_glyphs(nested_df):
    """A31 cardinality from provenance tags: array/map 1-n, nullable record
    0-1 (the reference's NULLABLE vs ARRAY/MAP Transformation glyphs)."""
    tables = flatten_table(nested_df, root_name="Order")
    assert tables.tags == {
        "Order.Tags": "array",
        "Order.Address": "record?",
        "Order.Props": "map",
        "Order.Lines": "array",
    }
    dot = schema_dot(tables)
    assert 'Order -> Order_Address [label="address (0-1)"]' in dot
    assert 'Order -> Order_Props [label="props (1-n)"]' in dot


def test_system_column_trio_propagates(nested_df):
    """pj_pds/pj_dts propagate to every extension table (partition pruning +
    lineage extend to nested outputs); pj_sha is root-only like the
    reference's payload hash."""
    tables = flatten_table(
        nested_df,
        root_name="Order",
        uid_expr=F.xxhash64("id"),
        pds_expr="date '2026-02-01'",
        sha_expr="sha2(cast(id as string), 256)",
        dts_expr="timestamp_ntz '2026-02-01 12:00:00'",
    )
    root = tables["Order"]
    assert root.columns[:7] == [
        "pj_uid", "pj_pid", "pj_fid", "pj_pos", "pj_pds", "pj_sha", "pj_dts",
    ]
    assert root.filter(F.col("pj_sha").isNull()).count() == 0
    for child_name in ("Order.Tags", "Order.Lines", "Order.Props", "Order.Address"):
        child = tables[child_name]
        assert "pj_pds" in child.columns and "pj_dts" in child.columns
        rows = child.collect()
        assert all(str(r["pj_pds"]) == "2026-02-01" for r in rows)
        assert all(r["pj_sha"] is None for r in rows)  # root-only sha
    # the FK join keyed by (pds, pid) still holds
    lines = tables["Order.Lines"]
    joined = lines.join(
        root.select(F.col("pj_uid").alias("uid"), "pj_pds", "id"),
        (lines["pj_pid"] == F.col("uid")) & (lines["pj_pds"] == root["pj_pds"]),
    )
    assert joined.count() == 3
