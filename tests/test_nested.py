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
