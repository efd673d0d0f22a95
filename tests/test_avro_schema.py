"""Avro `.avsc` ingestion: golden table-schema tests over the reference's own
schema corpus (`/root/reference/avro/avsc/*.avsc`), mirroring its
`test/tab/<Name>.md` golden strategy (`Unit.Tests/.../EqualsMarkdownTests.fs`)
— one fixture per schema, deterministic ordering, assert-no-parse-errors —
plus an end-to-end parse → conform → flatten → recombine data test."""

import os

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators import nested
from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_schema import (
    avsc_to_struct,
    schema_markdown,
)

AVSC_DIR = "/root/reference/avro/avsc"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "avro")
NAMES = [
    "Bar", "Foo", "Interop", "Method", "TestError", "TestRecord",
    "Node", "SelfRef", "SampleNode", "SamplePair",
]


@pytest.mark.parametrize("name", NAMES)
def test_avsc_golden_table_schemas(name):
    info = avsc_to_struct(open(f"{AVSC_DIR}/{name}.avsc").read())
    assert info.errors == []
    golden = open(f"{GOLDEN_DIR}/{name}.md").read()
    assert schema_markdown(info) == golden


def test_interop_union_and_named_types():
    info = avsc_to_struct(open(f"{AVSC_DIR}/Interop.avsc").read())
    fields = {f.name: f for f in info.struct.fields}
    # A8 general union -> struct of nullable typeN branches
    union = fields["unionField"].dataType
    assert [f.name for f in union.fields] == ["type0", "type1", "type2"]
    assert all(f.nullable for f in union.fields)
    # enum -> string, fixed -> binary, null -> nullable string
    assert fields["enumField"].dataType.simpleString() == "string"
    assert fields["fixedField"].dataType.simpleString() == "binary"
    assert fields["nullField"].nullable
    assert info.named["org.apache.avro.Kind"]["symbols"] == ["A", "B", "C"]
    assert info.named["org.apache.avro.MD5"]["size"] == 16


def test_mutually_recursive_pair_truncated():
    """SamplePair→SampleNode→array<SamplePair>: the MUTUAL recursion is cut
    at the back-reference (reference golden ``test/tab/SamplePair.md`` keeps
    the same three tables; its subNodes rows re-link via pj_pid, which a
    tree-shaped StructType cannot express — the truncation is recorded)."""
    info = avsc_to_struct(open(f"{AVSC_DIR}/SamplePair.avsc").read())
    assert info.errors == []
    assert any("recursive reference to org.apache.avro.gen.SamplePair" in t
               for t in info.truncated)
    fields = {f.name: f for f in info.struct.fields}
    # method record survives whole; node keeps count but loses subNodes
    assert [f.name for f in fields["method"].dataType.fields] == [
        "declaringClass", "methodName"]
    assert [f.name for f in fields["node"].dataType.fields] == ["count"]


def test_recursive_reference_truncated_not_crashed():
    info = avsc_to_struct(open(f"{AVSC_DIR}/SelfRef.avsc").read())
    assert info.errors == []
    assert any("recursive" in t for t in info.truncated)
    assert [f.name for f in info.struct.fields] == ["something"]


def test_nullable_union_collapse():
    info = avsc_to_struct(open(f"{AVSC_DIR}/TestRecord.avsc").read())
    fields = {f.name: f for f in info.struct.fields}
    assert fields["nullableHash"].nullable  # [null, MD5]
    assert fields["nullableHash"].dataType.simpleString() == "binary"
    assert fields["t"].nullable  # [time-millis int, null]
    assert fields["t"].dataType.simpleString() == "int"


def test_as_union_dispatch(spark):
    """A17 analog: heterogeneous sources land in their matching union branch,
    all other branches null, and union into one union-typed table."""
    from pyspark.sql import types as T

    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_schema import as_union

    u = T.StructType(
        [
            T.StructField("type0", T.LongType(), True),
            T.StructField("type1", T.StringType(), True),
        ]
    )
    ints = spark.createDataFrame([(1, 7), (2, 8)], "id int, v long")
    strs = spark.createDataFrame([(3, "x")], "id int, v string")
    merged = as_union(ints, "v", u).unionByName(as_union(strs, "v", u))
    rows = {r["id"]: (r["v"]["type0"], r["v"]["type1"]) for r in merged.collect()}
    assert rows == {1: (7, None), 2: (8, None), 3: (None, "x")}
    with pytest.raises(ValueError):
        as_union(spark.createDataFrame([(1.5,)], "v double"), "v", u)


def test_avsc_conform_flatten_recombine(spark):
    """Data path: a dataset conforming to an .avsc-derived StructType flattens
    into extension tables and recombines via the pj_pid=pj_uid contract."""
    avsc = """
    {"type": "record", "name": "Doc", "namespace": "test",
     "fields": [
       {"name": "doc_id", "type": "string"},
       {"name": "meta", "type": {"type": "record", "name": "Meta",
          "fields": [{"name": "lang", "type": "string"},
                     {"name": "source", "type": "string"}]}},
       {"name": "words", "type": {"type": "array", "items": "string"}}
     ]}
    """
    info = avsc_to_struct(avsc)
    rows = [("d1", ("en", "web"), ["a", "b"]), ("d2", ("de", "code"), ["x"])]
    df = spark.createDataFrame(rows, info.struct)
    tables = nested.flatten_table(
        df, root_name=info.name, uid_expr=F.xxhash64("doc_id")
    )
    assert set(tables) == {"Doc", "Doc.Meta", "Doc.Words"}
    root, words = tables["Doc"], tables["Doc.Words"]
    joined = words.join(root.select("pj_uid", "doc_id"), words.pj_pid == root.pj_uid)
    got = {(r["doc_id"], r["pj_pos"], r["item"]) for r in joined.collect()}
    assert got == {("d1", 0, "a"), ("d1", 1, "b"), ("d2", 0, "x")}


# ------------------- AST / Environment golden views (VERDICT r04 #5) --------
# The reference tests three orthogonal views per schema
# (`Unit.Tests/Tests/{Ast,Environment,Tables}/EqualsMarkdownTests.fs`,
# goldens `test/{ast,env,tab}/*.md`). The Tables view is pinned above; these
# pin the walker's internals — the named-type environment and the per-record
# resolved field types WITH nullability at every nesting level — so a
# regression in union tagging or nullable collapse cannot hide behind a
# coincidentally-identical physical schema.
# Regenerate after intentional walker changes:  python -m tests.test_avro_schema


@pytest.mark.parametrize("name", NAMES)
def test_avsc_golden_ast(name):
    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_schema import (
        ast_markdown,
    )

    info = avsc_to_struct(open(f"{AVSC_DIR}/{name}.avsc").read())
    with open(f"{GOLDEN_DIR}/ast/{name}.md") as fh:
        assert ast_markdown(info) == fh.read()


@pytest.mark.parametrize("name", NAMES)
def test_avsc_golden_env(name):
    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_schema import (
        env_markdown,
    )

    info = avsc_to_struct(open(f"{AVSC_DIR}/{name}.avsc").read())
    with open(f"{GOLDEN_DIR}/env/{name}.md") as fh:
        assert env_markdown(info) == fh.read()


if __name__ == "__main__":  # regenerate the ast/env goldens
    import pathlib

    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_schema import (
        ast_markdown,
        env_markdown,
    )

    for view, render in (("ast", ast_markdown), ("env", env_markdown)):
        d = pathlib.Path(GOLDEN_DIR) / view
        d.mkdir(parents=True, exist_ok=True)
        for name in NAMES:
            info = avsc_to_struct(open(f"{AVSC_DIR}/{name}.avsc").read())
            (d / f"{name}.md").write_text(render(info))
            print(f"wrote {d / (name + '.md')}")
