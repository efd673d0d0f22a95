"""Avro IDL (`.avdl`) front door: the reference's protocol files must produce
the SAME flattened table sets as their compiled `.avsc` twins — golden parity
through `avsc_to_struct` + `schema_markdown` (the `test/tab/<Name>.md`
strategy), plus targeted shape checks for the IDL-only constructs."""

import os

import pytest

from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_idl import (
    avdl_schema,
    avdl_to_structs,
    parse_avdl,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_schema import (
    avsc_to_struct,
    schema_markdown,
)

AVDL_DIR = "/root/reference/avro/avdl"
AVSC_DIR = "/root/reference/avro/avsc"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "avro")

# (protocol file, record types whose .avsc twins + goldens exist)
CASES = [
    ("org/apache/avro/InteropProtocol.avdl", ["Foo", "Node", "Interop"]),
    ("org/apache/avro/test/Simple.avdl", ["TestRecord", "TestError"]),
    ("org/apache/avro/gen/Cycle.avdl",
     ["SampleNode", "Method", "SamplePair", "SelfRef"]),
    ("org/foo/Import.avdl", ["Bar"]),
]


@pytest.mark.parametrize(
    "avdl,name",
    [(a, n) for a, names in CASES for n in names],
    ids=lambda x: x.split("/")[-1] if isinstance(x, str) else x,
)
def test_avdl_matches_avsc_twin_tables(avdl, name):
    """IDL-parsed schema flattens to byte-identical golden table sets as the
    compiled .avsc twin (same structs, same truncation provenance)."""
    proto = parse_avdl(os.path.join(AVDL_DIR, avdl))
    info = avsc_to_struct(avdl_schema(proto, name))
    assert info.errors == []
    twin = avsc_to_struct(open(f"{AVSC_DIR}/{name}.avsc").read())
    assert info.struct == twin.struct
    assert sorted(info.truncated) == sorted(twin.truncated)
    golden = open(f"{GOLDEN_DIR}/{name}.md").read()
    assert schema_markdown(info) == golden


def test_protocol_header_and_order():
    proto = parse_avdl(os.path.join(AVDL_DIR, "org/apache/avro/test/Simple.avdl"))
    assert proto.name == "Simple"
    assert proto.namespace == "org.apache.avro.test"
    assert proto.props.get("version") == "1.0.5"
    # declaration order preserved: Kind, Status, TestRecord, MD5, TestError
    short = [t.rsplit(".", 1)[-1] for t in proto.types]
    assert short == ["Kind", "Status", "TestRecord", "MD5", "TestError"]


def test_idl_constructs_land_in_schema():
    proto = parse_avdl(os.path.join(AVDL_DIR, "org/apache/avro/test/Simple.avdl"))
    rec = avdl_schema(proto, "TestRecord")
    fields = {f["name"]: f for f in rec["fields"]}
    # field-level annotations stay on the field
    assert fields["name"]["order"] == "ignore"
    assert fields["nullableHash"]["aliases"] == ["hash_", "hsh"]
    # type-level custom props decorate the type
    assert fields["l"]["type"] == {"type": "long", "foo.bar": "bar.foo"}
    assert fields["a"]["type"]["foo.bar.bar"] == "foo.bar2"
    # union props are dropped (not representable), branches survive
    assert fields["prop"]["type"] == ["null", "string"]
    # logical shorthand: time_ms → int/time-millis
    assert fields["t"]["type"][0] == {"type": "int",
                                      "logicalType": "time-millis"}
    # record-level custom annotation
    assert rec["my-property"] == {"key": 3}
    # enum default symbol
    status = fields["status"]["type"]
    assert status["symbols"] == ["A", "B", "C"] and status["default"] == "C"
    # doc comments normalize like the twin's
    assert rec["doc"] == "A TestRecord."
    assert fields["value"]["doc"].startswith(
        "These two fields parse correctly")
    assert "\n" in fields["value"]["doc"]


def test_import_idl_resolves_cross_namespace():
    proto = parse_avdl(os.path.join(AVDL_DIR, "org/foo/Import.avdl"))
    assert "org.apache.avro.ipc.specific.Foo" in proto.defs
    bar = avdl_schema(proto, "Bar")
    foo_inline = bar["fields"][0]["type"]
    assert foo_inline["name"] == "Foo"
    assert foo_inline["namespace"] == "org.apache.avro.ipc.specific"


def test_defaults_parse_as_json_values():
    proto = parse_avdl(
        os.path.join(AVDL_DIR, "org/apache/avro/InteropProtocol.avdl"))
    interop = avdl_schema(proto, "Interop")
    d = {f["name"]: f.get("default") for f in interop["fields"]}
    assert d["intField"] == 1 and d["longField"] == -1
    assert d["boolField"] is False
    assert d["doubleField"] == -1000000000000.0
    node = avdl_schema(proto, "Node")
    assert node["fields"][1]["default"] == []


def test_avdl_to_structs_records_only():
    infos = avdl_to_structs(
        os.path.join(AVDL_DIR, "org/apache/avro/gen/Cycle.avdl"))
    assert set(infos) == {
        "org.apache.avro.gen.SampleNode", "org.apache.avro.gen.Method",
        "org.apache.avro.gen.SamplePair", "org.apache.avro.gen.SelfRef",
    }
    assert all(i.errors == [] for i in infos.values())


def test_import_cycle_parses_once(tmp_path):
    """Mutually-importing protocols must not duplicate type declarations:
    the root file seeds the seen-set, so a circular `import idl` chain is a
    no-op instead of a re-parse."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_idl import (
        parse_avdl,
    )

    (tmp_path / "a.avdl").write_text(
        'protocol A { import idl "b.avdl"; record RecA { long x; } }'
    )
    (tmp_path / "b.avdl").write_text(
        'protocol B { import idl "a.avdl"; record RecB { string y; } }'
    )
    proto = parse_avdl(str(tmp_path / "a.avdl"))
    assert proto.types == ["RecB", "RecA"]
    assert len(proto.types) == len(set(proto.types))
