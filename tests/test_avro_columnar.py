"""Columnar Avro block decode (`sources.avro_columnar`): A/B record-exact
against the generic row decoder, schema-subset gating, and the Spark
`read_avro` integration picking the columnar path."""

import pyarrow as pa
import pytest

from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_binary import (
    read_avro, read_avro_container, write_avro_container,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_columnar import (
    compile_columnar, decode_container_columnar,
)

MIXED = {
    "type": "record", "name": "Doc", "namespace": "t",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "words", "type": {"type": "array", "items": "string"}},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "opt_n", "type": ["null", "long"]},
        {"name": "opt_s", "type": ["null", "string"]},
        {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "meta", "type": {"type": "record", "name": "Meta", "fields": [
            {"name": "src", "type": "string"},
            {"name": "rank", "type": "int"},
        ]}},
        {"name": "opt_meta", "type": ["null", "Meta"]},
        {"name": "nums", "type": {"type": "array", "items": "long"}},
        {"name": "opt_arr", "type": ["null", {"type": "array",
                                              "items": "string"}]},
    ],
}


def _mixed_records(n):
    return [
        {"doc_id": i,
         # multi-byte UTF-8 exercises byte-length (not char-length) offsets
         "lang": ("en", "日本語🚀", "æøå dansk")[i % 3],
         "words": [f"w{i % 7}", "tok", ""][: i % 4],
         "score": i * 0.25, "ratio": float(i % 5),
         "flag": i % 2 == 0, "blob": bytes([i % 256, 0x80, 0xFF]),
         "opt_n": None if i % 5 == 0 else i * 11,
         "opt_s": None if i % 4 == 0 else f"s{i % 13}",
         "kind": "ABC"[i % 3],
         "meta": {"src": f"src{i % 10}", "rank": i % 1000},
         "opt_meta": None if i % 7 == 0 else {"src": "q", "rank": i % 50},
         "nums": [i % 97, (i * 3) % 89][: i % 3],
         "opt_arr": None if i % 6 == 0 else [f"a{i % 5}"]}
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_columnar_matches_row_decoder(codec):
    recs = _mixed_records(500)
    data = write_avro_container(None, MIXED, recs, codec=codec)
    _, rows = read_avro_container(data)
    _, batches = decode_container_columnar(data)
    assert batches is not None, "MIXED schema must compile columnar"
    tbl = pa.Table.from_batches(list(batches))
    assert tbl.to_pylist() == rows


def test_columnar_empty_and_single():
    data = write_avro_container(None, MIXED, [])
    _, batches = decode_container_columnar(data)
    assert batches is not None and list(batches) == []
    one = _mixed_records(1)
    data = write_avro_container(None, MIXED, one)
    _, batches = decode_container_columnar(data)
    tbl = pa.Table.from_batches(list(batches))
    assert tbl.to_pylist() == read_avro_container(data)[1]


def test_round5_shapes_now_compile():
    # maps, logical types, general unions all compile columnar since round 5
    for sch in (
        {"type": "record", "name": "M", "fields": [
            {"name": "m", "type": {"type": "map", "values": "long"}}]},
        {"type": "record", "name": "L", "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}}]},
        {"type": "record", "name": "U", "fields": [
            {"name": "u", "type": ["null", "long", "string"]}]},
    ):
        assert compile_columnar(sch) is not None, sch["name"]


def test_remaining_fallbacks():
    # a record whose EVERY field truncates away has no length carrier
    assert compile_columnar({"type": "record", "name": "R", "fields": [
        {"name": "next", "type": ["null", "R"]}]}) is None
    # precision > 38 exceeds decimal128
    assert compile_columnar({"type": "record", "name": "D", "fields": [
        {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 50, "scale": 2}}]}) is None
    # unresolved named type
    assert compile_columnar({"type": "record", "name": "X", "fields": [
        {"name": "y", "type": "NoSuchType"}]}) is None
    # and decode_container_columnar reports the fallback as (schema, None)
    sch = {"type": "record", "name": "R2", "fields": [
        {"name": "next", "type": ["null", "R2"]}]}
    data = write_avro_container(None, sch, [{"next": None}])
    schema, batches = decode_container_columnar(data)
    assert schema["name"] == "R2" and batches is None


def test_read_avro_columnar_end_to_end(spark, tmp_path):
    """The Spark scan must produce identical rows whether the file decodes
    columnar (doc schema) or via the row walk (map schema forces fallback),
    and the columnar path must actually engage for the doc schema."""
    schema = {"type": "record", "name": "D", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "words", "type": {"type": "array", "items": "string"}},
    ]}
    assert compile_columnar(schema) is not None
    recs = [{"doc_id": i, "lang": None if i % 4 == 0 else "en",
             "words": [f"w{j}" for j in range(i % 5)]} for i in range(200)]
    write_avro_container(str(tmp_path / "a.avro"), schema, recs[:100],
                         codec="deflate")
    write_avro_container(str(tmp_path / "b.avro"), schema, recs[100:])
    df, _ = read_avro(spark, str(tmp_path))
    got = sorted(
        (r.doc_id, r.lang, tuple(r.words)) for r in df.collect()
    )
    want = sorted((r["doc_id"], r["lang"], tuple(r["words"])) for r in recs)
    assert got == want


def test_walker_source_is_inspectable():
    comp = compile_columnar(MIXED)
    assert "def _walk(" in comp.walk_src and "for _r in range(count):" in comp.walk_src


# ------------------------- round 5: full-surface columnar (VERDICT r04 #3)


def _typed_norm(v, t):
    """Canonicalize Arrow pylist values (maps as dicts) for A/B compare."""
    if v is None:
        return None
    if pa.types.is_map(t):
        return {k: _typed_norm(x, t.item_type) for k, x in v}
    if pa.types.is_list(t):
        return [_typed_norm(x, t.value_type) for x in v]
    if pa.types.is_struct(t):
        return {f.name: _typed_norm(v.get(f.name), f.type) for f in t}
    return v


def _ab_columnar(schema, recs, codec="null"):
    """Decode ``recs`` through BOTH paths; assert record-exact equality on
    the ``avsc_to_struct``-shaped rows (the read_avro contract)."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_binary import _shape
    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_schema import (
        avsc_to_struct,
    )

    data = write_avro_container(None, schema, recs, codec=codec)
    _, rows = read_avro_container(data)
    _, batches = decode_container_columnar(data)
    assert batches is not None, "schema must compile columnar"
    tbl = pa.Table.from_batches(list(batches))
    info = avsc_to_struct(schema)
    expected = [
        {f.name: _shape(r.get(f.name), f.dataType) for f in info.struct.fields}
        for r in rows
    ]
    got = [
        {name: _typed_norm(row[name], tbl.schema.field(name).type)
         for name in tbl.schema.names}
        for row in tbl.to_pylist()
    ]
    assert got == expected
    return info


def test_interop_decodes_columnar():
    """The reference's Interop.avsc (map+record values, multi-branch union,
    enum, fixed, null field, recursive Node) through the columnar walker,
    A/B record-exact vs the row decoder (/root/reference/avro/avsc/
    Interop.avsc; reference shapes Parquet.fs:172-380, Avro.fs:405-541)."""
    import json

    with open("/root/reference/avro/avsc/Interop.avsc") as fh:
        schema = json.load(fh)
    assert compile_columnar(schema) is not None

    def node(label, depth):
        return {"label": label,
                "children": [] if depth == 0 else [node(label + "x", depth - 1)]}

    recs = [
        {"intField": i, "longField": i * 7, "stringField": f"s{i}",
         "boolField": i % 2 == 0, "floatField": float(i),
         "doubleField": i * 0.5, "nullField": None,
         "mapField": {f"k{j}": {"label": f"v{i}_{j}"} for j in range(i % 3)},
         "unionField": [(0, i % 2 == 1), (1, i * 1.25),
                        (2, [bytes([i % 256]), b""])][i % 3],
         "enumField": "ABC"[i % 3],
         "fixedField": bytes(range(16)) if i % 2 else bytes(16),
         "recordField": node(f"n{i}", i % 3)}
        for i in range(60)
    ]
    info = _ab_columnar(schema, recs, codec="deflate")
    # the recursive children field is truncated, exactly like avsc_to_struct
    assert any("recursive" in t for t in info.truncated)


def test_logical_types_and_maps_columnar():
    import datetime
    import decimal

    schema = {
        "type": "record", "name": "L", "namespace": "t", "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tm", "type": {"type": "int",
                                    "logicalType": "time-millis"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-millis"}},
            {"name": "tsu", "type": {"type": "long",
                                     "logicalType": "timestamp-micros"}},
            {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                     "precision": 10, "scale": 3}},
            {"name": "fdec", "type": {"type": "fixed", "name": "FD", "size": 8,
                                      "logicalType": "decimal",
                                      "precision": 12, "scale": 2}},
            {"name": "opt_d", "type": ["null", {"type": "int",
                                                "logicalType": "date"}]},
            {"name": "opt_map", "type": ["null", {"type": "map",
                                                  "values": ["null", "long"]}]},
            {"name": "nested_map", "type": {"type": "map", "values":
                                            {"type": "map",
                                             "values": "string"}}},
            {"name": "arr_fixed", "type": {"type": "array", "items": "FD"}},
        ],
    }
    E, ET = datetime.date(1970, 1, 1), datetime.datetime(1970, 1, 1)
    recs = [
        {"d": E + datetime.timedelta(days=i * 37), "tm": i * 1000,
         "ts": ET + datetime.timedelta(milliseconds=i * 987654),
         "tsu": ET + datetime.timedelta(microseconds=i * 1234567),
         "dec": decimal.Decimal(i * 1234).scaleb(-3),
         "fdec": decimal.Decimal(-i * 55).scaleb(-2),
         "opt_d": None if i % 3 == 0 else E + datetime.timedelta(days=i),
         "opt_map": None if i % 4 == 0 else
         {f"k{j}": (None if j % 2 else j * 9) for j in range(i % 3)},
         "nested_map": {f"a{j}": {f"b{m}": f"v{j}{m}" for m in range(j)}
                        for j in range(i % 3)},
         "arr_fixed": [decimal.Decimal(i).scaleb(-2)] * (i % 3)}
        for i in range(40)
    ]
    _ab_columnar(schema, recs)


def test_mutual_recursion_skips_columnar():
    schema = {"type": "record", "name": "A", "fields": [
        {"name": "x", "type": "long"},
        {"name": "b", "type": {"type": "record", "name": "B", "fields": [
            {"name": "y", "type": "string"},
            {"name": "back", "type": {"type": "array", "items": "A"}},
        ]}},
        {"name": "b2", "type": "B"},
    ]}
    inner = {"x": 99, "b": {"y": "inner", "back": []},
             "b2": {"y": "q", "back": []}}
    recs = [{"x": i,
             "b": {"y": f"y{i}", "back": [] if i % 2 else [inner]},
             "b2": {"y": f"z{i}", "back": []}} for i in range(20)]
    info = _ab_columnar(schema, recs)
    assert any("recursive" in t for t in info.truncated)


def test_general_union_null_branch_and_nesting():
    schema = {"type": "record", "name": "G", "fields": [
        {"name": "u", "type": ["null", "long", "string",
                               {"type": "array", "items": "int"}]},
        {"name": "wrap", "type": ["null", {"type": "record", "name": "W",
                                           "fields": [
            {"name": "inner_u", "type": ["boolean", "double"]}]}]},
    ]}
    recs = [
        {"u": [(0, None), (1, i * 3), (2, f"s{i}"), (3, [i, i + 1])][i % 4],
         "wrap": None if i % 5 == 0 else
         {"inner_u": (0, i % 2 == 0) if i % 2 else (1, i * 0.5)}}
        for i in range(30)
    ]
    _ab_columnar(schema, recs)


def test_read_avro_interop_end_to_end(spark, tmp_path):
    """Interop through the real Spark source: columnar decode engages and
    rows land on the avsc-derived schema (maps, union struct, fixed)."""
    import json

    with open("/root/reference/avro/avsc/Interop.avsc") as fh:
        schema = json.load(fh)
    recs = [
        {"intField": i, "longField": -i, "stringField": f"r{i}",
         "boolField": False, "floatField": 1.5, "doubleField": 2.5,
         "nullField": None,
         "mapField": {"a": {"label": f"l{i}"}},
         "unionField": (1, i * 2.0),
         "enumField": "B",
         "fixedField": bytes(range(16)),
         "recordField": {"label": f"n{i}", "children": []}}
        for i in range(25)
    ]
    write_avro_container(str(tmp_path / "i.avro"), schema, recs)
    df, info = read_avro(spark, str(tmp_path))
    rows = {r.intField: r for r in df.collect()}
    assert len(rows) == 25
    assert rows[3].mapField["a"].label == "l3"
    assert rows[3].unionField.type1 == 6.0 and rows[3].unionField.type0 is None
    assert bytes(rows[3].fixedField) == bytes(range(16))
    assert rows[3].recordField.label == "n3"
