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


def test_unsupported_shapes_fall_back():
    # map values, logical types, general unions, recursion → None
    assert compile_columnar({"type": "record", "name": "M", "fields": [
        {"name": "m", "type": {"type": "map", "values": "long"}}]}) is None
    assert compile_columnar({"type": "record", "name": "L", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}}]}) is None
    assert compile_columnar({"type": "record", "name": "U", "fields": [
        {"name": "u", "type": ["null", "long", "string"]}]}) is None
    assert compile_columnar({"type": "record", "name": "R", "fields": [
        {"name": "next", "type": ["null", "R"]}]}) is None
    # and decode_container_columnar reports the fallback as (schema, None)
    sch = {"type": "record", "name": "M2", "fields": [
        {"name": "m", "type": {"type": "map", "values": "long"}}]}
    data = write_avro_container(None, sch, [{"m": {"a": 1}}])
    schema, batches = decode_container_columnar(data)
    assert schema["name"] == "M2" and batches is None


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
