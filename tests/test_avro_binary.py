"""Avro binary container round-trips (A21 second half).

Mirrors the reference's serialize → generically-deserialize pattern
(``Avro.fs:858-905``; test fixtures ``Tables/EqualsMarkdownTests.fs:28-183``)
against the reference's own schema corpus.
"""

import datetime
import decimal
import json
import os

import pytest

from pandora_apache_avro_idl_to_apache_parquet_spark.sources.avro_binary import (
    read_avro,
    read_avro_container,
    write_avro_container,
)

AVSC_DIR = "/root/reference/avro/avsc"


KITCHEN = {
    "type": "record",
    "name": "Kitchen",
    "namespace": "t",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "int"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                 "precision": 12, "scale": 2}},
        {"name": "en", "type": {"type": "enum", "name": "E",
                                "symbols": ["X", "Y", "Z"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
    ],
}


def _kitchen_rows(n=50):
    rows = []
    for k in range(n):
        rows.append({
            "b": k % 2 == 0,
            "i": k - 25,
            "l": k * 10_000_000_000,
            "f": float(k) / 4,
            "d": k * 1.5e-3,
            "s": f"sämple-{k}",
            "by": bytes([k % 256, 255 - k % 256]),
            "opt": None if k % 3 == 0 else k,
            "arr": list(range(k % 5)),
            "m": {f"k{j}": f"v{k}-{j}" for j in range(k % 3)},
            "dt": datetime.date(2020, 1, 1) + datetime.timedelta(days=k),
            "ts": datetime.datetime(2021, 6, 1, 12) + datetime.timedelta(seconds=k),
            "dec": decimal.Decimal(k * 7 - 100).scaleb(-2),
            "en": "XYZ"[k % 3],
            "fx": k.to_bytes(4, "big"),
        })
    return rows


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(tmp_path, codec):
    rows = _kitchen_rows()
    p = str(tmp_path / "kitchen.avro")
    write_avro_container(p, KITCHEN, rows, codec=codec)
    schema, got = read_avro_container(open(p, "rb").read())
    assert schema["name"] == "Kitchen"
    assert len(got) == len(rows)
    for a, b in zip(got, rows):
        for k, v in b.items():
            if k == "f":
                assert abs(a[k] - v) < 1e-6  # float32 storage
            else:
                assert a[k] == v, (k, a[k], v)


def test_read_avro_dataframe(spark, tmp_path):
    rows = _kitchen_rows(40)
    d = str(tmp_path / "avro_in")
    os.makedirs(d)
    for part in range(4):
        write_avro_container(
            os.path.join(d, f"part-{part}.avro"), KITCHEN, rows[part::4]
        )
    df, info = read_avro(spark, d)
    assert info.name == "Kitchen"
    got = {r["i"]: r for r in df.collect()}
    assert len(got) == 40
    r7 = got[7 - 25]
    assert r7["s"] == "sämple-7"
    assert r7["arr"] == [0, 1]
    assert r7["dec"] == decimal.Decimal("-0.51")
    assert r7["dt"] == datetime.date(2020, 1, 8)
    assert r7["en"] == "Y"
    # empty optional decoded as null
    assert got[-25]["opt"] is None


def test_general_union_shapes_to_typed_struct(spark, tmp_path):
    schema = {
        "type": "record", "name": "U", "fields": [
            {"name": "id", "type": "int"},
            {"name": "v", "type": ["null", "int", "string"]},
        ],
    }
    rows = [
        {"id": 0, "v": (1, 42)},      # branch 1 = int
        {"id": 1, "v": (2, "hi")},    # branch 2 = string
        {"id": 2, "v": (0, None)},    # null branch
    ]
    p = str(tmp_path / "u.avro")
    write_avro_container(p, schema, rows)
    _, got = read_avro_container(open(p, "rb").read())
    assert got[0]["v"] == {"type0": 42, "type1": None}
    assert got[1]["v"] == {"type0": None, "type1": "hi"}
    assert got[2]["v"] is None
    df, info = read_avro(spark, p)
    vals = {r["id"]: r["v"] for r in df.collect()}
    assert vals[0]["type0"] == 42 and vals[0]["type1"] is None
    assert vals[1]["type1"] == "hi"
    assert vals[2] is None


def test_reference_testrecord_roundtrip(spark):
    """Serialize records against the reference's own TestRecord.avsc and read
    them back generically — the Avro.fs:858-905 round-trip, through our
    container bytes and Spark scan."""
    with open(os.path.join(AVSC_DIR, "TestRecord.avsc")) as fh:
        schema = json.load(fh)
    rows = [
        {
            "name": f"rec{k}",
            "kind": ["FOO", "BAR", "BAZ"][k % 3],
            "status": "ABC"[k % 3],
            "hash": bytes(range(k % 8, k % 8 + 16)),
            "nullableHash": None if k % 2 else bytes(range(16)),
            "value": k * 1.25,
            "average": float(k),
            "t": None,
            "l": k * 3,
            "a": [f"s{j}" for j in range(k % 4)],
            "prop": None,
        }
        for k in range(20)
    ]
    import tempfile

    d = tempfile.mkdtemp(prefix="avro_tr_")
    try:
        write_avro_container(os.path.join(d, "tr.avro"), schema, rows)
        df, info = read_avro(spark, d)
        assert info.name == "TestRecord"
        got = sorted(df.collect(), key=lambda r: r["name"])
        assert len(got) == 20
        r3 = next(r for r in got if r["name"] == "rec3")
        assert r3["kind"] == "FOO"
        assert r3["value"] == 3.75
        assert r3["nullableHash"] is None
        assert r3["a"] == ["s0", "s1", "s2"]
        r2 = next(r for r in got if r["name"] == "rec2")
        assert r2["nullableHash"] == bytes(range(16))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_recursive_schema_decodes_with_truncation(spark, tmp_path):
    """Node→Node self-recursion: binary decode follows the recursion, the
    Spark shaping drops the truncated branch (A4 disposition)."""
    with open(os.path.join(AVSC_DIR, "SelfRef.avsc")) as fh:
        schema = json.load(fh)
    # discover field layout dynamically to stay robust to the corpus file
    names = [f["name"] for f in schema["fields"]]
    assert names  # sanity
    p = str(tmp_path / "self.avro")
    # build a 2-level value: each field filled minimally
    def mk(depth):
        row = {}
        for f in schema["fields"]:
            t = f["type"]
            if isinstance(t, list):  # optional
                row[f["name"]] = None
            elif t == "string":
                row[f["name"]] = f"d{depth}"
            elif t in ("int", "long"):
                row[f["name"]] = depth
            elif isinstance(t, dict) and t.get("type") == "array":
                items = t["items"]
                row[f["name"]] = [mk(depth + 1)] if (
                    isinstance(items, str) and items == schema["name"] and depth == 0
                ) else []
            else:
                row[f["name"]] = None
        return row

    write_avro_container(p, schema, [mk(0)])
    _, got = read_avro_container(open(p, "rb").read())
    assert len(got) == 1
    df, info = read_avro(spark, p)
    assert df.count() == 1
    assert info.truncated  # the recursive branch was recorded as dropped
