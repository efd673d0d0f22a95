"""Generic table encode/decode: ANY flat DataFrame -> per-column codec'd chunks.

The token pipeline (``encode.py``) is specialized to the north rule's fixed
``(doc_id, tokens, n_tok, source)`` shape. This module is the schema-driven
generalization the reference's design implies: its flattener emits one flat
extension table per nested record/array/map
(``/root/reference/.../Pandora/Apache/Parquet.fs:444-467, 880-946``), and each
such table's columns span the full Avro physical-type set — BOOLEAN, INT, LONG,
FLOAT, DOUBLE, BYTES, STRING, DATE, DECIMAL, TIMESTAMP_MS, TIME_MS
(``Parquet.fs:52-110``, mappings ``:534-621``). ``encode_table`` accepts any
DataFrame whose columns land in those types (run
:func:`..operators.nested.flatten_table` first for nested data — exactly the
reference's flatten-then-store contract) and writes per-column, per-chunk
auto-selected codec payloads; ``decode_table`` reproduces the input
bit-identically, nulls included.

Physical design (mirrors the token pipeline, so every scale property carries
over):

* one salted shuffle (``part_id = pmod(xxhash64(*key_cols), n_parts)``) into a
  grouped-map Arrow kernel — or none in scan mode;
* each partition sorts by the key columns (zone maps ``key_min``/``key_max``
  per chunk), slices into ``chunk_rows`` chunks, and encodes every column
  independently with the sampled cost model (``plans/cost.py``);
* lane mapping: int8/16/32, date32 and bool ride the int32 codec family;
  int64, timestamp and decimal(<=18) unscaled ride int64; decimal(19..38)
  rides TWO codec'd int64 word streams (lo/hi halves of the 128-bit unscaled
  value — hi is sign extension whenever the value fits 64 bits, so it RLEs to
  almost nothing); float32/float64 ride the same kernels as bit patterns;
  string/binary ride the FSST/dict string family. Every payload stays
  self-describing (``functions/codecs.py``).
* nulls: a per-column validity stream (int32 0/1, RLE-crushed by the cost
  model) plus a dense payload of the non-null values — Parquet's
  definition-level idea re-expressed in the engine's own codec family;
* chunk files carry one top-level column per (source column x
  {codec,nulls,raw,enc,valid,payload}) so BOTH the manifest scan and selective
  decode get parquet column pruning (read 2 of 40 columns -> scan 2 of 40);
* checkpoints, resume, FsIO publication, and the numbered-JSONL commit log are
  shared with the token pipeline (``encode.py``) — the ``_schema.json``
  sidecar plays the reference's Delta ``metaData.schemaString`` role
  (``DeltaLake.fs:176-444``) so a reader needs nothing but the output dir;
* table lifecycle: loads are run-namespaced appends (``run=``) with
  append-only schema evolution; reads are log-gated (the commit log's live
  file set, never a directory glob); ``compact_table`` merges small append
  files behind one atomic add+remove log entry and ``encode.vacuum``
  reclaims unreferenced files after a retention window.
"""

from __future__ import annotations

import base64
import json
import posixpath
import uuid
import zlib
from dataclasses import dataclass, field
from datetime import date

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions import codecs as C
from ..functions.fsio import FsIO
from ..functions.hashing import klondike, sha256
from ..plans.cost import select_int_codec, select_str_codec, select_typed_codec
from .encode import _io, write_commit_log

DEFAULT_CHUNK_ROWS = 65536

# logical tags: recorded per column in chunk files + sidecar; decode needs
# nothing else. Grouped by codec lane.
_I32_LOGICALS = {"byte", "short", "int", "date", "bool"}
_I64_LOGICALS = {"long", "timestamp", "timestamp_ntz"}
_STR_LOGICALS = {"string", "binary"}


def _logical_of(dt: T.DataType) -> str:
    if isinstance(dt, T.ByteType):
        return "byte"
    if isinstance(dt, T.ShortType):
        return "short"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp_ntz"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        if dt.precision > 38:
            # Deliberate hard boundary (round-4 decision, VERDICT r03 #9):
            # Spark's DecimalType itself tops out at precision 38, so a wider
            # lane could never be fed through a DataFrame column anyway; the
            # reference's arbitrary-precision DECIMAL (Parquet.fs:577-589) is
            # unreachable from the engine's declared (Spark-first) surface.
            # Widen by re-modeling as string/binary upstream if ever needed.
            raise ValueError(
                f"decimal precision {dt.precision} > 38 exceeds the "
                "decimal128 lane — Spark's DecimalType maximum; re-model "
                "wider values as string/binary upstream"
            )
        if dt.precision > 18:
            # two-word lane: lo/hi int64 halves of the 128-bit unscaled value,
            # each codec'd separately (hi is pure sign extension for values
            # that fit 64 bits, so it RLEs to almost nothing)
            return f"decimal128({dt.precision},{dt.scale})"
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        elem = dt.elementType
        if isinstance(elem, T.IntegerType):
            return "array<int>"
        if isinstance(elem, T.LongType):
            return "array<long>"
        if isinstance(elem, T.FloatType):
            return "array<float>"
        if isinstance(elem, T.DoubleType):
            return "array<double>"
        if isinstance(elem, T.StringType):
            return "array<string>"
        raise ValueError(
            f"unsupported array element type {elem.simpleString()} — explode or "
            "flatten to extension tables first (operators.nested.flatten_table)"
        )
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError(
                f"unsupported map key type {dt.keyType.simpleString()} — only "
                "string keys (the reference's MAP contract, Parquet.fs:86-98)"
            )
        val = dt.valueType
        for vt, name in ((T.IntegerType, "int"), (T.LongType, "long"),
                         (T.FloatType, "float"), (T.DoubleType, "double"),
                         (T.StringType, "string")):
            if isinstance(val, vt):
                return f"map<string,{name}>"
        raise ValueError(
            f"unsupported map value type {val.simpleString()} — explode to a "
            "{key,value} extension table first (operators.nested.flatten_table)"
        )
    raise ValueError(
        f"unsupported column type {dt.simpleString()} — nested types must be "
        "flattened to extension tables first (operators.nested.flatten_table)"
    )


# ------------------------------------------------------ struct column lane
# A struct column rides the store as independent per-leaf lanes (round 4):
# the encode boundary projects ``s`` into ``s·__set`` (presence: struct
# non-null) plus one flat column per leaf ``s·leaf`` (nested structs chain
# the separator), each codec'd/zone-mapped like any scalar lane — exactly
# the reference's flatten-to-columns instinct (Parquet.fs:768-878) applied
# INSIDE one table instead of across extension tables. ``decode_table``
# reassembles the original shape; presence decides struct-null vs
# struct-of-nulls. All projection, no kernel changes: Catalyst expressions
# on both sides. ``·`` (U+00B7) keeps flat names parse-safe for the plain
# identifier paths the store uses internally.

_STRUCT_SEP = "·"
_STRUCT_SET = "__set"
_STRUCT_ELEM = "__elem"  # per-element presence lane of an array<struct> column


def _struct_col_type(tj: dict) -> T.DataType:
    """Parse a ``structs`` sidecar column type: a struct json or (round 5)
    an array<struct> json."""
    if tj.get("type") == "array":
        return T.ArrayType(T.StructType.fromJson(tj["elementType"]),
                           tj.get("containsNull", True))
    return T.StructType.fromJson(tj)


def _is_nested_lane_type(dt: T.DataType) -> bool:
    """Column types the struct-lane layer owns: struct<...> and
    array<struct<...>>."""
    return isinstance(dt, T.StructType) or (
        isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType)
    )


# array<struct> element-leaf lane types: each leaf of the element struct
# becomes one array<prim> lane; booleans ride int lanes (cast back on
# rebuild). Richer element leaves (date/timestamp/decimal/array/map) have no
# array lane — explode to extension tables (operators.nested.flatten_table).
_ELEM_LANE_OK = (T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
                 T.StringType)


def _elem_leaves(dt: T.StructType, prefix: str = "",
                 path: tuple = ()) -> list[tuple[str, T.DataType, tuple, str]]:
    """Leaves of an array<struct> ELEMENT struct: (relname, lane element
    type, field path, kind). kind 'set' lanes (nested-struct presence) and
    boolean 'value' lanes are int (0/1); everything else keeps its type."""
    out: list[tuple[str, T.DataType, tuple, str]] = []
    for f in dt.fields:
        nm = f"{prefix}{f.name}"
        p = path + (f.name,)
        if isinstance(f.dataType, T.StructType):
            out.append((f"{nm}{_STRUCT_SEP}{_STRUCT_SET}", T.IntegerType(),
                        p, "set"))
            out += _elem_leaves(f.dataType, prefix=f"{nm}{_STRUCT_SEP}",
                                path=p)
        elif isinstance(f.dataType, T.BooleanType):
            out.append((nm, T.IntegerType(), p, "bool"))
        elif isinstance(f.dataType, _ELEM_LANE_OK):
            out.append((nm, f.dataType, p, "value"))
        else:
            raise ValueError(
                f"array<struct> element field {nm!r} has type "
                f"{f.dataType.simpleString()}; element leaves must be "
                "int/long/float/double/string/boolean or nested structs of "
                "those — explode richer shapes to extension tables first "
                "(operators.nested.flatten_table)"
            )
    return out


def _elem_path_expr(x, path: tuple):
    e = x
    for p in path:
        e = e[p]
    return e


def _flatten_array_struct_exprs(col, name: str, dt: T.ArrayType) -> list:
    """One array<struct> column → its per-leaf array lanes: a ``·__elem``
    presence lane (int 1/0 per element; the lane itself is null exactly
    where the array is null) plus one array lane per element leaf, each the
    same length as the source array (interior nulls where the element, a
    parent struct, or the value is null)."""
    elem_dt = dt.elementType
    out = [
        F.transform(col, lambda x: x.isNotNull().cast("int"))
        .alias(f"{name}{_STRUCT_SEP}{_STRUCT_ELEM}")
    ]
    for relname, _lane_t, path, kind in _elem_leaves(elem_dt):
        if kind == "set":
            fn = (lambda p: lambda x:
                  _elem_path_expr(x, p).isNotNull().cast("int"))(path)
        elif kind == "bool":
            fn = (lambda p: lambda x:
                  _elem_path_expr(x, p).cast("int"))(path)
        else:
            fn = (lambda p: lambda x: _elem_path_expr(x, p))(path)
        out.append(F.transform(col, fn).alias(f"{name}{_STRUCT_SEP}{relname}"))
    return out


def _flatten_struct_exprs(col, name: str, dt: T.DataType) -> list:
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        return _flatten_array_struct_exprs(col, name, dt)
    if not isinstance(dt, T.StructType):
        return [col.alias(name)]
    out = [col.isNotNull().alias(f"{name}{_STRUCT_SEP}{_STRUCT_SET}")]
    for f in dt.fields:
        out += _flatten_struct_exprs(
            col.getField(f.name), f"{name}{_STRUCT_SEP}{f.name}", f.dataType
        )
    return out


def _struct_lane_nullable(schema: T.StructType, structs: dict) -> T.StructType:
    """Spec schema for a flattened frame: every struct-derived lane is
    recorded nullable, so appending a NEW struct column passes the
    append-only evolution rule (old chunks decode the whole struct as
    null via its null presence lane)."""
    if not structs.get("cols"):
        return schema
    covered: set[str] = set()
    for name, tj in structs["cols"].items():
        covered.update(_struct_flat_names(name, _struct_col_type(tj)))
    return T.StructType(
        [T.StructField(f.name, f.dataType,
                       True if f.name in covered else f.nullable)
         for f in schema.fields]
    )


def _validate_struct_names(name: str, dt: T.DataType) -> None:
    """Nested field names may not contain the lane separator or shadow the
    presence lanes — either would alias two flat lanes onto one name and
    corrupt the encoded layout silently."""
    if isinstance(dt, T.ArrayType):
        _validate_struct_names(name, dt.elementType)
        return
    for f in dt.fields:
        if _STRUCT_SEP in f.name or f.name in (_STRUCT_SET, _STRUCT_ELEM):
            raise ValueError(
                f"struct field {name}.{f.name!r} collides with the "
                f"struct-lane naming ({_STRUCT_SEP!r} separator / "
                f"{_STRUCT_SET!r}/{_STRUCT_ELEM!r} presence lanes)"
            )
        if _is_nested_lane_type(f.dataType):
            _validate_struct_names(f"{name}.{f.name}", f.dataType)


def flatten_struct_columns(df: DataFrame) -> tuple[DataFrame, dict]:
    """(flat df, structs sidecar entry). No struct / array<struct> columns
    → (df, {})."""
    has = [f for f in df.schema.fields if _is_nested_lane_type(f.dataType)]
    if not has:
        return df, {}
    clash = [c for c in df.columns if _STRUCT_SEP in c]
    if clash:
        raise ValueError(
            f"column names may not contain {_STRUCT_SEP!r} "
            f"(struct-lane separator): {clash}"
        )
    for f in has:
        _validate_struct_names(f.name, f.dataType)
    exprs, cols, order = [], {}, []
    for f in df.schema.fields:
        order.append(f.name)
        if _is_nested_lane_type(f.dataType):
            cols[f.name] = f.dataType.jsonValue()
            exprs += _flatten_struct_exprs(df[f.name], f.name, f.dataType)
        else:
            exprs.append(df[f.name])
    return df.select(*exprs), {"cols": cols, "order": order}


def relax_nullable(dt: T.DataType) -> T.DataType:
    """Recursively mark every nested field/element nullable. The struct
    lane's physical leaves are nullable by construction (presence decides
    struct-null), so every decoded/reassembled struct reports nullable
    children regardless of the source frame's nullability."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, relax_nullable(f.dataType), True)
             for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(relax_nullable(dt.elementType), True)
    return dt


def _struct_leaf_fields(name: str, dt: T.DataType) -> list[T.StructField]:
    """Flat physical StructFields for one struct or array<struct> column
    (presence lane + one field per leaf, nested structs chained) — the
    schema-level twin of :func:`_flatten_struct_exprs`, for callers that
    hold a schema but no DataFrame (the DataSource sink)."""
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        out = [T.StructField(f"{name}{_STRUCT_SEP}{_STRUCT_ELEM}",
                             T.ArrayType(T.IntegerType(), False), True)]
        for rel, lane_t, _p, _k in _elem_leaves(dt.elementType):
            out.append(T.StructField(f"{name}{_STRUCT_SEP}{rel}",
                                     T.ArrayType(lane_t, True), True))
        return out
    out = [T.StructField(f"{name}{_STRUCT_SEP}{_STRUCT_SET}",
                         T.BooleanType(), True)]
    for f in dt.fields:
        child = f"{name}{_STRUCT_SEP}{f.name}"
        if _is_nested_lane_type(f.dataType):
            out += _struct_leaf_fields(child, f.dataType)
        else:
            out.append(T.StructField(child, f.dataType, True))
    return out


def flatten_struct_schema(schema: T.StructType) -> tuple[T.StructType, dict]:
    """(flat physical schema, structs sidecar entry) for a possibly
    struct-bearing schema. No struct / array<struct> columns → (schema, {})."""
    has = [f for f in schema.fields if _is_nested_lane_type(f.dataType)]
    if not has:
        return schema, {}
    clash = [f.name for f in schema.fields if _STRUCT_SEP in f.name]
    if clash:
        raise ValueError(
            f"column names may not contain {_STRUCT_SEP!r} "
            f"(struct-lane separator): {clash}"
        )
    for f in has:
        _validate_struct_names(f.name, f.dataType)
    cols, order, fields = {}, [], []
    for f in schema.fields:
        order.append(f.name)
        if _is_nested_lane_type(f.dataType):
            cols[f.name] = f.dataType.jsonValue()
            fields += _struct_leaf_fields(f.name, f.dataType)
        else:
            fields.append(f)
    return T.StructType(fields), {"cols": cols, "order": order}


def flatten_struct_arrow(table: "pa.Table", structs: dict) -> "pa.Table":
    """Arrow-side twin of :func:`flatten_struct_columns` for executor tasks
    that receive struct-bearing batches (the DataSource sinks): replace each
    struct column with its presence lane + leaf columns. Children under a
    NULL struct are masked to null (parity with the Catalyst projection,
    where ``getField`` of a null struct is null)."""
    if not structs.get("cols"):
        return table
    import pyarrow.compute as pc

    scols = {n: _struct_col_type(tj) for n, tj in structs["cols"].items()}

    def emit(arr: pa.Array, name: str, dt: T.DataType,
             names: list, arrays: list) -> None:
        if isinstance(dt, T.ArrayType):
            emit_array(arr, name, dt, names, arrays)
            return
        present = pc.is_valid(arr)
        names.append(f"{name}{_STRUCT_SEP}{_STRUCT_SET}")
        arrays.append(present)
        for f in dt.fields:
            child_name = f"{name}{_STRUCT_SEP}{f.name}"
            child = arr.field(f.name)
            child = pc.if_else(present, child, pa.scalar(None, child.type))
            if _is_nested_lane_type(f.dataType):
                emit(child, child_name, f.dataType, names, arrays)
            else:
                names.append(child_name)
                arrays.append(child)

    def emit_array(arr: pa.Array, name: str, dt: T.ArrayType,
                   names: list, arrays: list) -> None:
        # canonicalize: per-row lengths (0 at null rows) + compacted slots
        n = len(arr)
        if arr.type != pa.list_(arr.type.value_type):
            arr = arr.cast(pa.list_(arr.type.value_type))
        row_valid = arr.is_valid().to_numpy(zero_copy_only=False)
        validity = _validity_buffer(row_valid) if not row_valid.all() else None
        lengths = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(
            zero_copy_only=False).astype(np.int32)
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lengths, out=offs[1:])
        obuf = pa.py_buffer(offs.tobytes())
        slots = arr.flatten()  # exactly the referenced element slots
        elem_valid = pc.is_valid(slots)

        def lane(vals: pa.Array) -> pa.Array:
            return pa.Array.from_buffers(
                pa.list_(vals.type), n, [validity, obuf],
                children=[vals.combine_chunks() if isinstance(
                    vals, pa.ChunkedArray) else vals],
            )

        names.append(f"{name}{_STRUCT_SEP}{_STRUCT_ELEM}")
        arrays.append(lane(elem_valid.cast(pa.int32())))
        for rel, _t, path, kind in _elem_leaves(dt.elementType):
            cur, present = slots, elem_valid
            for p in path[:-1]:
                cur = cur.field(p)
                present = pc.and_(present, pc.is_valid(cur))
            leaf = cur.field(path[-1])
            if kind == "set":
                vals = pc.and_(present, pc.is_valid(leaf)).cast(pa.int32())
            else:
                vals = pc.if_else(present, leaf, pa.scalar(None, leaf.type))
                if kind == "bool":
                    vals = vals.cast(pa.int32())
            names.append(f"{name}{_STRUCT_SEP}{rel}")
            arrays.append(lane(vals))

    names, arrays = [], []
    for i, nm in enumerate(table.column_names):
        col = table.column(i)
        if nm in scols:
            emit(col.combine_chunks(), nm, scols[nm], names, arrays)
        else:
            names.append(nm)
            arrays.append(col)
    return pa.table(arrays, names=names)


def assemble_struct_arrow(flat: dict, name: str, dt: T.DataType,
                          arrow_type) -> "pa.Array":
    """Reassemble one struct or array<struct> column from decoded flat-lane
    Arrow arrays — the Arrow-side twin of :func:`_rebuild_struct_expr`
    (presence null or false ⇒ struct null)."""
    import pyarrow.compute as pc

    if isinstance(dt, T.ArrayType):
        return _assemble_array_struct_arrow(flat, name, dt, arrow_type)
    children, child_names = [], []
    for f, sub in zip(dt.fields, arrow_type):
        child_name = f"{name}{_STRUCT_SEP}{f.name}"
        if _is_nested_lane_type(f.dataType):
            children.append(
                assemble_struct_arrow(flat, child_name, f.dataType, sub.type)
            )
        else:
            children.append(flat[child_name].cast(sub.type))
        child_names.append(f.name)
    present = flat[f"{name}{_STRUCT_SEP}{_STRUCT_SET}"]
    invalid = pc.invert(pc.fill_null(present, False))
    return pa.StructArray.from_arrays(
        children, names=child_names,
        mask=invalid.combine_chunks() if isinstance(
            invalid, pa.ChunkedArray) else invalid,
    )


def _assemble_array_struct_arrow(flat: dict, name: str, dt: T.ArrayType,
                                 arrow_type) -> "pa.Array":
    """array<struct> lanes → one ListArray<StructArray>: the ``__elem`` lane
    carries the list structure (row null = array null; value 0 = element
    null), leaf lanes carry slot values; every lane shares the same per-row
    lengths by construction."""
    import pyarrow.compute as pc

    def one(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    elem_lane = one(flat[f"{name}{_STRUCT_SEP}{_STRUCT_ELEM}"])
    n = len(elem_lane)
    row_valid = elem_lane.is_valid().to_numpy(zero_copy_only=False)
    validity = _validity_buffer(row_valid) if not row_valid.all() else None
    lengths = pc.fill_null(pc.list_value_length(elem_lane), 0).to_numpy(
        zero_copy_only=False).astype(np.int32)
    offs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=offs[1:])
    elem_ok = pc.equal(one(elem_lane.flatten()), 1)

    elem_arrow = arrow_type.value_type  # struct type of the element

    def build(sdt: T.StructType, prefix: str, sub_arrow, ok) -> pa.Array:
        children, names_ = [], []
        for f, sub in zip(sdt.fields, sub_arrow):
            nm = f"{prefix}{f.name}"
            if isinstance(f.dataType, T.StructType):
                set_vals = one(
                    one(flat[f"{name}{_STRUCT_SEP}{nm}{_STRUCT_SEP}"
                             f"{_STRUCT_SET}"]).flatten())
                inner_ok = pc.equal(set_vals, 1)
                children.append(
                    build(f.dataType, f"{nm}{_STRUCT_SEP}", sub.type, inner_ok)
                )
            else:
                vals = one(one(flat[f"{name}{_STRUCT_SEP}{nm}"]).flatten())
                children.append(vals.cast(sub.type))
            names_.append(f.name)
        return pa.StructArray.from_arrays(
            children, names=names_, mask=pc.invert(ok))

    struct_arr = build(dt.elementType, "", elem_arrow, elem_ok)
    out = pa.Array.from_buffers(
        pa.list_(struct_arr.type), n,
        [validity, pa.py_buffer(offs.tobytes())], children=[struct_arr],
    )
    return out if out.type == arrow_type else out.cast(arrow_type)


def _struct_flat_names(name: str, dt: T.DataType) -> list[str]:
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        return [f"{name}{_STRUCT_SEP}{_STRUCT_ELEM}"] + [
            f"{name}{_STRUCT_SEP}{rel}"
            for rel, _t, _p, _k in _elem_leaves(dt.elementType)
        ]
    if not isinstance(dt, T.StructType):
        return [name]
    out = [f"{name}{_STRUCT_SEP}{_STRUCT_SET}"]
    for f in dt.fields:
        out += _struct_flat_names(f"{name}{_STRUCT_SEP}{f.name}", f.dataType)
    return out


def _rebuild_struct_expr(df: DataFrame, name: str, dt: T.DataType):
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
        return _rebuild_array_struct_expr(df, name, dt)
    leaves = []
    for f in dt.fields:
        child = f"{name}{_STRUCT_SEP}{f.name}"
        if _is_nested_lane_type(f.dataType):
            leaves.append(_rebuild_struct_expr(df, child, f.dataType).alias(f.name))
        else:
            leaves.append(df[child].alias(f.name))
    # __set null (chunk predates the column) or false → struct is null
    return F.when(
        df[f"{name}{_STRUCT_SEP}{_STRUCT_SET}"] == F.lit(True),
        F.struct(*leaves),
    )


def _rebuild_array_struct_expr(df: DataFrame, name: str, dt: T.ArrayType):
    """Reassemble one array<struct> column from its decoded array lanes:
    ``arrays_zip`` re-aligns every leaf lane with the per-element presence
    lane, ``transform`` rebuilds each element (presence 0 → null element),
    and the ``__elem`` lane's own row-null marks the whole array null (a
    chunk predating the column decodes every lane as null → null array)."""
    elem_dt = dt.elementType
    leaves = _elem_leaves(elem_dt)
    elem_lane = df[f"{name}{_STRUCT_SEP}{_STRUCT_ELEM}"]
    zipped = F.arrays_zip(
        elem_lane.alias("e"),
        *[df[f"{name}{_STRUCT_SEP}{rel}"].alias(f"v{i}")
          for i, (rel, _t, _p, _k) in enumerate(leaves)],
    )
    slot = {rel: (f"v{i}", kind) for i, (rel, _t, _p, kind) in enumerate(leaves)}

    def build(z, sdt: T.StructType, prefix: str):
        fields = []
        for f in sdt.fields:
            nm = f"{prefix}{f.name}"
            if isinstance(f.dataType, T.StructType):
                set_slot, _ = slot[f"{nm}{_STRUCT_SEP}{_STRUCT_SET}"]
                inner = build(z, f.dataType, f"{nm}{_STRUCT_SEP}")
                fields.append(F.when(z[set_slot] == 1, inner).alias(f.name))
            else:
                vslot, kind = slot[nm]
                v = z[vslot]
                if kind == "bool":
                    v = v.cast("boolean")
                fields.append(v.alias(f.name))
        return F.struct(*fields)

    elems = F.transform(zipped, lambda z: F.when(z["e"] == 1,
                                                 build(z, elem_dt, "")))
    return F.when(elem_lane.isNotNull(), elems)


@dataclass
class TableSpec:
    """Source schema + key columns (+ optional per-chunk bloom columns),
    serialized to the ``_schema.json`` sidecar.

    ``structs`` records struct columns the encode boundary auto-flattened
    (``{"cols": {name: struct type json}, "order": [original col names]}``):
    ``schema`` is always the FLAT physical schema (each struct leaf is its
    own codec'd lane ``s·leaf`` plus a ``s·__set`` presence lane), and
    :func:`decode_table` reassembles the original shape from it."""

    schema: T.StructType
    key_cols: list[str]
    bloom_cols: list[str] = field(default_factory=list)
    #: the date column the table is PARTITIONED by (``encode_table(pds_col=…)``)
    #: — persisted so appends/DML keep routing rows to their date partitions
    pds_col: str | None = None
    structs: dict = field(default_factory=dict)

    @property
    def logicals(self) -> dict[str, str]:
        return {f.name: _logical_of(f.dataType) for f in self.schema.fields}

    def to_json(self) -> str:
        return json.dumps(
            {"schema": self.schema.jsonValue(), "key": self.key_cols,
             "bloom": self.bloom_cols, "pds_col": self.pds_col,
             "structs": self.structs,
             "logical": self.logicals}
        )

    @classmethod
    def from_json(cls, s: str) -> "TableSpec":
        d = json.loads(s)
        return cls(schema=T.StructType.fromJson(d["schema"]), key_cols=d["key"],
                   bloom_cols=d.get("bloom", []), pds_col=d.get("pds_col"),
                   structs=d.get("structs", {}))


def _meta_fields(spec: "TableSpec") -> list[T.StructField]:
    # key_min/key_max carry the FIRST key column's own type, so zone-map
    # range predicates compare in key semantics (a stringified "100" < "99"
    # would break numeric pruning) and push down into the parquet scan
    key_type = spec.schema[spec.key_cols[0]].dataType
    return [
        T.StructField("run", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("chunk_seq", T.IntegerType(), False),
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("row_lo", T.LongType(), False),
        T.StructField("row_hi", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("key_min", key_type, False),
        T.StructField("key_max", key_type, False),
        T.StructField("sha", T.BinaryType(), False),
        T.StructField("pds", T.DateType(), False),
    ]


def chunk_schema_for(spec: TableSpec) -> T.StructType:
    """Chunk-file schema: meta columns + 6 top-level columns per source column
    (top-level so parquet prunes both manifest scans and selective decodes)."""
    fields = _meta_fields(spec)
    for f in spec.schema.fields:
        fields += [
            T.StructField(f"{f.name}__codec", T.StringType(), False),
            T.StructField(f"{f.name}__nulls", T.LongType(), False),
            T.StructField(f"{f.name}__raw", T.LongType(), False),
            T.StructField(f"{f.name}__enc", T.LongType(), False),
            # per-column typed zone map (None when the chunk is all-null):
            # lets chunk_filter prune on ANY column, not just the sort key
            T.StructField(f"{f.name}__min", f.dataType, True),
            T.StructField(f"{f.name}__max", f.dataType, True),
            T.StructField(f"{f.name}__valid", T.BinaryType(), True),
            T.StructField(f"{f.name}__payload", T.BinaryType(), False),
        ]
        if f.name in spec.bloom_cols:
            # per-chunk bloom filter words (point-lookup pruning on columns
            # the key sort can't zone-map tightly); None = all-null chunk
            fields.append(T.StructField(f"{f.name}__bloom", T.BinaryType(), True))
    return T.StructType(fields)


# -------------------------------------------------- per-chunk bloom filters
# min/max zone maps prune range predicates on the SORT key tightly, but a
# point lookup on an unsorted high-cardinality column (every chunk spans
# nearly the full value range) prunes nothing. A small per-chunk bloom
# (4096 bits = 66 int64 words per column-chunk) answers "value definitely
# absent" per chunk, so a point lookup decodes only the handful of chunks
# that may contain it. Words hold 63 bits (sign bit unused) so the probe
# predicate's conv(hex(substring(...))) word extraction never overflows a
# signed int64; the predicate is a plain expression over the chunk scan and
# composes with zone maps in `chunk_filter`. Internal to the store (both
# build and probe are this module), so the hash is md5 of the value's
# canonical string — no cross-engine contract needed.

_CHUNK_BLOOM_BITS = 4096
_CHUNK_BLOOM_K = 3
_CHUNK_BLOOM_WORD = 63
_BLOOMABLE = {"byte", "short", "int", "long", "string", "date", "bool"}


def _bloom_positions_of(canon: str) -> list[int]:
    """Kirsch-Mitzenmacher double hashing from one md5."""
    import hashlib as _hashlib

    d = _hashlib.md5(canon.encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [((h1 + i * h2) % (1 << 61)) % _CHUNK_BLOOM_BITS
            for i in range(_CHUNK_BLOOM_K)]


def _chunk_bloom(arr: pa.Array) -> bytes | None:
    """Bloom words for one column-chunk (canonical string per value; nulls
    skipped; all-null chunk -> None = 'prune nothing' conservative)."""
    import pyarrow.compute as pc

    vals = pc.cast(arr.drop_null(), pa.string()).to_pylist()
    if not vals:
        return None
    n_words = -(-_CHUNK_BLOOM_BITS // _CHUNK_BLOOM_WORD)
    words = np.zeros(n_words, dtype=np.int64)
    for v in vals:
        for p in _bloom_positions_of(v):
            w, b = divmod(p, _CHUNK_BLOOM_WORD)
            words[w] |= np.int64(1) << np.int64(b)
    return words.astype(">i8").tobytes()


def _canon_probe(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def bloom_value_predicate(column: str, value) -> "F.Column":
    """``chunk_filter`` fragment: TRUE iff the chunk's bloom MAY contain
    ``value`` (missing/None bloom keeps the chunk — provably conservative,
    exactly like the DataSource's residual-filter contract)."""
    checks = []
    for p in _bloom_positions_of(_canon_probe(value)):
        w, b = divmod(p, _CHUNK_BLOOM_WORD)
        word = (
            f"cast(conv(hex(substring({column}__bloom, {8 * w + 1}, 8)), 16, 10) "
            f"as bigint)"
        )
        checks.append(
            f"(({word}) & shiftleft(cast(1 as bigint), {b})) != 0"
        )
    return F.expr(
        f"({column}__bloom IS NULL) OR ({' AND '.join(checks)})"
    )


def _prepare_spec(io: FsIO, df_schema: T.StructType,
                  key_cols: list[str],
                  bloom_cols: list[str] | None = None,
                  pds_col: str | None = None,
                  structs: dict | None = None) -> TableSpec:
    """Create or evolve the ``_schema.json`` sidecar (append-only schema
    evolution, the reference's Delta ``metaData`` schema-evolve contract,
    ``DeltaLake.fs:176-444``): new columns may be ADDED if nullable; existing
    columns must keep name+type; key columns are immutable. Old chunk files
    simply lack the new columns' payloads and decode as nulls.

    ``df_schema`` is the FLAT physical schema (struct columns already split
    by :func:`flatten_struct_columns`); ``structs`` is that split's sidecar
    entry. An existing struct column's shape is immutable (its leaves are
    its flat type); NEW struct columns may be appended."""
    new_spec = TableSpec(schema=df_schema, key_cols=list(key_cols),
                         bloom_cols=list(bloom_cols or []), pds_col=pds_col,
                         structs=structs or {})
    logicals = new_spec.logicals  # validates every column type is supported
    for b in new_spec.bloom_cols:
        if b not in logicals:
            raise ValueError(f"bloom column {b!r} not in schema")
        if logicals[b] not in _BLOOMABLE:
            raise ValueError(
                f"bloom column {b!r} has logical {logicals[b]!r}; only "
                f"{sorted(_BLOOMABLE)} canonicalize stably for bloom probes"
            )
    sidecar = io.join("_schema.json")
    if not io.exists(sidecar):
        io.makedirs(io.base)
        io.publish_bytes(sidecar, new_spec.to_json().encode(),
                         attempt_tag=uuid.uuid4().hex[:8])
        return new_spec

    old = TableSpec.from_json(io.read_text(sidecar))
    if pds_col is not None and old.pds_col != pds_col:
        raise ValueError(
            f"partition column is immutable: encoded with {old.pds_col!r}, "
            f"got {pds_col!r}"
        )
    if old.key_cols != list(key_cols):
        raise ValueError(
            f"key columns are immutable: encoded with {old.key_cols}, got {list(key_cols)}"
        )
    if bloom_cols is not None and list(bloom_cols) != old.bloom_cols:
        raise ValueError(
            f"bloom columns are immutable: encoded with {old.bloom_cols}, "
            f"got {list(bloom_cols)}"
        )
    old_fields = {f.name: f for f in old.schema.fields}
    new_fields = {f.name: f for f in df_schema.fields}
    missing = [n for n in old_fields if n not in new_fields]
    if missing:
        raise ValueError(f"schema evolution is append-only; missing columns {missing}")
    for name, f in old_fields.items():
        if new_fields[name].dataType != f.dataType:
            raise ValueError(
                f"column {name!r} type change "
                f"{f.dataType.simpleString()} -> {new_fields[name].dataType.simpleString()}"
            )
    # struct-lane evolution: an existing struct column's shape is immutable
    # (its leaves ARE its flat type); new struct columns may be appended
    old_structs = old.structs or {"cols": {}, "order": []}
    new_structs = structs or {"cols": {}, "order": []}
    for name, tj in old_structs.get("cols", {}).items():
        if name in new_structs.get("cols", {}) and \
                new_structs["cols"][name] != tj:
            raise ValueError(f"struct column {name!r} shape change is not "
                             "supported (append a new column instead)")
    merged_structs = old_structs
    added_struct_cols = {
        n: tj for n, tj in new_structs.get("cols", {}).items()
        if n not in old_structs.get("cols", {})
    }
    if added_struct_cols:
        merged_structs = {
            "cols": {**old_structs.get("cols", {}), **added_struct_cols},
            "order": old_structs.get("order", [])
            + [n for n in new_structs.get("order", [])
               if n not in old_structs.get("order", [])],
        }
    added = [f for f in df_schema.fields if f.name not in old_fields]
    if not added and not added_struct_cols:
        return old
    bad = [f.name for f in added if not f.nullable]
    if bad:
        raise ValueError(f"new columns must be nullable (old chunks decode them as null): {bad}")
    merged = TableSpec(
        schema=T.StructType(list(old.schema.fields) + added),
        key_cols=list(key_cols), bloom_cols=old.bloom_cols,
        pds_col=old.pds_col,
        structs=merged_structs if merged_structs.get("cols") else {},
    )
    io.publish_bytes(sidecar, merged.to_json().encode(),
                     attempt_tag=uuid.uuid4().hex[:8])
    return merged


# ------------------------------------------------------------ column kernels


def _decimal_words(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Dense decimal128 array -> (lo, hi) int64 word streams (little-endian
    two's-complement halves of the 128-bit unscaled value)."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    raw = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=2 * (arr.offset + n))[2 * arr.offset:]
    return np.ascontiguousarray(raw[0::2]), np.ascontiguousarray(raw[1::2])


def _words_to_decimal(lo: np.ndarray, hi: np.ndarray, ptype: pa.DataType,
                      validity: pa.Buffer | None) -> pa.Array:
    pairs = np.empty((len(lo), 2), np.int64)
    pairs[:, 0] = lo
    pairs[:, 1] = hi
    return pa.Array.from_buffers(
        ptype, len(lo), [validity, pa.py_buffer(pairs.tobytes())]
    )


def _decimal_lo_words(arr: pa.Array) -> np.ndarray:
    """Dense decimal128 array -> int64 unscaled values (vectorized buffer
    view; precision <= 18 guarantees the high word is sign extension)."""
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int64)
    raw = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                        count=2 * (arr.offset + n))[2 * arr.offset:]
    lo, hi = raw[0::2], raw[1::2]
    if not np.array_equal(hi, lo >> 63):
        raise ValueError("decimal values overflow the int64 unscaled lane")
    return np.ascontiguousarray(lo)


def _int64_to_decimal(v: np.ndarray, ptype: pa.DataType,
                      validity: pa.Buffer | None) -> pa.Array:
    pairs = np.empty((len(v), 2), np.int64)
    pairs[:, 0] = v
    pairs[:, 1] = v >> 63
    return pa.Array.from_buffers(
        ptype, len(v), [validity, pa.py_buffer(pairs.tobytes())]
    )


_ARRAY_LANES = {
    "array<int>": (pa.int32(), np.int32, 4),
    "array<long>": (pa.int64(), np.int64, 8),
    "array<float>": (pa.float32(), np.float32, 4),
    "array<double>": (pa.float64(), np.float64, 8),
}

# map<string,T> value lanes: the map rides three streams — entry lengths,
# keys (a string stream), values (a string or typed stream) — the array
# lane's composite layout with one more segment.
_MAP_VAL_LANES = {
    "int": (pa.int32(), np.int32, 4),
    "long": (pa.int64(), np.int64, 8),
    "float": (pa.float32(), np.float32, 4),
    "double": (pa.float64(), np.float64, 8),
}


def _encode_column(arr: pa.Array, logical: str) -> tuple[bytes | None, bytes, int, int, str]:
    """One column chunk -> (valid_payload | None, payload, n_nulls, raw_bytes,
    codec_name).

    ``raw_bytes`` is the uncompressed lane footprint (lane width x rows, or
    blob + offsets for byte lanes) — the denominator of the compression ratio.
    Array lanes (the token pipeline's layout generalized) store a composite
    payload: length-prefixed row-lengths stream + flattened element stream —
    int32 elements ride the GROUPED adaptive cascade exactly like tokens.
    """
    import struct as _struct

    n = len(arr)
    n_nulls = arr.null_count
    if n_nulls:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        valid_payload = select_int_codec(valid.astype(np.int32))
        dense = arr.drop_null()
    else:
        valid_payload = None
        dense = arr

    if logical in _ARRAY_LANES or logical == "array<string>":
        import pyarrow.compute as pc

        lengths = pc.list_value_length(dense).to_numpy(zero_copy_only=False).astype(np.int32)
        flat = dense.combine_chunks().flatten() if isinstance(dense, pa.ChunkedArray) else dense.flatten()
        # Interior nulls (nullable elements — the array<struct> leaf lanes
        # produce them for null elements / null fields) ride an optional
        # element-validity stream; the value stream stores non-nulls only.
        if flat.null_count:
            ev = flat.is_valid().to_numpy(zero_copy_only=False).astype(np.int32)
            ep = select_int_codec(ev)
            flat = flat.drop_null()
        else:
            ep = b""
        lp = select_int_codec(lengths)
        if logical == "array<string>":
            # element stream is itself a string stream (elem-lengths + blob)
            el, blob = C.bytes_to_blob(flat)
            vp = select_str_codec(el, blob)
            raw = 4 * n + 4 * len(el) + len(blob)
        else:
            lane_pa, lane_np, width = _ARRAY_LANES[logical]
            values = np.ascontiguousarray(
                flat.cast(lane_pa).to_numpy(zero_copy_only=False), dtype=lane_np
            )
            if lane_np is np.int32 and not ep:
                from ..plans.cost import encode_values

                vp = encode_values(values, lengths)
            else:
                vp = select_typed_codec(values)
            raw = 4 * n + width * len(values)
        payload = (_struct.pack("<Q", len(lp)) + lp
                   + _struct.pack("<Q", len(ep)) + ep + vp)
        name = f"{C.payload_codec_name(lp)}+{C.payload_codec_name(vp)}"
        return valid_payload, payload, n_nulls, raw, name

    if logical.startswith("map<string,"):
        dense = dense.combine_chunks() if isinstance(dense, pa.ChunkedArray) else dense
        # no list_value_length kernel for maps in this pyarrow: lengths come
        # straight from the (slice-adjusted) offsets buffer
        offsets = dense.offsets.to_numpy(zero_copy_only=False)
        lengths = np.diff(offsets).astype(np.int32)
        keys, items = dense.keys, dense.items
        if items.null_count:
            raise ValueError("null values inside map columns are not supported")
        lp = select_int_codec(lengths)
        kl, kblob = C.bytes_to_blob(keys)
        kp = select_str_codec(kl, kblob)
        vlane = logical[len("map<string,"):-1]
        if vlane == "string":
            vl, vblob = C.bytes_to_blob(items)
            vp = select_str_codec(vl, vblob)
            raw = 4 * n + 4 * len(kl) + len(kblob) + 4 * len(vl) + len(vblob)
        else:
            lane_pa, lane_np, width = _MAP_VAL_LANES[vlane]
            values = np.ascontiguousarray(
                items.cast(lane_pa).to_numpy(zero_copy_only=False), dtype=lane_np
            )
            if lane_np is np.int32:
                from ..plans.cost import encode_values

                vp = encode_values(values, lengths)
            else:
                vp = select_typed_codec(values)
            raw = 4 * n + 4 * len(kl) + len(kblob) + width * len(values)
        payload = (_struct.pack("<Q", len(lp)) + lp
                   + _struct.pack("<Q", len(kp)) + kp + vp)
        name = (f"{C.payload_codec_name(lp)}+{C.payload_codec_name(kp)}"
                f"+{C.payload_codec_name(vp)}")
        return valid_payload, payload, n_nulls, raw, name

    if logical in _STR_LOGICALS:
        lengths, blob = C.bytes_to_blob(dense)
        payload = select_str_codec(lengths, blob)
        raw = len(blob) + 4 * n
    elif logical in _I32_LOGICALS:
        vals = dense.cast(pa.int32()).to_numpy(zero_copy_only=False)
        payload = select_int_codec(np.ascontiguousarray(vals, dtype=np.int32))
        raw = 4 * n
    elif logical in _I64_LOGICALS:
        vals = dense.cast(pa.int64()).to_numpy(zero_copy_only=False)
        payload = select_typed_codec(np.ascontiguousarray(vals, dtype=np.int64))
        raw = 8 * n
    elif logical.startswith("decimal128"):
        lo, hi = _decimal_words(dense)
        lp = select_typed_codec(lo)
        hp = select_typed_codec(hi)
        payload = _struct.pack("<Q", len(lp)) + lp + hp
        name = f"{C.payload_codec_name(lp)}+{C.payload_codec_name(hp)}"
        return valid_payload, payload, n_nulls, 16 * n, name
    elif logical.startswith("decimal"):
        payload = select_typed_codec(_decimal_lo_words(dense))
        raw = 8 * n
    elif logical == "float":
        vals = dense.to_numpy(zero_copy_only=False)
        payload = select_typed_codec(np.ascontiguousarray(vals, dtype=np.float32))
        raw = 4 * n
    elif logical == "double":
        vals = dense.to_numpy(zero_copy_only=False)
        payload = select_typed_codec(np.ascontiguousarray(vals, dtype=np.float64))
        raw = 8 * n
    else:
        raise ValueError(f"unknown logical type {logical!r}")
    return valid_payload, payload, n_nulls, raw, C.payload_codec_name(payload)


def _min_max(arr: pa.Array):
    """(min, max) of the non-null values, or (None, None) when empty/all-null
    or the type has no min_max kernel."""
    import pyarrow.compute as pc

    if arr.null_count == len(arr):
        return None, None
    try:
        mm = pc.min_max(arr)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
        return None, None  # e.g. list types have no min_max kernel
    return mm["min"].as_py(), mm["max"].as_py()


def _validity_buffer(mask: np.ndarray) -> pa.Buffer:
    return pa.py_buffer(np.packbits(mask, bitorder="little").tobytes())


def _decode_column(valid_payload: bytes | None, payload: bytes, logical: str,
                   n: int, target: pa.DataType) -> pa.Array:
    """Inverse of :func:`_encode_column`: rebuild the arrow column (validity
    included) at its original type."""
    if valid_payload is not None:
        mask = C.decode_int32(valid_payload).astype(bool)
        validity = _validity_buffer(mask)
    else:
        mask = None
        validity = None

    if logical in _ARRAY_LANES or logical == "array<string>":
        import struct as _struct

        (llen,) = _struct.unpack_from("<Q", payload, 0)
        lengths = C.decode_int32(payload[8 : 8 + llen])
        rest = payload[8 + llen :]
        (elen,) = _struct.unpack_from("<Q", rest, 0)
        elem_mask = (C.decode_int32(rest[8 : 8 + elen]).astype(bool)
                     if elen else None)
        vbuf = rest[8 + elen :]
        n_elems = int(lengths.sum())
        if logical == "array<string>":
            el, blob = C.decode_strings(vbuf)
            if elem_mask is None:
                child = C.blob_to_strings(el, blob)
            else:
                # scatter non-null string lengths into the full slot layout
                full_el = np.zeros(n_elems, dtype=np.int32)
                full_el[elem_mask] = el
                offs_e = np.zeros(n_elems + 1, dtype=np.int32)
                np.cumsum(full_el, out=offs_e[1:])
                child = pa.Array.from_buffers(
                    pa.string(), n_elems,
                    [_validity_buffer(elem_mask), pa.py_buffer(offs_e.tobytes()),
                     pa.py_buffer(blob)],
                )
            lane_pa = pa.string()
        else:
            lane_pa, lane_np, _w = _ARRAY_LANES[logical]
            if C.payload_codec_name(vbuf) == "grouped":
                values = C.decode_int32_grouped(vbuf, lengths)
            else:
                values = C.decode_typed(vbuf)
            if elem_mask is None:
                full_vals = np.ascontiguousarray(values, dtype=lane_np)
                ebuf = None
            else:
                full_vals = np.zeros(n_elems, dtype=lane_np)
                full_vals[elem_mask] = values
                ebuf = _validity_buffer(elem_mask)
            child = pa.Array.from_buffers(
                lane_pa, n_elems, [ebuf, pa.py_buffer(full_vals.tobytes())],
            )
        if mask is not None:
            full_len = np.zeros(n, dtype=np.int32)
            full_len[mask] = lengths
            lengths = full_len  # null rows contribute 0 elements
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lengths, out=offs[1:])
        arr = pa.Array.from_buffers(
            pa.list_(lane_pa), n, [validity, pa.py_buffer(offs.tobytes())],
            children=[child],
        )
        return arr if arr.type == target else arr.cast(target)

    if logical.startswith("map<string,"):
        import struct as _struct

        (llen,) = _struct.unpack_from("<Q", payload, 0)
        lengths = C.decode_int32(payload[8 : 8 + llen])
        rest = payload[8 + llen :]
        (klen,) = _struct.unpack_from("<Q", rest, 0)
        kl, kblob = C.decode_strings(rest[8 : 8 + klen])
        keys = C.blob_to_strings(kl, kblob)
        vbuf = rest[8 + klen :]
        vlane = logical[len("map<string,"):-1]
        if vlane == "string":
            vl, vblob = C.decode_strings(vbuf)
            items = C.blob_to_strings(vl, vblob)
            lane_pa = pa.string()
        else:
            lane_pa, lane_np, _w = _MAP_VAL_LANES[vlane]
            if C.payload_codec_name(vbuf) == "grouped":
                values = C.decode_int32_grouped(vbuf, lengths)
            else:
                values = C.decode_typed(vbuf)
            items = pa.Array.from_buffers(
                lane_pa, len(values),
                [None, pa.py_buffer(np.ascontiguousarray(values, dtype=lane_np).tobytes())],
            )
        if mask is not None:
            full_len = np.zeros(n, dtype=np.int32)
            full_len[mask] = lengths
            lengths = full_len
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lengths, out=offs[1:])
        map_t = pa.map_(pa.string(), lane_pa)
        entries = pa.StructArray.from_arrays(
            [keys, items],
            fields=[pa.field("key", pa.string(), nullable=False),
                    pa.field("value", lane_pa)],
        )
        arr = pa.Array.from_buffers(
            map_t, n, [validity, pa.py_buffer(offs.tobytes())],
            children=[entries],
        )
        return arr if arr.type == target else arr.cast(target)

    if logical in _STR_LOGICALS:
        lengths, blob = C.decode_strings(payload)
        if mask is not None:
            full_len = np.zeros(n, dtype=np.int32)
            full_len[mask] = lengths
            lengths = full_len  # nulls contribute 0 bytes: blob unchanged
        offs = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lengths, out=offs[1:])
        arrow_type = pa.string() if logical == "string" else pa.binary()
        arr = pa.Array.from_buffers(
            arrow_type, n, [validity, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)]
        )
        return arr if arr.type == target else arr.cast(target)

    if logical.startswith("decimal128"):
        import struct as _struct

        (llen,) = _struct.unpack_from("<Q", payload, 0)
        lo = C.decode_typed(payload[8 : 8 + llen])
        hi = C.decode_typed(payload[8 + llen :])
        if mask is not None:
            full_lo = np.zeros(n, dtype=np.int64)
            full_hi = np.zeros(n, dtype=np.int64)
            full_lo[mask] = lo
            full_hi[mask] = hi
            lo, hi = full_lo, full_hi
        return _words_to_decimal(lo, hi, target, validity)

    if logical.startswith("decimal"):
        dense = C.decode_typed(payload)
        if mask is not None:
            full = np.zeros(n, dtype=np.int64)
            full[mask] = dense
            dense = full
        return _int64_to_decimal(dense, target, validity)

    dense = C.decode_typed(payload)
    if mask is not None:
        full = np.zeros(n, dtype=dense.dtype)
        full[mask] = dense
        dense = full
    lane_type = {
        np.dtype(np.int32): pa.int32(),
        np.dtype(np.int64): pa.int64(),
        np.dtype(np.float32): pa.float32(),
        np.dtype(np.float64): pa.float64(),
    }[dense.dtype]
    arr = pa.Array.from_buffers(lane_type, n, [validity, pa.py_buffer(dense.tobytes())])
    return arr if arr.type == target else arr.cast(target)


# ------------------------------------------------------------- encode driver


def _encode_table_partition(table: pa.Table, io: FsIO, spec: TableSpec,
                            chunk_rows: int, pds: date,
                            fail_parts=None, run: str = "r0",
                            marker_dir: str = "_checkpoints",
                            sort_cols: list[str] | None = None,
                            pds_from_col: bool = False) -> pa.Table:
    """Grouped-map kernel: one part_id's rows -> one chunk parquet file +
    checkpoint marker (same publication contract as the token kernel).
    ``run`` namespaces files/markers so append runs into one table dir never
    collide with earlier runs' parts.

    ``marker_dir`` defaults to the resume/commit checkpoint dir; rewrite jobs
    (:func:`delete_where` / :func:`merge_table`) pass ``"_rewrites"`` so their
    files are NEVER auto-committed by ``write_commit_log``'s marker gate — a
    rewrite becomes visible only through its own single add+remove log entry,
    and a crash before that entry leaves pure orphans for ``vacuum``."""
    import time

    import pyarrow.compute as pc

    from pyspark.sql.pandas.types import to_arrow_schema

    t_start = time.perf_counter()
    part_id = int(table.column("part_id")[0].as_py())
    if fail_parts and part_id in fail_parts:
        raise RuntimeError(f"injected failure for part {part_id}")
    if pds_from_col:
        # date-partitioned encode (encode_table's pds_col): every row of the
        # group shares one partition date, carried in the helper column
        pds = table.column("__pds")[0].as_py()

    # ``sort_cols`` (recluster_table) re-orders rows physically WITHOUT
    # changing key semantics: key_min/key_max below then fall back from the
    # positional first/last (valid only under key order) to a true min/max
    # scan, so key-range pruning stays correct under any layout.
    key_sorted = sort_cols is None or list(sort_cols) == list(spec.key_cols)
    order = sort_cols or spec.key_cols
    table = table.take(
        pc.sort_indices(table, sort_keys=[(k, "ascending") for k in order])
    )
    n = table.num_rows
    logicals = spec.logicals
    key0 = table.column(spec.key_cols[0])
    if key0.null_count:
        raise ValueError(f"key column {spec.key_cols[0]!r} contains nulls")

    t_kernel0 = time.perf_counter()
    rows: list[dict] = []
    payload_cols = [f.name for f in spec.schema.fields]
    for seq, lo in enumerate(range(0, n, chunk_rows)):
        hi = min(lo + chunk_rows, n)
        key_mm = (
            (key0[lo].as_py(), key0[hi - 1].as_py()) if key_sorted
            else _min_max(key0.slice(lo, hi - lo))
        )
        row: dict = {
            "run": run,
            "part_id": part_id,
            "chunk_seq": seq,
            "row_lo": lo,
            "row_hi": hi,
            "n_rows": hi - lo,
            "key_min": key_mm[0],
            "key_max": key_mm[1],
            "pds": pds,
        }
        hasher_parts = []
        for name in payload_cols:
            arr = table.column(name).slice(lo, hi - lo).combine_chunks()
            valid_payload, payload, n_nulls, raw, codec_name = _encode_column(
                arr, logicals[name])
            row[f"{name}__codec"] = codec_name
            row[f"{name}__nulls"] = n_nulls
            row[f"{name}__raw"] = raw
            row[f"{name}__enc"] = len(payload) + (len(valid_payload) if valid_payload else 0)
            row[f"{name}__min"], row[f"{name}__max"] = _min_max(arr)
            row[f"{name}__valid"] = valid_payload
            row[f"{name}__payload"] = payload
            if name in spec.bloom_cols:
                row[f"{name}__bloom"] = _chunk_bloom(arr)
            hasher_parts.append(payload)
            if valid_payload:
                hasher_parts.append(valid_payload)
        sha = sha256(b"".join(hasher_parts))
        row["sha"] = sha
        row["chunk_id"] = klondike(f"{run}:{part_id}:{seq}:".encode() + sha)
        rows.append(row)

    kernel_sec = time.perf_counter() - t_kernel0

    chunk_schema = to_arrow_schema(chunk_schema_for(spec))
    out = pa.Table.from_pylist(rows, schema=chunk_schema)

    data_dir, ckpt_dir = io.join("data"), io.join(marker_dir)
    io.makedirs(data_dir)
    io.makedirs(ckpt_dir)
    tag = uuid.uuid4().hex[:8]
    file_name = f"part-{run}-{part_id:05d}.parquet"
    t_write0 = time.perf_counter()
    file_size, file_sha = io.publish_parquet(
        out,
        posixpath.join(data_dir, file_name),
        attempt_tag=tag,
        compression={f"{c}__payload": "NONE" for c in payload_cols}
        | {f"{c}__valid": "NONE" for c in payload_cols}
        | {"__default__": "SNAPPY"},
        # see encode.py: parquet stats on binary payloads are pure footer
        # bloat; keep stats only on the prunable/meta columns
        use_dictionary=False,
        write_statistics=[
            f.name for f in chunk_schema_for(spec).fields
            if not f.name.endswith(("__payload", "__valid")) and f.name != "sha"
        ],
    )
    stats = {
        "run": run,
        "part_id": part_id,
        "pds": pds.isoformat(),
        "n_chunks": len(rows),
        "n_rows": n,
        "enc_bytes": sum(r[f"{c}__enc"] for r in rows for c in payload_cols),
        "raw_bytes": sum(r[f"{c}__raw"] for r in rows for c in payload_cols),
        "kernel_sec": round(kernel_sec, 4),
        "write_sec": round(time.perf_counter() - t_write0, 4),
        "total_sec": round(time.perf_counter() - t_start, 4),
        "file_name": file_name,
        "file_size": file_size,
        "file_sha256": file_sha,
        "status": "done",
    }
    io.publish_bytes(
        posixpath.join(ckpt_dir, f"part-{run}-{part_id:05d}.json"),
        json.dumps(stats).encode(),
        attempt_tag=tag,
    )
    return out.drop_columns(
        [f"{c}__payload" for c in payload_cols] + [f"{c}__valid" for c in payload_cols]
    )


def completed_table_parts(out_dir: str, run: str = "r0",
                          io: FsIO | None = None) -> list[int]:
    """Part ids of ``run`` with a checkpoint marker (the resume identity —
    per run, so append runs into one dir never mask each other)."""
    io = _io(out_dir, io)
    d = io.join("_checkpoints")
    prefix = f"part-{run}-"
    return sorted(
        int(f[len(prefix):-len(".json")])
        for f in io.listdir(d)
        if f.startswith(prefix) and f.endswith(".json")
    )


def encode_table(df: DataFrame, out_dir: str, key_cols: list[str],
                 n_parts: int = 64, chunk_rows: int = DEFAULT_CHUNK_ROWS,
                 pds: date | None = None,
                 fail_parts: set[int] | None = None,
                 io: FsIO | None = None,
                 run: str = "r0",
                 bloom_cols: list[str] | None = None,
                 pds_col: str | None = None) -> DataFrame:
    """Encode any supported-typed DataFrame; returns the manifest (long form).

    Same plan as :func:`..operators.encode.encode_tokens`: salted shuffle on
    ``xxhash64(*key_cols)``, anti-join completed checkpoints (resume), one
    grouped-map Arrow kernel, commit log at the end. ``key_cols`` provide the
    salt, the intra-chunk sort order, and the ``key_min/key_max`` zone maps.

    ``run`` is the append identity: a second load into the same dir uses a
    new run id (its files/markers are namespaced ``part-<run>-``), and may
    carry an evolved schema — appended columns must be nullable; earlier
    runs' chunks decode them as null (:func:`_prepare_spec`).

    ``pds_col`` (a non-null ``date`` column) turns on DATE-PARTITIONED
    layout — the reference's ``partitionColumns=["pj_pds"]`` contract
    (``DeltaLake.fs:288``): rows group by (date, salt), each file/chunk
    carries its own date as ``pds`` (commit-log ``partitionValues``, chunk
    zone column), so date-range reads prune whole files via
    ``chunk_filter`` on ``pds`` exactly like Hive/Delta partition pruning.
    The distinct-date set is collected to the driver (bounded — dates are a
    partition key, not data); ``n_parts`` becomes parts PER DATE.
    """
    spark = df.sparkSession
    pds = pds or date(2026, 1, 1)
    io = _io(out_dir, io)
    if "part_id" in df.columns:
        raise ValueError("'part_id' is a reserved column name")
    for k in key_cols:
        if k not in df.columns:
            raise ValueError(f"key column {k!r} not in DataFrame")
        if isinstance(df.schema[k].dataType, T.StructType):
            raise ValueError(f"key column {k!r} may not be a struct")
    # struct columns split into per-leaf lanes here (decode reassembles)
    df, structs = flatten_struct_columns(df)
    spec = _prepare_spec(io, _struct_lane_nullable(df.schema, structs),
                         list(key_cols), bloom_cols, pds_col,
                         structs=structs)
    # appends into a date-partitioned table inherit its partition column
    pds_col = pds_col or spec.pds_col

    salt = F.pmod(F.xxhash64(*key_cols), F.lit(n_parts)).cast("int")
    if pds_col is not None:
        if not isinstance(df.schema[pds_col].dataType, T.DateType):
            raise ValueError(f"pds_col {pds_col!r} must be a date column")
        raw = [r[0] for r in df.select(pds_col).distinct().collect()]
        if any(d is None for d in raw):
            raise ValueError(f"pds_col {pds_col!r} contains nulls")
        dates = sorted(raw)
        date_idx = spark.createDataFrame(
            [(d, i) for i, d in enumerate(dates)], f"{pds_col} date, __didx int"
        )
        keyed = (
            df.join(F.broadcast(date_idx), pds_col)
            .withColumn("part_id", (F.col("__didx") * n_parts + salt).cast("int"))
            .withColumn("__pds", F.col(pds_col))
            .drop("__didx")
        )
    else:
        keyed = df.withColumn("part_id", salt)
    done = completed_table_parts(out_dir, run, io)
    if done:
        done_df = spark.createDataFrame([(p,) for p in done], "part_id int")
        keyed = keyed.join(F.broadcast(done_df), "part_id", "left_anti")

    full = chunk_schema_for(spec)
    manifest_struct = T.StructType(
        [f for f in full.fields
         if not (f.name.endswith("__payload") or f.name.endswith("__valid"))]
    )

    def kernel(table: pa.Table) -> pa.Table:
        return _encode_table_partition(table, io, spec, chunk_rows, pds,
                                       fail_parts=fail_parts, run=run,
                                       pds_from_col=pds_col is not None)

    result = keyed.groupBy("part_id").applyInArrow(kernel, schema=manifest_struct)
    result.write.format("noop").mode("overwrite").save()
    write_commit_log(out_dir, pds, io, schema_json=full.json())
    return read_table_manifest(spark, out_dir, io)


def encode_table_scan(df: DataFrame, out_dir: str, key_cols: list[str],
                      chunk_rows: int = DEFAULT_CHUNK_ROWS,
                      pds: date | None = None,
                      fail_parts: set[int] | None = None,
                      io: FsIO | None = None,
                      run: str = "r0") -> DataFrame:
    """Map-only generic encode: each *scan partition* is the encode unit —
    scan → ``mapInArrow`` → chunk files, **no shuffle at all** (the table
    analog of :func:`..operators.encode.encode_tokens_scan`, with the same
    resume-by-deterministic-partition-id contract). Use for curated inputs
    whose files already spread the data; :func:`encode_table` (salted
    shuffle) remains the path for skewed or hot-keyed sources."""
    spark = df.sparkSession
    pds = pds or date(2026, 1, 1)
    io = _io(out_dir, io)
    if "part_id" in df.columns:
        raise ValueError("'part_id' is a reserved column name")
    for k in key_cols:
        if k not in df.columns:
            raise ValueError(f"key column {k!r} not in DataFrame")
        if isinstance(df.schema[k].dataType, T.StructType):
            raise ValueError(f"key column {k!r} may not be a struct")
    df, structs = flatten_struct_columns(df)
    spec = _prepare_spec(io, _struct_lane_nullable(df.schema, structs),
                         list(key_cols), structs=structs)
    done = set(completed_table_parts(out_dir, run, io))

    full = chunk_schema_for(spec)
    manifest_struct = T.StructType(
        [f for f in full.fields
         if not (f.name.endswith("__payload") or f.name.endswith("__valid"))]
    )

    def gen(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid in done:
            return
        collected = list(batches)
        if not collected or sum(b.num_rows for b in collected) == 0:
            return
        table = pa.Table.from_batches(collected)
        table = table.append_column(
            "part_id", pa.array(np.full(table.num_rows, pid, np.int32))
        )
        yield from _encode_table_partition(
            table, io, spec, chunk_rows, pds, fail_parts=fail_parts, run=run
        ).to_batches()

    result = df.mapInArrow(gen, schema=manifest_struct)
    result.write.format("noop").mode("overwrite").save()
    write_commit_log(out_dir, pds, io, schema_json=full.json())
    return read_table_manifest(spark, out_dir, io)


def compact_table(out_dir: str, io: FsIO | None = None,
                  max_group_bytes: int = 128 << 20) -> dict:
    """Merge committed chunk files into fewer, larger files (the
    many-small-appends antidote — object-store listings and scan planning
    degrade with file count long before data size hurts).

    Chunk ROWS are moved verbatim (payloads untouched — compaction is pure
    file regrouping, no re-encode); files are greedily grouped under
    ``max_group_bytes``. The swap is committed as ONE log entry holding the
    new ``add``s and the old ``remove``s, so log-gated readers switch
    atomically; old files stay on disk (still referenced by nothing) until
    :func:`..operators.encode.vacuum` reclaims them. Pre-evolution files
    promote to the current chunk schema during the merge (missing payload
    cells become null — exactly what decode already expects).

    Driver-side merge by design: the files being compacted are SMALL (that
    is the problem being fixed); each group is bounded by ``max_group_bytes``
    and streamed through one pyarrow read+write.
    """
    import pyarrow.parquet as pq

    from .encode import append_log_entry, committed_files, read_commit_log

    io = _io(out_dir, io)
    spec = read_table_spec(out_dir, io)
    live = committed_files(out_dir, io)
    if live is None:
        raise ValueError("compact_table requires a committed table (no _log found)")
    sizes = {
        e["add"]["path"]: e["add"]["size"]
        for e in read_commit_log(out_dir, io)
        if "add" in e
    }
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in live:
        fsize = sizes.get(f, 0)
        if cur and cur_bytes + fsize > max_group_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += fsize
    if cur:
        groups.append(cur)
    if all(len(g) <= 1 for g in groups):
        return {"files_before": len(live), "files_after": len(live), "log": None}

    from pyspark.sql.pandas.types import to_arrow_schema

    chunk_schema = chunk_schema_for(spec)
    arrow_schema = to_arrow_schema(
        T.StructType([T.StructField(f.name, f.dataType, True) for f in chunk_schema.fields])
    )
    payload_cols = [f.name for f in spec.schema.fields]
    data_dir = io.join("data")
    tag = uuid.uuid4().hex[:8]
    entries: list[dict] = [
        {"metaData": {"schemaString": chunk_schema.json(),
                      "partitionColumns": ["pds"], "format": {"provider": "parquet"}}}
    ]
    new_files = 0
    for i, group in enumerate(groups):
        if len(group) <= 1:
            continue  # singleton stays as-is (still live, not removed)
        tables = [
            pq.read_table(io.open_input_file(posixpath.join(data_dir, f)))
            for f in group
        ]
        merged = _promote_to(tables, arrow_schema)
        name = f"part-compact{tag}-{i:05d}.parquet"
        size, sha = io.publish_parquet(
            merged,
            posixpath.join(data_dir, name),
            attempt_tag=tag,
            compression={f"{c}__payload": "NONE" for c in payload_cols}
            | {f"{c}__valid": "NONE" for c in payload_cols}
            | {"__default__": "SNAPPY"},
            use_dictionary=False,
            write_statistics=[
                f.name for f in chunk_schema.fields
                if not f.name.endswith(("__payload", "__valid")) and f.name != "sha"
            ],
        )
        new_files += 1
        entries.append({"add": {"path": name, "size": size, "sha256": sha,
                                "dataChange": False}})
        entries += [{"remove": {"path": f, "dataChange": False}} for f in group]
    log = append_log_entry(out_dir, entries, io)
    after = len(committed_files(out_dir, io))
    return {"files_before": len(live), "files_after": after, "log": log}


def _promote_to(tables: list[pa.Table], arrow_schema: pa.Schema) -> pa.Table:
    """Concat chunk tables onto the current chunk schema: columns a file
    predates (schema evolution) fill with nulls."""
    normed = []
    for t in tables:
        cols = []
        for field in arrow_schema:
            if field.name in t.column_names:
                cols.append(t.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(t.num_rows, field.type))
        normed.append(pa.Table.from_arrays(cols, schema=arrow_schema))
    return pa.concat_tables(normed)


# ------------------------------------------------------------- decode driver


def read_table_spec(out_dir: str, io: FsIO | None = None) -> TableSpec:
    io = _io(out_dir, io)
    return TableSpec.from_json(io.read_text(io.join("_schema.json")))


def read_table_chunks(spark: SparkSession, out_dir: str,
                      io: FsIO | None = None,
                      as_of: int | None = None) -> DataFrame:
    """Log-gated chunk-file scan under the sidecar's CURRENT chunk schema
    (passed explicitly, not footer-sampled): the commit log's live file set
    governs what is read (orphans/compacted files invisible; directory
    fallback pre-commit), and chunk files written before a schema evolution
    simply lack the new columns' stat/payload columns and surface them as
    nulls — no mergeSchema footer pass over every file."""
    from .encode import committed_files

    io = _io(out_dir, io)
    schema = chunk_schema_for(read_table_spec(out_dir, io))
    d = io.join("data")
    live = committed_files(out_dir, io, as_of=as_of)
    if live is None:
        live = [f for f in io.listdir(d) if f.endswith(".parquet")]
    if not live:
        return spark.createDataFrame([], schema)
    relaxed = T.StructType([T.StructField(f.name, f.dataType, True) for f in schema.fields])
    base = out_dir.rstrip("/") + "/data/"
    return spark.read.schema(relaxed).parquet(*[base + f for f in live])


def read_table_manifest(spark: SparkSession, out_dir: str,
                        io: FsIO | None = None,
                        as_of: int | None = None) -> DataFrame:
    """Long-form manifest: one row per (chunk, column) with codec/size/null
    stats. Only meta + small stat columns are referenced, so the parquet scan
    never touches payload bytes (top-level column pruning). ``as_of`` scopes
    the manifest to the live set at that commit-log index, so it always
    describes the same version a time-traveled data read sees."""
    spec = read_table_spec(out_dir, io)
    chunks = read_table_chunks(spark, out_dir, io, as_of=as_of)
    meta = [f.name for f in _meta_fields(spec) if f.name != "sha"]
    def _stat(name: str, which: str):
        # typed per column in the chunk files; stringified here so the long
        # form has one homogeneous struct type across columns. Binary stats
        # hex-encode (a raw cast would produce invalid UTF-8 strings).
        col = F.col(f"{name}__{which}")
        if spec.logicals[name] == "binary":
            return F.hex(col).alias(f"{which}_value")
        return col.cast("string").alias(f"{which}_value")

    per_col = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.lit(spec.logicals[f.name]).alias("logical"),
            F.col(f"{f.name}__codec").alias("codec"),
            F.col(f"{f.name}__nulls").alias("n_nulls"),
            F.col(f"{f.name}__raw").alias("raw_bytes"),
            F.col(f"{f.name}__enc").alias("enc_bytes"),
            _stat(f.name, "min"),
            _stat(f.name, "max"),
        )
        for f in spec.schema.fields
    ]
    return (
        chunks.select(*meta, F.explode(F.array(*per_col)).alias("c"))
        .select(*meta, "c.*")
    )


def decode_table(spark: SparkSession, out_dir: str,
                 columns: list[str] | None = None,
                 io: FsIO | None = None,
                 chunk_filter=None,
                 as_of: int | None = None,
                 meta_cols: list[str] | None = None) -> DataFrame:
    """Decode chunk files back to the source table, bit-identically.

    ``columns`` selects a subset — only those payload/validity columns are
    read (parquet column pruning at the chunk scan) and decoded; the plan is a
    shuffle-free ``mapInArrow`` either way, mirroring ``decode.decode_tokens``.
    ``chunk_filter`` (a Column over the chunk meta fields, e.g. a
    ``key_min``/``key_max`` zone-map predicate) prunes whole chunks at the
    parquet scan before any payload is read. ``as_of`` time-travels to the
    table as of that commit-log index (appends/compactions after it are
    invisible; schema-on-read under the CURRENT sidecar schema, so columns
    added later decode as null at old versions).

    ``meta_cols`` appends chunk-level ROW PROVENANCE columns, replicated per
    decoded row: any chunk meta field (``run``, ``part_id``, ``chunk_id``,
    ``chunk_seq``, ...) plus the synthetic ``__src_file`` (basename of the
    chunk parquet file the row lives in — the copy-on-write rewrite unit
    :func:`delete_where`/:func:`merge_table` operate on). ``chunk_filter``
    may reference them too.

    Struct columns (auto-flattened at encode, :func:`flatten_struct_columns`)
    reassemble here: pass the ORIGINAL struct name in ``columns`` to get the
    struct back (its leaves decode selectively); pass a flat leaf name
    (``s·leaf``) to read just that lane. ``chunk_filter`` predicates address
    the flat lanes (each leaf has its own zone map).
    """
    spec = read_table_spec(out_dir, io)
    structs = spec.structs or {}
    if structs.get("cols"):
        scols = {n: _struct_col_type(tj)
                 for n, tj in structs["cols"].items()}
        flat_names = {f.name for f in spec.schema.fields}
        wanted = list(columns) if columns is not None else _orig_columns(spec)
        flat_needed: list[str] = []
        missing = []
        for c in wanted:
            if c in scols:
                flat_needed += [
                    n for n in _struct_flat_names(c, scols[c])
                    if n not in flat_needed
                ]
            elif c in flat_names:
                if c not in flat_needed:
                    flat_needed.append(c)
            else:
                missing.append(c)
        if missing:
            raise ValueError(f"columns not in encoded table: {missing}")
        flat = _decode_table_flat(spark, out_dir, flat_needed, io,
                                  chunk_filter, as_of, meta_cols, spec)
        exprs = []
        for c in wanted:
            if c in scols:
                exprs.append(_rebuild_struct_expr(flat, c, scols[c]).alias(c))
            else:
                exprs.append(flat[c])
        exprs += [flat[m] for m in (meta_cols or [])]
        return flat.select(*exprs)
    return _decode_table_flat(spark, out_dir, columns, io, chunk_filter,
                              as_of, meta_cols, spec)


def _orig_columns(spec: TableSpec) -> list[str]:
    """Original-shape column list: the recorded declaration order, plus any
    later-appended flat columns not covered by a struct."""
    st = spec.structs or {}
    if not st.get("cols"):
        return [f.name for f in spec.schema.fields]
    covered: set[str] = set()
    for name, tj in st["cols"].items():
        covered.update(_struct_flat_names(name, _struct_col_type(tj)))
    out = list(st.get("order", []))
    seen = set(out)
    for f in spec.schema.fields:
        if f.name not in covered and f.name not in seen:
            out.append(f.name)
    return out


def _decode_table_flat(spark: SparkSession, out_dir: str,
                       columns: list[str] | None,
                       io: FsIO | None,
                       chunk_filter,
                       as_of: int | None,
                       meta_cols: list[str] | None,
                       spec: TableSpec) -> DataFrame:
    logicals = spec.logicals
    fields = [f for f in spec.schema.fields if columns is None or f.name in columns]
    if columns is not None:
        missing = set(columns) - {f.name for f in fields}
        if missing:
            raise ValueError(f"columns not in encoded table: {sorted(missing)}")
        fields.sort(key=lambda f: columns.index(f.name))
    meta_cols = list(meta_cols or [])
    chunk_fields = {f.name: f for f in chunk_schema_for(spec).fields}
    for m in meta_cols:
        if m in {f.name for f in spec.schema.fields}:
            raise ValueError(f"meta column {m!r} collides with a table column")
        if m not in ("__src_file", "__pos") and (
            m not in chunk_fields or m.endswith(("__payload", "__valid"))
        ):
            raise ValueError(f"unknown meta column {m!r}")
    _synth_types = {"__src_file": T.StringType(), "__pos": T.LongType()}
    meta_struct = [
        T.StructField(m, _synth_types.get(m) or chunk_fields[m].dataType, True)
        for m in meta_cols
    ]
    out_struct = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in fields] + meta_struct
    )

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_out = to_arrow_schema(out_struct)
    names = [f.name for f in fields]

    # merge-on-read deletes: DV state at this version, packed per chunk id
    from .encode import committed_dv_actions
    _riod = _io(out_dir, io)
    dv_packed = _dv_packed_map(_riod, committed_dv_actions(out_dir, _riod,
                                                           as_of=as_of))

    select_cols = ["n_rows"]
    if dv_packed and "chunk_id" not in meta_cols:
        select_cols.append("chunk_id")
    for name in names:
        select_cols += [f"{name}__valid", f"{name}__payload"]
    select_cols += [m for m in meta_cols if m != "__pos"]

    def gen(it):
        for batch in it:
            cols = {c: batch.column(i) for i, c in enumerate(batch.schema.names)}
            for i in range(batch.num_rows):  # iterates CHUNKS, not rows
                n = int(cols["n_rows"][i].as_py())
                arrays = []
                for name in names:
                    vp = cols[f"{name}__valid"][i].as_py()
                    pl = cols[f"{name}__payload"][i].as_py()
                    if pl is None:
                        # chunk predates this column (schema evolution):
                        # it decodes as all-null
                        arrays.append(pa.nulls(n, arrow_out.field(name).type))
                        continue
                    arrays.append(
                        _decode_column(vp, pl, logicals[name], n,
                                       arrow_out.field(name).type)
                    )
                for m in meta_cols:
                    if m == "__pos":
                        # physical in-chunk ordinal, assigned BEFORE the DV
                        # filter so new DV deletes address original positions
                        arrays.append(pa.array(np.arange(n, dtype=np.int64)))
                    else:
                        arrays.append(pa.repeat(
                            cols[m][i].cast(arrow_out.field(m).type), n))
                if dv_packed:
                    pk = dv_packed.get(cols["chunk_id"][i].as_py())
                    if pk is not None:
                        keep = np.ones(n, dtype=bool)
                        keep[np.frombuffer(zlib.decompress(pk), dtype="<u4")] = False
                        mask = pa.array(keep)
                        arrays = [a.filter(mask) for a in arrays]
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_out)

    chunks = read_table_chunks(spark, out_dir, io, as_of=as_of)
    if "__src_file" in meta_cols:
        chunks = chunks.withColumn(
            "__src_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
    if chunk_filter is not None:
        chunks = chunks.filter(chunk_filter)
    return chunks.select(*select_cols).mapInArrow(gen, schema=out_struct)


def register_table_views(spark: SparkSession, out_dir: str, name: str,
                         io: FsIO | None = None,
                         as_of: int | None = None) -> None:
    """Expose an encoded table to ``spark.sql``: temp views ``<name>``
    (decoded rows — Catalyst sees a normal relation, so joins/aggregations/
    window functions over the encoded store are plain SQL) and
    ``<name>_manifest`` (long-form chunk/codec/zone-map stats). This view
    decodes EVERY column (``mapInArrow`` is a projection barrier — Catalyst
    cannot prune through it); for per-query column pruning + zone-map chunk
    filters from a SQL string, use :func:`table_sql`, or pass ``columns``/
    ``chunk_filter`` to :func:`decode_table` directly."""
    decode_table(spark, out_dir, io=io, as_of=as_of).createOrReplaceTempView(name)
    read_table_manifest(spark, out_dir, io, as_of=as_of).createOrReplaceTempView(
        f"{name}_manifest"
    )


# ----------------------------------------------------- pruned SQL surface
# ``register_table_views`` decodes EVERY column for every query because
# ``mapInArrow`` is a projection/predicate barrier: Catalyst cannot push the
# SQL's column set or filters through it into the chunk scan. ``table_sql``
# closes that gap per query, before the barrier exists: it inspects the SQL
# text, registers a view decoding only the referenced columns, and turns
# provably-safe WHERE conjuncts into zone-map chunk filters — the reference's
# Delta reader-side pruning contract (``DeltaLake.fs:176-444``) applied to
# an ad-hoc SQL string.


def _strip_sql_noise(sql: str) -> str:
    """Remove comments; collapse whitespace (string literals kept)."""
    import re

    s = re.sub(r"--[^\n]*", " ", sql)
    s = re.sub(r"/\*.*?\*/", " ", s, flags=re.S)
    return re.sub(r"\s+", " ", s).strip()


def referenced_table_columns(sql: str, spec: TableSpec) -> list[str] | None:
    """Encoded-table columns the SQL can possibly reference, by identifier
    intersection over the de-commented, de-stringed text. Returns ``None``
    for "all" (a ``SELECT *`` / ``alias.*`` appears); over-approximation is
    safe (an extra column decodes needlessly), under-approximation cannot
    happen for valid SQL because every column use is a bare identifier
    token. With zero matches (e.g. ``SELECT count(*)``), the cheapest
    decodable unit — the first key column — is used for row counts."""
    import re

    s = _strip_sql_noise(sql)
    no_str = re.sub(r"'(?:[^']|'')*'", " ", s)
    # a star selection (SELECT *, t.*, "..., *") forces all columns;
    # count(*) does not match (the "(" intervenes between count and *)
    if re.search(r"(?i)(?:\bselect|,)\s*(?:[a-z_]\w*\s*\.\s*)?\*", no_str):
        return None
    toks = {t.lower() for t in re.findall(r"[A-Za-z_]\w*", no_str)}
    cols = [f.name for f in spec.schema.fields if f.name.lower() in toks]
    return cols or [spec.key_cols[0]]


_SQL_LIT = r"(?:(?:date|timestamp)\s*'[^']*'|'(?:[^']|'')*'|-?\d+(?:\.\d+)?)"


def _zone_lit(tok: str, dt: T.DataType):
    import re

    t = tok.strip()
    m = re.match(r"(?i)(?:date|timestamp)\s*'([^']*)'", t)
    if m:
        return F.lit(m.group(1)).cast(dt)
    if t.startswith("'"):
        v = F.lit(t[1:-1].replace("''", "'"))
        return v.cast(dt) if isinstance(
            dt, (T.DateType, T.TimestampType, T.TimestampNTZType)) else v
    # numeric literals stay untyped: Spark's numeric promotion compares
    # exactly; casting 5.5 to an int column's type would mis-prune `<`
    return F.lit(float(t) if "." in t or "e" in t.lower() else int(t))


def zone_map_filter_for_sql(sql: str, spec: TableSpec, view_name: str):
    """Chunk-filter Column derived from the SQL's WHERE clause, or ``None``.

    Only provably-safe extractions prune (a wrong prune is a wrong answer,
    not a missed optimization, so every gate errs toward ``None``):

    * single SELECT, no JOIN, FROM exactly ``view_name`` — the WHERE can
      only constrain this table;
    * the WHERE clause contains no OR/NOT/CASE/IN/EXISTS/LIKE — every
      top-level AND conjunct is then individually necessary;
    * only conjuncts that ENTIRELY match ``col op literal`` or
      ``col BETWEEN a AND b`` on an encoded column participate; anything
      else is ignored (Spark still applies the full residual WHERE on the
      decoded rows — zone maps prune chunks, never rows).

    All-null chunks carry NULL stats and are pruned by SQL null semantics —
    correct, since their rows cannot satisfy any comparison; chunks predating
    an evolved column likewise decode it as all-null.
    """
    import re

    s = _strip_sql_noise(sql)
    if len(re.findall(r"(?i)\bselect\b", s)) != 1 or re.search(r"(?i)\bjoin\b", s):
        return None
    m_from = re.search(r"(?i)\bfrom\s+([a-z_][\w.]*)", s)
    if not m_from or m_from.group(1).lower() != view_name.lower():
        return None
    m_where = re.search(
        r"(?i)\bwhere\b(.*?)(?:\bgroup by\b|\border by\b|\blimit\b|\bhaving\b|\bwindow\b|$)",
        s,
    )
    if not m_where:
        return None
    clause = m_where.group(1)
    if re.search(r"(?i)\b(or|not|case|in|exists|like)\b", clause):
        return None

    logicals = spec.logicals
    dtypes = {f.name.lower(): f for f in spec.schema.fields
              if not logicals[f.name].startswith("array")}
    conds: list[tuple] = []

    def grab_between(m):
        conds.append(("between", m.group(1), m.group(2), m.group(3)))
        return " "

    clause = re.sub(
        rf"(?i)\b([a-z_]\w*)\s+between\s+({_SQL_LIT})\s+and\s+({_SQL_LIT})",
        grab_between,
        clause,
    )
    cmp_full = re.compile(rf"(?i)([a-z_]\w*)\s*(>=|<=|=|<|>)\s*({_SQL_LIT})")
    for frag in re.split(r"(?i)\band\b", clause):
        frag = frag.strip()
        while frag.startswith("(") and frag.endswith(")"):
            frag = frag[1:-1].strip()
        frag = frag.strip("() ").strip()
        if not frag:
            continue
        m = cmp_full.fullmatch(frag)
        if m:
            conds.append(("cmp", m.group(1), m.group(2), m.group(3)))

    pred = None
    for cond in conds:
        name = cond[1].lower()
        field = dtypes.get(name)
        if field is None:
            continue
        col = field.name
        if cond[0] == "between":
            lo = _zone_lit(cond[2], field.dataType)
            hi = _zone_lit(cond[3], field.dataType)
            p = (F.col(f"{col}__max") >= lo) & (F.col(f"{col}__min") <= hi)
        else:
            op, lit = cond[2], _zone_lit(cond[3], field.dataType)
            if op == ">=":
                p = F.col(f"{col}__max") >= lit
            elif op == ">":
                p = F.col(f"{col}__max") > lit
            elif op == "<=":
                p = F.col(f"{col}__min") <= lit
            elif op == "<":
                p = F.col(f"{col}__min") < lit
            else:  # =
                p = (F.col(f"{col}__min") <= lit) & (F.col(f"{col}__max") >= lit)
        pred = p if pred is None else (pred & p)
    return pred


def table_sql(spark: SparkSession, out_dir: str, sql: str, name: str,
              io: FsIO | None = None, as_of: int | None = None) -> DataFrame:
    """Run ``sql`` against the encoded table exposed as view ``name``,
    decoding ONLY the columns the SQL references and zone-map-pruning chunks
    from its safe WHERE conjuncts. The chunk scan's ReadSchema then carries
    just the referenced payload/validity streams (parquet top-level column
    pruning) and the chunk filter lands in ``PushedFilters`` — the engine's
    ``decode_table(columns=…, chunk_filter=…)`` fast path, reachable from a
    plain SQL string. Also registers ``<name>_manifest``."""
    spec = read_table_spec(out_dir, io)
    cols = referenced_table_columns(sql, spec)
    cf = zone_map_filter_for_sql(sql, spec, name)
    decode_table(spark, out_dir, columns=cols, io=io, chunk_filter=cf,
                 as_of=as_of).createOrReplaceTempView(name)
    read_table_manifest(spark, out_dir, io, as_of=as_of).createOrReplaceTempView(
        f"{name}_manifest"
    )
    return spark.sql(sql)


def lookup_key_range(spark: SparkSession, out_dir: str, lo, hi,
                     columns: list[str] | None = None,
                     io: FsIO | None = None) -> DataFrame:
    """Selective decode of rows whose FIRST key column lies in ``[lo, hi]``.

    Chunk pruning via the typed ``key_min``/``key_max`` zone map: rows inside
    a chunk are key-sorted (the encode kernel sorts before slicing), so a
    chunk can overlap the range only if ``key_max >= lo AND key_min <= hi``.
    The predicate lands in the parquet scan (``PushedFilters``), payloads of
    pruned chunks are never read, and only surviving chunks are decoded —
    ``decode.lookup_docs``'s point-lookup idea generalized to any key type.
    """
    spec = read_table_spec(out_dir, io)
    k0 = spec.key_cols[0]
    if columns is not None and k0 not in columns:
        columns = [k0] + list(columns)
    pruned = (F.col("key_max") >= F.lit(lo)) & (F.col("key_min") <= F.lit(hi))
    dec = decode_table(spark, out_dir, columns=columns, io=io, chunk_filter=pruned)
    return dec.filter(F.col(k0).between(F.lit(lo), F.lit(hi)))


def lookup_value(spark: SparkSession, out_dir: str, column: str, value,
                 columns: list[str] | None = None,
                 io: FsIO | None = None) -> DataFrame:
    """Point lookup ``column = value`` on ANY column with chunk pruning.

    Prunes with both available structures and the exact filter last:
    * the typed per-column min/max zone map (tight when ``column`` is the
      sort key, loose otherwise);
    * the per-chunk bloom filter when the table was encoded with ``column``
      in ``bloom_cols`` — the structure that actually prunes point lookups
      on unsorted high-cardinality columns, where every chunk's min/max
      spans nearly the full range.
    Both prune conservatively (null stats/bloom keep the chunk); surviving
    chunks decode only the requested ``columns``.
    """
    spec = read_table_spec(out_dir, io)
    if columns is not None and column not in columns:
        columns = [column] + list(columns)
    zmap = (
        F.col(f"{column}__min").isNull()
        | ((F.col(f"{column}__min") <= F.lit(value))
           & (F.col(f"{column}__max") >= F.lit(value)))
    )
    pred = zmap
    if column in spec.bloom_cols:
        pred = pred & bloom_value_predicate(column, value)
    dec = decode_table(spark, out_dir, columns=columns, io=io, chunk_filter=pred)
    return dec.filter(F.col(column) == F.lit(value))


def column_range_filter(name: str, lo, hi):
    """Chunk-filter Column pruning on ANY encoded column's typed zone map:
    a chunk can hold a value in ``[lo, hi]`` only if its min/max overlap the
    range (all-null chunks have NULL stats and are pruned by null semantics).
    Pass to :func:`decode_table` as ``chunk_filter``; combine with ``&``/``|``
    for conjunctive predicates. The caller applies the residual row filter
    after decode (zone maps prune chunks, not rows)."""
    return (F.col(f"{name}__max") >= F.lit(lo)) & (F.col(f"{name}__min") <= F.lit(hi))


# ----------------------------------------------- metadata-only statistics


def table_stats(spark: SparkSession, out_dir: str,
                columns: list[str] | None = None,
                io: FsIO | None = None,
                as_of: int | None = None) -> DataFrame:
    """Exact per-column statistics WITHOUT reading any payload byte.

    Total rows, null count, min and max per column, aggregated from the
    chunk zone maps alone — the same answer a full decode + aggregate gives,
    because chunk stats are computed from the actual values at encode time
    (never truncated the way parquet footer string stats can be). At 100 TB
    this turns ``SELECT count(*), min(x), max(x)`` into a parquet scan of a
    few small stat columns over the chunk rows (~1e-5 of the data), one
    map-side-combined aggregate, zero decode.

    Schema-evolved chunks predate added columns entirely (their stat cells
    are null) and count as all-null — ``coalesce(col__nulls, n_rows)``.
    Output: one row per column ``(column, n_rows, n_nulls, min_value,
    max_value)`` with min/max stringified (binary hex-encoded), the
    :func:`read_table_manifest` convention, so the row type is homogeneous
    across columns.

    Deletion vectors (:func:`dv_delete_where`): ``n_rows`` stays EXACT — the
    per-chunk DV cardinalities broadcast-join onto the chunk scan and
    subtract. ``n_nulls``/``min``/``max`` remain the chunks' physical stats,
    i.e. valid-but-possibly-loose bounds once rows are soft-deleted (the
    Delta convention: file stats are physical; a CoW rewrite or compaction
    of the affected files re-tightens them).
    """
    spec = read_table_spec(out_dir, io)
    fields = [f for f in spec.schema.fields if columns is None or f.name in columns]
    if columns is not None:
        missing = set(columns) - {f.name for f in fields}
        if missing:
            raise ValueError(f"columns not in encoded table: {sorted(missing)}")
        fields.sort(key=lambda f: columns.index(f.name))
    chunks = read_table_chunks(spark, out_dir, io, as_of=as_of)
    from .encode import committed_dv_actions
    _riod = _io(out_dir, io)
    dvm = load_dv_map(_riod, committed_dv_actions(out_dir, _riod, as_of=as_of))
    rows_expr = F.col("n_rows")
    if dvm:
        dv_counts = spark.createDataFrame(
            [(cid, len(pos)) for cid, pos in dvm.items()],
            "chunk_id string, __dvk long",
        )
        chunks = chunks.join(F.broadcast(dv_counts), "chunk_id", "left")
        rows_expr = F.col("n_rows") - F.coalesce(F.col("__dvk"), F.lit(0))
    aggs = [F.sum(rows_expr).alias("__rows")]
    for f in fields:
        aggs += [
            F.sum(F.coalesce(F.col(f"{f.name}__nulls"), F.col("n_rows")))
            .alias(f"{f.name}__tn"),
            F.min(f"{f.name}__min").alias(f"{f.name}__mn"),
            F.max(f"{f.name}__max").alias(f"{f.name}__mx"),
        ]

    def _s(name: str, which: str):
        col = F.col(f"{name}__{which}")
        if spec.logicals[name] == "binary":
            return F.hex(col).alias(f"{which}_value")
        return col.cast("string").alias(f"{which}_value")

    per_col = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.col(f"{f.name}__tn").alias("n_nulls"),
            _s(f.name, "mn").alias("min_value"),
            _s(f.name, "mx").alias("max_value"),
        )
        for f in fields
    ]
    return (
        chunks.agg(*aggs)
        .select(F.explode(F.array(*per_col)).alias("s"))
        .select("s.*")
    )


# ------------------------------------------- row-level DELETE / MERGE (CoW)


def _file_pds_map(out_dir: str, io: FsIO) -> dict[str, date]:
    """Each live-or-historical file's partition date from its commit-log add
    record — the source of truth a rewrite must PRESERVE per file so
    date-partitioned (``pds_col``) tables keep pruning correctly after DML."""
    from .encode import read_commit_log

    out: dict[str, date] = {}
    for e in read_commit_log(out_dir, io):
        if "add" in e:
            v = e["add"].get("partitionValues", {}).get("pds")
            if v:
                out[e["add"]["path"]] = date.fromisoformat(v)
    return out


def _rewrite_job(survivors: DataFrame, io: FsIO, spec: TableSpec,
                 chunk_rows: int, pds: date, run: str,
                 sort_cols: list[str] | None = None,
                 pds_from_col: bool = False) -> list[dict]:
    """Run the grouped encode kernel for a copy-on-write rewrite and return
    the ``add`` log dicts for every file it published. Markers go to
    ``_rewrites/`` (not ``_checkpoints/``) so ``write_commit_log``'s marker
    gate can never auto-commit a rewrite file: the rewrite becomes visible
    only through its caller's single add+remove log entry, and a crash
    before that entry leaves pure orphans for ``vacuum``."""
    full = chunk_schema_for(spec)
    manifest_struct = T.StructType(
        [f for f in full.fields
         if not (f.name.endswith("__payload") or f.name.endswith("__valid"))]
    )

    def kernel(table: pa.Table) -> pa.Table:
        return _encode_table_partition(table, io, spec, chunk_rows, pds,
                                       run=run, marker_dir="_rewrites",
                                       sort_cols=sort_cols,
                                       pds_from_col=pds_from_col)

    (survivors.groupBy("part_id").applyInArrow(kernel, manifest_struct)
     .write.format("noop").mode("overwrite").save())
    adds: list[dict] = []
    rw = io.join("_rewrites")
    prefix = f"part-{run}-"
    if io.isdir(rw):
        for f in sorted(io.listdir(rw)):
            if f.startswith(prefix) and f.endswith(".json"):
                st = json.loads(io.read_text(posixpath.join(rw, f)))
                adds.append({"add": {
                    "path": st["file_name"], "size": st["file_size"],
                    "sha256": st["file_sha256"],
                    # per-file partition date from the rewrite marker: a DML
                    # rewrite of a date-partitioned file keeps ITS date
                    "partitionValues": {"pds": st.get("pds",
                                                      pds.isoformat())},
                    "dataChange": True,
                }})
    return adds


def _meta_entry(spec: TableSpec) -> dict:
    chunk_schema = chunk_schema_for(spec)
    return {"metaData": {"schemaString": chunk_schema.json(),
                         "partitionColumns": ["pds"],
                         "format": {"provider": "parquet"}}}


def _flat_for_rewrite(df: DataFrame, spec: TableSpec) -> DataFrame:
    """DML frames are built in the table's ORIGINAL shape (structs
    reassembled, so conditions/assignments address ``s.a`` naturally); the
    rewrite kernel works on the FLAT physical schema. Re-split struct
    columns here — pure projection, Catalyst folds it into the decode
    projection. Helper columns (``part_id``/``__pds``) pass through."""
    if not (spec.structs or {}).get("cols"):
        return df
    flat, _ = flatten_struct_columns(df)
    return flat


DML_MAX_MATCHED_FILES = 1_000_000
"""Cap on DML detect-phase matched files returned to the driver.

The matched-file list must reach the driver (it IS the copy-on-write
rewrite plan), but an unbounded `.collect()` of per-file hit rows is a
driver-OOM hazard when a broad predicate matches most of a 100-TB table
(VERDICT r04 item 3). The detect pass now (a) drops the per-file counts
(total comes from one scalar aggregate), and (b) fails fast past this cap
with guidance to partition the DML by predicate instead."""


def _dml_matched_files(filtered: DataFrame) -> tuple[list[str], int]:
    """Detect-phase fold: (sorted matched ``__src_file`` names, matched-row
    count). One distributed aggregate for the scalars, then a distinct
    file-name collect gated by :data:`DML_MAX_MATCHED_FILES` — never a
    per-file count row set."""
    slim = filtered.select("__src_file").localCheckpoint(eager=False)
    stats = slim.agg(
        F.count("*").alias("n"),
        F.countDistinct("__src_file").alias("nf"),
    ).first()
    n_rows, n_files = int(stats["n"]), int(stats["nf"])
    if n_files > DML_MAX_MATCHED_FILES:
        raise ValueError(
            f"DML predicate matches {n_files} files "
            f"(> DML_MAX_MATCHED_FILES={DML_MAX_MATCHED_FILES}); split the "
            "statement by a partition predicate (pds / key range) so each "
            "rewrite plan stays driver-sized"
        )
    matched = sorted(
        r["__src_file"] for r in slim.distinct().collect()
    )
    return matched, n_rows


def delete_where(spark: SparkSession, out_dir: str, condition,
                 io: FsIO | None = None,
                 chunk_rows: int = DEFAULT_CHUNK_ROWS,
                 pds: date | None = None,
                 condition_cols: list[str] | None = None,
                 chunk_filter=None) -> dict:
    """Row-level DELETE with copy-on-write file rewrite + ONE atomic commit
    (the Delta ``DELETE FROM`` contract over the reference's commit-log
    protocol, ``DeltaLake.fs:176-444``).

    ``condition`` is a Column over the table's source columns; rows where it
    evaluates TRUE are deleted (FALSE *or NULL* rows survive — SQL DELETE
    semantics). Two passes, both distributed:

    1. *Detect*: decode (optionally only ``condition_cols``, and only chunks
       passing ``chunk_filter`` — zone maps / blooms prune here) with
       ``__src_file`` row provenance; one tiny aggregate yields the matched
       file set + deleted-row count.
    2. *Rewrite*: only matched files' chunks re-decode; survivors re-encode
       grouped per original file (the CoW unit, so untouched files are never
       rewritten). One ``append_log_entry`` holds the new adds AND the old
       files' removes — log-gated readers switch atomically, ``as_of``
       versions before the entry still see the pre-delete rows until
       ``vacuum`` reclaims them.
    """
    from .encode import append_log_entry, committed_files

    io = _io(out_dir, io)
    if committed_files(out_dir, io) is None:
        raise ValueError("delete_where requires a committed table (no _log found)")
    spec = read_table_spec(out_dir, io)
    pds = pds or date(2026, 1, 1)

    probe = decode_table(spark, out_dir, columns=condition_cols, io=io,
                         chunk_filter=chunk_filter, meta_cols=["__src_file"])
    matched, n_deleted = _dml_matched_files(probe.filter(condition))
    if not matched:
        return {"rows_deleted": 0, "files_rewritten": 0,
                "files_removed": 0, "log": None}

    run = f"dw{uuid.uuid4().hex[:8]}"
    fp = _file_pds_map(out_dir, io)
    part_map = spark.createDataFrame(
        [(f, i, fp.get(f, pds)) for i, f in enumerate(matched)],
        "__src_file string, part_id int, __pds date",
    )
    dec = decode_table(spark, out_dir, io=io, meta_cols=["__src_file"],
                       chunk_filter=F.col("__src_file").isin(matched))
    survivors = (
        dec.join(F.broadcast(part_map), "__src_file")
        .filter(~F.coalesce(condition, F.lit(False)))
        .drop("__src_file")
    )
    adds = _rewrite_job(_flat_for_rewrite(survivors, spec), io, spec,
                        chunk_rows, pds, run, pds_from_col=True)
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec)] + adds
        + [{"remove": {"path": f, "dataChange": True}} for f in matched],
        io,
    )
    return {"rows_deleted": n_deleted, "files_rewritten": len(adds),
            "files_removed": len(matched), "log": log}


# ------------------------------------- deletion vectors (merge-on-read DELETE)
# The CoW `delete_where` rewrites every matched file — right for broad
# predicates, wasteful for sparse ones (a GDPR delete of 1e3 rows spread over
# 1e4 multi-GB files would rewrite terabytes). A deletion vector instead
# records the doomed rows' ordinals per CHUNK in a `_dv/` sidecar and commits
# one metadata-only `{"dv": ...}` log action; every reader
# (`decode_table`, SQL views, the DataSource) subtracts them at decode time.
# Keying by chunk_id (content-addressed, globally unique) — never file path —
# means compaction (verbatim chunk moves) carries DVs untouched and CoW
# rewrites (fresh chunk ids) orphan them harmlessly. Delta's deletion-vector
# feature, re-derived over this store's chunk model.

DV_MAX_DELETED_ROWS = 4_000_000
"""Driver-size guard: a DV delete collects (chunk_id, ordinals) to the
driver. Past this many matched rows the predicate is not 'sparse' — use the
copy-on-write :func:`delete_where`, which never materializes row ids."""


def _pack_positions(pos: np.ndarray) -> str:
    return base64.b64encode(
        zlib.compress(np.asarray(pos, dtype="<u4").tobytes())
    ).decode("ascii")


def _unpack_positions(b64: str) -> np.ndarray:
    return np.frombuffer(zlib.decompress(base64.b64decode(b64)), dtype="<u4")


def load_dv_map(io: FsIO, actions: list[dict]) -> dict[str, np.ndarray]:
    """Union the live DV actions' per-chunk deleted ordinals. Disjointness
    holds by construction (a delete's probe decode already excludes earlier
    DV rows), so cardinalities are additive; union1d also tolerates replayed
    duplicates."""
    out: dict[str, np.ndarray] = {}
    for a in actions:
        d = json.loads(io.read_text(io.join("_dv/" + a["dvFile"])))
        for cid, b64 in d["chunks"].items():
            pos = _unpack_positions(b64)
            out[cid] = np.union1d(out[cid], pos) if cid in out else pos
    return out


def _dv_packed_map(io: FsIO, actions: list[dict]) -> dict[str, bytes]:
    """zlib-packed positions per chunk — the task-closure form (compressed
    so a wide DV state doesn't bloat task serialization)."""
    return {cid: zlib.compress(np.asarray(pos, dtype="<u4").tobytes())
            for cid, pos in load_dv_map(io, actions).items()}


def dv_delete_where(spark: SparkSession, out_dir: str, condition,
                    io: FsIO | None = None,
                    condition_cols: list[str] | None = None,
                    chunk_filter=None) -> dict:
    """Row-level DELETE as a deletion vector: no data file is rewritten.

    One distributed probe (selective decode of ``condition_cols``, zone
    maps/blooms prune via ``chunk_filter``) finds matched rows' (chunk_id,
    in-chunk ordinal); ordinals are pre-DV physical positions, so repeated
    DV deletes compose (the probe never re-matches an already-deleted row).
    The positions publish to ``_dv/dv-<uuid>.json`` and ONE metadata-only
    log action makes them visible atomically — ``as_of`` reads before it
    still see the rows, :func:`restore_table` resurrects them via
    ``dvRestore``, and any later CoW rewrite of a file materializes the
    deletes (survivor decode is DV-filtered) and retires its vectors.
    """
    from .encode import append_log_entry, committed_files

    io = _io(out_dir, io)
    if committed_files(out_dir, io) is None:
        raise ValueError("dv_delete_where requires a committed table (no _log found)")
    spec = read_table_spec(out_dir, io)

    probe = decode_table(spark, out_dir, columns=condition_cols, io=io,
                         chunk_filter=chunk_filter,
                         meta_cols=["chunk_id", "__pos"])
    hits = (probe.filter(condition).select("chunk_id", "__pos")
            .localCheckpoint(eager=False))
    total = hits.count()
    if total == 0:
        return {"rows_deleted": 0, "chunks_touched": 0,
                "dv_file": None, "log": None}
    if total > DV_MAX_DELETED_ROWS:
        raise ValueError(
            f"predicate matches {total} rows "
            f"(> DV_MAX_DELETED_ROWS={DV_MAX_DELETED_ROWS}); this is a broad "
            "delete — use the copy-on-write delete_where instead"
        )
    rows = (
        hits.groupBy("chunk_id")
        .agg(F.sort_array(F.collect_list("__pos")).alias("pos"))
        .collect()
    )
    chunks = {r["chunk_id"]: _pack_positions(np.asarray(r["pos"]))
              for r in rows}
    name = f"dv-{uuid.uuid4().hex[:12]}.json"
    io.makedirs(io.join("_dv"))
    io.publish_bytes(
        io.join("_dv/" + name),
        json.dumps({"chunks": chunks, "cardinality": total}).encode(),
        attempt_tag=name[3:15],
    )
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec), {"dv": {"dvFile": name, "cardinality": total}}],
        io,
    )
    return {"rows_deleted": total, "chunks_touched": len(rows),
            "dv_file": name, "log": log}


def dv_update_where(spark: SparkSession, out_dir: str, condition,
                    assignments: dict, io: FsIO | None = None,
                    chunk_rows: int = DEFAULT_CHUNK_ROWS,
                    pds: date | None = None,
                    condition_cols: list[str] | None = None,
                    chunk_filter=None,
                    update_parts: int = 8) -> dict:
    """Row-level UPDATE as merge-on-read: DV-mark the old rows, append the
    updated rows as fresh files, ONE atomic log commit — no existing data
    file is rewritten (Delta's DV-backed UPDATE shape, vs the copy-on-write
    :func:`update_where` which rewrites every matched file in place).

    Semantics differ from the CoW path in one liberating way: because the
    updated rows RELOCATE into fresh files (own zone maps, own
    ``partitionValues``), *any* column may be assigned — including the key
    columns and the partition column ``pds_col`` (rows re-route to their new
    date's files via the same per-(date, salt) routing merge inserts use).
    The in-place CoW paths must reject both, since there the row keeps its
    file and the file keeps its placement metadata.

    Two distributed passes over DV-filtered decodes, so repeated MoR updates
    compose (an already-superseded row never re-matches):

    1. *Probe*: selective decode of ``condition_cols`` (``chunk_filter``
       prunes via zone maps/blooms) yields matched (chunk_id, physical
       ordinal); bounded by ``DV_MAX_DELETED_ROWS`` — past it the predicate
       is not sparse, use :func:`update_where`.
    2. *Rewrite rows, not files*: only the touched chunks decode in full;
       ``condition`` re-applies (it must be DETERMINISTIC over the row — the
       same contract the CoW rewrite's in-place ``F.when`` relies on) and
       ``assignments`` (column → Column over the PRE-update row, SQL UPDATE
       semantics) produce the replacement rows, encoded append-style.

    The commit carries the new files' adds AND the ``{"dv": ...}`` action
    atomically: readers see either the old rows or (new rows + vectors),
    never both. ``as_of`` before the commit sees pre-update rows;
    :func:`restore_table` undoes both halves (``dvRestore`` + file removes);
    a later compaction carries the vectors (chunk-id-keyed) verbatim.
    """
    from .encode import append_log_entry, committed_files

    io = _io(out_dir, io)
    if committed_files(out_dir, io) is None:
        raise ValueError("dv_update_where requires a committed table (no _log found)")
    spec = read_table_spec(out_dir, io)
    scols = {n: relax_nullable(_struct_col_type(tj))
             for n, tj in (spec.structs or {}).get("cols", {}).items()}
    orig_fields = [
        (n, scols.get(n) or spec.schema[n].dataType)
        for n in _orig_columns(spec)
    ]
    bad = sorted(set(assignments) - {n for n, _ in orig_fields})
    if bad:
        raise ValueError(f"assigned columns not in table: {bad}")
    pds = pds or date(2026, 1, 1)

    probe = decode_table(spark, out_dir, columns=condition_cols, io=io,
                         chunk_filter=chunk_filter,
                         meta_cols=["chunk_id", "__pos"])
    hits = (probe.filter(condition).select("chunk_id", "__pos")
            .localCheckpoint(eager=False))
    total = hits.count()
    if total == 0:
        return {"rows_updated": 0, "chunks_touched": 0, "files_added": 0,
                "dv_file": None, "log": None}
    if total > DV_MAX_DELETED_ROWS:
        raise ValueError(
            f"predicate matches {total} rows "
            f"(> DV_MAX_DELETED_ROWS={DV_MAX_DELETED_ROWS}); this is a broad "
            "update — use the copy-on-write update_where instead"
        )
    pos_rows = (
        hits.groupBy("chunk_id")
        .agg(F.sort_array(F.collect_list("__pos")).alias("pos"))
        .collect()
    )
    chunks = {r["chunk_id"]: _pack_positions(np.asarray(r["pos"]))
              for r in pos_rows}

    # replacement rows: full decode of ONLY the touched chunks (every other
    # chunk's payload is never read), condition re-applied, assignments
    # evaluated against the pre-update row, routed like merge inserts
    run = f"du{uuid.uuid4().hex[:8]}"
    dec = decode_table(spark, out_dir, io=io,
                       chunk_filter=F.col("chunk_id").isin(sorted(chunks)))
    updated = dec.filter(condition).select(
        *[
            assignments[name].cast(dtype).alias(name)
            if name in assignments else F.col(name)
            for name, dtype in orig_fields
        ]
    )
    routed = _route_inserts(spark, _flat_for_rewrite(updated, spec), spec,
                            update_parts, pds, 0, out_dir, io)
    adds = _rewrite_job(routed, io, spec, chunk_rows, pds, run,
                        pds_from_col=True)

    name = f"dv-{uuid.uuid4().hex[:12]}.json"
    io.makedirs(io.join("_dv"))
    io.publish_bytes(
        io.join("_dv/" + name),
        json.dumps({"chunks": chunks, "cardinality": total}).encode(),
        attempt_tag=name[3:15],
    )
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec)] + adds
        + [{"dv": {"dvFile": name, "cardinality": total}}],
        io,
    )
    return {"rows_updated": total, "chunks_touched": len(pos_rows),
            "files_added": len(adds), "dv_file": name, "log": log}


def _route_inserts(spark: SparkSession, src_flat: DataFrame, spec: TableSpec,
                   insert_parts: int, pds: date, part_offset: int,
                   out_dir: str, io: FsIO) -> DataFrame:
    """Assign fresh part ids + partition dates to merge-insert rows: fresh
    key-hashed files, routed per (date, salt) when the table is
    date-partitioned (pruning stays correct after a merge)."""
    keys = spec.key_cols
    insert_salt = (F.pmod(F.xxhash64(*keys), F.lit(insert_parts))
                   + F.lit(part_offset)).cast("int")
    if spec.pds_col:
        raw = [r[0] for r in src_flat.select(spec.pds_col).distinct().collect()]
        if any(d is None for d in raw):
            raise ValueError(
                f"pds_col {spec.pds_col!r} contains nulls in the merge source")
        date_idx = spark.createDataFrame(
            [(d, i) for i, d in enumerate(sorted(raw))],
            f"{spec.pds_col} date, __didx int",
        )
        return (
            src_flat.join(F.broadcast(date_idx), spec.pds_col)
            .withColumn("part_id",
                        (insert_salt + F.col("__didx") * insert_parts).cast("int"))
            .withColumn("__pds", F.col(spec.pds_col))
            .drop("__didx")
        )
    return (src_flat.withColumn("part_id", insert_salt)
            .withColumn("__pds", F.lit(pds)))


def merge_table(spark: SparkSession, out_dir: str, source: DataFrame,
                io: FsIO | None = None,
                chunk_rows: int = DEFAULT_CHUNK_ROWS,
                pds: date | None = None,
                insert_parts: int = 8,
                when_matched_update: dict | None = None,
                when_matched_delete: bool = False,
                when_matched_condition=None,
                when_not_matched_condition=None) -> dict:
    """Delta ``MERGE`` keyed on the table's ``key_cols``, committed as ONE
    atomic log entry.

    Default (no clause arguments): upsert — whenMatchedUpdateAll +
    whenNotMatchedInsertAll. Every target row whose key tuple appears in
    ``source`` is replaced by the source rows carrying that key; source
    rows with unseen keys insert. ``source`` must carry exactly the encoded
    schema (same names + types).

    Clause mode (round 5 — the full MERGE surface):

    * ``when_matched_update`` — dict of column → Column expression applied
      to matched target rows IN PLACE (they stay in their files); exprs
      address the aliased join: ``F.col("t.x")`` is the pre-merge target
      value, ``F.col("s.y")`` the source value. Key columns cannot be
      assigned.
    * ``when_matched_delete=True`` — matched target rows are deleted
      (mutually exclusive with ``when_matched_update``).
    * ``when_matched_condition`` — Column over the t/s join gating the
      matched action; matched rows failing it pass through UNCHANGED.
    * ``when_not_matched_condition`` — Column over the source (alias
      ``s``) gating inserts; pass ``F.lit(False)`` for a matched-only
      merge. In clause mode the source may carry EXTRA columns for the
      conditions; inserts project the table's columns and require them all.

    Plan: key-only provenance decode finds the matched file set (the
    source's key side is the small one — AQE broadcasts it); matched files
    rewrite grouped per original file, inserts encode into
    ``insert_parts`` fresh key-hashed files, and adds + removes land in one
    ``append_log_entry`` so readers switch atomically. Untouched files are
    never rewritten.
    """
    from .encode import append_log_entry, committed_files

    io = _io(out_dir, io)
    if committed_files(out_dir, io) is None:
        raise ValueError("merge_table requires a committed table (no _log found)")
    spec = read_table_spec(out_dir, io)
    keys = spec.key_cols
    clause_mode = (when_matched_update is not None or when_matched_delete
                   or when_matched_condition is not None
                   or when_not_matched_condition is not None)
    if clause_mode:
        return _merge_with_clauses(
            spark, out_dir, source, io, spec, chunk_rows,
            pds or date(2026, 1, 1), insert_parts,
            when_matched_update, when_matched_delete,
            when_matched_condition, when_not_matched_condition,
        )
    # the source arrives in the table's ORIGINAL shape; struct columns
    # split into their physical lanes before the schema check, so shape
    # mismatches surface as flat-lane name/type diffs
    source_flat = _flat_for_rewrite(source, spec)
    want = {f.name: f.dataType for f in spec.schema.fields}
    got = {f.name: f.dataType for f in source_flat.schema.fields}
    if got != want:
        raise ValueError(
            f"merge source schema must match the encoded table: want {want}, got {got}"
        )
    pds = pds or date(2026, 1, 1)
    src = source_flat.select(*[f.name for f in spec.schema.fields])
    src_keys = src.select(*keys).distinct()

    probe = decode_table(spark, out_dir, columns=list(keys), io=io,
                         meta_cols=["__src_file"])
    matched, n_replaced = _dml_matched_files(
        probe.join(src_keys, list(keys), "left_semi")
    )

    run = f"mg{uuid.uuid4().hex[:8]}"
    # rewritten files each keep THEIR OWN partition date; inserts route by
    # the table's persisted partition column when it has one (fresh files
    # per (date, salt)), else they stamp the call's pds — date-partitioned
    # tables keep pruning correctly after a merge either way
    inserts = _route_inserts(spark, src, spec, insert_parts, pds,
                             len(matched), out_dir, io)
    if matched:
        fp = _file_pds_map(out_dir, io)
        part_map = spark.createDataFrame(
            [(f, i, fp.get(f, pds)) for i, f in enumerate(matched)],
            "__src_file string, part_id int, __pds date",
        )
        # decode the FLAT physical lanes directly (keys are always scalar
        # lanes), matching the flattened source side of the union
        dec = decode_table(spark, out_dir, io=io,
                           columns=[f.name for f in spec.schema.fields],
                           meta_cols=["__src_file"],
                           chunk_filter=F.col("__src_file").isin(matched))
        survivors = (
            dec.join(F.broadcast(part_map), "__src_file")
            .join(src_keys, list(keys), "left_anti")
            .drop("__src_file")
        )
        new_rows = survivors.unionByName(inserts)
    else:
        new_rows = inserts
    adds = _rewrite_job(new_rows, io, spec, chunk_rows, pds, run,
                        pds_from_col=True)
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec)] + adds
        + [{"remove": {"path": f, "dataChange": True}} for f in matched],
        io,
    )
    return {"rows_replaced": n_replaced, "files_rewritten": len(adds),
            "files_removed": len(matched), "log": log}


def _merge_with_clauses(spark: SparkSession, out_dir: str, source: DataFrame,
                        io: FsIO, spec: TableSpec, chunk_rows: int,
                        pds: date, insert_parts: int,
                        upd: dict | None, delete: bool,
                        m_cond, i_cond) -> dict:
    """Clause-mode MERGE body (see :func:`merge_table`): matched rows are
    transformed IN PLACE inside their files (update) or dropped (delete),
    unmatched-by-target source rows insert under ``i_cond``; one atomic
    add+remove log entry either way."""
    from .encode import append_log_entry

    if upd is not None and delete:
        raise ValueError(
            "choose ONE matched action: when_matched_update or when_matched_delete")
    if m_cond is not None and upd is None and not delete:
        raise ValueError("when_matched_condition requires a matched action")
    keys = spec.key_cols
    orig_cols = _orig_columns(spec)
    if upd is not None:
        bad = [c for c in upd if c in keys]
        if bad:
            raise ValueError(f"key columns cannot be assigned: {bad}")
        if spec.pds_col and spec.pds_col in upd:
            # same in-place hazard as update_where: the matched row stays in
            # its file, whose partitionValues date would go stale
            raise ValueError(
                f"partition column {spec.pds_col!r} cannot be assigned by "
                "when_matched_update (rows keep their file's partition "
                "date); delete + re-insert, or dv_update_where"
            )
        unknown = [c for c in upd if c not in orig_cols]
        if unknown:
            raise ValueError(f"assignments target unknown columns: {unknown}")
    missing_keys = [k for k in keys if k not in source.columns]
    if missing_keys:
        raise ValueError(f"merge source lacks key columns {missing_keys}")

    s = source.alias("s")
    src_keys = source.select(*keys).distinct()
    probe = decode_table(spark, out_dir, columns=list(keys), io=io,
                         meta_cols=["__src_file"])
    have_matched_action = upd is not None or delete
    if have_matched_action:
        # Delta MERGE semantics: a target row matching multiple source rows
        # is an error (the action would be ambiguous/nondeterministic)
        dup = (source.groupBy(*keys).count()
               .filter(F.col("count") > 1).limit(1).count())
        if dup:
            raise ValueError(
                "merge source has duplicate key tuples; a matched action "
                "must see at most ONE source row per target row")
        matched, n_matched = _dml_matched_files(
            probe.join(src_keys, list(keys), "left_semi"))
    else:
        matched, n_matched = [], 0

    inserts_src = s.join(probe.select(*keys).distinct(), list(keys),
                         "left_anti")
    if i_cond is not None:
        inserts_src = inserts_src.filter(i_cond)
    missing = [c for c in orig_cols if c not in source.columns]
    inserts = None
    if missing:
        if inserts_src.limit(1).count() > 0:
            raise ValueError(
                f"merge source lacks table columns {missing} needed for "
                "inserts; pass when_not_matched_condition=F.lit(False) for "
                "a matched-only merge")
    else:
        ins_flat = _flat_for_rewrite(inserts_src.select(*orig_cols), spec)
        want = {f.name: f.dataType for f in spec.schema.fields}
        got = {f.name: f.dataType for f in ins_flat.schema.fields}
        if got != want:
            raise ValueError(
                f"merge insert schema must match the encoded table: "
                f"want {want}, got {got}")
        inserts = _route_inserts(spark, ins_flat, spec, insert_parts, pds,
                                 len(matched), out_dir, io)

    run = f"mg{uuid.uuid4().hex[:8]}"
    n_action = 0
    new_rows = inserts
    if matched:
        dec = decode_table(spark, out_dir, io=io, meta_cols=["__src_file"],
                           chunk_filter=F.col("__src_file").isin(matched))
        t = dec.alias("t")
        join_cond = F.col(f"t.{keys[0]}").eqNullSafe(F.col(f"s.{keys[0]}"))
        for k in keys[1:]:
            join_cond = join_cond & F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        joined = t.join(s, join_cond, "left")
        matched_flag = F.col(f"s.{keys[0]}").isNotNull()
        cond = F.lit(True) if m_cond is None else m_cond
        hit = matched_flag & F.coalesce(cond.cast("boolean"), F.lit(False))
        n_action = joined.filter(hit).count()
        if delete:
            result = joined.filter(~hit).select(
                *[F.col(f"t.{c}").alias(c) for c in orig_cols],
                F.col("t.__src_file").alias("__src_file"),
            )
        else:
            exprs = []
            for c in orig_cols:
                tgt_dt = dec.schema[c].dataType
                if c in upd:
                    exprs.append(
                        F.when(hit, upd[c].cast(tgt_dt))
                        .otherwise(F.col(f"t.{c}")).alias(c))
                else:
                    exprs.append(F.col(f"t.{c}").alias(c))
            result = joined.select(
                *exprs, F.col("t.__src_file").alias("__src_file"))
        fp = _file_pds_map(out_dir, io)
        part_map = spark.createDataFrame(
            [(f, i, fp.get(f, pds)) for i, f in enumerate(matched)],
            "__src_file string, part_id int, __pds date",
        )
        survivors = (_flat_for_rewrite(result, spec)
                     .join(F.broadcast(part_map), "__src_file")
                     .drop("__src_file"))
        new_rows = (survivors if inserts is None
                    else survivors.unionByName(inserts))
    if new_rows is None:
        return {"rows_matched": 0, "rows_deleted": 0, "rows_updated": 0,
                "files_rewritten": 0, "files_removed": 0, "log": None}
    adds = _rewrite_job(new_rows, io, spec, chunk_rows, pds, run,
                        pds_from_col=True)
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec)] + adds
        + [{"remove": {"path": f, "dataChange": True}} for f in matched],
        io,
    )
    return {"rows_matched": n_matched,
            "rows_deleted": n_action if delete else 0,
            "rows_updated": 0 if delete else n_action,
            "files_rewritten": len(adds), "files_removed": len(matched),
            "log": log}


def update_where(spark: SparkSession, out_dir: str, condition,
                 assignments: dict, io: FsIO | None = None,
                 chunk_rows: int = DEFAULT_CHUNK_ROWS,
                 pds: date | None = None,
                 condition_cols: list[str] | None = None,
                 chunk_filter=None) -> dict:
    """Row-level UPDATE (Delta ``UPDATE ... SET ... WHERE ...``) — the third
    leg of the DML triple, same copy-on-write + single-atomic-entry protocol
    as :func:`delete_where`.

    ``assignments`` maps column name → Column expression over the source
    columns (evaluated against the PRE-update row, SQL UPDATE semantics, so
    ``{"a": col("b"), "b": col("a")}`` swaps). Rows where ``condition`` is
    TRUE get the assignments applied; FALSE/NULL rows pass through verbatim.
    Key columns cannot be assigned (they define chunk placement + zone
    order; re-keying is a DELETE + MERGE). Only files holding matches are
    rewritten; every surviving byte of untouched files is untouched.
    """
    from .encode import append_log_entry, committed_files

    io = _io(out_dir, io)
    if committed_files(out_dir, io) is None:
        raise ValueError("update_where requires a committed table (no _log found)")
    spec = read_table_spec(out_dir, io)
    # assignments address the table's ORIGINAL shape: a struct column is
    # assigned as a whole (produce the full struct value); leaf-level
    # assignment composes naturally via F.struct over the PRE-update row.
    # Cast targets relax to fully-nullable (the physical lanes are nullable
    # anyway — decode reassembles through the presence lane)
    scols = {n: relax_nullable(_struct_col_type(tj))
             for n, tj in (spec.structs or {}).get("cols", {}).items()}
    orig_fields = [
        (n, scols.get(n) or spec.schema[n].dataType)
        for n in _orig_columns(spec)
    ]
    names = {n for n, _ in orig_fields}
    bad = sorted(set(assignments) - names)
    if bad:
        raise ValueError(f"assigned columns not in table: {bad}")
    keyed = sorted(set(assignments) & set(spec.key_cols))
    if keyed:
        raise ValueError(
            f"key columns cannot be assigned (delete+merge to re-key): {keyed}"
        )
    if spec.pds_col and spec.pds_col in assignments:
        # the CoW rewrite keeps each file's partitionValues date — assigning
        # the partition column in place would desync it from the rows and
        # silently break pds chunk_filter pruning. The merge-on-read
        # dv_update_where relocates rows, so it CAN re-partition them.
        raise ValueError(
            f"partition column {spec.pds_col!r} cannot be assigned in place "
            "(rows keep their file's partition date); use dv_update_where, "
            "which re-routes updated rows to their new date's files"
        )
    pds = pds or date(2026, 1, 1)

    probe = decode_table(spark, out_dir, columns=condition_cols, io=io,
                         chunk_filter=chunk_filter, meta_cols=["__src_file"])
    matched, n_updated = _dml_matched_files(probe.filter(condition))
    if not matched:
        return {"rows_updated": 0, "files_rewritten": 0,
                "files_removed": 0, "log": None}

    run = f"up{uuid.uuid4().hex[:8]}"
    fp = _file_pds_map(out_dir, io)
    part_map = spark.createDataFrame(
        [(f, i, fp.get(f, pds)) for i, f in enumerate(matched)],
        "__src_file string, part_id int, __pds date",
    )
    dec = decode_table(spark, out_dir, io=io, meta_cols=["__src_file"],
                       chunk_filter=F.col("__src_file").isin(matched))
    hit = F.coalesce(condition, F.lit(False))
    updated = dec.join(F.broadcast(part_map), "__src_file").select(
        *[
            F.when(hit, assignments[name]).otherwise(F.col(name))
            .cast(dtype).alias(name)
            if name in assignments else F.col(name)
            for name, dtype in orig_fields
        ],
        "part_id",
        "__pds",
    )
    adds = _rewrite_job(_flat_for_rewrite(updated, spec), io, spec,
                        chunk_rows, pds, run, pds_from_col=True)
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec)] + adds
        + [{"remove": {"path": f, "dataChange": True}} for f in matched],
        io,
    )
    return {"rows_updated": n_updated, "files_rewritten": len(adds),
            "files_removed": len(matched), "log": log}


def recluster_table(spark: SparkSession, out_dir: str, by: list[str],
                    io: FsIO | None = None, n_parts: int = 8,
                    chunk_rows: int = DEFAULT_CHUNK_ROWS,
                    pds: date | None = None,
                    rel_err: float = 0.01) -> dict:
    """Physically re-layout the live table clustered by ``by`` (Delta
    ``OPTIMIZE ... ZORDER BY`` / ``CLUSTER BY`` analog): files are
    range-bucketed on ``by[0]`` (sampled quantile boundaries — the same idea
    as ``repartitionByRange``) and every chunk is sorted by ``by``, so the
    per-column zone maps on the ``by`` columns become tight and
    :func:`column_range_filter` pruning on them does real work. To z-order
    recluster on two dimensions, materialize ``clustering.zorder_key`` as a
    column at encode time and recluster ``by=["zkey"]``.

    METADATA SEMANTICS ARE UNTOUCHED: the table's key columns, schema, and
    sidecar stay exactly as encoded — this is a pure physical rewrite.
    ``key_min``/``key_max`` remain the true per-chunk min/max of the first
    key column (the encode kernel switches from positional endpoints to a
    real min/max scan when the sort order differs), so key-range pruning
    stays CORRECT, merely looser than on a key-sorted layout. Rows move as a
    whole-table rewrite committed as ONE atomic add+remove log entry;
    ``as_of`` versions before it still read the old layout, and a crash
    before the entry leaves only orphan files for :func:`..operators.encode.vacuum`.

    ``by[0]`` must be a non-null numeric/date column (quantile bucketing);
    remaining ``by`` columns refine the within-chunk sort only.
    """
    from .encode import append_log_entry, committed_files

    io = _io(out_dir, io)
    live = committed_files(out_dir, io)
    if live is None:
        raise ValueError("recluster_table requires a committed table (no _log found)")
    spec = read_table_spec(out_dir, io)
    names = {f.name for f in spec.schema.fields}
    missing = sorted(set(by) - names)
    if not by or missing:
        raise ValueError(f"cluster columns not in table: {missing or by}")
    live_pds = sorted({d for f, d in _file_pds_map(out_dir, io).items()
                       if f in set(live)})
    if len(live_pds) > 1:
        raise ValueError(
            "recluster_table does not support date-partitioned tables "
            f"(live files span {len(live_pds)} pds partitions — quantile "
            "buckets would merge dates and break partition pruning)"
        )
    # a single-date table keeps ITS date through the rewrite
    pds = pds or (live_pds[0] if live_pds else date(2026, 1, 1))

    dec = decode_table(spark, out_dir, io=io)
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = sorted(set(
        dec.select(F.col(by[0]).cast("double").alias("__c"))
        .approxQuantile("__c", probs, rel_err)
    )) if n_parts > 1 else []
    part_expr = F.lit(0)
    for b in bounds:
        part_expr = part_expr + F.when(F.col(by[0]) > F.lit(b), 1).otherwise(0)
    run = f"rc{uuid.uuid4().hex[:8]}"
    clustered = dec.withColumn("part_id", part_expr.cast("int"))
    adds = _rewrite_job(clustered, io, spec, chunk_rows, pds, run,
                        sort_cols=list(by))
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec)] + adds
        + [{"remove": {"path": f, "dataChange": True}} for f in live],
        io,
    )
    return {"files_before": len(live), "files_after": len(adds),
            "buckets": len(bounds) + 1, "log": log}


def table_diff(spark: SparkSession, out_dir: str,
               from_version: int, to_version: int | None = None,
               io: FsIO | None = None) -> DataFrame:
    """Change data feed between two commit-log versions: the decoded rows
    with a ``_change_type`` column (``insert`` / ``delete``; an updated row
    appears as its old image deleted + new image inserted — the Delta CDF
    convention without per-row tracking columns).

    Fast path (the common append-only case): when no file was REMOVED in
    ``(from_version, to_version]``, the diff is exactly the rows of the
    files ADDED in that range — a pruned decode of just those files, no
    comparison pass at all. General path (deletes / updates / merges in
    range): multiset difference of the two version reads
    (``exceptAll`` both ways — exact, order-independent); compaction
    rewrites (``dataChange: false``) are content-neutral and correctly
    produce an empty diff.
    """
    from .encode import log_versions

    io = _io(out_dir, io)
    versions = log_versions(out_dir, io)
    if to_version is None:
        to_version = max(versions)
    if from_version not in versions or to_version not in versions:
        raise ValueError(f"versions must be committed indices {versions}")
    if from_version > to_version:
        raise ValueError("from_version must be <= to_version")

    # replay only the in-range entries to classify the change shape
    log_dir = io.join("_log")
    added: list[str] = []
    removed = False
    data_change_adds: list[str] = []
    for f in sorted(io.listdir(log_dir)):
        if not f.endswith(".json"):
            continue
        idx = int(f[:-5])
        if idx <= from_version or idx > to_version:
            continue
        for line in io.read_text(posixpath.join(log_dir, f)).splitlines():
            entry = json.loads(line)
            if "add" in entry:
                added.append(entry["add"]["path"])
                if entry["add"].get("dataChange", True):
                    data_change_adds.append(entry["add"]["path"])
            if "remove" in entry and entry["remove"].get("dataChange", True):
                removed = True
            if "dv" in entry or "dvRestore" in entry:
                # a deletion vector (or its restore) changed existing files'
                # visible rows: the range is not append-only
                removed = True

    from .encode import committed_files

    live_now = set(committed_files(out_dir, io, as_of=to_version))
    if not removed and all(f in live_now for f in data_change_adds):
        # append-only range with every added file still live: the diff IS
        # those files (log-tail contract, same axis the streaming source
        # reads) — a pruned decode, no comparison pass. dataChange:false
        # adds are compaction rewrites of pre-range rows and excluded; an
        # in-range add later compacted away falls through to the exact path.
        if not data_change_adds:
            return decode_table(spark, out_dir, io=io,
                                as_of=to_version).limit(0).withColumn(
                "_change_type", F.lit("insert"))
        dec = decode_table(spark, out_dir, io=io, as_of=to_version,
                           meta_cols=["__src_file"],
                           chunk_filter=F.col("__src_file").isin(data_change_adds))
        return dec.drop("__src_file").withColumn("_change_type", F.lit("insert"))

    old = decode_table(spark, out_dir, io=io, as_of=from_version)
    new = decode_table(spark, out_dir, io=io, as_of=to_version)
    return (
        new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        .unionByName(old.exceptAll(new).withColumn("_change_type", F.lit("delete")))
    )


def check_table_integrity(spark: SparkSession, out_dir: str,
                          io: FsIO | None = None,
                          as_of: int | None = None) -> DataFrame:
    """fsck for the encoded store: recompute each chunk's content hash over
    its payload+validity bytes and compare to the ``sha`` written at encode
    time (A23's SHA-256 contract, Hash.fs:9-37 — the same bytes the commit
    log's per-file sha256 covers at file granularity). Returns ONE ROW PER
    BAD CHUNK (``run, part_id, chunk_seq, chunk_id, reason``); a healthy
    table returns 0 rows.

    Shape: a map-only scan of the chunk files — payload bytes stream through
    Arrow batches, nothing decodes and nothing shuffles. The per-row Python
    loop is manifest-scale (one row per ≤ chunk_rows data rows), not
    data-scale. Columns appended by schema evolution after a chunk was
    written surface as NULL payloads and are skipped — exactly the byte set
    the original hash covered.
    """
    import hashlib as _hashlib

    spec = read_table_spec(out_dir, io)
    payload_cols = [f.name for f in spec.schema.fields]
    sel = ["run", "part_id", "chunk_seq", "chunk_id", "sha"]
    sel += [f"{c}__payload" for c in payload_cols]
    sel += [f"{c}__valid" for c in payload_cols]
    chunks = read_table_chunks(spark, out_dir, io, as_of=as_of).select(*sel)
    out_schema = T.StructType(
        [
            T.StructField("run", T.StringType(), False),
            T.StructField("part_id", T.IntegerType(), False),
            T.StructField("chunk_seq", T.IntegerType(), False),
            T.StructField("chunk_id", T.StringType(), False),
            T.StructField("reason", T.StringType(), False),
        ]
    )

    def audit(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            bad = {k: [] for k in
                   ("run", "part_id", "chunk_seq", "chunk_id", "reason")}
            for i in range(t.num_rows):
                parts = []
                for c in payload_cols:
                    p = t.column(f"{c}__payload")[i].as_py()
                    if p is None:
                        continue  # column appended after this chunk's encode
                    parts.append(p)
                    v = t.column(f"{c}__valid")[i].as_py()
                    if v is not None:
                        parts.append(v)
                calc = _hashlib.sha256(b"".join(parts)).digest()
                stored = t.column("sha")[i].as_py()
                if calc != stored:
                    bad["run"].append(t.column("run")[i].as_py())
                    bad["part_id"].append(t.column("part_id")[i].as_py())
                    bad["chunk_seq"].append(t.column("chunk_seq")[i].as_py())
                    bad["chunk_id"].append(t.column("chunk_id")[i].as_py())
                    bad["reason"].append("sha mismatch: payload bytes differ "
                                         "from encode-time content hash")
            yield pa.RecordBatch.from_pydict(
                bad,
                schema=pa.schema(
                    [
                        pa.field("run", pa.string()),
                        pa.field("part_id", pa.int32()),
                        pa.field("chunk_seq", pa.int32()),
                        pa.field("chunk_id", pa.string()),
                        pa.field("reason", pa.string()),
                    ]
                ),
            )

    return chunks.mapInArrow(audit, schema=out_schema)


def validate_table(spark: SparkSession, out_dir: str,
                   unique: list[str] | None = None,
                   not_null: list[str] | None = None,
                   checks: dict[str, "F.Column"] | None = None,
                   check_cols: list[str] | None = None,
                   io: FsIO | None = None) -> DataFrame:
    """Constraint audit over the encoded store: one row per constraint with
    its violation count (``constraint, n_bad``) — the data-quality gate a
    warehouse runs after loads.

    * ``not_null`` columns are answered from the chunk zone maps ALONE
      (:func:`table_stats` null counts — zero payload read);
    * ``unique`` (a composite key) decodes only the key columns and counts
      surplus rows per duplicated key (``Σ (cnt − 1)``);
    * ``checks`` maps constraint name → boolean Column over the source
      columns; rows where the predicate is FALSE or NULL count as
      violations (SQL CHECK semantics). ``check_cols`` limits the decode to
      the referenced columns.
    All pieces are lazy DataFrames unioned by name — the audit is one job.
    """
    frames: list[DataFrame] = []
    if not_null:
        frames.append(
            table_stats(spark, out_dir, columns=list(not_null), io=io)
            .select(
                F.concat(F.lit("not_null("), F.col("column"), F.lit(")"))
                .alias("constraint"),
                F.col("n_nulls").alias("n_bad"),
            )
        )
    if unique:
        dup = (
            decode_table(spark, out_dir, columns=list(unique), io=io)
            .groupBy(*unique)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
        )
        frames.append(
            dup.agg(
                F.lit(f"unique({', '.join(unique)})").alias("constraint"),
                F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_bad"),
            )
        )
    for name, cond in (checks or {}).items():
        dec = decode_table(spark, out_dir, columns=check_cols, io=io)
        frames.append(
            dec.agg(
                F.lit(f"check({name})").alias("constraint"),
                F.sum(
                    F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
                ).alias("n_bad"),
            )
        )
    if not frames:
        raise ValueError("validate_table: no constraints given")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def restore_table(out_dir: str, version: int, io: FsIO | None = None) -> dict:
    """Delta ``RESTORE TABLE ... TO VERSION`` analog: ONE metadata-only log
    entry returns the live file set to exactly what commit ``version`` left
    — files live then but removed since are RE-ADDED (their original add
    records, still on disk because :func:`..operators.encode.vacuum` hasn't
    reclaimed them), files added since are REMOVED. Deletion-vector state
    rolls back too: a ``dvRestore`` action carrying the target version's
    exact live DV set replaces the current one — rows soft-deleted since
    resurrect, and a later forward-restore re-applies them (embedded state
    makes restore self-inverse). No data byte moves;
    history is preserved (``as_of`` reads of intermediate versions still
    work, and the restore itself is a new version that can be restored
    away). Raises if any needed file has already been vacuumed."""
    from .encode import (append_log_entry, committed_dv_actions,
                         committed_files, read_commit_log)

    io = _io(out_dir, io)
    cur = committed_files(out_dir, io)
    old = committed_files(out_dir, io, as_of=version)
    dv_target = committed_dv_actions(out_dir, io, as_of=version)
    dv_changed = committed_dv_actions(out_dir, io) != dv_target
    if cur is None or old is None:
        raise ValueError("restore_table requires a committed table (no _log found)")
    add_records = {
        e["add"]["path"]: e["add"] for e in read_commit_log(out_dir, io)
        if "add" in e
    }
    re_add = sorted(set(old) - set(cur))
    remove = sorted(set(cur) - set(old))
    data_dir = io.join("data")
    gone = [f for f in re_add
            if not io.exists(posixpath.join(data_dir, f))]
    if gone:
        raise ValueError(
            f"cannot restore to version {version}: {len(gone)} file(s) already "
            f"vacuumed (e.g. {gone[0]!r})"
        )
    dv_gone = [a["dvFile"] for a in dv_target
               if not io.exists(io.join("_dv/" + a["dvFile"]))]
    if dv_gone:
        raise ValueError(
            f"cannot restore to version {version}: deletion-vector file(s) "
            f"already vacuumed (e.g. {dv_gone[0]!r})"
        )
    if not re_add and not remove and not dv_changed:
        return {"restored_to": version, "files_readded": 0,
                "files_removed": 0, "log": None}
    spec = read_table_spec(out_dir, io)
    log = append_log_entry(
        out_dir,
        [_meta_entry(spec)]
        + [{"add": dict(add_records[f], dataChange=True)} for f in re_add]
        + [{"remove": {"path": f, "dataChange": True}} for f in remove]
        + ([{"dvRestore": {"asOf": version, "keep": dv_target}}]
           if dv_changed else []),
        io,
    )
    return {"restored_to": version, "files_readded": len(re_add),
            "files_removed": len(remove), "log": log}


def clone_table(src_dir: str, dst_dir: str, as_of: int | None = None,
                src_io: FsIO | None = None,
                dst_io: FsIO | None = None) -> dict:
    """DEEP CLONE: physically copy the live data files of ``src_dir`` (at
    ``as_of``, default latest) plus the schema sidecar into a fresh table
    dir and commit them as the clone's version 0 — the snapshot/export/
    backup primitive (Delta ``CREATE TABLE ... DEEP CLONE``). The clone's
    history is independent: mutations, compaction and vacuum on either side
    never touch the other. File bytes stream through FsIO (works across
    filesystems); sizes/hashes are carried from the source's add records —
    commit never re-reads what it just wrote."""
    from .encode import append_log_entry, committed_files, read_commit_log

    src_io = _io(src_dir, src_io)
    dst_io = _io(dst_dir, dst_io)
    live = committed_files(src_dir, src_io, as_of=as_of)
    if live is None:
        raise ValueError("clone_table requires a committed source (no _log found)")
    if dst_io.isdir(dst_io.join("_log")):
        raise ValueError(f"clone destination {dst_dir!r} already has a table")
    add_records = {
        e["add"]["path"]: e["add"] for e in read_commit_log(src_dir, src_io)
        if "add" in e
    }
    spec = read_table_spec(src_dir, src_io)
    dst_io.makedirs(dst_io.join("data"))
    tag = uuid.uuid4().hex[:8]
    dst_io.publish_bytes(dst_io.join("_schema.json"),
                         spec.to_json().encode(), attempt_tag=tag)
    src_data, dst_data = src_io.join("data"), dst_io.join("data")
    for f in live:
        data = src_io.open_input_file(posixpath.join(src_data, f)).read()
        dst_io.publish_bytes(posixpath.join(dst_data, f), data, attempt_tag=tag)
    # deletion-vector state travels with the clone: copy the live dv files
    # and re-commit their actions in the clone's version 0
    from .encode import committed_dv_actions

    dv_actions = committed_dv_actions(src_dir, src_io, as_of=as_of)
    if dv_actions:
        dst_io.makedirs(dst_io.join("_dv"))
        for a in dv_actions:
            dst_io.publish_bytes(
                posixpath.join(dst_io.join("_dv"), a["dvFile"]),
                src_io.read_text(
                    posixpath.join(src_io.join("_dv"), a["dvFile"])).encode(),
                attempt_tag=tag,
            )
    log = append_log_entry(
        dst_dir,
        [_meta_entry(spec)]
        + [{"add": dict(add_records[f], dataChange=True)} for f in live]
        + [{"dv": {"dvFile": a["dvFile"], "cardinality": a["cardinality"]}}
           for a in dv_actions],
        dst_io,
    )
    return {"files_cloned": len(live), "log": log}
