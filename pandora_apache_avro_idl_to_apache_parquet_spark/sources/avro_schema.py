"""Avro ``.avsc`` JSON schema ingestion → Spark ``StructType``.

The reference's schema front door is a recursive Avro-JSON walk that fills a
named-type environment and rewrites nested shapes
(``/root/reference/.../Pandora/Apache/Avro.fs:27-145`` walk;
``Parquet.fs:128-380`` type inference incl. logical types; rewrites A5–A8).
This module re-expresses that walk against Spark's type system so any
``.avsc``-described dataset can feed :func:`..operators.nested.flatten_table`
— schema in, extension tables out, no hand-built ``StructType``.

Type mapping (reference physical mapping ``Parquet.fs:534-621`` and Delta
SQL-type mapping ``DeltaLake.fs:32-72``):

| Avro | Spark |
|---|---|
| boolean / int / long | Boolean / Integer / Long |
| float / double / bytes / string | Float / Double / Binary / String |
| null | String (nullable) — NULL cannot be a column type, ``DeltaLake.fs:65-66`` |
| int + logicalType=date | Date |
| int + time-millis | Integer (millis-of-day; reference stores TimeSpan→long) |
| long + timestamp-millis | TimestampNTZ |
| bytes/fixed + decimal(p,s) | Decimal(p,s) |
| enum | String (symbols kept in field metadata) — ``Parquet.fs:610-613`` |
| fixed(n) | Binary (size kept in metadata) |
| array<t> / map<t> | Array / Map(String, t) |
| union[null, X] | nullable X — the A8 nullable collapse (``Avro.fs:542-626``) |
| union[A, B, …] | Struct{type0: A?, type1: B?, …} — the A8 general-union |
|  | record synthesis (``Avro.fs:627-788``; golden ``test/tab/Interop.md`` |
|  | shows exactly these ``typeN`` branch columns) |

Named types (record/error/enum/fixed) register in a case-preserving
environment keyed by full name (Avro namespace inheritance applied), so
string references resolve — the reference's env
(``Parquet.fs:112-117, 357-380``). **Recursive references** (Node→Node,
SelfRef, mutually recursive SampleNode/SamplePair) cannot exist in a Spark
``StructType`` (schemas are trees): the recursive field is dropped and
recorded in :attr:`AvroSchemaInfo.truncated` — the honest A4 disposition
documented in SURVEY.md §1.5 (the reference instead re-links such rows into
the *same* child table via ``pj_pid``, which a fixed-schema column store
cannot express).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "null": T.StringType(),  # nullable-string stand-in (DeltaLake.fs:65-66)
}


@dataclass
class AvroSchemaInfo:
    """Parse result: the root struct plus the provenance the reference keeps
    in its env/AST (named types, union/nullable tags, truncated cycles)."""

    struct: T.StructType
    name: str
    namespace: str | None
    named: dict[str, dict] = field(default_factory=dict)
    truncated: list[str] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)
    # fq record name → resolved StructType, as first registered (the AST
    # side of the reference's env; recursion truncated at first occurrence)
    structs: dict[str, T.StructType] = field(default_factory=dict)


class _Parser:
    def __init__(self) -> None:
        self.named: dict[str, dict] = {}
        self.structs: dict[str, T.StructType] = {}
        self.in_progress: set[str] = set()
        self.truncated: list[str] = []
        self.errors: list[str] = []

    @staticmethod
    def _fullname(name: str, namespace: str | None) -> str:
        if "." in name or not namespace:
            return name
        return f"{namespace}.{name}"

    def _resolve_ref(self, name: str, namespace: str | None):
        for key in (self._fullname(name, namespace), name):
            if key in self.in_progress:
                return "RECURSIVE", key
            if key in self.structs:
                return self.structs[key], key
            if key in self.named:  # enum/fixed
                info = self.named[key]
                if info["kind"] == "enum":
                    return T.StringType(), key
                if info["kind"] == "fixed":
                    # a named reference to a decimal fixed keeps its logical
                    # type (the declaration owns it, Avro spec §Logical Types)
                    if info.get("logicalType") == "decimal":
                        return T.DecimalType(info.get("precision") or 38,
                                             info.get("scale") or 0), key
                    return T.BinaryType(), key
        return None, name

    def parse(self, schema, namespace: str | None, path: str):
        """Returns (sparkType | None, nullable). None type ⇒ drop field."""
        if isinstance(schema, str):
            if schema in _PRIMITIVES:
                return _PRIMITIVES[schema], schema == "null"
            ref, key = self._resolve_ref(schema, namespace)
            if ref == "RECURSIVE":
                self.truncated.append(f"{path}: recursive reference to {key}")
                return None, False
            if ref is None:
                self.errors.append(f"{path}: unresolved named type {schema!r}")
                return None, False
            return ref, False
        if isinstance(schema, list):
            return self._parse_union(schema, namespace, path)
        if isinstance(schema, dict):
            t = schema.get("type")
            logical = schema.get("logicalType")
            if t == "record" or t == "error":
                return self._parse_record(schema, namespace, path), False
            if t == "enum":
                fq = self._register(schema, namespace, "enum",
                                    symbols=schema.get("symbols", []))
                return T.StringType(), False
            if t == "fixed":
                self._register(schema, namespace, "fixed",
                               size=schema.get("size"),
                               logicalType=logical,
                               precision=schema.get("precision"),
                               scale=schema.get("scale"))
                if logical == "decimal":
                    return T.DecimalType(schema.get("precision", 38),
                                         schema.get("scale", 0)), False
                return T.BinaryType(), False
            if t == "array":
                elem, _ = self.parse(schema["items"], namespace, f"{path}[]")
                if elem is None:
                    self.truncated.append(f"{path}: array of unrepresentable items")
                    return None, False
                return T.ArrayType(elem), False
            if t == "map":
                val, _ = self.parse(schema["values"], namespace, f"{path}{{}}")
                if val is None:
                    self.truncated.append(f"{path}: map of unrepresentable values")
                    return None, False
                return T.MapType(T.StringType(), val), False
            if isinstance(t, (dict, list)):
                return self.parse(t, namespace, path)
            # annotated primitive, possibly logical (Parquet.fs:172-380)
            if t == "int" and logical == "date":
                return T.DateType(), False
            if t == "int" and logical == "time-millis":
                return T.IntegerType(), False
            if t == "long" and logical in ("timestamp-millis", "timestamp-micros"):
                return T.TimestampNTZType(), False
            if t == "bytes" and logical == "decimal":
                return T.DecimalType(schema.get("precision", 38),
                                     schema.get("scale", 0)), False
            if t in _PRIMITIVES or isinstance(t, str):
                return self.parse(t, namespace, path)
        self.errors.append(f"{path}: unsupported schema shape {schema!r}")
        return None, False

    def _parse_union(self, branches: list, namespace: str | None, path: str):
        non_null = [b for b in branches if b != "null"]
        nullable = len(non_null) < len(branches)
        if len(non_null) == 0:
            return T.StringType(), True
        if len(non_null) == 1:
            # A8 nullable collapse (Avro.fs:542-626)
            dt, _ = self.parse(non_null[0], namespace, path)
            if dt is None:
                return None, False
            return dt, True
        # general union → struct of nullable typeN branches (Avro.fs:627-788;
        # golden column names per test/tab/Interop.md)
        fields = []
        for i, b in enumerate(non_null):
            dt, _ = self.parse(b, namespace, f"{path}|type{i}")
            if dt is not None:
                fields.append(T.StructField(f"type{i}", dt, True))
        if not fields:
            return None, False
        return T.StructType(fields), nullable

    def _register(self, schema: dict, namespace: str | None, kind: str, **extra) -> str:
        ns = schema.get("namespace", namespace)
        fq = self._fullname(schema["name"], ns)
        self.named.setdefault(fq, {"kind": kind, **extra})
        return fq

    def _parse_record(self, schema: dict, namespace: str | None, path: str) -> T.StructType | None:
        ns = schema.get("namespace", namespace)
        fq = self._fullname(schema["name"], ns)
        kind = "error" if schema.get("type") == "error" else "record"
        self.named.setdefault(fq, {"kind": kind})
        self.in_progress.add(fq)
        fields = []
        for f in schema.get("fields", []):
            dt, nullable = self.parse(f["type"], ns, f"{path}.{f['name']}")
            if dt is None:
                continue
            fields.append(T.StructField(f["name"], dt, nullable))
        self.in_progress.discard(fq)
        struct = T.StructType(fields)
        self.structs[fq] = struct
        return struct


def avsc_to_struct(schema: str | dict) -> AvroSchemaInfo:
    """Parse an Avro ``.avsc`` record/error schema into a Spark StructType
    (+ provenance). Raises on a non-record root."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if not isinstance(schema, dict) or schema.get("type") not in ("record", "error"):
        raise ValueError("root schema must be an Avro record or error")
    p = _Parser()
    ns = schema.get("namespace")
    struct = p._parse_record(schema, ns, schema["name"])
    return AvroSchemaInfo(
        struct=struct,
        name=schema["name"],
        namespace=ns,
        named=p.named,
        truncated=p.truncated,
        errors=p.errors,
        structs=p.structs,
    )


def conform(df, struct: T.StructType):
    """Project/coerce a DataFrame onto an ``.avsc``-derived StructType: select
    exactly the schema's fields in schema order, cast to the schema's types —
    the reference's scalar-coercion step (``primitive2obj``,
    ``Parquet.fs:716-757``) as one Catalyst projection. Raises on missing
    columns."""
    from pyspark.sql import functions as F

    missing = [f.name for f in struct.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"input is missing schema fields {missing}")

    def relax(dt: T.DataType) -> T.DataType:
        # cast targets must be fully nullable (CAST cannot impose NOT NULL;
        # non-null enforcement is the writer's runtime concern, as in the
        # reference's primitive2obj rejection path)
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, relax(f.dataType), True) for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(relax(dt.elementType), True)
        if isinstance(dt, T.MapType):
            return T.MapType(relax(dt.keyType), relax(dt.valueType), True)
        return dt

    return df.select(
        *[F.col(f.name).cast(relax(f.dataType)).alias(f.name) for f in struct.fields]
    )


def as_union(df, col: str, union_type: T.StructType):
    """Place a statically-typed column into its matching branch of a general
    union struct (``type0…typeN``, as produced by :func:`avsc_to_struct` for
    multi-branch unions) — the Spark expression of the reference's runtime
    union dispatch (A17, ``popuUnion`` ``Parquet.fs:1041-1193``): the value's
    branch is set, every other branch is null. In Spark the "runtime type
    reflection" (A18) collapses to a schema lookup because column types are
    static; heterogeneous sources each call ``as_union`` with their own type
    and then ``unionByName`` into one union-typed table."""
    from pyspark.sql import functions as F

    dt = df.schema[col].dataType
    matches = [f.name for f in union_type.fields if f.dataType == dt]
    if not matches:
        raise ValueError(
            f"column {col!r} of type {dt.simpleString()} matches no union branch "
            f"in {union_type.simpleString()}"
        )
    branch = matches[0]
    return df.withColumn(
        col,
        F.struct(
            *[
                (F.col(col) if f.name == branch else F.lit(None).cast(f.dataType)).alias(
                    f.name
                )
                for f in union_type.fields
            ]
        ),
    )


def schema_markdown(info: AvroSchemaInfo) -> str:
    """Golden-testable view: the flattened extension-table schemas this
    struct produces, in the shape of the reference's ``test/tab/<Name>.md``
    goldens (table per section, ``column: type (nullable = b)`` lines,
    deterministically ordered)."""
    from ..operators.nested import SYSTEM_COLS, flatten_schema

    lines = ["# Tables"]
    tables = flatten_schema(info.struct, root_name=info.name)
    for tbl in sorted(tables):
        lines.append(f"## {tbl}")
        lines.append("### Fields")
        fields = tables[tbl]
        sys_part = [f for f in fields if f.name in SYSTEM_COLS]
        data_part = sorted(
            (f for f in fields if f.name not in SYSTEM_COLS), key=lambda f: f.name
        )
        for f in sys_part + data_part:
            lines.append(
                f"* {f.name}: {f.dataType.simpleString()} (nullable = {str(f.nullable).lower()})"
            )
    if info.truncated:
        lines.append("## (truncated recursive references)")
        for t in sorted(info.truncated):
            lines.append(f"* {t}")
    return "\n".join(lines) + "\n"


def _type_full(dt: T.DataType) -> str:
    """Render a Spark type WITH nullability at every nesting level (``?``
    marks nullable) — ``simpleString`` drops exactly the tags the AST golden
    must pin (union branch nullability, array/map element nullability)."""
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name}: {_type_full(f.dataType)}{'?' if f.nullable else ''}"
            for f in dt.fields
        )
        return f"struct<{inner}>"
    if isinstance(dt, T.ArrayType):
        return (f"array<{_type_full(dt.elementType)}"
                f"{'?' if dt.containsNull else ''}>")
    if isinstance(dt, T.MapType):
        return (f"map<{_type_full(dt.keyType)}, {_type_full(dt.valueType)}"
                f"{'?' if dt.valueContainsNull else ''}>")
    return dt.simpleString()


def ast_markdown(info: AvroSchemaInfo) -> str:
    """Golden-testable AST view — the repo analog of the reference's
    ``test/ast/<Name>.md`` (``Unit.Tests/Tests/Ast/EqualsMarkdownTests.fs``):
    one section per named record in the environment, fields sorted by name,
    each with its FULL resolved Spark type including nullability at every
    nesting level. Pins union ``typeN`` tagging, the nullable collapse, and
    recursion truncation independently of the physical tables view."""
    lines = ["# AST"]
    for fq in sorted(info.structs):
        lines.append(f"## {fq}")
        struct = info.structs[fq]
        for f in sorted(struct.fields, key=lambda f: f.name):
            lines.append(
                f"* {f.name}: {_type_full(f.dataType)}"
                f"{'?' if f.nullable else ''}"
            )
    if info.truncated:
        lines.append("## (truncated recursive references)")
        for t in sorted(info.truncated):
            lines.append(f"* {t}")
    return "\n".join(lines) + "\n"


def env_markdown(info: AvroSchemaInfo) -> str:
    """Golden-testable environment view — the repo analog of the reference's
    ``test/env/<Name>.md``: the named-type registry (records, errors, enums
    with symbols, fixeds with size and decimal logical types), sorted by
    fully-qualified name."""
    lines = ["# Environment"]
    for fq in sorted(info.named):
        meta = info.named[fq]
        kind = meta["kind"]
        if kind == "enum":
            detail = f"enum [{', '.join(meta.get('symbols', []))}]"
        elif kind == "fixed":
            detail = f"fixed({meta.get('size')})"
            if meta.get("logicalType") == "decimal":
                detail += (f" decimal({meta.get('precision')}, "
                           f"{meta.get('scale') or 0})")
        else:
            n = len(info.structs.get(fq, T.StructType()).fields)
            detail = f"{kind} ({n} fields)"
        lines.append(f"* {fq}: {detail}")
    return "\n".join(lines) + "\n"
