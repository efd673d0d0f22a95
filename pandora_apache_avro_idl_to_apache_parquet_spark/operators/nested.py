"""Generic schema-driven flatten-to-extension-tables — the reference's core.

The reference walks an Avro schema and rewrites nested shapes into child
tables linked by synthetic keys (``/root/reference/.../Pandora/Apache/
Avro.fs:203-847`` rewrites A5-A8; ``Parquet.fs:768-1039`` populate/popuArray/
popuMap A14-A16), every row carrying the six ``pj_*`` system columns
(``Parquet.fs:444-467``). This module re-expresses that contract over ANY
Spark DataFrame with nested ``StructType``/``ArrayType``/``MapType`` columns,
declaratively (select/explode — Catalyst prunes and pipelines; no RDDs):

* struct column      → child table, tag ``record``   (reference: plain RECORD,
  recursive ``populate`` with pid=uid, fid=field, ``Parquet.fs:834-847``)
* array<primitive>   → child ``{item}``, tag ``array``  (A6/A15)
* array<struct>      → child table per element, tag ``array``  (A5/A15)
* map<k,v>           → child ``{key, value}``, tag ``map``  (A7/A16)
* primitive columns  → stay in the parent table  (A11 projection)

Lineage columns (deterministic — the reference's random GUID ``pj_uid``,
``Parquet.fs:778``, is replaced by a content-addressed row id so the output
is reproducible and joins are still exact):

| column  | reference analog | meaning |
|---|---|---|
| ``pj_uid`` | ``pj_uid``  | row id: xxhash64 of (table, parent uid, position) |
| ``pj_pid`` | ``pj_pid``  | parent row's ``pj_uid`` (null at root) |
| ``pj_fid`` | ``pj_fid``  | field name in the parent that spawned this row |
| ``pj_pos`` | —           | element index (arrays) / null (maps, structs) |

Join contract: ``child.pj_pid = parent.pj_uid`` filtered by ``pj_fid``
(``/root/reference/README.md:95-102``). Table naming mirrors the reference's
PascalCase synthesis (``Avro.fs:21-25, 291-404``): ``Parent.field``.

Like the reference (which only materializes primitive fields per table and
sorts them by FQDN, ``Parquet.fs:639-660``), output tables contain the
system columns first, then the primitive columns sorted by name — golden-test
stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

SYSTEM_COLS = ["pj_uid", "pj_pid", "pj_fid", "pj_pos", "pj_pds", "pj_sha", "pj_dts"]


class FlattenResult(dict):
    """``{table_name: DataFrame}`` plus per-child provenance ``tags``
    (``record`` / ``record?`` / ``array`` / ``map``) — the reference's
    ``Transformation`` marks (``Parquet.fs:43-50``) that drive ER cardinality
    glyphs (A31)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tags: dict[str, str] = {}


def _is_primitive(dt: T.DataType) -> bool:
    return not isinstance(dt, (T.StructType, T.ArrayType, T.MapType))


def _uid(table: str, pid_col, pos_col) -> F.Column:
    """Deterministic row id: hash of (table, parent uid, position)."""
    return F.xxhash64(F.lit(table), F.coalesce(pid_col, F.lit(-1)), pos_col)


def flatten_table(df: DataFrame, root_name: str = "Root",
                  max_depth: int = 8,
                  uid_expr: str | F.Column | None = None,
                  pds_expr: str | F.Column | None = None,
                  sha_expr: str | F.Column | None = None,
                  dts_expr: str | F.Column | None = None) -> "FlattenResult":
    """Explode a nested DataFrame into ``{table_name: DataFrame}`` extension
    tables with lineage columns.

    ``uid_expr``: expression yielding a per-row long that seeds the root
    ``pj_uid`` — pass a natural key hash whenever one exists. The fallback is
    ``monotonically_increasing_id``, which is only stable within one
    materialization: parent and child tables are separate lazy plans, so with
    the fallback the caller must cache ``df`` (or persist the outputs) before
    joining them — the same caveat Spark documents for any nondeterministic
    expression reused across plans. A natural-key hash has no such footgun.

    ``pds_expr`` / ``sha_expr`` / ``dts_expr`` (optional): the reference's
    remaining system-column trio (``Parquet.fs:448-461``) — partition date
    stamp (cast to date; propagated to every child row, so *every* extension
    table partition-prunes on ``pj_pds``), payload SHA (binary; **root rows
    only**, null in children, exactly the reference's root-only ``pj_sha``)
    and event timestamp (propagated). When omitted, tables carry only the
    uid/pid/fid/pos quartet as before.

    Cycle safety: Spark schemas are trees (no self-references, unlike Avro's
    named-type cycles the reference guards with ``isReference``,
    ``Avro.fs:849-856``), so ``max_depth`` is a plain recursion bound.
    """
    out = FlattenResult()
    if uid_expr is None:
        uid = F.monotonically_increasing_id()
    elif isinstance(uid_expr, str):
        uid = F.expr(uid_expr)
    else:
        uid = uid_expr

    def as_col(e):
        return F.expr(e) if isinstance(e, str) else e

    trio = []
    if pds_expr is not None or sha_expr is not None or dts_expr is not None:
        trio = [
            (as_col(pds_expr).cast("date") if pds_expr is not None
             else F.lit(None).cast("date")).alias("pj_pds"),
            (as_col(sha_expr).cast("binary") if sha_expr is not None
             else F.lit(None).cast("binary")).alias("pj_sha"),
            (as_col(dts_expr).cast("timestamp_ntz") if dts_expr is not None
             else F.lit(None).cast("timestamp_ntz")).alias("pj_dts"),
        ]
    root = df.select(
        _uid(root_name, F.lit(None).cast("long"), uid).alias("pj_uid"),
        F.lit(None).cast("long").alias("pj_pid"),
        F.lit(None).cast("string").alias("pj_fid"),
        F.lit(None).cast("int").alias("pj_pos"),
        *trio,
        "*",
    )
    _flatten(root, root_name, out, max_depth, with_trio=bool(trio))
    return out


def _project(df: DataFrame, table: str, out: dict[str, DataFrame]) -> None:
    sys_present = [c for c in SYSTEM_COLS if c in df.columns]
    prims = sorted(
        f.name for f in df.schema.fields
        if f.name not in SYSTEM_COLS and _is_primitive(f.dataType)
    )
    out[table] = df.select(*sys_present, *prims)


def _flatten(df: DataFrame, table: str, out: "FlattenResult", depth: int,
             with_trio: bool = False) -> None:
    if depth <= 0:
        raise ValueError(f"nesting deeper than bound at table {table}")
    _project(df, table, out)
    for field in df.schema.fields:
        name, dt = field.name, field.dataType
        if name in SYSTEM_COLS or _is_primitive(dt):
            continue
        child_tbl = f"{table}.{name[:1].upper()}{name[1:]}"
        parent_keys = [F.col("pj_uid").alias("__parent_uid")]
        # pj_pds/pj_dts propagate to children; pj_sha is root-only (null in
        # children), mirroring the reference's demo sha handling
        # (avroidl2parquet.fsx:222-225)
        trio_carry = (
            [F.col("pj_pds").alias("__pds"), F.col("pj_dts").alias("__dts")]
            if with_trio else []
        )
        trio_emit = (
            [
                F.col("__pds").alias("pj_pds"),
                F.lit(None).cast("binary").alias("pj_sha"),
                F.col("__dts").alias("pj_dts"),
            ]
            if with_trio else []
        )
        if isinstance(dt, T.StructType):
            # plain nested record: one child row per non-null struct (A14
            # recursion with pid=uid, fid=key)
            tag = "record?" if field.nullable else "record"
            child = (
                df.filter(F.col(name).isNotNull())
                .select(*parent_keys, *trio_carry, F.col(name).alias("__v"))
                .select(
                    _uid(child_tbl, F.col("__parent_uid"), F.lit(0)).alias("pj_uid"),
                    F.col("__parent_uid").alias("pj_pid"),
                    F.lit(name).alias("pj_fid"),
                    F.lit(None).cast("int").alias("pj_pos"),
                    *trio_emit,
                    F.col("__v.*"),
                )
            )
        elif isinstance(dt, T.ArrayType):
            tag = "array"
            elem = dt.elementType
            exploded = df.select(
                *parent_keys, *trio_carry,
                F.posexplode(F.col(name)).alias("__pos", "__v"),
            )
            body = (
                [F.col("__v.*")]
                if isinstance(elem, T.StructType)
                else [F.col("__v").alias("item")]  # A6 synthesized {item} record
            )
            child = exploded.select(
                _uid(child_tbl, F.col("__parent_uid"), F.col("__pos")).alias("pj_uid"),
                F.col("__parent_uid").alias("pj_pid"),
                F.lit(name).alias("pj_fid"),
                F.col("__pos").alias("pj_pos"),
                *trio_emit,
                *body,
            )
        elif isinstance(dt, T.MapType):
            tag = "map"
            exploded = df.select(
                *parent_keys, *trio_carry,
                F.posexplode(F.map_entries(F.col(name))).alias("__pos", "__kv"),
            )
            val = dt.valueType
            body = [F.col("__kv.key").alias("key")] + (
                [F.col("__kv.value.*")]
                if isinstance(val, T.StructType)
                else [F.col("__kv.value").alias("value")]  # A7 {key, value} record
            )
            child = exploded.select(
                _uid(child_tbl, F.col("__parent_uid"), F.col("__pos")).alias("pj_uid"),
                F.col("__parent_uid").alias("pj_pid"),
                F.lit(name).alias("pj_fid"),
                F.col("__pos").alias("pj_pos"),
                *trio_emit,
                *body,
            )
        else:  # pragma: no cover
            continue
        if isinstance(out, FlattenResult):
            out.tags[child_tbl] = tag
        _flatten(child, child_tbl, out, depth - 1, with_trio=with_trio)


def flatten_schema(struct: T.StructType, root_name: str = "Root",
                   max_depth: int = 8) -> dict[str, list[T.StructField]]:
    """Schema-only view of :func:`flatten_table`: the extension-table DDL a
    nested struct produces, without any data — the reference's ``Tables.
    update`` table-synthesis step (``Parquet.fs:662-706``, one table per AST
    entry) separated from population. Used by Avro-schema golden tests."""
    out: dict[str, list[T.StructField]] = {}
    sys_fields = [
        T.StructField("pj_uid", T.LongType(), False),
        T.StructField("pj_pid", T.LongType(), True),
        T.StructField("pj_fid", T.StringType(), True),
        T.StructField("pj_pos", T.IntegerType(), True),
    ]

    def emit(table: str, fields: list[T.StructField], depth: int) -> None:
        if depth <= 0:
            raise ValueError(f"nesting deeper than bound at table {table}")
        prims = sorted(
            (f for f in fields if _is_primitive(f.dataType)), key=lambda f: f.name
        )
        out[table] = sys_fields + prims
        for f in fields:
            dt = f.dataType
            if _is_primitive(dt):
                continue
            child_tbl = f"{table}.{f.name[:1].upper()}{f.name[1:]}"
            if isinstance(dt, T.StructType):
                emit(child_tbl, list(dt.fields), depth - 1)
            elif isinstance(dt, T.ArrayType):
                elem = dt.elementType
                if isinstance(elem, T.StructType):
                    emit(child_tbl, list(elem.fields), depth - 1)
                else:
                    emit(child_tbl,
                         [T.StructField("item", elem, dt.containsNull)], depth - 1)
            elif isinstance(dt, T.MapType):
                val = dt.valueType
                key_f = T.StructField("key", dt.keyType, False)
                if isinstance(val, T.StructType):
                    emit(child_tbl, [key_f, *val.fields], depth - 1)
                else:
                    emit(child_tbl,
                         [key_f, T.StructField("value", val, dt.valueContainsNull)],
                         depth - 1)

    emit(root_name, list(struct.fields), max_depth)
    return out


def reassemble_array(parent: DataFrame, child: DataFrame, fid: str,
                     item_col: str = "item", out_col: str | None = None) -> DataFrame:
    """Inverse of the array explode: regroup child ``{item}`` rows back onto
    their parent as an array column, ordered by ``pj_pos`` — the reference's
    parent/child recombination contract (``child.pj_pid = parent.pj_uid`` +
    ``pj_fid`` filter) executed as a join + sorted collect."""
    out_col = out_col or fid
    items = (
        child.filter(F.col("pj_fid") == fid)
        .groupBy("pj_pid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pj_pos").alias("p"),
                                            F.col(item_col).alias("v")))
                ),
                lambda s: s["v"],
            ).alias(out_col)
        )
    )
    joined = parent.join(items, parent["pj_uid"] == items["pj_pid"], "left").drop(
        items["pj_pid"]
    )
    return joined.withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast(items.schema[out_col].dataType))
    )


_CARDINALITY = {
    # provenance tag -> ER glyph, mirroring the reference's Transformation-
    # driven arrowheads (demo/avroidl2dot.fsx: ARRAY/MAP -> invodot 1-n,
    # NULLABLE -> noneteeodot 0-1, plain record -> 1-1)
    "array": "1-n",
    "map": "1-n",
    "record?": "0-1",
    "record": "1-1",
}


def schema_dot(tables: dict[str, DataFrame]) -> str:
    """ER diagram of the flattened tables as Graphviz dot — the A31 analog
    (``demo/avroidl2dot.fsx``): one node per table listing its columns, one
    edge per parent→child link labeled with the spawning field and its
    cardinality (from the flatten provenance tags when ``tables`` is a
    :class:`FlattenResult`; 1-n otherwise)."""
    tags = getattr(tables, "tags", {})
    lines = ["digraph tables {", "  node [shape=record];"]
    for name, df in sorted(tables.items()):
        cols = "|".join(
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name not in SYSTEM_COLS
        )
        safe = name.replace(".", "_")
        lines.append(f'  {safe} [label="{{{name}|{cols}}}"];')
    for name in sorted(tables):
        if "." in name:
            parent = name.rsplit(".", 1)[0]
            fid = name.rsplit(".", 1)[1]
            card = _CARDINALITY.get(tags.get(name, "array"), "1-n")
            lines.append(
                f'  {parent.replace(".", "_")} -> {name.replace(".", "_")} '
                f'[label="{fid[0].lower()}{fid[1:]} ({card})"];'
            )
    lines.append("}")
    return "\n".join(lines)
