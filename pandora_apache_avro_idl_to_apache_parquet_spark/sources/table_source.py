"""Spark Python DataSource over the encoded table store.

``register_table_views`` (``operators/table.py``) exposes the store to
``spark.sql`` through a ``mapInArrow`` barrier Catalyst cannot push filters
through, and ``table_sql`` closes that gap only for SQL shapes its
conservative text analysis can prove safe. This module is the engine-native
answer: a **DataSourceV2 (Python Data Source API, Spark 4)** implementation,
so the encoded store becomes a first-class Catalyst relation —

    spark.dataSource.register(PandoraTableDataSource)
    df = spark.read.format("pandora_table").load(out_dir)

— and ``WHERE`` predicates of ANY query shape (joins, ORs elsewhere in the
plan, subqueries …) reach :meth:`DataSourceReader.pushFilters`, where they
become zone-map pruning at two levels:

* **file level (planning, driver)**: each chunk file's parquet FOOTER carries
  row-group statistics for the tiny ``{col}__min``/``{col}__max``/
  ``{col}__nulls`` stat columns (payload stats are deliberately not written —
  ``operators/table.py``); a metadata-only probe drops whole files no
  conjunct can match, so they never become tasks. This is the same
  planning-time contract as the reference's Delta reader (file skipping from
  log/footer stats, ``DeltaLake.fs:176-444``), with the commit log supplying
  the live file set (orphans and compacted-away files are invisible).
* **chunk level (executors)**: the surviving files are read with a pyarrow
  filter over the chunk META rows (``col__min``/``col__max``/``col__nulls``),
  so pruned chunks' payload bytes are never materialized; only then do the
  surviving chunks decode, column-pruned to the requested ``columns``.

Pruning is strictly conservative: ``pushFilters`` returns EVERY filter as
residual, so Spark re-applies the full predicate on decoded rows — a zone map
can only skip chunks that provably contain no matching row, never change a
result. Column pruning: the Python Data Source API has no column-pruning
hook, so the projected column set is an explicit read option
(``.option("columns", "a,b,c")``) — :func:`read_encoded_table` wires it.

Options: ``path`` (load arg), ``columns`` (comma list), ``as_of`` (commit-log
index, same semantics as :func:`operators.table.decode_table`), ``plan_prune``
("false" disables the planning-time file probe; chunk-level pruning remains).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql import types as T

FORMAT_NAME = "pandora_table"

# (op, column, value) specs recorded by pushFilters; value is None for the
# null tests. All ops are self-inverse under conservative zone logic below.
_COMPARE_OPS = {"lt", "le", "gt", "ge", "eq", "in"}


def _zone_specs(filters: list[Filter], colnames: set[str]) -> tuple[list, list[Filter]]:
    """Translate supported pushed filters into picklable zone specs."""
    specs = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1 or attr[0] not in colnames:
            continue
        c = attr[0]
        if isinstance(f, LessThan):
            specs.append(("lt", c, f.value))
        elif isinstance(f, LessThanOrEqual):
            specs.append(("le", c, f.value))
        elif isinstance(f, GreaterThan):
            specs.append(("gt", c, f.value))
        elif isinstance(f, GreaterThanOrEqual):
            specs.append(("ge", c, f.value))
        elif isinstance(f, EqualTo):
            specs.append(("eq", c, f.value))
        elif isinstance(f, In) and f.value:
            specs.append(("in", c, tuple(f.value)))
        elif isinstance(f, IsNull):
            specs.append(("isnull", c, None))
        elif isinstance(f, IsNotNull):
            specs.append(("notnull", c, None))
    return specs


class PandoraTableDataSource(DataSource):
    """``spark.read.format("pandora_table")`` over an encoded table dir."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _spec(self):
        from ..operators.table import read_table_spec

        path = self.options.get("path")
        if not path:
            raise ValueError("pandora_table requires a path: .load(<encoded dir>)")
        return path, read_table_spec(path)

    def schema(self) -> T.StructType:
        _, spec = self._spec()
        cols_opt = self.options.get("columns")
        fields = {f.name: f for f in spec.schema.fields}
        if cols_opt:
            names = [c.strip() for c in cols_opt.split(",") if c.strip()]
            missing = [c for c in names if c not in fields]
            if missing:
                raise ValueError(f"columns not in encoded table: {missing}")
        else:
            names = [f.name for f in spec.schema.fields]
        return T.StructType(
            [T.StructField(n, fields[n].dataType, True) for n in names]
        )

    def reader(self, schema: T.StructType) -> "PandoraTableReader":
        path, spec = self._spec()
        as_of = self.options.get("as_of")
        return PandoraTableReader(
            path=path,
            spec_json=spec.to_json(),
            out_names=[f.name for f in schema.fields],
            as_of=int(as_of) if as_of is not None else None,
            plan_prune=self.options.get("plan_prune", "true").lower() != "false",
        )


class PandoraTableReader(DataSourceReader):
    def __init__(self, path: str, spec_json: str, out_names: list[str],
                 as_of: int | None, plan_prune: bool):
        self._path = path
        self._spec_json = spec_json
        self._out_names = out_names
        self._as_of = as_of
        self._plan_prune = plan_prune
        self._zone: list = []

    # -- planning (driver) --------------------------------------------------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        from ..operators.table import TableSpec

        spec = TableSpec.from_json(self._spec_json)
        self._zone = _zone_specs(filters, {f.name for f in spec.schema.fields})
        # everything is residual: zone maps prune chunks, Spark still applies
        # the exact predicate to every decoded row
        return iter(filters)

    def _live_files(self) -> list[str]:
        from ..operators.encode import committed_files
        from ..operators.table import _io

        io = _io(self._path, None)
        live = committed_files(self._path, io, as_of=self._as_of)
        if live is None:
            d = io.join("data")
            live = sorted(f for f in io.listdir(d) if f.endswith(".parquet"))
        return live

    def partitions(self) -> list[InputPartition]:
        files = self._live_files()
        if self._plan_prune and self._zone:
            files = [f for f in files if self._file_may_match(f)]
        return [InputPartition(f) for f in files]

    def _file_may_match(self, fname: str) -> bool:
        """Metadata-only probe: footer row-group stats of the stat columns.
        True unless some conjunct proves NO chunk in the file can match."""
        import pyarrow.parquet as pq

        from ..operators.table import _io

        io = _io(self._path, None)
        try:
            md = pq.ParquetFile(
                io.open_input_file(io.join("data/" + fname))
            ).metadata
        except Exception:
            return True  # unreadable footer -> let the scan decide
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}

        def col_range(col: str):
            """(min, max) over row groups of a stat column, or None when any
            row group lacks stats (disabled or all-null page)."""
            if col not in idx:
                return "absent"
            lo = hi = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    return None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            return (lo, hi)

        for op, c, v in self._zone:
            if op in _COMPARE_OPS:
                rng_min = col_range(f"{c}__min")
                rng_max = col_range(f"{c}__max")
                if rng_min == "absent" or rng_max == "absent":
                    return False  # column predates file: all-null, no match
                if rng_min is None or rng_max is None:
                    continue
                try:
                    if op == "lt" and not rng_min[0] < v:
                        return False
                    if op == "le" and not rng_min[0] <= v:
                        return False
                    if op == "gt" and not rng_max[1] > v:
                        return False
                    if op == "ge" and not rng_max[1] >= v:
                        return False
                    if op == "eq" and not (rng_min[0] <= v and rng_max[1] >= v):
                        return False
                    if op == "in" and not (
                        rng_min[0] <= max(v) and rng_max[1] >= min(v)
                    ):
                        return False
                except TypeError:
                    continue  # incomparable stat repr (e.g. binary): keep
            elif op == "isnull":
                rng = col_range(f"{c}__nulls")
                if rng == "absent":
                    continue  # column predates file: all null, keep
                if rng is not None and rng[1] == 0:
                    return False
            elif op == "notnull":
                rng = col_range(f"{c}__nulls")
                if rng == "absent":
                    return False  # all null in this file
        return True

    # -- execution (executors) ----------------------------------------------

    def read(self, partition: InputPartition) -> Iterator[Any]:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        from ..operators.table import TableSpec, _decode_column, _io

        if partition is None:  # Spark probes once when partitions() is empty
            return

        spec = TableSpec.from_json(self._spec_json)
        logicals = spec.logicals
        fields = {f.name: f for f in spec.schema.fields}
        names = self._out_names
        out_struct = T.StructType(
            [T.StructField(n, fields[n].dataType, True) for n in names]
        )
        arrow_out = to_arrow_schema(out_struct)

        io = _io(self._path, None)
        pf = pq.ParquetFile(io.open_input_file(io.join("data/" + partition.value)))
        present = set(pf.schema_arrow.names)

        # chunk-level zone filter over the meta rows of THIS file
        expr = None
        for op, c, v in self._zone:
            mn, mx, nl = f"{c}__min", f"{c}__max", f"{c}__nulls"
            if op in _COMPARE_OPS and not (mn in present and mx in present):
                return  # column predates file: all-null, no row matches
            if op == "lt":
                e = pc.field(mn) < v
            elif op == "le":
                e = pc.field(mn) <= v
            elif op == "gt":
                e = pc.field(mx) > v
            elif op == "ge":
                e = pc.field(mx) >= v
            elif op == "eq":
                e = (pc.field(mn) <= v) & (pc.field(mx) >= v)
            elif op == "in":
                e = (pc.field(mn) <= max(v)) & (pc.field(mx) >= min(v))
            elif op == "isnull":
                if nl not in present:
                    continue  # column predates file: all rows null, keep all
                e = pc.field(nl) > 0
            elif op == "notnull":
                if nl not in present:
                    return  # all rows null in this file
                e = pc.field("n_rows") > pc.field(nl)
            else:  # pragma: no cover
                continue
            expr = e if expr is None else expr & e

        want = ["n_rows"]
        for n in names:
            for side in ("__valid", "__payload"):
                if f"{n}{side}" in present:
                    want.append(f"{n}{side}")
        try:
            tbl = pq.read_table(
                io.open_input_file(io.join("data/" + partition.value)),
                columns=want, filters=expr,
            )
        except pa.ArrowInvalid:
            # filter referenced a stat column absent from this file's subset
            # (pre-evolution file + mixed conjuncts): fall back to unfiltered
            tbl = pq.read_table(
                io.open_input_file(io.join("data/" + partition.value)),
                columns=want,
            )
        cols = {c: tbl.column(c) for c in tbl.column_names}
        n_rows_col = cols["n_rows"]
        for i in range(tbl.num_rows):  # iterates CHUNKS
            n = int(n_rows_col[i].as_py())
            arrays = []
            for name in names:
                pcol = cols.get(f"{name}__payload")
                pl = pcol[i].as_py() if pcol is not None else None
                if pl is None:
                    arrays.append(pa.nulls(n, arrow_out.field(name).type))
                    continue
                vcol = cols.get(f"{name}__valid")
                vp = vcol[i].as_py() if vcol is not None else None
                arrays.append(
                    _decode_column(vp, pl, logicals[name], n,
                                   arrow_out.field(name).type)
                )
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_out)


def register_table_datasource(spark) -> None:
    """Idempotently register the ``pandora_table`` format on this session."""
    # Python-data-source filter pushdown is gated off by default (Spark 4.1);
    # without it Spark refuses any reader implementing pushFilters
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PandoraTableDataSource)


def read_encoded_table(spark, out_dir: str, columns: list[str] | None = None,
                       as_of: int | None = None):
    """``spark.read.format("pandora_table")`` with the options wired."""
    register_table_datasource(spark)
    r = spark.read.format(FORMAT_NAME)
    if columns:
        r = r.option("columns", ",".join(columns))
    if as_of is not None:
        r = r.option("as_of", str(as_of))
    return r.load(out_dir)
