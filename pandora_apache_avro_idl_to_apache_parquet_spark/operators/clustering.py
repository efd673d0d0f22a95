"""Z-order (Morton) clustering keys for multi-column zone-map pruning.

The encoded store sorts each partition by ``key_cols`` and zone-maps EVERY
column per chunk (`table.py`). A single-column sort makes that column's
min/max spans tight and every other column's spans wide — a 2-D range query
on two non-key columns prunes nothing. Interleaving the bits of both
columns' quantized values into one Morton key and sorting by THAT makes
chunks cover small axis-aligned rectangles of the value space, so BOTH
columns' per-chunk min/max become tight and `column_range_filter` prunes
multi-dimensional predicates (the Delta ``OPTIMIZE ZORDER BY`` contract;
the reference's Delta writer is the commit side of the same lake layout,
``DeltaLake.fs:176-444``).

Usage (a recipe, not a new store format — correctness never depends on it,
zone maps stay exact whatever the row order):

    bounds = zorder_bounds(df, ["x", "y"])      # one tiny aggregate
    df2 = df.withColumn("zkey", zorder_key(bounds))
    encode_table(df2, out, key_cols=["zkey", <tiebreakers>])
    decode_table(spark, out, chunk_filter=column_range_filter("x", ...)
                 & column_range_filter("y", ...))

Everything is a plain codegen expression — no UDF, no shuffle beyond the
encode's own salted exchange; the key costs ``bits × ncols`` bit-ops per
row, computed map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_bounds(df: DataFrame, cols: list[str]) -> dict:
    """Per-column (min, max) for quantization — ONE aggregate over the
    input (map-side combined; at 100 TB this is the cheap planning pass,
    or pass known domain bounds directly to skip it)."""
    row = df.agg(*[
        f for c in cols
        for f in (F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi"))
    ]).collect()[0]
    return {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in cols}


def zorder_key(bounds: dict, bits: int = 12) -> Column:
    """Morton key Column interleaving ``bits`` quantized bits per column.

    ``bounds`` maps column name → (lo, hi) over NUMERIC columns (cast dates
    to days / timestamps to epoch first). Values clamp into [lo, hi], scale
    to ``[0, 2^bits)`` (double arithmetic — fine for clustering, which only
    affects pruning efficiency, never correctness), nulls quantize to 0.
    Bit i of column j lands at position ``i * ncols + j``; ``bits × ncols``
    must fit a signed int64.
    """
    cols = list(bounds)
    ncols = len(cols)
    if ncols < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * ncols > 63:
        raise ValueError(f"bits*ncols = {bits * ncols} exceeds int64")
    scale = (1 << bits) - 1
    qs = []
    for c in cols:
        lo, hi = bounds[c]
        if lo is None or hi is None or float(hi) == float(lo):
            qs.append(F.lit(0).cast("long"))
            continue
        frac = ((F.col(c).cast("double") - F.lit(float(lo)))
                / F.lit(float(hi) - float(lo)))
        q = F.floor(frac * F.lit(float(scale)))
        q = F.least(F.lit(scale).cast("long"),
                    F.greatest(F.lit(0).cast("long"), q))
        qs.append(F.coalesce(q, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)),
                            i * ncols + j)
            )
    return z
