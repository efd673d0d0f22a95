"""Sequence packing: documents -> fixed-length training sequences.

The last step of a pretraining data pipeline: lay every document out in one
deterministic global token stream and chunk that stream into fixed
``seq_len`` training sequences ("concat-then-chunk" packing). The output is
a *packing manifest* — for each (sequence, document) incidence, which token
slice of the document lands at which position of the sequence — which is
exactly what a downstream tokenizer/loader needs to materialize batches
without ever shuffling token payloads through the planner.

No reference analog (the reference stops at columnar encode); this is the
LLM-pipeline breadth the brief demands, built scale-first:

* the global token offset is the SAME two-phase distributed prefix sum as
  ``flatten.token_offsets`` (order-consistent hash-prefix buckets → driver
  fold over ~256 scalars → bucket-partitioned running sums) — no global
  ``Window.orderBy`` funnel, so the plan survives a corpus 1000× this size;
* the stream order is an md5 permutation of the document key (seeded), so
  packing is reproducible across engines, partitionings and retries — the
  DuckDB oracle recomputes the identical layout;
* the span→sequence fan-out is ``explode(sequence(seq_first, seq_last))``
  — executor-local, each doc multiplies only into the sequences it actually
  touches (≤ n_tok/seq_len + 1 rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_token_offsets", "pack_sequences"]


def _order_key(key: Column, seed: int | None) -> Column:
    """The global stream order: md5-permuted when seeded, key order when not.

    A (hash, key) pair string is returned so that lexicographic order on the
    single column IS the total order (ties broken by key) and a fixed-length
    prefix of it remains order-consistent for bucketing."""
    if seed is None:
        return key.cast("string")
    return F.concat_ws(
        ":", F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string"))),
        key.cast("string"),
    )


def global_token_offsets(df: DataFrame, ntok_col: str = "n_tok",
                         key_col: str = "doc_id", seed: int | None = None,
                         prefix_len: int = 2) -> DataFrame:
    """Exclusive global token offset of every row in the (seeded) stream
    order — ``flatten.token_offsets`` generalized to an arbitrary key column
    and an optional md5 shuffle order.

    Phase 1 aggregates per-bucket token totals (hash-prefix buckets, a
    metadata-sized result) which the driver folds into exclusive base
    offsets; phase 2 is a running sum *partitioned by bucket* plus the
    broadcast base. Adds ``__ord`` (the order key — kept so callers can
    re-derive the same order) and ``offset``."""
    spark = df.sparkSession
    ordered = df.withColumn("__ord", _order_key(F.col(key_col), seed))
    bkt = F.substring("__ord", 1, prefix_len)
    sums = (
        ordered.groupBy(bkt.alias("__bkt"))
        .agg(F.sum(ntok_col).alias("s"))
        .collect()
    )
    base, acc = [], 0
    for row in sorted(sums, key=lambda r: r["__bkt"]):
        base.append((row["__bkt"], acc))
        acc += row["s"] or 0
    base_df = spark.createDataFrame(base or [("", 0)], "__bkt string, __base long")
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__ord")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ordered.withColumn("__bkt", bkt)
        .join(F.broadcast(base_df), "__bkt")
        .withColumn(
            "offset",
            (F.col("__base") + F.coalesce(F.sum(ntok_col).over(w), F.lit(0)))
            .cast("long"),
        )
        .drop("__bkt", "__base")
    )


def pack_sequences(df: DataFrame, seq_len: int, ntok_col: str = "n_tok",
                   key_col: str = "doc_id", seed: int | None = None,
                   prefix_len: int = 2) -> DataFrame:
    """Concat-then-chunk packing manifest at fixed ``seq_len``.

    One output row per (sequence, document) incidence:

    * ``seq_id``    — 0-based sequence number in the global stream;
    * ``doc_begin`` — first token of THIS doc that lands in the sequence;
    * ``slice_len`` — how many of its tokens land there;
    * ``seq_begin`` — where in the sequence the slice starts.

    Every token of every (non-empty) document is covered exactly once:
    ``sum(slice_len) == sum(n_tok)`` and per-sequence
    ``sum(slice_len) == seq_len`` for all but the final ragged sequence.
    Documents longer than ``seq_len`` span multiple sequences (the explode
    emits one row per touched sequence); empty documents pack nowhere.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    n = F.col(ntok_col).cast("long")
    offs = global_token_offsets(
        df.where(n >= 1), ntok_col, key_col, seed, prefix_len
    ).select(key_col, ntok_col, "offset")
    L = F.lit(seq_len).cast("long")
    first = F.expr(f"offset div {seq_len}")
    last = F.expr(f"(offset + {ntok_col} - 1) div {seq_len}")
    start = F.greatest(F.col("offset"), F.col("seq_id") * L)
    stop = F.least(F.col("offset") + n, (F.col("seq_id") + 1) * L)
    return (
        offs.withColumn(
            "seq_id", F.explode(F.sequence(first.cast("long"), last.cast("long")))
        )
        .select(
            key_col,
            F.col("seq_id").cast("long").alias("seq_id"),
            (start - F.col("offset")).cast("long").alias("doc_begin"),
            (stop - start).cast("long").alias("slice_len"),
            (start - F.col("seq_id") * L).cast("long").alias("seq_begin"),
        )
    )
