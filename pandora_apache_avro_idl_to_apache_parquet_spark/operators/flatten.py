"""Flatten / explode operators: token arrays -> typed extension tables.

The reference flattens nested data into child tables linked by synthetic keys:
array-of-primitive becomes a ``{item}`` child row per element carrying
``pj_pid`` (parent id) and ``pj_fid`` (field name) lineage
(``/root/reference/.../Pandora/Apache/Parquet.fs:880-946`` ``popuArray``;
rewrite at ``Avro.fs:291-404``). These operators re-express that contract
declaratively so Catalyst keeps pushdown/pruning:

* ``flatten_tokens`` — one row per token ``(doc_id, pos, token)`` via
  ``posexplode``; ``pos`` plays the role the reference's implicit append order
  plays, ``doc_id`` is the FK (the reference's ``pj_pid``).
* ``token_offsets`` — per-doc offset vector (cumulative sums) — the Arrow
  list-offsets view of the same explode, used by the encode pipeline where a
  physical row-per-token blow-up would be wasteful (SURVEY.md §7 "vectorized
  explode without blow-up").

At 100 TB the explode output is never materialized whole: it feeds directly
into per-partition aggregations, so Spark pipelines scan→explode→partial-agg
inside one whole-stage-codegen span with no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def flatten_tokens(df: DataFrame) -> DataFrame:
    """(doc_id, tokens, ...) -> one row per token: (doc_id, pos, token)."""
    return df.select("doc_id", F.posexplode("tokens").alias("pos", "token"))


def token_offsets(df: DataFrame, order_col: str = "doc_id") -> DataFrame:
    """Per-row exclusive start offset into the flattened value stream.

    The Arrow list-offset representation of the explode: ``offset`` is the
    running sum of ``n_tok`` over ``order_col`` order (window function).
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.select(
        F.col("doc_id"),
        F.col("n_tok"),
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long").alias("offset"),
    )


def token_stats_by_source(df: DataFrame) -> DataFrame:
    """Aggregate token statistics per source (partial-agg friendly: all
    distributive/algebraic aggregates, map-side combine applies)."""
    return (
        df.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("n_tok").alias("min_len"),
            F.max("n_tok").alias("max_len"),
            F.round(F.avg("n_tok"), 4).alias("avg_len"),
        )
        .orderBy("source")
    )


def dictionary_cardinality(df: DataFrame) -> DataFrame:
    """Exact distinct-token count per source — the dictionary-codec probe.

    Uses explode + two-phase distinct aggregation (Spark rewrites
    count(distinct) into a partial-dedup + final count, so the token blow-up
    never leaves the map side un-deduplicated).
    """
    return (
        df.select("source", F.explode("tokens").alias("token"))
        .groupBy("source")
        .agg(F.countDistinct("token").alias("n_distinct_tokens"))
        .orderBy("source")
    )
