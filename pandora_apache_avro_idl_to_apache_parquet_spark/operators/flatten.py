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


def token_offsets(df: DataFrame, order_col: str = "doc_id",
                  prefix_len: int = 4) -> DataFrame:
    """Per-row exclusive start offset into the flattened value stream.

    The Arrow list-offset representation of the explode, computed as a
    **two-phase distributed prefix sum** — a global ``Window.orderBy`` with no
    partitioning would funnel the whole table through one reducer:

    1. bucket rows by a fixed-length prefix of ``order_col`` (a fixed-length
       prefix is order-consistent: ``prefix(a) < prefix(b) ⇒ a < b``), and
       aggregate per-bucket token totals — a metadata-sized result (bounded by
       the distinct-prefix count; pick ``prefix_len ≈ log_62(wanted buckets)``)
       that the driver folds into exclusive per-bucket base offsets;
    2. a *partition-local* running sum per bucket (window partitioned by the
       bucket — parallel across buckets) plus the broadcast bucket base.

    This is the same per-chunk/per-partition offset scheme the encode kernel
    uses, lifted to the whole table.
    """
    spark = df.sparkSession
    bkt = F.substring(order_col, 1, prefix_len)
    # slim projection + localCheckpoint: both phases (bucket sums, ranked
    # output) need only (order_col, doc_id, n_tok) — never the token arrays —
    # and without the checkpoint the upstream scan recomputes twice
    # (the VERDICT-r04 double-scan)
    slim_cols = list(dict.fromkeys([order_col, "doc_id", "n_tok"]))
    df = df.select(*slim_cols).localCheckpoint(eager=False)
    sums = (
        df.groupBy(bkt.alias("__bkt"))
        .agg(F.sum("n_tok").alias("s"))
        .collect()
    )
    base, acc = {}, 0
    for row in sorted(sums, key=lambda r: r["__bkt"]):
        base[row["__bkt"]] = acc
        acc += row["s"] or 0
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [("", 0)], "__bkt string, __base long"
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("__bkt", bkt)
        .join(F.broadcast(base_df), "__bkt")
        .select(
            F.col("doc_id"),
            F.col("n_tok"),
            (F.col("__base") + F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
            .cast("long")
            .alias("offset"),
        )
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
