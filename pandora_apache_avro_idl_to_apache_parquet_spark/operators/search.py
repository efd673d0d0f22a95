"""Full-text relevance search over the documents table: inverted-index
postings, BM25 ranking, and per-group top-k.

The reference engine has no search operator — this extends the text-analysis
tier (SURVEY.md §2 Part C) with the standard training-data-curation
primitives: "give me the best documents for these terms" (query-biased corpus
slicing) and "the top n documents per source" (per-stratum exemplars).

Scale design:
* Postings are ``explode → filter → groupBy``; the query-term filter runs
  MAP-SIDE (before the shuffle), so only the (term, doc) pairs that can score
  ever leave the scan stage — at 100 TB the shuffle is proportional to the
  query's posting lists, not the corpus.
* Document length rides along through the explode, so scoring needs no join
  back to the corpus; global stats (N, avgdl) are a one-row aggregate
  broadcast into the scoring projection.
* The final top-k is ``orderBy().limit(k)`` — Spark plans
  TakeOrderedAndProject (per-partition bounded heaps + driver merge), never a
  single-partition Window.
* ``grouped_topk`` ranks in two phases — (group, shard) then group over the
  ≤ shards·k survivors — so one hot group parallelizes across shards instead
  of landing on a single window task (same discipline as
  ``sampling.shuffle_rank``).

All expressions are built-in column functions (whole-stage codegen, no Python
in the hot path); scores are rounded to 4 decimals before ranking so the
DuckDB oracle makes identical ordering decisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import spark_md5_long

_WORDS = "filter(split(lower(text), ' '), w -> w <> '')"


def postings(docs: DataFrame, terms: list[str] | None = None,
             id_col: str = "doc_id") -> DataFrame:
    """Inverted-index postings ``(term, doc_id, tf, dl)`` from whitespace
    words of ``lower(text)``. ``terms`` (if given) filters map-side, before
    the groupBy shuffle. ``dl`` (document word count) is carried through the
    explode so BM25 scoring never joins back to the corpus."""
    rows = docs.select(
        F.col(id_col),
        F.expr(f"size({_WORDS})").cast("long").alias("dl"),
        F.explode(F.expr(_WORDS)).alias("term"),
    )
    if terms is not None:
        rows = rows.filter(F.col("term").isin(list(terms)))
    return rows.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),
    )


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents by BM25 for ``query_terms``
    (Robertson/Sparck-Jones idf as used by Lucene: ``ln(1 + (N-df+0.5)/
    (df+0.5))``). Returns ``(doc_id, n_terms, bm25)`` ordered by
    ``(bm25 DESC, doc_id)``; the score is rounded to 4 decimals BEFORE the
    rank so tie-breaks are cross-engine deterministic."""
    tf = postings(docs, terms=query_terms, id_col=id_col)
    # Corpus stats: one row, broadcast into the scoring projection.
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.expr(f"size({_WORDS})")).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.expr(
                f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
                f" * tf * ({k1} + 1.0)"
                f" / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("contrib"), 4).alias("bm25"),
        )
    )
    # TakeOrderedAndProject: bounded per-partition heaps, no global Window.
    return scored.orderBy(F.desc("bm25"), F.col(id_col)).limit(k)


def grouped_topk(df: DataFrame, group_col: str, order_col: str, k: int,
                 id_col: str, shards: int = 16,
                 descending: bool = True,
                 rank_name: str = "rnk") -> DataFrame:
    """Top-``k`` rows per ``group_col`` by ``(order_col, id_col)`` without a
    per-group-hot window: phase 1 ranks within (group, md5-shard of id) and
    keeps ≤ ``k`` per shard — a hot group spreads over ``shards`` parallel
    window tasks; phase 2 ranks the ≤ shards·k survivors per group. Output
    adds an int ``rank_name`` column (1-based, default ``rnk``). Ties break
    on ``id_col``, so the result set is deterministic under any
    partitioning."""
    key: Column = F.desc(order_col) if descending else F.asc(order_col)
    shard = F.expr(
        f"pmod({spark_md5_long(f'cast({id_col} as string)')}, {shards})"
    )
    w1 = Window.partitionBy(group_col, "__gtk_shard").orderBy(key, id_col)
    survivors = (
        df.withColumn("__gtk_shard", shard)
        .withColumn("__gtk_r1", F.row_number().over(w1))
        .filter(F.col("__gtk_r1") <= k)
        .drop("__gtk_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(key, id_col)
    return (
        survivors.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
        .drop("__gtk_shard")
    )


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             k: int = 10, k_rrf: int = 60,
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    rankings — the standard hybrid-retrieval combiner (lexical BM25 +
    semantic ANN): each list contributes ``1 / (k_rrf + rank)`` per
    document, fused score = the sum, missing lists contribute nothing.
    Rank-based, so the legs' incomparable score scales never matter.

    Scale shape: each input is already a top-k (bounded) list, so the
    union + groupBy touches O(lists x k) rows regardless of corpus size,
    and the final top-k is TakeOrderedAndProject. Output:
    ``(id_col, rrf, n_lists)``, rrf rounded to 6 before the rank cut so
    cross-engine ties break on the id."""
    contribs = None
    for r in rankings:
        c = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k_rrf) + F.col(rank_col))).alias("__c"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    return (
        contribs.groupBy(id_col)
        .agg(F.round(F.sum("__c"), 6).alias("rrf"),
             F.count(F.lit(1)).alias("n_lists"))
        .orderBy(F.col("rrf").desc(), id_col)
        .limit(k)
    )
