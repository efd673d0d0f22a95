"""Graph analytics over edge DataFrames: deterministic PageRank.

Companion to ``dedup.connected_components`` (min-label propagation): where
components answer "which docs are the same", PageRank answers "which nodes
matter" — the standard centrality pass a link/citation/near-dup graph gets
before sampling or pruning.

Scale shape: each iteration is ONE join of the edge list against the
(|nodes|-sized) rank table plus one groupBy on the destination — the edge
list never materializes anything quadratic, and contributions partial-
aggregate map-side. The node count is a single driver scalar (same class as
``connected_components``' convergence count).

Cross-engine determinism: no RNG anywhere; per-iteration sums round to 12
decimals before feeding the next round, so Spark and the unrolled-CTE SQL
oracle hold bit-identical rank state between iterations (the same
round-before-decide rule every float operator here follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, n_iter: int = 2, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """PageRank over a directed edge list, ``n_iter`` unrolled iterations.

    ``pr'(v) = (1−d)/N + d · Σ_{u→v} pr(u)/outdeg(u)`` with uniform init
    ``1/N``; dangling nodes keep their base term (no global mass
    redistribution — the common simplified form, and the one a SQL oracle
    can restate verbatim). Returns ``(node, pr)`` with ``pr`` rounded to 12.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(outdeg, "src")
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.round(F.sum("c"), 12).alias("s"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce("s", F.lit(0.0)),
                    12,
                ).alias("pr"),
            )
        )
    return pr
