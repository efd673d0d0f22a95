"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k as the exact baseline; a random-hyperplane
LSH-bucketed variant as the scale path (search only within a bucket). Built on
``zip_with``/``aggregate`` array higher-order functions — JVM-side, codegen'd,
no Python in the hot path — with exact DuckDB SQL oracles.

Scores are rounded to 4 decimals *before* ranking so Spark and the SQL oracle
rank identically despite last-ulp float differences; ties break on neighbor id.

Scale notes:
* ``brute_force_topk`` broadcasts the (small) query set and computes per-input
  partial top-k inside the map side via window-over-rounded-score; at 100 TB
  the corpus side never shuffles — only (query_id, neighbor, score) survivors.
* ``lsh_bucketed_topk`` hashes both sides into ``2^n_planes`` sign buckets and
  joins bucket-to-bucket, turning the cross product into an equi-join whose
  shuffle is O(corpus), not O(corpus × queries). Recall < 1 by construction —
  that is the documented trade; the hyperplanes are deterministic md5 signs so
  results are reproducible and oracle-checkable.
* IVF-style variant: ``ivf_assign`` picks the first ``n_cells`` embeddings as
  coarse centroids (deterministic; k-means would be a driver-side loop) and
  assigns every vector to its nearest centroid — the classic inverted-file
  partitioning where a probe searches only its cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.hashing import spark_md5_long


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    """Spark SQL expression: cosine similarity of two array<float> columns."""
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


def brute_force_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact cosine top-k: first ``n_queries`` vectors (by vec_id) are the
    query set, every other vector is a candidate. Returns
    (query_id, rank, neighbor_id, score)."""
    queries = (
        emb.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(cosine_expr("q", "embedding")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
        .orderBy("query_id", "rank")
    )


def lsh_bucket_expr(col: str, n_planes: int = 8) -> str:
    """Spark SQL expression: random-hyperplane sign bucket of an embedding.

    Plane ``p``'s weight for dimension ``d`` is ±1 from the parity of
    md5-long("p/d") — deterministic, engine-independent, and orthogonal-ish in
    expectation, standing in for gaussian planes (SimHash for vectors).
    """
    parts = []
    for p in range(n_planes):
        w = spark_md5_long(f"concat('{p}/', cast(i as string))")
        proj = (
            f"aggregate(zip_with({col}, sequence(0, size({col}) - 1), "
            f"(x, i) -> cast(x as double) * (CASE WHEN {w} % 2 = 1 THEN 1.0 ELSE -1.0 END)), "
            f"0D, (acc, v) -> acc + v)"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def lsh_bucketed_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = 4
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    bucketed = emb.withColumn("bucket", F.expr(lsh_bucket_expr("embedding", n_planes)))
    queries = (
        bucketed.orderBy("vec_id")
        .limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = (
        bucketed.join(F.broadcast(queries), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(cosine_expr("q", "embedding")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
        .orderBy("query_id", "rank")
    )


def ivf_assign(emb: DataFrame, n_cells: int = 8) -> DataFrame:
    """Assign every embedding to its nearest of ``n_cells`` coarse centroids.

    Centroids are the first ``n_cells`` embeddings by vec_id (deterministic
    seeding). Returns (vec_id, cell, cell_score). Broadcast the centroid set;
    the corpus side is map-only.
    """
    cents = (
        emb.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c"))
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        F.round(F.expr(cosine_expr("embedding", "c")), 4).alias("cell_score"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_score"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "cell_score")
        .orderBy("vec_id")
    )


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, symmetric, a<b)."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(F.expr(cosine_expr("ea", "eb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
        .orderBy("vec_a", "vec_b")
    )
