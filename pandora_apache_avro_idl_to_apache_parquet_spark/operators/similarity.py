"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k as the exact baseline; LSH-bucketed and IVF variants
as the scale paths. Built on ``zip_with``/``aggregate`` array higher-order
functions — JVM-side, codegen'd — with exact DuckDB SQL oracles. The only
Python in any hot path is the bounded-heap partial top-k (Arrow-batched
``mapInPandas``, a few small columns).

Scores are rounded to 4 decimals *before* ranking so Spark and the SQL oracle
rank identically despite last-ulp float differences; ties break on neighbor id.

Scale design (the 100-TB story):
* Top-k never funnels the scored corpus through a per-query window. The plan is
  score (map-only, queries broadcast) → per-partition bounded top-k
  (``mapInPandas``, emits ≤ n_queries·k rows per partition) → tiny final
  ``collect_list``+``array_sort``+``slice`` aggregate. No ``Window`` node
  anywhere; shuffle bytes are O(partitions · queries · k), not O(corpus).
* ``ivf_assign`` is entirely map-side: the (small, by construction) centroid
  set is collapsed to ONE broadcast row and the per-vector argmax is an
  ``array_max`` over a ``transform`` — the corpus never shuffles at all.
* ``embedding_near_pairs`` mirrors the MinHash→Jaccard two-stage design
  (``dedup.lsh_candidate_pairs``): banded random-hyperplane sign codes
  generate candidates via a bucket equi-join (with an oversized-bucket cap —
  boilerplate protection), then only candidates pay the exact cosine — never
  an all-pairs cross join. Recall < 1 by construction and is governed by
  (n_tables, planes): more planes ⇒ finer buckets (size ~n/2^planes, so scale
  planes ≈ log2(n/target_bucket)); more tables ⇒ higher recall. The scheme is
  sharpest in the near-duplicate regime (cos ≥ 0.8) where sign agreement is
  concentrated; the exact all-pairs baseline is kept as
  ``embedding_near_pairs_exact`` for small-n verification only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import spark_md5_long


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    """Spark SQL expression: cosine similarity of two array<float> columns."""
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


# ------------------------------------------------------------------- top-k

def _partial_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-partition bounded top-k over (query_id, neighbor_id, score).

    ``mapInPandas`` folds the partition's Arrow batches through a running
    top-k table (≤ n_queries·k rows held at any time — a bounded heap, not a
    buffer of the partition), so each partition emits at most n_queries·k
    rows. The union over partitions is a superset of the global top-k under
    the total order (score desc, neighbor_id asc), which the tiny final
    aggregate then extracts exactly.
    """
    schema = scored.schema

    def gen(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pd.concat([best, pdf], ignore_index=True) if best is not None else pdf
            cur = cur.sort_values(
                ["query_id", "score", "neighbor_id"],
                ascending=[True, False, True],
                kind="mergesort",
                ignore_index=True,
            )
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None and len(best):
            yield best

    return scored.mapInPandas(gen, schema=schema)


def _final_topk(pruned: DataFrame, k: int) -> DataFrame:
    """Exact global top-k from the pruned survivors — a partial-aggregation-
    friendly ``collect_list`` + ``array_sort`` + ``slice`` (no Window node)."""
    agg = pruned.groupBy("query_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct((-F.col("score")).alias("ns"), F.col("neighbor_id").alias("nid"))
                )
            ),
            1,
            k,
        ).alias("top")
    )
    return (
        agg.select("query_id", F.posexplode("top").alias("rank0", "s"))
        .select(
            "query_id",
            (F.col("rank0") + 1).cast("int").alias("rank"),
            F.col("s.nid").alias("neighbor_id"),
            (-F.col("s.ns")).alias("score"),
        )
        .orderBy("query_id", "rank")
    )


def brute_force_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact cosine top-k: first ``n_queries`` vectors (by vec_id) are the
    query set, every other vector is a candidate. Returns
    (query_id, rank, neighbor_id, score). The corpus side is scored map-only
    against the broadcast query set; only per-partition top-k survivors
    shuffle (see module docstring)."""
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
    return _final_topk(_partial_topk(scored, k), k)


def lsh_bucket_expr(col: str, n_planes: int = 8, key_prefix: str = "") -> str:
    """Spark SQL expression: random-hyperplane sign bucket of an embedding.

    Plane ``p``'s weight for dimension ``d`` is ±1 from the parity of
    md5-long("<prefix>p/d") — deterministic, engine-independent, and
    orthogonal-ish in expectation, standing in for gaussian planes (SimHash
    for vectors). ``key_prefix`` derives an independent hash table.
    """
    parts = []
    for p in range(n_planes):
        w = spark_md5_long(f"concat('{key_prefix}{p}/', cast(i as string))")
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
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then the same bounded partial-top-k path as the exact variant."""
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
    return _final_topk(_partial_topk(scored, k), k)


def ivf_assign(emb: DataFrame, n_cells: int = 8) -> DataFrame:
    """Assign every embedding to its nearest of ``n_cells`` coarse centroids.

    Centroids are the first ``n_cells`` embeddings by vec_id (deterministic
    seeding; a k-means refinement would iterate this same assignment). The
    centroid set is collapsed into ONE row (an array of (cell, centroid)
    structs) and broadcast, so the per-vector argmax is a map-side
    ``array_max`` over a ``transform`` — the classic inverted-file coarse
    quantizer with zero shuffle of the corpus. Ties break on the lower cell id
    (the struct max compares (score, -cell)). Returns (vec_id, cell,
    cell_score)."""
    cents = (
        emb.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("ce"))
        .agg(F.collect_list(F.struct("cell", "ce")).alias("cs"))
    )
    best = F.expr(
        "array_max(transform(cs, c -> struct("
        f"round({cosine_expr('embedding', 'c.ce')}, 4) as s, -c.cell as nc)))"
    )
    return (
        emb.join(F.broadcast(cents))
        .select(
            "vec_id",
            best.alias("best"),
        )
        .select(
            "vec_id",
            (-F.col("best.nc")).alias("cell"),
            F.col("best.s").alias("cell_score"),
        )
        .orderBy("vec_id")
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF search: every corpus vector is assigned to its nearest coarse cell
    (map-side argmax, as :func:`ivf_assign`), each query probes its
    ``n_probe`` best cells, and only vectors in probed cells are scored —
    the classic inverted-file search. Recall < 1 by construction (governed by
    ``n_probe``); the candidate join is a cell equi-join against the
    broadcast (query, probe_cell) list, and ranking goes through the same
    bounded partial top-k path as the exact variant. Ties break on the lower
    cell / neighbor id everywhere so the SQL oracle reproduces results
    exactly."""
    cents = (
        emb.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("ce"))
        .agg(F.collect_list(F.struct("cell", "ce")).alias("cs"))
    )
    cell_scores = (
        f"transform(cs, c -> struct(-round({cosine_expr('embedding', 'c.ce')}, 4) as ns, "
        f"c.cell as cell))"
    )
    assigned = (
        emb.join(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            # array_min on (ns=-score, cell): best score first, lowest cell on ties
            F.expr(f"array_min({cell_scores})").alias("best"),
        )
        .select("vec_id", "embedding", F.col("best.cell").alias("cell"))
    )
    probes = (
        emb.orderBy("vec_id")
        .limit(n_queries)
        .join(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q"),
            F.explode(
                F.expr(
                    f"transform(slice(array_sort({cell_scores}), 1, {n_probe}), s -> s.cell)"
                )
            ).alias("probe_cell"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probes), F.col("cell") == F.col("probe_cell"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(cosine_expr("q", "embedding")), 4).alias("score"),
        )
    )
    return _final_topk(_partial_topk(scored, k), k)


# ------------------------------------------------------ product quantization

def _l2sq(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
        f"0D, (acc, v) -> acc + v)"
    )


def _pq_codebook(emb: DataFrame, n_codes: int) -> DataFrame:
    """ONE-row broadcastable codebook: the first ``n_codes`` vectors by
    vec_id (deterministic seeding, same idiom as :func:`ivf_assign`; a
    k-means refinement would iterate encode/update), ordered so position
    ``i`` (1-based) IS code ``i``."""
    return (
        emb.orderBy("vec_id")
        .limit(n_codes)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(vec_id, embedding))), "
                "c -> c.embedding)"
            ).alias("cbs")
        )
    )


def _pq_codes_expr(col: str, m: int, dsub: int, n_codes: int) -> str:
    """Per-vector PQ code array: for each of ``m`` subspaces, the 1-based
    index of the nearest codebook entry's subvector (L2², rounded to 4
    before the argmin so Spark and the SQL oracle break ties identically,
    lower code wins)."""
    sub = f"slice({col}, s * {dsub} + 1, {dsub})"
    cbsub = f"slice(element_at(cbs, i), s * {dsub} + 1, {dsub})"
    return (
        f"transform(sequence(0, {m - 1}), s -> "
        f"array_min(transform(sequence(1, {n_codes}), i -> "
        f"struct(round({_l2sq(sub, cbsub)}, 4) as d, i as code))).code)"
    )


def _infer_dim(emb: DataFrame) -> int:
    return len(emb.select("embedding").first()[0])


def pq_encode(emb: DataFrame, m: int = 4, n_codes: int = 16,
              dim: int | None = None) -> DataFrame:
    """Product-quantization encode: each vector compresses to ``m`` codes
    (one per ``dim/m``-wide subspace) into a ``n_codes``-entry codebook —
    ``m * ceil(log2(n_codes))`` bits per vector instead of ``32 * dim``
    (64 floats → 4 nibbles here, a 128× compression). Entirely map-side:
    the codebook is ONE broadcast row; the corpus never shuffles. Returns
    (vec_id, codes array<int>, embedding passthrough)."""
    dim = dim or _infer_dim(emb)
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    return emb.join(F.broadcast(_pq_codebook(emb, n_codes))).select(
        "vec_id",
        "embedding",
        F.expr(_pq_codes_expr("embedding", m, dsub, n_codes)).alias("codes"),
    )


def pq_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    shortlist: int = 50,
    dim: int | None = None,
) -> DataFrame:
    """PQ search with asymmetric distance computation (ADC) + exact re-rank:
    corpus vectors live as ``m``-code arrays, queries keep full precision,
    and the approximate distance is the sum of per-subspace L2² between the
    query subvector and the *reconstructed* (codebook) subvector. The top
    ``shortlist`` per query by ADC then pays exact cosine and the final
    top-``k`` is exact over that shortlist — the standard IVF-ADC recall
    contract (recall < 1 governed by shortlist/n_codes). Scale shape: ADC
    is map-only against ONE broadcast codebook row, candidates go through
    the same bounded partial-top-k path as :func:`brute_force_topk` (no
    Window over the corpus), and the exact re-rank touches only
    ``n_queries * shortlist`` rows via a broadcast semi-join back to the
    corpus — at 100 TB the full-precision vectors are read twice but
    shuffled never."""
    dim = dim or _infer_dim(emb)
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    cb = _pq_codebook(emb, n_codes)
    coded = emb.join(F.broadcast(cb)).select(
        "vec_id",
        "cbs",
        F.expr(_pq_codes_expr("embedding", m, dsub, n_codes)).alias("codes"),
    )
    queries = (
        emb.orderBy("vec_id")
        .limit(n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
    )
    qsub = f"slice(q, s * {dsub} + 1, {dsub})"
    rsub = f"slice(element_at(cbs, element_at(codes, s + 1)), s * {dsub} + 1, {dsub})"
    adist = (
        f"aggregate(sequence(0, {m - 1}), 0D, (acc, s) -> acc + {_l2sq(qsub, rsub)})"
    )
    scored = (
        coded.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (-F.round(F.expr(adist), 4)).alias("score"),
        )
    )
    short = _final_topk(_partial_topk(scored, shortlist), shortlist).select(
        "query_id", "neighbor_id"
    )
    rer = (
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
        .join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.expr(cosine_expr("q", "ne")), 4).alias("score"),
        )
    )
    return _final_topk(rer, k)


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 4,
    planes: int = 6,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (symmetric, a<b) via banded
    sign-LSH candidates + exact cosine verification.

    Candidate generation mirrors ``dedup.lsh_candidate_pairs``: each vector
    gets ``n_tables`` independent ``planes``-bit sign codes; vectors sharing a
    (table, code) bucket become candidates (oversized buckets > ``max_bucket``
    are dropped before the quadratic pair expansion). Only candidates pay the
    exact cosine — the all-pairs cross join of the naive formulation never
    happens. See module docstring for the recall/(n_tables, planes) trade.
    """
    codes = emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.expr(lsh_bucket_expr("embedding", planes, key_prefix=f"{t}:"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tbl", "code"),
    )
    small = (
        codes.groupBy("tbl", "code")
        .agg(F.collect_list("vec_id").alias("members"), F.count("*").alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
    )
    pairs = (
        small.select(
            F.explode(
                F.expr(
                    "flatten(transform(members, a -> "
                    "transform(filter(members, b -> b > a), b -> struct(a as vec_a, b as vec_b))))"
                )
            ).alias("p")
        )
        .select("p.vec_a", "p.vec_b")
        .distinct()
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("cos", F.round(F.expr(cosine_expr("ea", "eb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_pairs_exact(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Exact all-pairs baseline (O(n²) cross join) — small-n verification of
    the bucketed variant only; never the scale path."""
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


def _l2sq(a: str, b: str) -> str:
    """Squared L2 distance between two double arrays (codegen expression)."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"


def kmeans_assign(vecs: DataFrame, cents: DataFrame,
                  id_col: str = "vec_id",
                  vec_col: str = "ve") -> DataFrame:
    """Nearest-centroid assignment: ``cents(cid int, ce array<double>)`` is
    collapsed to ONE broadcast row, the per-vector argmin is a map-side
    ``array_min`` over (rounded distance, cid) structs — the corpus never
    shuffles (same shape as :func:`ivf_assign`). Distances are rounded to 6
    decimals BEFORE the argmin so tie-breaks (lowest cid) are cross-engine
    deterministic. Returns (id, cid, dist, the vector)."""
    one = cents.agg(F.collect_list(F.struct("cid", "ce")).alias("cs"))
    best = F.expr(
        "array_min(transform(cs, c -> struct("
        f"round({_l2sq(vec_col, 'c.ce')}, 6) as dist, c.cid as cid)))"
    )
    return (
        vecs.join(F.broadcast(one))
        .select(id_col, vec_col, best.alias("best"))
        .select(id_col, F.col("best.cid").alias("cid"),
                F.col("best.dist").alias("dist"), vec_col)
    )


def kmeans_train(emb: DataFrame, k: int = 4, n_iter: int = 2,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Deterministic Lloyd's k-means over an embedding column, returning the
    final per-vector assignment ``(vec_id, cid, dist)``.

    The iterative trainer behind :func:`ivf_assign`'s coarse quantizer:
    * init: the ``k`` lowest-id vectors (deterministic seeding — no RNG);
    * assign: map-side argmin against ONE broadcast centroid row (corpus
      never shuffles; distance rounded to 6 before the argmin);
    * update: per-dimension mean via ``posexplode → groupBy(cid, pos)``
      (k·dim groups — sketch-sized, partial-aggregated), components rounded
      to 6 so both engines hold bit-identical centroids between rounds.

    Scale: each round shuffles k·dim aggregate cells, never vectors; the
    broadcast is k·dim doubles. Empty clusters simply drop their centroid
    (both engines agree because assignments agree). ``n_iter`` is a fixed
    unroll — convergence-checked training would add a per-round driver
    scalar like ``dedup.connected_components``."""
    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("ve"),
    )
    cents = (
        vecs.orderBy("vec_id").limit(k)
        .select(F.col("vec_id").cast("int").alias("cid"), F.col("ve").alias("ce"))
    )
    for _ in range(n_iter):
        assigned = kmeans_assign(vecs, cents)
        cents = (
            assigned.select("cid", F.posexplode("ve").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("v"), 6).alias("m"))
            .groupBy("cid")
            .agg(F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("ce"))
        )
    return kmeans_assign(vecs, cents).select("vec_id", "cid", "dist")
