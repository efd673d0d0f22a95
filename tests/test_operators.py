"""Unit tests for the breadth operators (dedup, similarity, text, multimodal,
flatten) on crafted in-memory tables — the operator-level complement to the
driver's DuckDB oracle gate (scripts/oracle_check.py covers engine-vs-SQL
parity; these cover semantic edge cases the testdata doesn't hit, e.g. real
duplicates, hamming-near simhashes, identical embeddings)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators import (
    dedup,
    flatten,
    multimodal,
    similarity,
    text,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and looked at the dog", "en", "web", 0),
        (2, "the cat sat on the mat and looked at the dog", "en", "web", 0),  # dup of 1
        (3, "the cat sat on the mat and stared at the dog", "en", "web", 0),  # near-dup
        (4, "completely different text about spark shuffles here", "en", "code", 0),
        (5, "der hund und die katze sind nicht ein problem", "de", "web", 0),
        (6, "one", "en", "misc", 0),  # fewer words than shingle k
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),  # identical to 0
        (2, [0.9, 0.1, 0.0, 0.0], 0),  # close to 0
        (3, [0.0, 1.0, 0.0, 0.0], 1),  # orthogonal
        (4, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


# ------------------------------------------------------------------- dedup


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["keeper_doc_id"] == 1 and out[0]["n_copies"] == 2


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: r["sig"] for r in dedup.with_minhash(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    assert len(sigs[1]) == dedup.DEFAULT_PERMS


def test_lsh_finds_exact_and_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs  # identical docs always collide in every band
    assert all(a < b for a, b in pairs)


def test_lsh_bucket_cap_drops_boilerplate(spark):
    boiler = spark.createDataFrame(
        [(i, "same exact boilerplate text repeated verbatim", "en", "web", 0) for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert dedup.lsh_candidate_pairs(boiler, max_bucket=10).count() == 0
    assert dedup.lsh_candidate_pairs(boiler, max_bucket=100).count() == 30 * 29 // 2


def test_simhash_identical_and_near(docs):
    sims = {r["doc_id"]: r["simhash"] for r in dedup.with_simhash(docs).collect()}
    assert sims[1] == sims[2]
    ham_near = bin(sims[1] ^ sims[3]).count("1")
    ham_far = bin(sims[1] ^ sims[4]).count("1")
    assert ham_near < ham_far
    assert all(0 <= s < (1 << 32) for s in sims.values())


def test_simhash_near_pairs_block_join_complete(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             dedup.simhash_near_pairs(docs, max_hamming=8).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs  # one-word edit stays within hamming 8


def test_ngram_jaccard_exact_values(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r for r in
             dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1).collect()}
    assert pairs[(1, 2)]["jaccard"] == 1.0
    r13 = pairs[(1, 3)]
    # "the cat sat on the mat and {looked|stared} at the dog": 9 shingles each,
    # 3-gram windows touching the changed word differ (3), rest shared (6)
    assert r13["common"] == 6 and abs(r13["jaccard"] - 6 / 12) < 1e-9


def test_ngram_jaccard_lsh_gated_agrees_with_exact_on_candidates(docs):
    """The production pipeline (LSH candidates -> exact verify) must produce
    exactly the exact-path rows restricted to the candidate set, with
    identical (common, jaccard) values — the gate changes recall, never
    values."""
    cand = dedup.lsh_candidate_pairs(docs)
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    gated = {(r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"]) for r in
             dedup.ngram_jaccard_on_candidates(docs, cand, k=3, threshold=0.1).collect()}
    exact = {(r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"]) for r in
             dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1).collect()}
    assert gated == {p: v for p, v in exact.items() if p in cand_set}
    piped = {(r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"]) for r in
             dedup.ngram_jaccard_pairs_lsh(docs, k=3, threshold=0.1).collect()}
    assert piped == gated


# -------------------------------------------------------------- similarity


def test_brute_force_topk(emb):
    out = similarity.brute_force_topk(emb, n_queries=1, k=3).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["score"] == 1.0  # identical vector
    assert out[2]["score"] == 0.0  # orthogonal


def test_embedding_near_pairs(emb):
    pairs = {(r["vec_a"], r["vec_b"]): r["cos"] for r in
             similarity.embedding_near_pairs(emb, threshold=0.9).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and (0, 3) not in pairs


def test_lsh_bucket_identical_vectors_same_bucket(spark, emb):
    b = emb.withColumn("bucket", F.expr(similarity.lsh_bucket_expr("embedding", 6)))
    rows = {r["vec_id"]: r["bucket"] for r in b.collect()}
    assert rows[0] == rows[1]
    assert 0 <= rows[0] < 64


def test_ivf_assign_covers_all(emb):
    out = similarity.ivf_assign(emb, n_cells=4).collect()
    assert len(out) == 5
    byid = {r["vec_id"]: r for r in out}
    assert byid[0]["cell"] == 0 and byid[0]["cell_score"] == 1.0
    # vec 1 is identical to centroid 0 and centroid 1 (tie -> lowest cell id)
    assert byid[1]["cell"] == 0 and byid[1]["cell_score"] == 1.0
    assert byid[3]["cell"] == 3  # its own centroid
    assert byid[4]["cell"] == 3 or byid[4]["cell_score"] == 0.0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_plans_have_no_window(emb):
    """The scored corpus must never funnel through a per-query Window — the
    plan is bounded partial top-k (MapInPandas) + collect_list/slice final."""
    for df in (
        similarity.brute_force_topk(emb, n_queries=2, k=2),
        similarity.lsh_bucketed_topk(emb, n_queries=2, k=2),
        similarity.ivf_topk(emb, n_queries=2, k=2, n_cells=2, n_probe=1),
    ):
        plan = _plan(df)
        assert "Window" not in plan, f"top-k plan funnels through a Window:\n{plan}"
        assert "MapInPandas" in plan, "partial top-k stage missing from plan"


def test_near_pairs_plan_no_cross_join(emb):
    """Candidate generation is a bucket equi-join, never an all-pairs cross."""
    plan = _plan(similarity.embedding_near_pairs(emb, threshold=0.9))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_ivf_plan_is_map_side(emb):
    """Argmax over the broadcast centroid array: no Window, no per-vector
    hash shuffle of the corpus (only the tiny centroid agg + final sort)."""
    plan = _plan(similarity.ivf_assign(emb, n_cells=2))
    assert "Window" not in plan, plan
    assert "array_max" in plan, plan
    assert "hashpartitioning(vec_id" not in plan, plan


def test_near_pairs_bucketed_subset_of_exact(emb):
    exact = {(r["vec_a"], r["vec_b"]): r["cos"] for r in
             similarity.embedding_near_pairs_exact(emb, threshold=0.9).collect()}
    bucketed = {(r["vec_a"], r["vec_b"]): r["cos"] for r in
                similarity.embedding_near_pairs(emb, threshold=0.9).collect()}
    assert set(bucketed) <= set(exact)
    assert all(exact[p] == c for p, c in bucketed.items())
    assert (0, 1) in bucketed  # identical vectors share every table's code


# ------------------------------------------------------------------- text


def test_quality_score_ranges(docs):
    out = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert all(0.0 <= r["quality"] <= 1.0 for r in out.values())
    # doc 1 is English prose with stopwords; doc 6 is a single word
    assert out[1]["quality"] > out[6]["quality"]
    assert out[1]["stopword_ratio"] > 0.3


def test_language_id(docs):
    out = {r["doc_id"]: r["predicted_lang"] for r in text.language_id(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "de"


def test_token_counts(spark):
    d = spark.createDataFrame(
        [(1, "hello world, 42 times!", "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = text.token_counts(d).first()
    assert r["n_ws_tokens"] == 4
    # hello/world/,/42/times/! -> 6 BPE-ish pieces
    assert r["n_bpe_tokens"] == 6


def test_fingerprint_dup_detection(docs):
    fp = {r["doc_id"]: (r["fp_min"], r["fp_max"]) for r in
          text.document_fingerprint(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[4]


# -------------------------------------------------------------- multimodal


def test_multimodal_plumbing_roundtrip(docs):
    feats = multimodal.extract_features(multimodal.documents_as_media(docs))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 6
    r = rows[1]
    assert len(r["features"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= f < 1.0 for f in r["features"])
    assert r["n_bytes"] == len("the cat sat on the mat and looked at the dog")
    # identical payloads -> identical fake features (deterministic extractor)
    assert rows[1]["features"] == rows[2]["features"]
    assert rows[1]["sha"] == rows[2]["sha"]


def test_decode_media_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media_stub(b"xx", "image")


# ----------------------------------------------------------------- flatten


def test_flatten_tokens_positions(spark):
    df = spark.createDataFrame(
        [("a", [10, 20, 30], 3, "web"), ("b", [], 0, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = flatten.flatten_tokens(df).collect()
    assert [(r["doc_id"], r["pos"], r["token"]) for r in out] == [
        ("a", 0, 10), ("a", 1, 20), ("a", 2, 30)
    ]
    offs = {r["doc_id"]: r["offset"] for r in flatten.token_offsets(df).collect()}
    assert offs == {"a": 0, "b": 3}


def test_token_offsets_two_phase_no_global_window(spark):
    """Offsets are a bucketed two-phase prefix sum: exact values, and no
    single-partition exchange (the global-window anti-pattern) in the plan."""
    df = spark.createDataFrame(
        [(f"src{i % 3}-{i:04d}", list(range(i % 5)), i % 5, "s") for i in range(40)],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = flatten.token_offsets(df)
    acc = 0
    for r in sorted(out.collect(), key=lambda r: r["doc_id"]):
        assert r["offset"] == acc
        acc += r["n_tok"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_simhash_plan_shuffle_free(docs):
    """SimHash is a map-side column expression — no Exchange in the plan."""
    df = dedup.with_simhash(docs).select("doc_id", "simhash")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ngram_df_cap_drops_boilerplate_shingle(spark):
    rows = [
        (i, f"common boiler plate w{i}a w{i}b w{i}c", "en", "web", 0)
        for i in range(20)
    ]
    boiler = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # the only shared shingle has document frequency 20: capped -> no pairs
    assert dedup.ngram_jaccard_pairs(boiler, k=3, threshold=0.01, df_cap=5).count() == 0
    assert (
        dedup.ngram_jaccard_pairs(boiler, k=3, threshold=0.01, df_cap=100).count()
        == 20 * 19 // 2
    )


def test_connected_components_min_label(spark):
    """Chain, separate clique, and self-contained pair converge to the min
    reachable id; convergence needs diameter rounds (chain of 5 forces >1)."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [
            # chain d1-d2-d3-d4-d5 (diameter 4)
            ("d2", "d1"), ("d2", "d3"), ("d3", "d4"), ("d5", "d4"),
            # triangle
            ("x1", "x2"), ("x2", "x3"), ("x1", "x3"),
            # isolated pair
            ("z9", "z8"),
        ],
        "doc_a string, doc_b string",
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        "d1": "d1", "d2": "d1", "d3": "d1", "d4": "d1", "d5": "d1",
        "x1": "x1", "x2": "x1", "x3": "x1",
        "z8": "z8", "z9": "z8",
    }


def test_connected_components_local_contraction_exact(spark):
    """Phase-0 contraction vs a reference union-find: a seeded random graph,
    scattered across partitions arbitrarily, must land on exactly the
    reference components (the fixpoint is unique, so partitioning must not
    matter); a deep chain COALESCED to one partition must converge within 2
    propagation rounds — the contraction solved it before the first shuffle."""
    import random

    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {n: find(n) for n in nodes}

    pairs = spark.createDataFrame(
        spark.sparkContext.parallelize(edges, 13), "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["component_id"]
           for r in connected_components(pairs).collect()}
    assert got == want

    deep = spark.createDataFrame(
        [(i, i + 1) for i in range(500)], "doc_a long, doc_b long"
    ).coalesce(1)
    out = connected_components(deep, max_iters=2)
    assert {r["component_id"] for r in out.collect()} == {0}
    assert out.count() == 501


def test_connected_components_raises_without_convergence(spark):
    import pytest as _pytest

    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
        connected_components,
    )

    # one edge per partition (deterministic parallelize split), so the
    # phase-0 local contraction is the identity and phase 1 genuinely needs
    # diameter rounds — max_iters=1 must fail loudly, never return a
    # pre-fixpoint answer
    chain = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(f"n{i:02d}", f"n{i+1:02d}") for i in range(6)], 6
        ),
        "doc_a string, doc_b string",
    )
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iters=1)


def test_connected_components_deep_path_graph(spark):
    """Deep-path stress: a 201-node path with one edge per partition defeats
    the phase-0 contraction entirely, so phase 1 must close a diameter-200
    component — pointer doubling does it in O(log d) ≈ 9 rounds (max_iters=12
    pins the bound; plain min-label would need 200), comfortably exercising
    the periodic localCheckpoint lineage truncation (every 5 rounds). The
    returned frame is lineage-free and nothing is left cached."""
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
        connected_components,
    )

    path = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(f"p{i:03d}", f"p{i+1:03d}") for i in range(200)], 200
        ),
        "doc_a string, doc_b string",
    )
    import gc
    import time

    sc = spark.sparkContext
    n_before = len(sc._jsc.sc().getRDDStorageInfo())
    out = connected_components(path, max_iters=12)
    got = {r["doc_id"]: r["component_id"] for r in out.collect()}
    assert got == {f"p{i:03d}": "p000" for i in range(201)}
    # no CacheManager-cached generation survives the call; the intermediate
    # localCheckpoint blocks are ContextCleaner-owned and reclaimed on GC,
    # leaving only the final checkpoint (still referenced by `out`)
    gc.collect()
    for _ in range(15):
        sc._jvm.System.gc()
        n_after = len(sc._jsc.sc().getRDDStorageInfo())
        if n_after <= n_before + 1:
            break
        time.sleep(2)
    assert n_after <= n_before + 1
