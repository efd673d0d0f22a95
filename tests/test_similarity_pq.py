"""Product quantization: code validity, reconstruction semantics, recall of
the ADC+rerank path against the exact brute-force baseline, and partition-
order independence."""

import math
import random

import pytest

from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.similarity import (
    brute_force_topk,
    pq_encode,
    pq_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    # 120 vectors in 8 dims: 3 well-separated clusters + noise, deterministic
    rng = random.Random(7)
    centers = [[5.0, 0, 0, 0, 0, 0, 0, 0],
               [0, 0, 5.0, 0, 0, 0, 0, 0],
               [0, 0, 0, 0, 0, 5.0, 0, 0]]
    rows = []
    for i in range(120):
        c = centers[i % 3]
        rows.append((i, [c[d] + rng.gauss(0, 0.5) for d in range(8)], i % 3))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(4)


def test_pq_encode_codes_valid(emb):
    out = pq_encode(emb, m=4, n_codes=8, dim=8).collect()
    assert len(out) == 120
    for r in out:
        assert len(r.codes) == 4
        assert all(1 <= c <= 8 for c in r.codes)


def test_pq_encode_codebook_vectors_encode_to_themselves(emb):
    # each of the first 8 vectors (the codebook seeds) must pick its own
    # subvector (distance 0) in every subspace
    seeds = {r.vec_id for r in emb.orderBy("vec_id").limit(8).collect()}
    coded = {r.vec_id: r.codes for r in pq_encode(emb, m=4, n_codes=8, dim=8).collect()}
    order = sorted(seeds)
    for v in seeds:
        expect = order.index(v) + 1
        assert coded[v] == [expect] * 4, (v, coded[v])


def test_pq_topk_recall_against_exact(emb):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, n_queries=5, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, n_queries=5, k=5, m=4, n_codes=8,
                         shortlist=40, dim=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall
    # rerank is exact cosine, so shared pairs carry identical scores
    ex_scores = {(r.query_id, r.neighbor_id): r.score
                 for r in brute_force_topk(emb, n_queries=5, k=5).collect()}
    ap_scores = {(r.query_id, r.neighbor_id): r.score
                 for r in pq_topk(emb, n_queries=5, k=5, m=4, n_codes=8,
                                  shortlist=40, dim=8).collect()}
    for pair in exact & approx:
        assert math.isclose(ex_scores[pair], ap_scores[pair])


def test_pq_partition_order_independent(emb):
    a = pq_topk(emb.repartition(1), n_queries=3, k=3, m=4, n_codes=8,
                shortlist=20, dim=8).collect()
    b = pq_topk(emb.repartition(16, "label"), n_queries=3, k=3, m=4, n_codes=8,
                shortlist=20, dim=8).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pq_rejects_nondividing_m(emb):
    with pytest.raises(ValueError):
        pq_encode(emb, m=3, n_codes=8, dim=8)
