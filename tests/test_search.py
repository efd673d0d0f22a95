"""Search / ranking operators (operators/search.py) and blocked fuzzy dedup.

Properties a 100-TB run depends on: two-phase grouped top-k must equal the
single-window definition under any sharding, BM25 must be partition-invariant
and rank higher-tf docs first, and the fuzzy blocker must meet the exact
within-block edit-distance definition.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
    fuzzy_levenshtein_pairs,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.search import (
    bm25_topk,
    grouped_topk,
    postings,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark merge join", "s0"),
        (2, "spark spark spark merge", "s0"),
        (3, "table scan filter row batch window hash", "s1"),
        (4, "vector vector query", "s1"),
        (5, "the a of and to is in it", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_postings_tf_and_dl(docs):
    rows = {
        (r.term, r.doc_id): (r.tf, r.dl)
        for r in postings(docs, terms=["spark", "vector"]).collect()
    }
    assert rows[("spark", 1)] == (1, 3)
    assert rows[("spark", 2)] == (3, 4)
    assert rows[("vector", 4)] == (2, 3)
    assert ("the", 5) not in rows  # term filter applied


def test_bm25_prefers_higher_tf(docs):
    out = bm25_topk(docs, ["spark"], k=3).collect()
    assert [r.doc_id for r in out][0] == 2  # tf=3 beats tf=1
    assert all(out[i].bm25 >= out[i + 1].bm25 for i in range(len(out) - 1))


def test_bm25_partition_invariant(docs):
    a = [(r.doc_id, r.bm25) for r in bm25_topk(docs, ["spark", "vector"], k=5).collect()]
    b = [
        (r.doc_id, r.bm25)
        for r in bm25_topk(docs.repartition(7), ["spark", "vector"], k=5).collect()
    ]
    assert a == b and len(a) == 3  # only docs containing a query term score


def test_grouped_topk_matches_single_window(spark):
    rows = [(i, f"g{i % 3}", (i * 37) % 101) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v int")
    got = {
        (r.g, r.id, r.rnk)
        for r in grouped_topk(df, "g", "v", 5, "id", shards=4).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), "id")
    want = {
        (r.g, r.id, r.rnk)
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    assert got == want and len(want) == 15


def test_grouped_topk_small_groups(spark):
    df = spark.createDataFrame([(1, "g", 9)], "id long, g string, v int")
    out = grouped_topk(df, "g", "v", 3, "id").collect()
    assert [(r.id, r.rnk) for r in out] == [(1, 1)]


def test_fuzzy_pairs_within_block_only(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base + " x"),           # 2 edits from base, same prefix+bucket
        (3, "totally different prefix text here that shares nothing at all"),
        (4, base.replace("kappa", "kappz")),  # 1 edit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.dist
        for r in fuzzy_levenshtein_pairs(df, max_dist=5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 2
    assert (1, 4) in pairs and pairs[(1, 4)] == 1
    assert all(3 not in p for p in pairs)


def test_fuzzy_block_cap_drops_boilerplate(spark):
    rows = [(i, "same prefix boilerplate text shared by every doc") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert fuzzy_levenshtein_pairs(df, max_block=10).count() == 0
    assert fuzzy_levenshtein_pairs(df, max_block=100).count() == 30 * 29 // 2


def test_frame_sample_offsets_and_short_payloads(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.multimodal import (
        documents_as_media, frame_sample,
    )

    long_text = "".join(chr(ord("a") + (i % 26)) for i in range(96 + 32))
    rows = [(1, long_text, "en", "s", len(long_text)), (2, "tiny", "en", "s", 4)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {
        (r.media_id, r.frame_idx): (r.off, r.frame_text)
        for r in frame_sample(documents_as_media(docs), n_frames=4, width=32).collect()
    }
    assert len(out) == 8
    # stride = (128 - 32) // 3 = 32: frames tile the payload exactly
    for i in range(4):
        off, txt = out[(1, i)]
        assert off == 32 * i and txt == long_text[off:off + 32]
    # short payload: all frames are the whole payload at offset 0
    assert all(out[(2, i)] == (0, "tiny") for i in range(4))
