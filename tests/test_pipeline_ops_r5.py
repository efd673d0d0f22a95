"""Round-5 pipeline operators: substring-level duplicate spans (Lee et al.
exact-substring dedup shape), Gopher repetition filters, and hybrid RRF
retrieval fusion."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.dedup import (
    duplicate_spans,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.search import rrf_fuse
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.text import (
    repetition_stats,
)


def test_duplicate_spans_known_layout(spark):
    docs = spark.createDataFrame([
        # docs 1 and 2 share tokens: positions 2..11 of doc2 equal doc1 0..9
        (1, "a b c d e f g h i j unique1 unique2"),
        (2, "x y a b c d e f g h i j z w"),
        (3, "totally different words with no overlap at all in this one"),
        (4, "x y a b c d e f g h i j z w"),  # exact dup of doc 2
    ], "doc_id long, text string")
    got = {(r.doc_id, r.span_start, r.span_end, r.n_windows)
           for r in duplicate_spans(docs, n=4, min_docs=2).collect()}
    assert got == {
        (1, 0, 10, 7),   # windows 0..6 over the shared 10 tokens
        (2, 0, 14, 11),  # whole doc duplicated with doc 4
        (4, 0, 14, 11),
    }


def test_duplicate_spans_islands_split(spark):
    """Two disjoint duplicated regions in one doc yield two spans."""
    shared1 = "p q r s t"
    shared2 = "u v w x y"
    docs = spark.createDataFrame([
        (1, f"{shared1} GAP1a GAP1b GAP1c {shared2}"),
        (2, f"{shared1} other tail words here"),
        (3, f"lead words {shared2} trailing bits"),
    ], "doc_id long, text string")
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in duplicate_spans(docs, n=5, min_docs=2).collect()}
    assert (1, 0, 5) in spans and (1, 8, 13) in spans
    assert (2, 0, 5) in spans and (3, 2, 7) in spans


def test_repetition_stats_rules(spark):
    docs = spark.createDataFrame([
        (1, "buy now buy now buy now buy now buy now"),
        (2, "a genuinely varied sentence with many different interesting words here"),
        (3, "one"),  # <2 words: filtered (no bigrams exist)
    ], "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].keep == 0 and rows[1].dup_word_frac == 0.8
    assert rows[1].top_2gram_frac == round(5 / 9, 6)
    assert rows[2].keep == 1 and rows[2].dup_word_frac == 0.0


def test_rrf_fuse_math_and_ties(spark):
    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int")
    got = {r.doc_id: (r.rrf, r.n_lists)
           for r in rrf_fuse([lex, sem], k=4).collect()}
    assert got[20] == (round(1 / 62 + 1 / 61, 6), 2)
    assert got[10] == (round(1 / 61 + 1 / 63, 6), 2)
    assert got[30] == (round(1 / 63, 6), 1)
    assert got[40] == (round(1 / 62, 6), 1)
    # both-list docs outrank single-list docs at these depths
    order = [r.doc_id for r in rrf_fuse([lex, sem], k=4).collect()]
    assert set(order[:2]) == {10, 20}
