"""Sequence packing (operators/packing.py): coverage invariants a training
loader depends on — every token placed exactly once, sequences full except
the final ragged one, long docs spanning, determinism across partitionings."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.packing import (
    global_token_offsets,
    pack_sequences,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.sampling import (
    quota_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    # lengths 0..120: includes empty docs and docs longer than seq_len=64
    rows = [(f"d{i:03d}", (i * 37) % 121) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id string, n_tok int")


def test_offsets_are_exclusive_prefix_sums(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 7)], "doc_id string, n_tok int"
    )
    got = {
        r.doc_id: r.offset
        for r in global_token_offsets(df, seed=None).select("doc_id", "offset").collect()
    }
    assert got == {"a": 0, "b": 5, "c": 8}  # key order, exclusive


def test_pack_covers_every_token_exactly_once(docs):
    m = pack_sequences(docs, seq_len=64, seed=7)
    total = docs.where("n_tok >= 1").agg(F.sum("n_tok")).collect()[0][0]
    assert m.agg(F.sum("slice_len")).collect()[0][0] == total
    # per-doc: slices are disjoint, contiguous, and cover 0..n_tok
    per_doc = (
        m.groupBy("doc_id")
        .agg(F.sum("slice_len").alias("s"), F.min("doc_begin").alias("b"))
        .join(docs, "doc_id")
        .where((F.col("s") != F.col("n_tok")) | (F.col("b") != 0))
    )
    assert per_doc.count() == 0


def test_pack_sequences_full_except_last(docs):
    m = pack_sequences(docs, seq_len=64, seed=7)
    per_seq = m.groupBy("seq_id").agg(F.sum("slice_len").alias("s")).collect()
    last = max(r.seq_id for r in per_seq)
    for r in per_seq:
        assert r.s == 64 or r.seq_id == last
    # dense sequence ids from 0
    assert sorted(r.seq_id for r in per_seq) == list(range(last + 1))


def test_pack_long_doc_spans_multiple_sequences(spark):
    df = spark.createDataFrame([("big", 150)], "doc_id string, n_tok int")
    rows = sorted(
        pack_sequences(df, seq_len=64).collect(), key=lambda r: r.seq_id
    )
    assert [(r.doc_begin, r.slice_len, r.seq_begin) for r in rows] == [
        (0, 64, 0), (64, 64, 0), (128, 22, 0)
    ]


def test_pack_partition_invariant(docs):
    key = ["doc_id", "seq_id"]
    a = sorted(map(tuple, pack_sequences(docs, 64, seed=3).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), 64, seed=3).collect()))
    assert a == b


def test_pack_no_single_partition_window(docs):
    plan = (
        pack_sequences(docs, 64, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_pack_rejects_bad_seq_len(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)


def test_quota_sample_caps_and_is_monotone(spark):
    rows = [(f"k{i:03d}", ["a", "b"][i % 2]) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    k5 = {r.doc_id for r in quota_sample(df, "source", "doc_id", 5, seed=2).collect()}
    k9 = {r.doc_id for r in quota_sample(df, "source", "doc_id", 9, seed=2).collect()}
    assert len(k5) == 10 and len(k9) == 18
    assert k5 < k9  # larger quota keeps a strict superset
    assert quota_sample(df, "source", "doc_id", 0).count() == 0
    with pytest.raises(ValueError):
        quota_sample(df, "source", "doc_id", -1)
