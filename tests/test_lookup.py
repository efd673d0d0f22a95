"""Selective decode (zone-map chunk pruning) tests."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.decode import lookup_docs
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
    encode_tokens,
    read_manifest,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.sources.tokens import synthesize_tokens


@pytest.fixture(scope="module")
def encoded(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lk"))
    df = synthesize_tokens(spark, 2000, seed=42).cache()
    encode_tokens(df, out, n_parts=16)
    return out, df


def test_lookup_returns_exact_rows(spark, encoded):
    out, df = encoded
    want = [r["doc_id"] for r in df.orderBy("doc_id").limit(5).collect()]
    got = lookup_docs(spark, out, want).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(want)
    src = {r["doc_id"]: r["tokens"] for r in df.filter(F.col("doc_id").isin(want)).collect()}
    for r in got:
        assert r["tokens"] == src[r["doc_id"]]


def test_lookup_prunes_chunks(spark, encoded):
    out, df = encoded
    m = read_manifest(spark, out)
    n_chunks = m.count()
    one = df.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    surviving = m.filter(
        (F.lit(one) >= F.col("doc_id_min")) & (F.lit(one) <= F.col("doc_id_max"))
    ).count()
    assert surviving < n_chunks, "zone map pruned nothing"
    assert lookup_docs(spark, out, [one]).count() == 1


def test_lookup_missing_doc_is_empty(spark, encoded):
    out, _ = encoded
    assert lookup_docs(spark, out, ["zzz-does-not-exist"]).count() == 0
