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


# ------------------------------------------------------ per-chunk bloom


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        encode_table,
    )

    out = str(tmp_path_factory.mktemp("bloomtab"))
    df = spark.range(20000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7919 % 100000).alias("pk"),
        F.concat(F.lit("u"), (F.col("id") % 5000).cast("string")).alias("user"),
    )
    encode_table(df, out, key_cols=["k"], n_parts=4, chunk_rows=1024,
                 bloom_cols=["pk", "user"])
    return out, df


def test_bloom_lookup_exact_rows_with_pruning(spark, bloom_table):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        bloom_value_predicate,
        lookup_value,
        read_table_chunks,
    )

    out, df = bloom_table
    probe = 3 * 7919 % 100000
    rows = lookup_value(spark, out, "pk", probe).collect()
    want = sorted(map(tuple, df.filter(F.col("pk") == probe).collect()))
    assert sorted(map(tuple, rows)) == want

    chunks = read_table_chunks(spark, out)
    total = chunks.count()
    surv = chunks.filter(bloom_value_predicate("pk", probe)).count()
    # pk is unsorted: zone maps prune ~nothing, the bloom must (1024 values
    # in 4096 bits -> FP ~15%, so the survivor set stays a small fraction)
    assert total == 20 and surv <= total // 2, (total, surv)


def test_bloom_lookup_absent_value_and_string_column(spark, bloom_table):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        lookup_value,
    )

    out, df = bloom_table
    assert lookup_value(spark, out, "pk", 99999999).count() == 0
    got = lookup_value(spark, out, "user", "u123").count()
    assert got == df.filter(F.col("user") == "u123").count() == 4


def test_bloom_cols_validation_and_immutability(spark, tmp_path):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
        encode_table,
    )

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 0.5).alias("x")
    )
    with pytest.raises(ValueError, match="bloom column"):
        encode_table(df, str(tmp_path / "a"), key_cols=["k"], n_parts=1,
                     bloom_cols=["x"])  # float: no stable canonicalization
    out = str(tmp_path / "b")
    encode_table(df.select("k"), out, key_cols=["k"], n_parts=1,
                 bloom_cols=["k"])
    with pytest.raises(ValueError, match="immutable"):
        encode_table(df.select("k"), out, key_cols=["k"], n_parts=1,
                     bloom_cols=[], run="r1")
