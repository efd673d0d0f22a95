"""Structured Streaming tests: foreachBatch encode with availableNow, and the
watermarked windowed aggregation (SURVEY.md Part B streaming row)."""

import os

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.decode import (
    decode_tokens,
    verify_roundtrip,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.sources.tokens import synthesize_tokens
from pandora_apache_avro_idl_to_apache_parquet_spark.streaming.pipeline import (
    decoded_batches_dir,
    encode_stream,
    read_token_stream,
    token_window_counts,
)

N = 800


def test_encode_stream_available_now(spark, tmp_path):
    src_dir = str(tmp_path / "drops")
    out_dir = str(tmp_path / "enc")
    ckpt = str(tmp_path / "ckpt")
    # two file drops -> at least one micro-batch each with maxFilesPerTrigger=1
    df = synthesize_tokens(spark, N, seed=42).cache()
    df.filter(F.crc32(F.col("doc_id")) % 2 == 0).write.parquet(src_dir)
    df.filter(F.crc32(F.col("doc_id")) % 2 == 1).write.mode("append").parquet(src_dir)

    stream = read_token_stream(spark, src_dir, max_files_per_trigger=1)
    q = encode_stream(stream, out_dir, ckpt, n_parts=4, available_now=True)
    q.awaitTermination(120)

    batches = decoded_batches_dir(out_dir)
    assert batches, "no batch outputs written"
    decoded = None
    for b in batches:
        d = decode_tokens(spark, b)
        decoded = d if decoded is None else decoded.union(d)
    assert decoded.count() == N
    assert verify_roundtrip(df, decoded).count() == 0
    df.unpersist()


def test_encode_table_stream_available_now(spark, tmp_path):
    """Generic-table streaming encode: typed micro-batches (long/double/
    string/timestamp/nullable) land as per-batch encoded dirs that decode
    back to exactly the union of the drops."""
    import pandas as pd

    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import decode_table
    from pandora_apache_avro_idl_to_apache_parquet_spark.streaming.pipeline import (
        encode_table_stream,
    )

    src_dir = str(tmp_path / "tdrops")
    out_dir = str(tmp_path / "tenc")
    ckpt = str(tmp_path / "tckpt")
    df = spark.range(0, 400).selectExpr(
        "id AS k", "cast(id % 9 as double) AS v",
        "concat('s', id % 4) AS s",
        "timestamp_ntz'2026-01-01' + make_interval(0,0,0,0,0,0,id) AS ts",
        "nullif(cast(id % 3 as int), 0) AS maybe",
    ).cache()
    df.filter("k % 2 = 0").write.parquet(src_dir)
    df.filter("k % 2 = 1").write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1).parquet(src_dir)
    q = encode_table_stream(stream, out_dir, ckpt, key_cols=["k"],
                            n_parts=2, available_now=True)
    q.awaitTermination(120)

    batches = decoded_batches_dir(out_dir)
    assert batches, "no batch outputs written"
    decoded = None
    for b in batches:
        d = decode_table(spark, b)
        decoded = d if decoded is None else decoded.union(d)
    a = df.toPandas().sort_values("k", ignore_index=True)
    b = decoded.toPandas().sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)
    df.unpersist()


def test_token_window_counts_batch_semantics(spark):
    # windowed agg is testable in batch mode (same plan, no trigger)
    df = synthesize_tokens(spark, 200, seed=7).withColumn(
        "event_time",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(mins=(F.crc32("doc_id") % 180).cast("int")),
    )
    out = token_window_counts(df, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == 200
    starts = {r["window_start"].minute for r in rows}
    assert starts == {0}  # tumbling windows aligned to the hour
    spans = {(r["window_end"] - r["window_start"]).total_seconds() for r in rows}
    assert spans == {3600.0}


def test_dedup_stream_collapses_duplicates(spark, tmp_path):
    from pandora_apache_avro_idl_to_apache_parquet_spark.streaming.pipeline import (
        dedup_stream,
    )

    src = str(tmp_path / "src")
    rows = [(1, "click", "2026-01-01 00:00:01"),
            (1, "click", "2026-01-01 00:05:00"),  # dup key within watermark
            (1, "view", "2026-01-01 00:00:02"),
            (2, "click", "2026-01-01 00:00:03"),
            (2, "click", "2026-01-01 00:00:03")]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
        .withColumn("ts", F.to_timestamp("ts").cast("timestamp_ntz"))
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    name = "dedup_stream_test_sink"
    q = (dedup_stream(stream, ["user_id", "event_type"])
         .writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.user_id, r.event_type)
                 for r in spark.table(name).select("user_id", "event_type").collect())
    assert got == [(1, "click"), (1, "view"), (2, "click")]
