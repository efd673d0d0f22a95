"""Concurrent committers: two encode runs racing into ONE table dir must
both land (optimistic index retry on the exclusive-create commit log —
A29's upload-with-overwrite=false contract under a real race, not just the
injected-collision adapter test)."""

import threading

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
    log_versions,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    decode_table,
    encode_table,
)


def test_two_racing_appends_both_commit(spark, tmp_path):
    out = str(tmp_path / "tbl")
    lo = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    hi = spark.range(4000, 8000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # seed the dir (schema sidecar) so the racers contend only on the log
    encode_table(lo.limit(0), out, key_cols=["k"], n_parts=1, run="seed")

    errs: list[Exception] = []

    def run(df, run_id):
        try:
            encode_table(df, out, key_cols=["k"], n_parts=4,
                         chunk_rows=512, run=run_id)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    t1 = threading.Thread(target=run, args=(lo, "ra"))
    t2 = threading.Thread(target=run, args=(hi, "rb"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    # every row from both racers is present exactly once
    dec = decode_table(spark, out)
    assert dec.count() == 8000
    assert dec.select(F.count_distinct("k")).collect()[0][0] == 8000
    assert dec.agg(F.sum("v")).collect()[0][0] == sum(i * 2 for i in range(8000))
    # exactly-once adds: every published file appears in the log ONCE.
    # (One entry total is legal — the marker-gated commit of whichever racer
    # reaches the log first sweeps up every completed, uncommitted file, and
    # the loser then finds nothing new to add.)
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
        read_commit_log,
    )

    adds = [e["add"]["path"] for e in read_commit_log(out) if "add" in e]
    assert len(adds) == len(set(adds)) == 8  # 4 parts per racer, no double-add
    assert len(log_versions(out)) >= 1
