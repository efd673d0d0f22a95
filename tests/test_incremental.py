"""Incremental view maintenance (operators/incremental.py): the maintained
SUM/COUNT state after applying the signed change feed must equal a direct
recomputation over the final table — through updates, deletes, appends, and
group birth/death."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
    log_versions,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.incremental import (
    aggregate_state,
    incremental_sum,
    merge_state,
    signed_delta,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    decode_table,
    delete_where,
    encode_table,
    update_where,
)


def _mk(spark, out, n=4000):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
        (F.col("id") * 1.0).alias("amt"),
    )
    encode_table(df, out, key_cols=["k"], n_parts=4, chunk_rows=512)
    return df


def _state(df):
    return {
        r.grp: (round(r.sum_amt, 6), r.n_rows)
        for r in df.collect()
    }


def test_merge_state_algebra(spark):
    base = spark.createDataFrame(
        [(0, 10.0, 2), (1, 5.0, 1)], "grp int, sum_amt double, n_rows long"
    )
    diff = spark.createDataFrame(
        [(0, 3.0, "insert"), (1, 5.0, "delete"), (2, 7.0, "insert")],
        "grp int, amt double, _change_type string",
    )
    out = _state(merge_state(base, signed_delta(diff, ["grp"], ["amt"]),
                             ["grp"], ["amt"]))
    # group 0 grows, group 1 dies (n_rows hits 0), group 2 is born
    assert out == {0: (13.0, 3), 2: (7.0, 1)}


def test_incremental_equals_recompute_through_update_and_delete(spark, tmp_path):
    out = str(tmp_path / "tbl")
    _mk(spark, out)
    update_where(spark, out, F.col("grp") == 2,
                 {"amt": F.col("amt") + 100.0}, condition_cols=["grp"])
    delete_where(spark, out, F.col("grp") == 4, condition_cols=["grp"])
    assert len(log_versions(out)) == 3

    inc = _state(incremental_sum(spark, out, ["grp"], ["amt"], from_version=0))
    direct = _state(aggregate_state(decode_table(spark, out), ["grp"], ["amt"]))
    assert inc == direct
    assert 4 not in inc and len(inc) == 4  # deleted group is gone


def test_incremental_window_between_versions(spark, tmp_path):
    out = str(tmp_path / "tbl")
    _mk(spark, out)
    update_where(spark, out, F.col("grp") == 0,
                 {"amt": F.col("amt") * 2}, condition_cols=["grp"])
    delete_where(spark, out, F.col("k") < 100, condition_cols=["k"])
    # maintain from v1 (post-update) to v2 (post-delete) only
    inc = _state(incremental_sum(spark, out, ["grp"], ["amt"],
                                 from_version=1, to_version=2))
    direct = _state(aggregate_state(
        decode_table(spark, out, as_of=2), ["grp"], ["amt"]))
    assert inc == direct
