"""RESTORE-to-version and DEEP CLONE (table.restore_table / clone_table):
metadata-only rollback that preserves history, and physically independent
snapshots."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
    log_versions,
    vacuum,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    clone_table,
    decode_table,
    delete_where,
    encode_table,
    restore_table,
)


def _mk(spark, out, n=3000):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("int").alias("g"),
        (F.col("id") * 1.0).alias("v"),
    )
    encode_table(df, out, key_cols=["k"], n_parts=3, chunk_rows=512)
    return df


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_restore_undoes_a_delete_and_preserves_history(spark, tmp_path):
    out = str(tmp_path / "tbl")
    df = _mk(spark, out)
    before = _rows(decode_table(spark, out))
    delete_where(spark, out, F.col("g") == 3, condition_cols=["g"])
    assert decode_table(spark, out).count() < len(before)

    res = restore_table(out, 0)
    assert res["files_readded"] > 0 and res["files_removed"] > 0
    assert _rows(decode_table(spark, out)) == before
    # intermediate (post-delete) version still time-travels
    assert decode_table(spark, out, as_of=1).filter(F.col("g") == 3).count() == 0
    # restoring to the post-delete version works too (restore the restore)
    restore_table(out, 1)
    assert decode_table(spark, out).filter(F.col("g") == 3).count() == 0
    # restoring to the current state is a no-op
    assert restore_table(out, len(log_versions(out)) - 1)["log"] is None


def test_restore_refuses_after_vacuum(spark, tmp_path):
    out = str(tmp_path / "tbl")
    _mk(spark, out)
    delete_where(spark, out, F.col("g") == 0, condition_cols=["g"])
    vacuum(out, min_age_sec=0.0)  # reclaims the pre-delete files
    with pytest.raises(ValueError, match="vacuumed"):
        restore_table(out, 0)


def test_clone_is_physically_independent(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = _mk(spark, src)
    delete_where(spark, src, F.col("g") == 5, condition_cols=["g"])

    res = clone_table(src, dst, as_of=0)  # snapshot the PRE-delete version
    assert res["files_cloned"] == 3
    assert _rows(decode_table(spark, dst)) == _rows(df)
    # mutating the clone leaves the source alone (and vice versa)
    delete_where(spark, dst, F.col("g") == 1, condition_cols=["g"])
    assert decode_table(spark, src).filter(F.col("g") == 1).count() > 0
    assert decode_table(spark, src).filter(F.col("g") == 5).count() == 0
    # cloning onto an existing table refuses
    with pytest.raises(ValueError, match="already has a table"):
        clone_table(src, dst)
