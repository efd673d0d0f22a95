"""Integrity + constraint audits (table.check_table_integrity /
validate_table): a healthy store audits clean, a flipped payload byte is
pinpointed to its chunk, and constraint counts are exact."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    check_table_integrity,
    encode_table,
    validate_table,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    out = str(tmp_path / "tbl")
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 40).cast("int").alias("dup"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 1.0)
        .alias("v"),
    )
    encode_table(df, out, key_cols=["k"], n_parts=2, chunk_rows=256)
    return out


def test_clean_table_audits_clean(spark, tbl):
    assert check_table_integrity(spark, tbl).count() == 0


def test_flipped_payload_byte_is_pinpointed(spark, tbl):
    import glob
    import os

    f = sorted(glob.glob(os.path.join(tbl, "data", "*.parquet")))[0]
    t = pq.read_table(f)
    col = t.column("v__payload").to_pylist()
    corrupted = bytearray(col[2])
    corrupted[len(corrupted) // 2] ^= 0xFF
    col[2] = bytes(corrupted)
    t = t.set_column(
        t.column_names.index("v__payload"), "v__payload",
        pa.array(col, type=pa.binary()),
    )
    pq.write_table(t, f)

    bad = check_table_integrity(spark, tbl).collect()
    assert len(bad) == 1
    assert bad[0].chunk_seq == 2 and "sha mismatch" in bad[0].reason


def test_constraint_counts_exact(spark, tbl):
    out = {
        r.constraint: r.n_bad
        for r in validate_table(
            spark, tbl,
            unique=["dup"],
            not_null=["k", "v"],
            checks={"k_small": F.col("k") < 1500},
            check_cols=["k"],
        ).collect()
    }
    assert out["not_null(k)"] == 0
    assert out["not_null(v)"] == 200
    # 40 distinct dup values over 2000 rows: surplus = 2000 - 40
    assert out["unique(dup)"] == 1960
    assert out["check(k_small)"] == 500


def test_validate_requires_a_constraint(spark, tbl):
    with pytest.raises(ValueError):
        validate_table(spark, tbl)
