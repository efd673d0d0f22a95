"""recluster_table: physical re-layout (OPTIMIZE/CLUSTER BY analog) must be
row-preserving and atomic, must make zone maps on the cluster columns tight
(real pruning), and must keep key-range pruning CORRECT even though chunks
are no longer key-sorted."""

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
    committed_files,
    log_versions,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    column_range_filter,
    decode_table,
    delete_where,
    encode_table,
    lookup_key_range,
    read_table_chunks,
    recluster_table,
)


@pytest.fixture(scope="module")
def tbl(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("recl") / "tbl")
    df = spark.range(20000).select(
        F.col("id").alias("k"),
        # value uncorrelated with the key: every key-sorted chunk spans
        # nearly the full value range, so pre-recluster pruning is useless
        ((F.col("id") * 2654435761) % 10000).cast("long").alias("v"),
        (F.col("id") % 13).cast("int").alias("grp"),
    )
    encode_table(df, out, key_cols=["k"], n_parts=4, chunk_rows=1024)
    return out, df


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_recluster_preserves_rows_and_is_atomic(spark, tbl):
    out, df = tbl
    before = _rows(decode_table(spark, out))
    res = recluster_table(spark, out, ["v", "k"], n_parts=4, chunk_rows=1024)
    assert res["files_before"] == 4 and res["files_after"] == res["buckets"]
    assert len(log_versions(out)) == 2
    assert _rows(decode_table(spark, out)) == before
    # time travel still sees the pre-recluster layout's identical rows
    assert _rows(decode_table(spark, out, as_of=0)) == before
    # old files are fully swapped out of the live set
    assert all(f.startswith("part-rc") for f in committed_files(out))


def test_recluster_tightens_value_zone_maps(spark, tbl):
    out, _ = tbl
    pred = column_range_filter("v", 1000, 1500)
    chunks = read_table_chunks(spark, out)
    total = chunks.count()
    surviving = chunks.filter(pred).count()
    # clustered on v: only ~5% of chunks overlap a 5% value range
    assert surviving <= max(2, total // 10)
    # pre-recluster layout (as_of=0) pruned nothing on v
    old = read_table_chunks(spark, out, as_of=0)
    assert old.filter(pred).count() == old.count()
    # and the pruned decode is exact
    got = (
        decode_table(spark, out, chunk_filter=pred)
        .filter(F.col("v").between(1000, 1500)).count()
    )
    assert got == decode_table(spark, out).filter(
        F.col("v").between(1000, 1500)).count()


def test_key_range_pruning_stays_correct_after_recluster(spark, tbl):
    out, df = tbl
    got = _rows(lookup_key_range(spark, out, 5000, 5100))
    want = _rows(df.filter(F.col("k").between(5000, 5100)))
    assert got == want


def test_dml_still_works_on_reclustered_table(spark, tbl):
    out, _ = tbl
    n_before = decode_table(spark, out).count()
    res = delete_where(spark, out, F.col("grp") == 3, condition_cols=["grp"])
    assert res["rows_deleted"] > 0
    dec = decode_table(spark, out)
    assert dec.filter(F.col("grp") == 3).count() == 0
    assert dec.count() == n_before - res["rows_deleted"]


def test_recluster_validates_columns(spark, tbl):
    out, _ = tbl
    with pytest.raises(ValueError):
        recluster_table(spark, out, ["nope"])
    with pytest.raises(ValueError):
        recluster_table(spark, out, [])
