"""pandora_table DataSource write path (df.write.format) and streaming source
(spark.readStream.format): atomic commit, append/overwrite modes, schema
evolution through the writer, exactly-once log tailing, compaction skip."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.encode import (
    committed_files,
    log_versions,
    read_commit_log,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.operators.table import (
    compact_table,
    decode_table,
)
from pandora_apache_avro_idl_to_apache_parquet_spark.sources.table_source import (
    stream_encoded_table,
    write_encoded_table,
)


def _mkdir(prefix="tbl_dsw_"):
    out = tempfile.mkdtemp(prefix=prefix)
    shutil.rmtree(out)
    return out


@pytest.fixture()
def out_dir():
    out = _mkdir()
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("tag"),
    )


def test_write_roundtrip_and_atomic_commit(spark, out_dir):
    df = _df(spark, 0, 5000).repartition(4)
    write_encoded_table(df, out_dir, key_cols=["id"])
    got = decode_table(spark, out_dir).orderBy("id")
    assert got.collect() == _df(spark, 0, 5000).orderBy("id").collect()
    # exactly one log entry, adds only, carrying size+sha per file
    assert log_versions(out_dir) == [0]
    adds = [e["add"] for e in read_commit_log(out_dir) if "add" in e]
    assert len(adds) == 4
    assert all(a["size"] > 0 and len(a["sha256"]) == 64 for a in adds)


def test_write_append_then_overwrite(spark, out_dir):
    write_encoded_table(_df(spark, 0, 100).repartition(2), out_dir,
                        key_cols=["id"])
    write_encoded_table(_df(spark, 100, 200).repartition(2), out_dir)
    assert decode_table(spark, out_dir).count() == 200

    write_encoded_table(_df(spark, 500, 550).repartition(2), out_dir,
                        mode="overwrite")
    dec = decode_table(spark, out_dir)
    assert dec.count() == 50
    assert dec.agg(F.min("id"), F.max("id")).collect()[0][0:2] == (500, 549)
    # old versions remain time-travelable until vacuum
    v0 = log_versions(out_dir)[0]
    assert decode_table(spark, out_dir, as_of=v0).count() == 100
    # overwrite's removes made the old files dead, not deleted
    assert len(committed_files(out_dir)) == 2


def test_write_empty_partitions_and_evolution(spark, out_dir):
    # 2 rows across 8 partitions: empty tasks must commit cleanly
    write_encoded_table(_df(spark, 0, 2).repartition(8), out_dir,
                        key_cols=["id"])
    assert decode_table(spark, out_dir).count() == 2
    files0 = committed_files(out_dir)
    assert 1 <= len(files0) <= 2  # only non-empty tasks published files

    # append an evolved schema (nullable add) through the writer
    ev = _df(spark, 2, 4).withColumn(
        "extra", F.expr("nullif(id * 1.5, -1.0)")).repartition(2)  # nullable
    write_encoded_table(ev, out_dir)
    dec = decode_table(spark, out_dir)
    assert dec.count() == 4
    assert dec.where("extra IS NULL").count() == 2  # pre-evolution rows

    # incompatible evolution is refused driver-side
    with pytest.raises(Exception, match="append-only|type change"):
        write_encoded_table(
            spark.range(4, 6).select(F.col("id")), out_dir)


def test_write_requires_key_cols_first(spark, out_dir):
    with pytest.raises(Exception, match="key_cols"):
        write_encoded_table(_df(spark, 0, 10), out_dir)


def _drain_to_parquet(spark, out_dir, ckpt, sink):
    """Run the tail until caught up, restartable on the SAME checkpoint."""
    q = (stream_encoded_table(spark, out_dir)
         .writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(sink)


def test_stream_tails_appends_exactly_once(spark, out_dir):
    write_encoded_table(_df(spark, 0, 300).repartition(2), out_dir,
                        key_cols=["id"])
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    sink = tempfile.mkdtemp(prefix="sink_")

    first = _drain_to_parquet(spark, out_dir, ckpt, sink)
    assert first.count() == 300
    assert first.agg(F.max("id")).collect()[0][0] == 299

    # append more; the restarted stream on the SAME checkpoint adds ONLY the
    # new rows to the sink (exactly-once tailing)
    write_encoded_table(_df(spark, 300, 450).repartition(2), out_dir)
    both = _drain_to_parquet(spark, out_dir, ckpt, sink)
    assert both.count() == 450
    assert both.select("id").distinct().count() == 450


def test_stream_skips_compaction_rewrites(spark, out_dir):
    write_encoded_table(_df(spark, 0, 50).repartition(2), out_dir,
                        key_cols=["id"])
    write_encoded_table(_df(spark, 50, 100).repartition(2), out_dir)
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    sink = tempfile.mkdtemp(prefix="sink_")
    assert _drain_to_parquet(spark, out_dir, ckpt, sink).count() == 100

    # compaction rewrites files with dataChange=false: nothing new to stream
    stats = compact_table(out_dir)
    assert stats["files_before"] > stats["files_after"]
    assert _drain_to_parquet(spark, out_dir, ckpt, sink).count() == 100

    # but a genuine append after compaction still arrives, exactly once
    write_encoded_table(_df(spark, 100, 120).repartition(1), out_dir)
    final = _drain_to_parquet(spark, out_dir, ckpt, sink)
    assert final.count() == 120
    assert final.select("id").distinct().count() == 120
