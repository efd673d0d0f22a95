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


# ---------------------------------------------------------- streaming SINK

def _drops(spark, out, lo, hi, n_files):
    _df(spark, lo, hi).repartition(n_files, "id").write.mode(
        "append"
    ).parquet(out)


def _run_stream_into(spark, drops, store, ckpt, output_mode="append",
                     app_id=None, agg=None):
    from pandora_apache_avro_idl_to_apache_parquet_spark.sources.table_source import (
        stream_write_encoded_table,
    )

    schema = spark.read.parquet(drops).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(drops)
    )
    if agg is not None:
        stream = agg(stream)
    key = ["grp"] if agg is not None else ["id"]
    q = (
        stream_write_encoded_table(
            stream, store, ckpt, key_cols=key, app_id=app_id,
            output_mode=output_mode,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stream_write_exactly_once_and_multi_epoch(spark, out_dir):
    """Each micro-batch is one atomic commit with a txn line; decoded rows
    equal the batch input exactly."""
    drops, store, ckpt = out_dir + "/d", out_dir + "/s", out_dir + "/c"
    _drops(spark, drops, 0, 3000, 3)
    _run_stream_into(spark, drops, store, ckpt)
    assert log_versions(store) == [0, 1, 2]
    got = decode_table(spark, store).orderBy("id")
    assert got.collect() == _df(spark, 0, 3000).orderBy("id").collect()
    txns = [e["txn"] for e in read_commit_log(store) if "txn" in e]
    assert [t["version"] for t in txns] == [0, 1, 2]


def test_stream_write_replay_is_idempotent(spark, out_dir):
    """Restart with a wiped Spark checkpoint replays every epoch from 0; the
    sink's txn gate must drop the duplicate attempts (no extra adds, decoded
    rows unchanged, orphan files reclaimed)."""
    import glob
    import shutil as _sh

    drops, store, ckpt = out_dir + "/d", out_dir + "/s", out_dir + "/c"
    _drops(spark, drops, 0, 2000, 2)
    _run_stream_into(spark, drops, store, ckpt)
    before = decode_table(spark, store).orderBy("id").collect()
    n_files_before = len(committed_files(store))
    # wipe the streaming checkpoint: the replayed run re-sees ALL input
    _sh.rmtree(ckpt)
    _run_stream_into(spark, drops, store, ckpt)
    after = decode_table(spark, store).orderBy("id").collect()
    assert after == before
    assert len(committed_files(store)) == n_files_before
    # replayed attempts' blind-published files were dropped in commit()
    live = set(committed_files(store))
    on_disk = {f.split("/")[-1] for f in glob.glob(store + "/data/*.parquet")}
    assert on_disk == live


def test_stream_write_new_data_after_restart_appends_once(spark, out_dir):
    """Replayed epochs are gated, but genuinely new files after the restart
    still land: versions beyond the recorded txn commit normally."""
    import shutil as _sh

    drops, store, ckpt = out_dir + "/d", out_dir + "/s", out_dir + "/c"
    _drops(spark, drops, 0, 1000, 1)
    _run_stream_into(spark, drops, store, ckpt)
    _sh.rmtree(ckpt)
    _drops(spark, drops, 1000, 1500, 1)
    _run_stream_into(spark, drops, store, ckpt)
    got = decode_table(spark, store).orderBy("id")
    assert got.collect() == _df(spark, 0, 1500).orderBy("id").collect()


def test_stream_write_complete_mode_replaces(spark, out_dir):
    """outputMode('complete') = materialized view in the store: every epoch
    atomically swaps the live file set for the new aggregate."""
    drops, store, ckpt = out_dir + "/d", out_dir + "/s", out_dir + "/c"
    _drops(spark, drops, 0, 3000, 3)

    def agg(stream):
        return stream.groupBy("grp").agg(
            F.count("*").alias("n"), F.sum("id").alias("total")
        )

    _run_stream_into(spark, drops, store, ckpt, output_mode="complete",
                     agg=agg)
    got = {(r.grp, r.n, r.total) for r in decode_table(spark, store).collect()}
    want = {
        (r.grp, r.n, r.total)
        for r in _df(spark, 0, 3000)
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("id").alias("total"))
        .collect()
    }
    assert got == want
    # the final epoch's removes hid every earlier epoch's files
    live = committed_files(store)
    adds_total = sum(1 for e in read_commit_log(store) if "add" in e)
    assert len(live) < adds_total
