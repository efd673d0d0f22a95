"""Stateful streaming sessionization (streaming/stateful.py):
applyInPandasWithState with event-time timeouts. Sessions must close
exactly once, via BOTH paths — a later in-stream event past the gap
(data-split) and the watermark passing last+gap (timeout)."""

import datetime as dt

from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.streaming.stateful import (
    sessionize_stream,
)

T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def _mins(m: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


def _run(spark, tmp_path, drops, gap_sec=1800, watermark="1 hour"):
    """Write each drop as one parquet file, stream with one-file batches."""
    src = str(tmp_path / "events")
    for i, rows in enumerate(drops):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = sessionize_stream(stream, gap_sec=gap_sec, watermark=watermark)
    name = f"sessions_{abs(hash(str(tmp_path))) % 10**8}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(name).collect()
    }


def test_data_split_and_timeout_paths(spark, tmp_path):
    drops = [
        # batch 1: user 1 opens a session (2 events), user 2 opens one
        [(1, _mins(0)), (1, _mins(10)), (2, _mins(5))],
        # batch 2: user 1 returns past the gap -> data-split closes session;
        # also advances the watermark to 11:00 (12:00 - 1h)
        [(1, _mins(120))],
        # batch 3: far-future sentinel fires user 2's (and nobody else's
        # emitted-twice) event-time timeout: 10:05+30min < 11:00 watermark
        [(99, _mins(600))],
    ]
    got = _run(spark, tmp_path, drops)
    # availableNow runs a final watermark-only batch, so user 1's 12:00
    # session times out too (12:30 < the sentinel-advanced 19:00 watermark);
    # the sentinel's own session (timeout 20:30) stays open.
    assert got == {
        (1, _mins(0), _mins(10), 2),     # closed by data-split in batch 2
        (2, _mins(5), _mins(5), 1),      # closed by timeout in batch 3
        (1, _mins(120), _mins(120), 1),  # closed by final-batch timeout
    }


def test_cross_batch_session_merges(spark, tmp_path):
    drops = [
        [(7, _mins(0)), (7, _mins(10))],
        [(7, _mins(20))],              # within gap: extends, not a new session
        [(7, _mins(120))],             # past gap: closes the merged session
        [(99, _mins(600))],
    ]
    got = _run(spark, tmp_path, drops)
    # the merged 3-event session closed once (data-split); its timeout must
    # NOT re-fire it. The 12:00 session closes via the final-batch timeout.
    u7 = sorted(g for g in got if g[0] == 7)
    assert u7 == [
        (7, _mins(0), _mins(20), 3),
        (7, _mins(120), _mins(120), 1),
    ]


def test_multiple_sessions_in_one_batch(spark, tmp_path):
    drops = [
        [(3, _mins(0)), (3, _mins(40)), (3, _mins(41)), (3, _mins(90))],
        [(99, _mins(600))],
    ]
    got = _run(spark, tmp_path, drops)
    u3 = sorted(g for g in got if g[0] == 3)
    # three sessions; first two close by in-batch split, third by timeout
    assert u3 == [
        (3, _mins(0), _mins(0), 1),
        (3, _mins(40), _mins(41), 2),
        (3, _mins(90), _mins(90), 1),
    ]


def test_state_scales_with_users_not_events(spark, tmp_path):
    """The streaming query's state rows == live users, not events —
    the bound that makes this runnable on an unbounded stream."""
    many = [(u, _mins(u % 5)) for u in range(50)]
    got = _run(spark, tmp_path, [many, [(99, _mins(600))]])
    # all 50 user sessions time out at the sentinel batch
    assert len(got) == 50
