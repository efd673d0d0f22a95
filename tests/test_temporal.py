"""Temporal operators (operators/temporal.py): as-of join carry-forward
semantics, range-join boundary/bucket behavior (and that it never plans a
nested-loop join), one-pass multi-granularity rollup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandora_apache_avro_idl_to_apache_parquet_spark.operators.temporal import (
    _interval_us,
    asof_join,
    hypertable_rollup,
    range_join,
)

T0 = dt.datetime(2026, 3, 1, 0, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_backward_with_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, _m(0)), (1, _m(10)), (1, _m(25)), (2, _m(5))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _m(10), "a"), (1, _m(20), "b")], "k int, ts timestamp, v string"
    )
    got = {
        (r.k, r.ts): r.v_asof
        for r in asof_join(left, right, key="k", ts="ts").collect()
    }
    assert got == {
        (1, _m(0)): None,   # before any right row
        (1, _m(10)): "a",   # tie at equal ts matches
        (1, _m(25)): "b",   # latest at-or-before
        (2, _m(5)): None,   # key with no right rows at all
    }


def test_asof_multiple_value_columns_and_row_count(spark):
    left = spark.createDataFrame(
        [(i % 3, _m(i)) for i in range(30)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(0, _m(7), 70, "x"), (1, _m(13), 130, "y")],
        "k int, ts timestamp, a int, b string",
    )
    out = asof_join(left, right, key="k", ts="ts")
    assert out.count() == 30  # exactly one output row per left row
    assert {"a_asof", "b_asof"} <= set(out.columns)


def test_range_join_boundaries_and_bucket_crossing(spark):
    ev = spark.createDataFrame(
        [(1, 1, _m(0)), (2, 1, _m(60)), (3, 1, _m(120)), (4, 1, _m(180))],
        "eid int, k int, ts timestamp",
    )
    # [0:60) and a window crossing several 1-hour buckets [60:181)
    win = spark.createDataFrame(
        [(1, _m(0), _m(60)), (1, _m(60), _m(181))],
        "k int, s timestamp, e timestamp",
    )
    got = sorted(
        (r.eid, r.s)
        for r in range_join(ev, win, key="k", ts="ts", start="s", end="e",
                            bucket="1 hour").collect()
    )
    # eid 2 at t=60 is EXCLUDED from [0,60) and INCLUDED in [60,181)
    assert got == [(1, _m(0)), (2, _m(60)), (3, _m(60)), (4, _m(60))]


def test_range_join_matches_naive_and_avoids_nested_loop(spark):
    ev = spark.createDataFrame(
        [(i, i % 5, _m(i * 7)) for i in range(100)],
        "eid int, k int, ts timestamp",
    )
    win = spark.createDataFrame(
        [(k, _m(k * 30), _m(k * 30 + 200)) for k in range(5)],
        "k int, s timestamp, e timestamp",
    )
    fast = range_join(ev, win, key="k", ts="ts", start="s", end="e",
                      bucket="1 hour")
    naive = ev.join(win, "k").where(
        (F.col("s") <= F.col("ts")) & (F.col("ts") < F.col("e"))
    )
    assert sorted(map(tuple, fast.select("eid", "s").collect())) == sorted(
        map(tuple, naive.select("eid", "s").collect())
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hypertable_rollup_one_pass_two_granularities(spark):
    ev = spark.createDataFrame(
        [("a" if i % 2 else "b", _m(i * 11), float(i)) for i in range(40)],
        "et string, ts timestamp, v double",
    )
    out = hypertable_rollup(
        ev, ts="ts", dims=["et"],
        aggs=["count(*) AS n", "max(v) AS vmax"],
        granularities=["1 hour", "1 day"],
    ).collect()
    hourly = [r for r in out if r.granularity == "1 hour"]
    daily = [r for r in out if r.granularity == "1 day"]
    assert sum(r.n for r in hourly) == 40 and sum(r.n for r in daily) == 40
    assert len(hourly) > len(daily)
    # daily bucket of 2026-03-01 midnight-aligned
    assert all(r.bucket_start.hour == 0 for r in daily)
    # dims survive: both event types present at both granularities
    assert {r.et for r in daily} == {"a", "b"}


def test_hypertable_rejects_variable_units(spark):
    ev = spark.createDataFrame([("a", _m(0), 1.0)], "et string, ts timestamp, v double")
    with pytest.raises(ValueError):
        hypertable_rollup(ev, "ts", ["et"], ["count(*) AS n"], ["1 month"])
    assert _interval_us("2 hours") == 2 * 3_600_000_000


# --------------------------------------------------------------- gap_fill


def test_gap_fill_dense_grid_and_carry_forward(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.temporal import (
        gap_fill,
    )

    rows = [
        ("a", "2024-01-01 10:00:00", 10.0),
        ("a", "2024-01-04 09:00:00", 40.0),
        ("b", "2024-01-03 00:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r.k, str(r.bucket.date())): (r.v_fill, r.n_obs)
        for r in gap_fill(df, "k", "ts", "v", granule="day").collect()
    }
    # dense: 2 keys x 4 global days (01-01 .. 01-04)
    assert len(out) == 8
    assert out[("a", "2024-01-01")] == (10.0, 1)
    assert out[("a", "2024-01-02")] == (10.0, 0)   # carried forward
    assert out[("a", "2024-01-03")] == (10.0, 0)
    assert out[("a", "2024-01-04")] == (40.0, 1)
    assert out[("b", "2024-01-02")] == (None, 0)   # no back-fill
    assert out[("b", "2024-01-03")] == (7.0, 1)
    assert out[("b", "2024-01-04")] == (7.0, 0)


def test_gap_fill_rejects_variable_granules(spark):
    import pytest as _pytest

    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.temporal import (
        gap_fill,
    )

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0)], "k string, ts string, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    with _pytest.raises(ValueError):
        gap_fill(df, "k", "ts", "v", granule="month")


def test_asof_forward_direction(spark):
    from pandora_apache_avro_idl_to_apache_parquet_spark.operators.temporal import (
        asof_join,
    )

    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 30), ("b", 1)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 10, "x"), ("a", 20, "y")], "k string, ts long, v string"
    )
    out = {
        (r.k, r.ts): r.v_asof
        for r in asof_join(left, right, "k", "ts", direction="forward").collect()
    }
    assert out[("a", 5)] == "x"    # next at-or-after
    assert out[("a", 10)] == "x"   # ties at equal ts match
    assert out[("a", 30)] is None  # nothing after
    assert out[("b", 1)] is None   # key never appears on the right
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, "k", "ts", direction="sideways")
