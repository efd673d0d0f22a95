"""Temporal join/rollup operators Spark lacks as built-ins.

The three custom operators the time-series world expects of an analytics
engine — as-of join, range join, hypertable (multi-granularity) rollup —
each re-expressed as a composition of existing DataFrame ops so Catalyst
keeps planning them (no reference analog: the reference is an encode-only
pipeline; these serve its output tables' consumers):

* ``asof_join`` — NOT a windowed cross join: both sides union into one
  stream tagged by side, ONE shuffle on the key, and a
  ``last(ignorenulls)`` running carry-forward delivers "latest right row
  at-or-before each left row". Cost is a sort-merge over (key, ts) —
  exactly what a 1000-executor cluster does well — with no range
  explosion at any skew.
* ``range_join`` — interval containment via COARSE TIME BUCKETS: each
  right interval explodes into the buckets it overlaps (executor-local,
  ≤ span/bucket + 1 rows), the equi-join runs on (key, bucket) — a plain
  hash join Catalyst can plan — and an exact containment filter keeps
  semantics. Without this, Spark plans inequality joins as
  BroadcastNestedLoopJoin: O(|L|·|R|).
* ``hypertable_rollup`` — the continuous-aggregate contract: one pass,
  GROUPING SETS over pre-computed time buckets (hour/day/…), all
  granularities from a single shuffle with partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "hypertable_rollup", "gap_fill"]

_UNIT_US = {
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
    "day": 86_400_000_000, "days": 86_400_000_000,
    "week": 7 * 86_400_000_000, "weeks": 7 * 86_400_000_000,
}


def _interval_us(g: str) -> int:
    """'"1 hour"' -> microseconds; fixed-length units only (no months —
    epoch-aligned tumbling buckets are undefined for variable units)."""
    parts = g.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or parts[1] not in _UNIT_US:
        raise ValueError(
            f"granularity must be '<n> <second|minute|hour|day|week>[s]', got {g!r}"
        )
    return int(parts[0]) * _UNIT_US[parts[1]]


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str] | None = None,
              suffix: str = "_asof",
              direction: str = "backward") -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` of the same key (``direction="backward"``, the
    default — DuckDB/pandas ``merge_asof`` semantics, ties at equal ts
    match), or the EARLIEST right row with ``right.ts >= left.ts``
    (``direction="forward"`` — "next reading at-or-after": the same
    carry-forward machinery over the reversed time order).

    Right rows with duplicate (key, ts) must be pre-aggregated by the
    caller; otherwise which duplicate wins is tie-ordered by the carried
    columns' last sort position (deterministic only per partition layout).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, ts)
    ]
    r = right.select(
        F.col(key), F.col(ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("__emit", F.lit(1))
    l = left.withColumn("__emit", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    # at equal ts the right (emitter) row sorts first so the left row sees
    # it; forward mode walks time descending, so "last seen" = next-at-or-
    # after
    order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(order, F.col("__emit").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w)
            .alias(f"__carry_{c}")
            for c in value_cols
        ],
    )
    keep = [c for c in left.columns]
    return carried.where(F.col("__emit") == 0).select(
        *keep,
        *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join(left: DataFrame, right: DataFrame, key: str, ts: str,
               start: str, end: str, bucket: str = "7 days") -> DataFrame:
    """All (left, right) pairs of the same key with
    ``right.start <= left.ts < right.end`` — half-open interval
    containment, planned as an equi-join.

    ``bucket`` coarsens time into join buckets: pick it near the typical
    interval length so each interval explodes into O(1) bucket rows. The
    exact predicate is re-applied after the hash join, so bucketing is
    purely a pruning device — semantics never depend on it."""
    iv = F.expr(f"interval '{bucket}'")
    b_l = F.window(F.col(ts), bucket).getField("start")
    l = left.withColumn("__bkt", b_l)
    r = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.window(F.col(start), bucket).getField("start"),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into that bucket
                F.window(
                    F.col(end) - F.expr("interval 1 microsecond"), bucket
                ).getField("start"),
                iv,
            )
        ),
    )
    joined = l.join(r, ["__bkt", key]).where(
        (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("__bkt")


def hypertable_rollup(df: DataFrame, ts: str, dims: list[str],
                      aggs: list[str],
                      granularities: list[str] = ("1 hour", "1 day"),
                      ) -> DataFrame:
    """Multi-granularity time rollup in ONE pass: for each granularity,
    per-(bucket, dims) aggregates — the TimescaleDB continuous-aggregate
    shape, expressed as GROUPING SETS over precomputed bucket columns so
    all levels share a single shuffle with map-side partial aggregation.

    ``aggs`` are SQL aggregate expressions with aliases
    (``"count(*) AS n"``). Output: ``granularity`` (the string),
    ``bucket_start``, the dims, the aggregates. Each input row contributes
    to exactly one set per granularity (N parallel rollups, not a cube);
    rows with a NULL ``ts`` are excluded (a NULL bucket would collide with
    the grouping-set NULL marker)."""
    if not granularities:
        raise ValueError("need at least one granularity")
    # epoch-modulo bucketing (Spark rejects >1 window() expr per projection;
    # this is the same epoch-aligned tumbling bucket, pure codegen math).
    # Post-1970 timestamps only (negative epoch would need floor-mod).
    ts_type = df.schema[ts].dataType.typeName()
    anchor = (
        "timestamp_ntz '1970-01-01 00:00:00'"
        if ts_type == "timestamp_ntz"
        else "timestamp '1970-01-01 00:00:00'"
    )
    us = f"timestampdiff(MICROSECOND, {anchor}, {ts})"
    bcols = [
        F.expr(
            f"timestampadd(MICROSECOND, ({us}) - (({us}) % {_interval_us(g)}),"
            f" {anchor})"
        ).alias(f"__b{i}")
        for i, g in enumerate(granularities)
    ]
    pre = df.where(F.col(ts).isNotNull()).select(*df.columns, *bcols)
    sets = ", ".join(
        f"(__b{i}, {', '.join(dims)})" if dims else f"(__b{i})"
        for i in range(len(granularities))
    )
    view = "__hyper_in"
    pre.createOrReplaceTempView(view)
    gran_case = " ".join(
        f"WHEN __b{i} IS NOT NULL THEN '{g}'"
        for i, g in enumerate(granularities)
    )
    bucket_expr = "coalesce(" + ", ".join(
        f"__b{i}" for i in range(len(granularities))
    ) + ")"
    dim_list = (", ".join(dims) + ",") if dims else ""
    sql = f"""
        SELECT CASE {gran_case} END AS granularity,
               {bucket_expr} AS bucket_start,
               {dim_list}
               {", ".join(aggs)}
        FROM {view}
        GROUP BY GROUPING SETS ({sets})
    """
    return pre.sparkSession.sql(sql)


def gap_fill(df: DataFrame, key: str, ts: str, value_col: str,
             granule: str = "day") -> DataFrame:
    """Dense per-key time series with carry-forward interpolation (the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` contract): every
    (key, bucket) between the GLOBAL min and max observed bucket exists in
    the output; buckets with no observation carry the last observed value
    forward (NULL before a key's first observation — no back-fill).

    Shape: one one-row bounds aggregate (broadcast) × distinct keys →
    per-key ``sequence()`` explode (executor-local, ≤ span/granule rows per
    key); observed buckets aggregate with map-side partials; the
    carry-forward is a per-key running ``last(ignorenulls)`` window —
    parallel across keys, never a global sort. Output:
    ``(key, bucket timestamp, v_fill, n_obs)`` where ``v_fill`` is the
    bucket's avg (4 dp) or the carried value.
    """
    if granule not in ("hour", "day", "week"):
        raise ValueError(f"granule must be hour/day/week, got {granule!r}")
    bounds = df.select(
        F.date_trunc(granule, F.min(ts)).alias("__lo"),
        F.date_trunc(granule, F.max(ts)).alias("__hi"),
    )
    dense = (
        df.select(key).distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key,
            F.explode(
                F.expr(f"sequence(__lo, __hi, interval 1 {granule})")
            ).alias("bucket"),
        )
    )
    obs = (
        df.groupBy(key, F.date_trunc(granule, ts).alias("bucket"))
        .agg(
            F.round(F.avg(value_col), 4).alias("__v_obs"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    w = (
        Window.partitionBy(key).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(obs, [key, "bucket"], "left")
        .select(
            key,
            "bucket",
            F.last("__v_obs", ignorenulls=True).over(w).alias("v_fill"),
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
    )
