"""Custom stateful streaming operator: gap-based sessionization.

The reference's streaming story is a stateless micro-batch loop (A30,
``/root/reference/demo/avroidl2parquet.fsx:191-420``); this module adds the
piece Spark is uniquely good at and the reference has no notion of —
*state that lives across micro-batches*, expressed with
``applyInPandasWithState`` (Arrow-batched per-group kernels + the
watermark-driven timeout machinery).

Semantics match the batch formulation in ``queries.q_events_sessionize``
(a > ``gap`` event-time silence per user starts a new session), delivered
incrementally:

* a session CLOSES — and is emitted exactly once — either when a later
  event of the same user arrives past the gap (data-split) or when the
  watermark passes ``last_event + gap`` (event-time timeout);
* the trailing open session per user is state: three scalars
  ``(start, last, n)`` — O(users) state total, independent of event volume,
  which is what lets this run forever on an unbounded stream;
* per group and micro-batch the kernel sorts its Arrow batch and splits on
  gap boundaries vectorized (numpy ``diff``), so the hot path is
  O(events log events) per group with no per-row Python.

Out-of-order events are handled within the watermark: rows later than the
watermark are dropped by Spark before the kernel, and in-batch disorder is
sorted away. An event arriving out of order ACROSS batches (older than the
open session's last event but newer than the watermark) merges into the
open session rather than rewriting history — the documented approximation
every O(1)-state streaming sessionizer makes.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp_ntz, session_end timestamp_ntz, "
    "n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def _make_kernel(gap_us: int):
    def kernel(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
               ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user],
                 "session_start": [pd.Timestamp(start, unit="us")],
                 "session_end": [pd.Timestamp(last, unit="us")],
                 "n_events": [n]}
            )
            return

        ts = np.sort(
            np.concatenate(
                [p["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                 for p in pdfs]
            )
        ) // 1000  # ns -> us
        if len(ts) == 0:
            return
        if state.exists:
            cur_start, cur_last, cur_n = state.get
        else:
            cur_start, cur_last, cur_n = None, None, 0

        # vectorized gap split: True where a NEW session starts at ts[i]
        new = np.empty(len(ts), dtype=bool)
        new[0] = cur_last is None or (ts[0] - cur_last) > gap_us
        new[1:] = np.diff(ts) > gap_us
        seg_idx = list(np.flatnonzero(new))

        # chronological session list: carried-over state session first,
        # absorbing the pre-boundary events when the gap doesn't split them
        sessions: list[list[int]] = []
        if cur_last is not None:
            sessions.append([cur_start, cur_last, cur_n])
        if cur_last is not None and not new[0]:
            end = seg_idx[0] if seg_idx else len(ts)
            sessions[-1][1] = int(ts[end - 1])
            sessions[-1][2] += end
        for j, b in enumerate(seg_idx):
            e = seg_idx[j + 1] if j + 1 < len(seg_idx) else len(ts)
            sessions.append([int(ts[b]), int(ts[e - 1]), int(e - b)])

        closed = sessions[:-1]
        cur_start, cur_last, cur_n = sessions[-1]
        state.update((cur_start, cur_last, cur_n))
        # event-time timeout at last+gap; must sit above the watermark
        tmo_ms = max(
            (cur_last + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(tmo_ms)

        if closed:
            yield pd.DataFrame(
                {"user_id": [user] * len(closed),
                 "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                 "session_end": [pd.Timestamp(l, unit="us") for _, l, _ in closed],
                 "n_events": [n for _, _, n in closed]}
            )

    return kernel


def sessionize_stream(stream: DataFrame, gap_sec: int = 1800,
                      watermark: str = "1 hour", user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Closed sessions of an event stream: ``(user_id, session_start,
    session_end, n_events)``, one row per session, emitted exactly once.

    Scale shape: ONE shuffle on ``user_col`` (the stateful exchange Spark
    requires anyway), state bounded by live users, Arrow-batched kernel.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    # watermarks require TIMESTAMP (LTZ); an NTZ input is cast through the
    # session timezone — the kernel's wall-clock microseconds then equal
    # Spark's internal epoch only when that zone is UTC, which get_spark
    # pins (any real deployment should too: event-time determinism)
    ev = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _make_kernel(gap_sec * 1_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
