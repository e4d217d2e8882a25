"""Stateful streaming sessionization with BOTH an inactivity gap and
a max session duration -- the streaming counterpart of the batch
``q_capped_sessions`` (queries.py), which plain ``session_window``
cannot express (it has no duration cap: a never-idle key yields one
unbounded session whose state never closes -- exactly the bot-traffic
pathology the cap exists to bound).

Semantics (identical to batch): per user, events more than ``gap``
apart start a new session; within a session, slices are fixed
``cap``-length windows offset from the SESSION START; a slice row is
(user_id, session_start, slice_idx, slice_start, slice_end, n_events).

Correctness under out-of-order delivery follows the repo's buffered
stateful pattern (streaming/stateful.py): rows later than the
watermark are buffered in per-key state; each invocation processes
the buffered prefix with event time <= watermark IN ORDER, so the
gap/slice walk sees the same ordered stream the batch window does.
A slice emits when the ordered walk proves it closed (a later slice
began, or a gap ended the session) or when the event-time timeout
fires with the watermark past ``last_ts + gap`` (no in-order event
can extend the session: anything earlier is late-dropped, anything
at-or-after the watermark exceeds the gap).

Scale: per-key state is one open slice + the out-of-watermark buffer
(bounded by lateness x rate, not stream length) -- the cap is what
BOUNDS state where session_window's would grow with a never-idle key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 30 * 60 * 1_000_000
CAP_US = 2 * 3600 * 1_000_000

SLICE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("slice_idx", T.LongType(), False),
        T.StructField("slice_start", T.TimestampType(), False),
        T.StructField("slice_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

# open slice accumulator + last event time + pending (out-of-watermark)
# event-time buffer, all integer microseconds.
_STATE_SCHEMA = (
    "sess_start_us LONG, slice_idx LONG, slice_start_us LONG, "
    "slice_end_us LONG, n_events LONG, last_ts_us LONG, buf ARRAY<LONG>"
)


def _slice_row(user_id: int, st: tuple) -> dict:
    sess, idx, s0, s1, n, _last = st
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(sess, unit="us"),
        "slice_idx": idx,
        "slice_start": pd.Timestamp(s0, unit="us"),
        "slice_end": pd.Timestamp(s1, unit="us"),
        "n_events": n,
    }


def _capped_sessions(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        sess, idx, s0, s1, n, last, buf = state.get
        buf = list(buf or [])
    else:
        sess = idx = s0 = s1 = n = last = -1
        buf = []

    for pdf in pdf_iter:
        buf.extend(int(v.value // 1000) for v in pdf["event_time"])

    wm_us = state.getCurrentWatermarkMs() * 1000
    buf.sort()
    cut = 0
    out: list[dict] = []
    for ts in buf:
        if ts > wm_us:
            break
        cut += 1
        if sess < 0 or ts - last > GAP_US:
            if sess >= 0:  # close the open slice of the prior session
                out.append(_slice_row(user_id, (sess, idx, s0, s1, n, last)))
            sess, idx, s0, s1, n = ts, 0, ts, ts, 1
        else:
            new_idx = (ts - sess) // CAP_US
            if new_idx != idx:  # the ordered walk proved the slice closed
                out.append(_slice_row(user_id, (sess, idx, s0, s1, n, last)))
                idx, s0, s1, n = new_idx, ts, ts, 1
            else:
                s1, n = ts, n + 1
        last = ts
    buf = buf[cut:]

    if sess >= 0 and wm_us > last + GAP_US and not buf:
        # no in-order event can extend this session anymore
        out.append(_slice_row(user_id, (sess, idx, s0, s1, n, last)))
        sess = idx = s0 = s1 = n = last = -1

    if sess < 0 and not buf:
        state.remove()  # fully flushed: drop the key's state entirely
    else:
        state.update((sess, idx, s0, s1, n, last, buf))
        if buf:
            state.setTimeoutTimestamp(max(1, buf[0] // 1000))
        else:
            state.setTimeoutTimestamp(max(1, (last + GAP_US) // 1000 + 1))
    if out:
        yield pd.DataFrame(out)


def streaming_capped_sessions(
    events: DataFrame, *, watermark: str = "10 seconds"
) -> DataFrame:
    """Gap+cap session slices over a streaming events feed; equals
    batch ``q_capped_sessions`` given the same rows (asserted by
    tests/test_streaming.py)."""
    with_wm = events.withColumn(
        "event_time", F.col("event_time").cast("timestamp")
    ).withWatermark("event_time", watermark)
    return with_wm.groupBy("user_id").applyInPandasWithState(
        _capped_sessions,
        outputStructType=SLICE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
