"""Stateful streaming z-score anomaly detection: the streaming twin of
`queries_pipeline.q_count_zscore_alerts`.

Batch computes the trailing statistics with a ROWS window; streams
have no OVER windows, so this operator keeps per-key state: the last
`window` emitted (hour, count) pairs (a bounded deque -- the exact
ROWS BETWEEN -W AND -1 frame) plus the out-of-watermark buffer +
ordered-emission machinery proven in `streaming/stateful.py` (the LAG
operator): rows buffer until the watermark passes their hour, then
flush in event-time order, deduplicating redelivered hours.

The alert test is the same integer-only cross-multiplied inequality
as batch -- counts and their running sums are Python ints here
(arbitrary precision), so streaming == batch bit-for-bit.

State per key: W + |in-flight hours| (lateness-bounded) pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ZSCORE_ALERT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("hour", T.TimestampType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("trailing_sum", T.LongType(), False),
        T.StructField("trailing_sumsq", T.LongType(), False),
    ]
)

#: last emitted hour + trailing deque + out-of-watermark buffer
_STATE_SCHEMA = (
    "last_hour_us LONG, trail_ns ARRAY<LONG>, "
    "buf_hours ARRAY<LONG>, buf_ns ARRAY<LONG>"
)


def _make_zscore_fn(window: int, sigma: int):
    def zscore_alerts(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            last_hour_us, trail_ns, buf_hours, buf_ns = state.get
            trail = list(trail_ns or [])
            buf = list(zip(buf_hours or [], buf_ns or []))
        else:
            last_hour_us, trail, buf = -1, [], []

        for pdf in pdf_iter:
            for row in pdf.itertuples():
                buf.append((int(row.hour.value // 1000), int(row.n)))

        wm_us = state.getCurrentWatermarkMs() * 1000
        buf.sort()
        out_rows: list[dict] = []
        flushed = 0
        for hour_us, n in buf:
            if hour_us > wm_us:
                break
            flushed += 1
            if hour_us <= last_hour_us:
                continue  # redelivered hour, already incorporated
            if len(trail) == window:
                s1 = sum(trail)
                s2 = sum(v * v for v in trail)
                dev = window * n - s1
                if dev * dev > sigma * sigma * (window * s2 - s1 * s1):
                    out_rows.append(
                        {
                            "event_type": event_type,
                            "hour": pd.Timestamp(hour_us, unit="us"),
                            "n": n,
                            "trailing_sum": s1,
                            "trailing_sumsq": s2,
                        }
                    )
            trail.append(n)
            if len(trail) > window:
                trail.pop(0)
            last_hour_us = hour_us
        buf = buf[flushed:]

        state.update(
            (last_hour_us, trail, [h for h, _ in buf], [v for _, v in buf])
        )
        if buf:
            # Spark requires a strictly positive timeout timestamp; a
            # pre-1970 (negative-epoch) buffered hour -- which the
            # batch twin and range_join support -- clamps to 1 ms, an
            # already-passed instant, so the group re-fires on the
            # next watermark advance instead of crashing the query.
            state.setTimeoutTimestamp(max(1, buf[0][0] // 1000))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return zscore_alerts


def streaming_zscore_alerts(
    hourly_counts: DataFrame,
    *,
    window: int = 24,
    sigma: int = 2,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Alerts over a streaming (event_type, hour, n) feed -- stage-2 of
    the counts bus, exactly the topology of the reference's anomaly
    job. Equals the batch z-score filter row-for-row given the same
    rows (tests/test_streaming_zscore.py, incl. out-of-order
    delivery)."""
    from pyspark.sql import functions as F

    with_wm = hourly_counts.withColumn(
        "hour", F.col("hour").cast("timestamp")
    ).withWatermark("hour", watermark)
    return with_wm.groupBy("event_type").applyInPandasWithState(
        _make_zscore_fn(window, sigma),
        outputStructType=ZSCORE_ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
