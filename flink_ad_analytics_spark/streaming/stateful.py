"""Stateful streaming LAG: the anomaly job's
``LAG(ctr) OVER (PARTITION BY campaign_id ORDER BY event_time)``
(`/root/reference/flink/anomaly_job.sql:49-57`) for streams, where
OVER windows are unsupported.

Faithful to Flink's event-time OVER operator: incoming rows are
BUFFERED in per-key state and emitted in event-time order only once
the watermark passes their event time (Flink buffers rows in its OVER
operator and fires on watermark advance). This makes the operator
correct under out-of-order delivery -- e.g. the reference's
round-robin-partitioned ``ctr_results`` topic (flink_job.sql:56),
where the anomaly job sees windows interleaved across partitions.

Mechanics (``applyInPandasWithState`` + EventTimeTimeout):
* rows later than the watermark are appended to the buffer;
* rows at-or-before the watermark were already filtered by Spark's
  late-data handling (input carries ``withWatermark`` on window_end,
  the analogue of `WATERMARK FOR event_time AS event_time - INTERVAL
  '10' SECOND`, anomaly_job.sql:18);
* each invocation (new data OR event-time timeout) flushes the
  buffered prefix with event time <= current watermark, in sorted
  order, emitting SPIKE/DROP alerts against the running previous
  value;
* an event-time timeout is armed at the earliest buffered timestamp
  so keys that stop receiving data still flush when the global
  watermark advances.

Scale: per-key state is the handful of windows inside the watermark
horizon (one window per key per interval in steady state) plus one
(timestamp, ctr) pair -- bounded by lateness, not by stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.anomaly import DROP_FACTOR, SPIKE_FACTOR

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("alert_time", T.TimestampType(), False),
        T.StructField("campaign_id", T.StringType(), False),
        T.StructField("current_ctr", T.DoubleType(), False),
        T.StructField("previous_ctr", T.DoubleType(), True),
        T.StructField("alert_type", T.StringType(), True),
    ]
)

# last emitted (event-time us, ctr) + event-time-ordered buffer.
_STATE_SCHEMA = (
    "last_end_us LONG, last_ctr DOUBLE, buf_ends ARRAY<LONG>, buf_ctrs ARRAY<DOUBLE>"
)


def _classify(cur: float, prev: float) -> str | None:
    if prev > 0 and cur > prev * SPIKE_FACTOR:
        return "SPIKE"
    if cur < prev * DROP_FACTOR:
        return "DROP"
    return None


def _lag_alerts(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (campaign_id,) = key
    if state.exists:
        last_end_us, last_ctr, buf_ends, buf_ctrs = state.get
        buf = list(zip(buf_ends or [], buf_ctrs or []))
    else:
        last_end_us, last_ctr, buf = -1, None, []

    for pdf in pdf_iter:
        for row in pdf.itertuples():
            buf.append((int(row.window_end.value // 1000), float(row.ctr)))

    wm_us = state.getCurrentWatermarkMs() * 1000
    buf.sort()
    out_rows: list[dict] = []
    flushed = 0
    for end_us, cur in buf:
        if end_us > wm_us:
            break
        flushed += 1
        if end_us <= last_end_us:
            continue  # duplicate delivery of an already-emitted window
        if last_ctr is not None:
            alert = _classify(cur, last_ctr)
            if alert is not None:
                out_rows.append(
                    {
                        "alert_time": pd.Timestamp(end_us, unit="us"),
                        "campaign_id": campaign_id,
                        "current_ctr": cur,
                        "previous_ctr": last_ctr,
                        "alert_type": alert,
                    }
                )
        last_end_us, last_ctr = end_us, cur
    buf = buf[flushed:]

    state.update(
        (
            last_end_us,
            last_ctr,
            [e for e, _ in buf],
            [c for _, c in buf],
        )
    )
    if buf:
        # flush the rest as soon as the watermark reaches the earliest
        # buffered row, even if this key never sees data again
        # clamp like zscore.py: Spark requires a strictly positive
        # timeout timestamp (first-ms / pre-epoch event times)
        state.setTimeoutTimestamp(max(1, buf[0][0] // 1000))
    if out_rows:
        yield pd.DataFrame(out_rows)


def streaming_anomaly_alerts(
    ctr_results: DataFrame, *, watermark: str = "10 seconds"
) -> DataFrame:
    """SPIKE/DROP alerts over a streaming ctr_results feed.

    Input schema: window_start, window_end, campaign_id, ...,  ctr
    (stage-1 output). Equals batch ``detect_anomalies`` output given
    the same rows -- including under out-of-order delivery -- asserted
    by tests/test_streaming.py.
    """
    # Event-time columns must be TIMESTAMP (LTZ); parquet round-trips
    # may yield TIMESTAMP_NTZ. The cast preserves wall-clock under the
    # engine's UTC session timezone.
    from pyspark.sql import functions as F

    with_wm = ctr_results.withColumn(
        "window_end", F.col("window_end").cast("timestamp")
    ).withWatermark("window_end", watermark)
    return with_wm.groupBy("campaign_id").applyInPandasWithState(
        _lag_alerts,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
