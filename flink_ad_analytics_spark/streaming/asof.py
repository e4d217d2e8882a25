"""Streaming as-of join: last-touch click attribution on streams.

Batch counterpart: operators/asof.py (union + ordered carry-forward).
Structured Streaming has no OVER windows and no as-of join, so the
streaming form keeps the SAME union shape but replaces the sort with
per-user state (``applyInPandasWithState``), exactly how Flink's
temporal join keeps versioned state per key (FOR SYSTEM_TIME AS OF --
the operator direction the reference's interval join cannot express).

Event-time correctness under out-of-order delivery:
* clicks are BUFFERED until the watermark passes their event time --
  only then can no earlier impression still arrive (same argument as
  the stateful LAG operator, streaming/stateful.py);
* impressions are buffered the same way; once final they fold into a
  single (last_time, last_id) running maximum -- matching the batch
  query's max(id) tie-break per (user, time);
* an event-time timeout is armed at the earliest buffered click so
  attribution flushes on watermark advance even if the user's traffic
  stops.

State per user: one (time, id) pair + the in-flight rows inside the
watermark horizon -- bounded by lateness, not stream length (T5's
state-TTL analogue). The shuffle key is user_id: high-cardinality,
evenly distributed, AQE-skew-safe at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ATTRIBUTION_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("click_time", T.TimestampType(), False),
        T.StructField("impression_id", T.StringType(), True),
        T.StructField("impression_time", T.TimestampType(), True),
        T.StructField("latency_ms", T.LongType(), True),
    ]
)

# running maximum impression + event-time-ordered in-flight buffers
_STATE_SCHEMA = (
    "last_imp_us LONG, last_imp_id STRING, "
    "imp_ts ARRAY<LONG>, imp_ids ARRAY<STRING>, "
    "clk_ts ARRAY<LONG>, clk_ids ARRAY<STRING>"
)


def _attribute(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_us, last_id, i_ts, i_ids, c_ts, c_ids = state.get
        imps = list(zip(i_ts or [], i_ids or []))
        clks = list(zip(c_ts or [], c_ids or []))
    else:
        last_us, last_id, imps, clks = -1, None, [], []

    for pdf in pdf_iter:
        for row in pdf.itertuples():
            t_us = int(row.t.value // 1000)
            (imps if row.side == 0 else clks).append((t_us, row.id))

    wm_us = state.getCurrentWatermarkMs() * 1000
    imps.sort()
    clks.sort()

    def advance(limit_us: int, ii: int) -> int:
        """Fold finalized impressions (time <= limit) into the running
        maximum; equal times keep the max id (batch parity)."""
        nonlocal last_us, last_id
        while ii < len(imps) and imps[ii][0] <= limit_us:
            t, iid = imps[ii]
            if t > last_us:
                last_us, last_id = t, iid
            elif t == last_us and (last_id is None or iid > last_id):
                last_id = iid
            ii += 1
        return ii

    out_rows: list[dict] = []
    ii = n_emitted = 0
    for ct, cid in clks:
        if ct >= wm_us:
            # STRICTLY below the watermark only: Spark admits rows AT
            # the watermark as on-time, so a click at exactly wm could
            # still gain a co-timestamped impression from a later
            # batch -- finalizing it here would break batch parity
            break
        ii = advance(ct, ii)  # inclusive: impression at ct matches
        n_emitted += 1
        matched = last_us >= 0
        out_rows.append(
            {
                "click_id": cid,
                "user_id": user_id,
                "click_time": pd.Timestamp(ct, unit="us"),
                "impression_id": last_id if matched else None,
                "impression_time": (
                    pd.Timestamp(last_us, unit="us") if matched else pd.NaT
                ),
                "latency_ms": (
                    ct // 1000 - last_us // 1000 if matched else None
                ),
            }
        )
    ii = advance(wm_us - 1, ii)  # finalize STRICTLY pre-watermark imps
    imps, clks = imps[ii:], clks[n_emitted:]

    state.update(
        (
            last_us,
            last_id,
            [t for t, _ in imps],
            [i for _, i in imps],
            [t for t, _ in clks],
            [c for _, c in clks],
        )
    )
    if clks:
        # clamp: Spark requires a strictly positive timeout; first-ms
        # (and pre-epoch) event times otherwise crash the query
        state.setTimeoutTimestamp(max(1, clks[0][0] // 1000))
    if out_rows:
        yield pd.DataFrame(out_rows)


def streaming_click_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    user_col: str = "user_id",
    imp_id_col: str = "impression_id",
    imp_time_col: str = "event_time",
    clk_id_col: str = "click_id",
    clk_time_col: str = "click_time",
    watermark: str = "5 seconds",
) -> DataFrame:
    """As-of attribution over two UN-watermarked streams: tag + union
    (the batch operator's shape), then per-user state. Each side gets
    its OWN watermark before the union -- Spark then advances the
    operator watermark at the MIN of the two, so a fast impression
    stream can never make slower clicks (or vice versa) late. A single
    watermark on the unioned frame would advance at the max and drop
    the lagging side's rows. Emits one attributed row per click once
    the watermark passes it."""
    i = impressions.select(
        F.col(user_col).alias("user_id"),
        F.lit(0).alias("side"),
        F.col(imp_id_col).alias("id"),
        F.col(imp_time_col).alias("t"),
    ).withWatermark("t", watermark)
    c = clicks.select(
        F.col(user_col).alias("user_id"),
        F.lit(1).alias("side"),
        F.col(clk_id_col).alias("id"),
        F.col(clk_time_col).alias("t"),
    ).withWatermark("t", watermark)
    return (
        i.unionByName(c)
        .groupBy("user_id")
        .applyInPandasWithState(
            _attribute,
            ATTRIBUTION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
