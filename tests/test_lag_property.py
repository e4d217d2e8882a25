"""Property test for the streaming LAG buffer (streaming/stateful.py).

The buffer must equal the batch LAG spec under ANY delivery order,
batching, and duplicate redelivery -- the exact failure modes of the
reference's round-robin-partitioned ctr_results topic
(/root/reference/flink/flink_job.sql:56). The round-1 tests used fixed
orderings; here hypothesis explores the space.

Technique: drive ``_lag_alerts`` directly through a fake GroupState
that mimics Spark's state round-trip (persisted tuple, monotone
watermark, final event-time-timeout flush), so each hypothesis example
costs microseconds instead of a streaming query. The harness only
feeds rows that Spark's late-data filter would admit (delivered while
the watermark is still below their event time), which is the operator's
documented input contract.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from flink_ad_analytics_spark.operators.anomaly import DROP_FACTOR, SPIKE_FACTOR
from flink_ad_analytics_spark.streaming.stateful import _lag_alerts

US_PER_SEC = 1_000_000


class FakeGroupState:
    """The subset of pyspark GroupState that _lag_alerts touches."""

    def __init__(self):
        self._value = None
        self._wm_ms = 0
        self.timeout_ts = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def update(self, value):
        self._value = value

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout_ts = ts_ms


def reference_alerts(rows: list[tuple[int, float]]) -> list[tuple[int, float, float, str]]:
    """Batch spec: LAG over event-time order, SPIKE/DROP classify
    (operators/anomaly.py:35-66 on distinct rows)."""
    out = []
    prev = None
    for end_s, ctr in sorted(set(rows)):
        if prev is not None:
            if prev > 0 and ctr > prev * SPIKE_FACTOR:
                out.append((end_s, ctr, prev, "SPIKE"))
            elif ctr < prev * DROP_FACTOR:
                out.append((end_s, ctr, prev, "DROP"))
        prev = ctr
    return out


@st.composite
def delivery_plan(draw):
    """Unique (window_end_sec, ctr) rows + a duplicated, shuffled,
    batched delivery schedule."""
    n = draw(st.integers(min_value=1, max_value=12))
    ends = draw(
        st.lists(
            st.integers(min_value=1, max_value=400),
            min_size=n, max_size=n, unique=True,
        )
    )
    ctrs = draw(
        st.lists(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=32),
            min_size=n, max_size=n,
        )
    )
    rows = list(zip(ends, [round(c, 4) for c in ctrs]))
    # duplicate some deliveries (at-least-once bus), then shuffle
    dups = draw(st.lists(st.sampled_from(rows), max_size=6))
    schedule = draw(st.permutations(rows + dups))
    # split into 1..5 micro-batches
    n_batches = draw(st.integers(min_value=1, max_value=5))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(schedule)),
                min_size=n_batches - 1, max_size=n_batches - 1,
            )
        )
    )
    batches = []
    prev_cut = 0
    for c in cuts + [len(schedule)]:
        batches.append(schedule[prev_cut:c])
        prev_cut = c
    return rows, batches


@given(delivery_plan())
@settings(max_examples=300, deadline=None)
def test_lag_buffer_equals_batch_under_any_delivery(plan):
    rows, batches = plan
    state = FakeGroupState()
    emitted: list[tuple[int, float, float, str]] = []

    def run(batch_rows, wm_ms):
        state._wm_ms = wm_ms
        pdf_iter = iter(
            [
                pd.DataFrame(
                    {
                        "window_end": [
                            pd.Timestamp(e * US_PER_SEC, unit="us") for e, _ in batch_rows
                        ],
                        "ctr": [c for _, c in batch_rows],
                    }
                )
            ]
            if batch_rows
            else []
        )
        for pdf in _lag_alerts(("camp-1",), pdf_iter, state):
            for r in pdf.itertuples():
                emitted.append(
                    (
                        int(r.alert_time.value // US_PER_SEC // 1000),
                        r.current_ctr,
                        r.previous_ctr,
                        r.alert_type,
                    )
                )

    # Watermark before each batch: just below the earliest event time
    # still undelivered (so Spark's late-data filter would admit every
    # row), monotone non-decreasing.
    wm_ms = 0
    for idx, batch in enumerate(batches):
        remaining = [e for b in batches[idx:] for e, _ in b]
        if remaining:
            wm_ms = max(wm_ms, (min(remaining) - 1) * 1000)
        run(batch, wm_ms)
    # final flush: watermark beyond every buffered row (the
    # EventTimeTimeout invocation in production)
    run([], 10_000_000)

    assert emitted == reference_alerts(rows)
