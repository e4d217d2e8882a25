"""Running per-key totals on the transformWithStateInPandas API
(Spark 4's state-v2 stateful processing: typed state handles, TTL,
timers) -- the successor surface to applyInPandasWithState, exercised
here so the engine covers BOTH stateful APIs.

Operator: per-campaign running spend -- every micro-batch emits each
touched campaign's updated lifetime (total_spend, n_impressions).
This is the streaming ledger pattern (update-mode semantics carried in
explicit ValueState), and the natural upstream of the keyed upsert
matview sink (streaming/sinks.py): ledger emits changes, MERGE applies
them.

Spend is held in integer CENTS: ValueState round-trips every batch,
and accumulating a double would compound representation error over an
unbounded stream; int64 cents are exact for ~9e16 cents.

Scale: state per key is two longs; emission is per-touched-key per
batch, not per-row. TTL is available on the handle for keyspaces that
churn (unused here: campaigns are a bounded dimension).

Environment note: the state-v2 worker protocol imports
``google.protobuf``, which this sandbox does not ship (the same gap
class as the absent Kafka broker). The operator and its batch-parity
test (tests/test_streaming.py::test_tws_running_spend_equals_batch)
are complete and run wherever protobuf is installed; here the test
importorskips. Every semantics this operator carries is ALSO covered
on the v1 API (applyInPandasWithState ledgers + the update-mode upsert
matview), so no behavior is test-only-on-paper.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "campaign_id string, total_spend double, n_impressions long"
)


class RunningSpendProcessor(StatefulProcessor):
    """ValueState ledger: (cents, n) per campaign key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "ledger", "cents long, n long"
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        cents, n = (self._state.get() or (0, 0)) if self._state.exists() else (0, 0)
        for pdf in rows:
            # exact per-ROW decimal->cents (costs carry 2dp): rounding
            # each value before the sum keeps the ledger integer-exact.
            # NULL costs (NaN after Arrow->pandas) are dropped, not
            # cast: .astype('int64') on NaN raises, and a raising task
            # is a poison pill -- the replayed batch fails identically
            # forever. Malformed rows still count toward n (they were
            # impressions; they had no cost).
            cost = pdf["cost"].dropna()
            cents += int((cost * 100).round().astype("int64").sum())
            n += len(pdf)
        self._state.update((cents, n))
        yield pd.DataFrame(
            {
                "campaign_id": [key[0]],
                "total_spend": [cents / 100.0],
                "n_impressions": [n],
            }
        )

    def close(self) -> None:
        pass


def streaming_running_spend(impressions: DataFrame) -> DataFrame:
    """Per-campaign lifetime spend, updated per micro-batch.

    Input: a stream carrying (campaign_id, cost). Output: one row per
    touched campaign per batch with the updated running totals --
    equal, after taking each campaign's LAST emission, to the batch
    groupBy aggregate over the same rows (tests/test_streaming.py).
    """
    return (
        impressions.select("campaign_id", "cost")
        .groupBy("campaign_id")
        .transformWithStateInPandas(
            RunningSpendProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
