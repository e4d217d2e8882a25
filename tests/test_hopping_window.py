"""Hopping-window pane decomposition: dual-solver gate pinning
_hopping_counts_panes to Spark's native ``window(W, S)`` hopping
aggregate (both are independently value-gated against the DuckDB
oracle via hopping_daily_actives; this test pins them to each
other)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_ad_analytics_spark.queries import _hopping_counts_panes
from flink_ad_analytics_spark.sources.batch import load_events
from tests.conftest import SF_SMOKE


def test_hopping_panes_equal_native_window(spark):
    ev = load_events(spark, SF_SMOKE)
    native = (
        ev.groupBy(
            F.window("event_time", "24 hours", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
        )
    )
    paned = _hopping_counts_panes(ev, window_hours=24, slide_hours=1)
    cols = sorted(paned.columns)
    a = sorted(tuple(r[c] for c in cols) for r in paned.collect())
    b = sorted(tuple(r[c] for c in cols) for r in native.select(*cols).collect())
    assert a and a == b
