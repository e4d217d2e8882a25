"""Integer-exact z-score anomaly detection (q_count_zscore_alerts'
engine): planted spikes flagged, steady traffic not, warmup excluded."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window, functions as F

from flink_ad_analytics_spark.queries_pipeline import _Z_SIGMA, _Z_WINDOW

BASE = dt.datetime(2024, 3, 1)


def _alerts(spark, counts: dict[int, int]):
    """Run the exact filter logic over a synthetic hourly series."""
    rows = [
        ("t", BASE + dt.timedelta(hours=h), n) for h, n in sorted(counts.items())
    ]
    hourly = spark.createDataFrame(rows, ["event_type", "hour", "n"])
    w = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-_Z_WINDOW, -1)
    )
    scored = hourly.select(
        "hour",
        "n",
        F.count(F.lit(1)).over(w).alias("w_rows"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    ).filter(F.col("w_rows") == _Z_WINDOW)
    dev = F.lit(_Z_WINDOW) * F.col("n") - F.col("s1")
    rhs = F.lit(_Z_SIGMA * _Z_SIGMA) * (
        F.lit(_Z_WINDOW) * F.col("s2") - F.col("s1") * F.col("s1")
    )
    return sorted(
        (r.hour - BASE).total_seconds() // 3600
        for r in scored.filter(dev * dev > rhs).collect()
    )


def test_planted_spike_flagged_steady_not(spark):
    # 48 hours of mildly noisy traffic around 100, one 3x spike at h=40
    counts = {h: 100 + (h % 5) - 2 for h in range(48)}
    counts[40] = 300
    flagged = _alerts(spark, counts)
    assert 40 in flagged
    # the spike itself may perturb later windows' mean/σ; nothing
    # BEFORE it (h 24..39, post-warmup steady traffic) may fire
    assert all(h >= 40 for h in flagged), flagged


def test_constant_series_never_alerts(spark):
    # zero variance and zero deviation: lhs == rhs == 0, strict > holds
    # for nothing -- no division-by-zero sigma trap
    assert _alerts(spark, {h: 42 for h in range(48)}) == []


def test_warmup_hours_excluded(spark):
    # massive jump at h=3 is invisible: fewer than 24 trailing hours
    counts = {h: 10 for h in range(10)}
    counts[3] = 10_000
    assert _alerts(spark, counts) == []
