"""QueryMetricsRecorder: captures per-batch input counts, stateful-
operator state size, and an advancing watermark from a real windowed
streaming query."""

from __future__ import annotations

import datetime as dt
import time

import pandas as pd
from pyspark.sql import functions as F, types as T

from flink_ad_analytics_spark.streaming.metrics import QueryMetricsRecorder

BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("event_time_ms", T.LongType()),
    ]
)


def _wait_for(cond, timeout_s=30.0):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(0.25)
    return False


def test_recorder_captures_rates_state_and_watermark(spark, tmp_path):
    n = 40
    base_ms = int(BASE.timestamp() * 1000)
    pdf = pd.DataFrame(
        {
            "k": ["a" if i % 2 else "b" for i in range(n)],
            "event_time_ms": [base_ms + 500 * i for i in range(n)],
        }
    )
    src = tmp_path / "in"
    src.mkdir()
    pdf.iloc[: n // 2].to_parquet(src / "p0.parquet", index=False)
    pdf.iloc[n // 2 :].to_parquet(src / "p1.parquet", index=False)

    rec = QueryMetricsRecorder()
    spark.streams.addListener(rec)
    try:
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn("event_time", F.timestamp_millis(F.col("event_time_ms")))
            .withWatermark("event_time", "5 seconds")
        )
        agg = stream.groupBy(F.window("event_time", "10 seconds"), "k").count()
        q = (
            agg.writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # listener delivery is async on the bus thread
        assert _wait_for(
            lambda: sum(
                r["num_input_rows"]
                for r in rec.snapshot()
                if r["query_name"] == "metrics_probe"
            )
            >= n
        ), rec.snapshot()
    finally:
        spark.streams.removeListener(rec)

    rows = [r for r in rec.snapshot() if r["query_name"] == "metrics_probe"]
    assert sum(r["num_input_rows"] for r in rows) == n
    assert max(r["state_rows_total"] for r in rows) > 0, "windowed agg keeps state"
    assert max(r["num_state_operators"] for r in rows) >= 1
    watermarks = [r["watermark"] for r in rows if r["watermark"]]
    assert watermarks and max(watermarks) > "2024-01-01T00:00:00.000Z"

    s = rec.summary()["metrics_probe"]
    assert s["total_input_rows"] == n
    # ordered fixture delivery: nothing may be dropped as late
    assert s["total_rows_dropped_late"] == 0
    assert s["batches"] >= 2, "maxFilesPerTrigger=1 over 2 files"
    assert s["max_state_rows"] > 0
    assert s["last_watermark"] == max(watermarks)

    out = tmp_path / "metrics.json"
    rec.dump(str(out))
    import json

    dumped = json.load(open(out))
    assert dumped["summary"]["metrics_probe"]["total_input_rows"] == n


def test_health_alerts_rules():
    from flink_ad_analytics_spark.streaming.metrics import health_alerts

    summary = {
        "leaky": {
            "batches": 3,
            "total_input_rows": 100,
            "max_state_rows": 5_000_000,
            "max_state_memory_bytes": 1,
            "last_watermark": None,
            "max_processed_rows_per_second": 9000.0,
        },
        "slow": {
            "batches": 2,
            "total_input_rows": 10,
            "max_state_rows": 10,
            "max_state_memory_bytes": 1,
            "last_watermark": None,
            "max_processed_rows_per_second": 3.0,
        },
    }
    alerts = health_alerts(
        summary, max_state_rows=1_000_000, min_processed_rows_per_second=100.0
    )
    kinds = {(a["query"], a["alert"]) for a in alerts}
    assert kinds == {("leaky", "STATE_GROWTH"), ("slow", "THROUGHPUT_FLOOR")}
    assert health_alerts(summary) == []  # no thresholds -> no alerts
