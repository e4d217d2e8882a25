"""Streaming z-score == batch z-score on the same hourly series,
including out-of-order file delivery across micro-batches."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import Window, functions as F, types as T

from flink_ad_analytics_spark.queries_pipeline import _Z_SIGMA, _Z_WINDOW
from flink_ad_analytics_spark.streaming.zscore import streaming_zscore_alerts

BASE = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("hour_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _series() -> pd.DataFrame:
    rng = random.Random(13)
    rows = []
    for etype in ("click", "error"):
        for h in range(60):
            n = 100 + rng.randint(-3, 3)
            if etype == "click" and h in (30, 47):
                n *= 3  # planted spikes
            if etype == "error" and h == 52:
                n //= 5  # planted drop
            rows.append((etype, h, n))
    base_ms = int(BASE.timestamp() * 1000)
    return pd.DataFrame(
        [(e, base_ms + 3_600_000 * h, n) for e, h, n in rows],
        columns=["event_type", "hour_ms", "n"],
    )


def _batch_alerts(spark, hourly):
    w = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-_Z_WINDOW, -1)
    )
    scored = hourly.select(
        "event_type",
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
    return scored.filter(dev * dev > rhs).select(
        "event_type", "hour", "n",
        F.col("s1").alias("trailing_sum"), F.col("s2").alias("trailing_sumsq"),
    )


def test_streaming_zscore_equals_batch_out_of_order(spark, tmp_path):
    pdf = _series()
    src = tmp_path / "counts"
    src.mkdir()
    # out-of-order delivery: shuffle rows, split into 3 files; the
    # 100h watermark delay covers the full reordering span (so the
    # late-data filter admits every row -- lateness tolerance is the
    # caller's policy knob, ordered emission is the operator's job),
    # and a far-future sentinel hour per key pushes the final flush
    shuffled = pdf.sample(frac=1.0, random_state=5).reset_index(drop=True)
    third = len(shuffled) // 3
    shuffled.iloc[:third].to_parquet(src / "p0.parquet", index=False)
    shuffled.iloc[third : 2 * third].to_parquet(src / "p1.parquet", index=False)
    tail = shuffled.iloc[2 * third :]
    sentinel_ms = int(BASE.timestamp() * 1000) + 3_600_000 * 1000
    tail = pd.concat(
        [
            tail,
            pd.DataFrame(
                [("click", sentinel_ms, 0), ("error", sentinel_ms, 0)],
                columns=tail.columns,
            ),
        ],
        ignore_index=True,
    )
    tail.to_parquet(src / "p2.parquet", index=False)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("hour", F.timestamp_millis(F.col("hour_ms")))
        .select("event_type", "hour", "n")
    )
    alerts = streaming_zscore_alerts(
        stream, window=_Z_WINDOW, sigma=_Z_SIGMA, watermark="100 hours"
    )
    q = (
        alerts.writeStream.format("memory")
        .queryName("zscore_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def rows(df):
        return {
            (r.event_type, r.hour, r.n, r.trailing_sum, r.trailing_sumsq)
            for r in df.collect()
        }

    hourly = spark.createDataFrame(pdf, SCHEMA).select(
        "event_type", F.timestamp_millis(F.col("hour_ms")).alias("hour"), "n"
    )
    streamed = rows(
        spark.table("zscore_stream").filter(
            F.col("hour") < F.timestamp_millis(F.lit(sentinel_ms))
        )
    )
    batch = rows(_batch_alerts(spark, hourly))
    assert streamed == batch
    assert batch, "planted spikes must alert"
    kinds = {(e, (h - BASE.replace(tzinfo=None)).total_seconds() // 3600)
             for e, h, *_ in batch}
    assert ("click", 30) in kinds and ("error", 52) in kinds


def test_zscore_restart_from_checkpoint(spark, tmp_path):
    """Kill the stateful z-score query mid-stream, restart from the
    same checkpoint, feed the rest: combined alerts are complete and
    duplicate-free (state -- the trailing deque -- survives the
    restart)."""
    pdf = _series().sort_values("hour_ms", kind="stable").reset_index(drop=True)
    src = tmp_path / "counts_r"
    src.mkdir()
    out = str(tmp_path / "alerts_out")
    ckpt = str(tmp_path / "ckpt_r")
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(src / "p0.parquet", index=False)

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn("hour", F.timestamp_millis(F.col("hour_ms")))
            .select("event_type", "hour", "n")
        )
        alerts = streaming_zscore_alerts(
            stream, window=_Z_WINDOW, sigma=_Z_SIGMA, watermark="100 hours"
        )
        return (
            alerts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # simulated failure/redeploy

    sentinel_ms = int(BASE.timestamp() * 1000) + 3_600_000 * 1000
    tail = pd.concat(
        [
            pdf.iloc[half:],
            pd.DataFrame(
                [("click", sentinel_ms, 0), ("error", sentinel_ms, 0)],
                columns=pdf.columns,
            ),
        ],
        ignore_index=True,
    )
    tail.to_parquet(src / "p1.parquet", index=False)
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = (
        spark.read.parquet(out)
        .filter(F.col("hour") < F.timestamp_millis(F.lit(sentinel_ms)))
    )
    rows = [
        (r.event_type, r.hour, r.n, r.trailing_sum, r.trailing_sumsq)
        for r in got.collect()
    ]
    assert len(rows) == len(set(rows)), "no duplicate alerts across restart"
    hourly = spark.createDataFrame(pdf, SCHEMA).select(
        "event_type", F.timestamp_millis(F.col("hour_ms")).alias("hour"), "n"
    )
    batch = {
        (r.event_type, r.hour, r.n, r.trailing_sum, r.trailing_sumsq)
        for r in _batch_alerts(spark, hourly).collect()
    }
    assert set(rows) == batch and batch
