"""`ad_events` data-source tests: the reference's generator
(`generate_events.py`) re-expressed as a registered Spark source must
be deterministic, referentially consistent, distribution-faithful, and
identical across batch and streaming reads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.sources.generator import register_ad_events
from flink_ad_analytics_spark.fixtures import VIRTUAL_START_MS


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_ad_events(spark)


def _imp(spark, **opts):
    r = spark.read.format("ad_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_deterministic_and_sized(spark):
    a = _imp(spark, duration_sec=30).orderBy("impression_id").collect()
    b = _imp(spark, duration_sec=30, num_partitions=3).orderBy("impression_id").collect()
    assert len(a) == 30 * 50
    assert a == b  # partitioning must not change content


def test_impression_distributions(spark):
    df = _imp(spark, duration_sec=120)
    row = df.agg(
        F.count_distinct("campaign_id").alias("camps"),
        F.count_distinct("ad_id").alias("ads"),
        F.sum(F.col("device_type").isNull().cast("long")).alias("nulls"),
        F.count(F.lit(1)).alias("n"),
        F.min("cost").alias("cmin"),
        F.max("cost").alias("cmax"),
        F.min("event_timestamp").alias("tmin"),
    ).collect()[0]
    assert row.camps == 10 and row.ads == 100
    assert 0.02 < row.nulls / row.n < 0.10  # ~5% null devices
    assert 0.01 <= row.cmin and row.cmax <= 0.50
    assert row.tmin == VIRTUAL_START_MS


def test_clicks_referentially_consistent(spark):
    imp = _imp(spark, duration_sec=60)
    clk = (
        spark.read.format("ad_events")
        .option("kind", "clicks")
        .option("duration_sec", 60)
        .load()
    )
    orphans = clk.join(imp, "impression_id", "left_anti").count()
    assert orphans == 0
    # flat-phase click rate ~0.1 (excluding camp-1 whose phases shift it)
    flat = imp.filter(F.col("campaign_id") != "camp-1")
    joined = flat.join(clk, "impression_id", "left_semi")
    rate = joined.count() / flat.count()
    assert 0.07 < rate < 0.13


def test_camp1_spike_phase_rate(spark):
    """The DROP (boost 0.1) and SPIKE (boost 4.0 -> capped 0.6) phases
    must be visible in the generated click-through rates."""
    imp = _imp(spark, duration_sec=1200).filter(F.col("campaign_id") == "camp-1")
    clk = (
        spark.read.format("ad_events")
        .option("kind", "clicks")
        .option("duration_sec", 1200)
        .load()
    )
    t = (F.col("event_timestamp") - F.lit(VIRTUAL_START_MS)) / 1000
    phased = imp.withColumn(
        "phase",
        F.when(t < 300, "flat1")
        .when(t < 600, "drop")
        .when(t < 900, "spike")
        .otherwise("flat2"),
    )
    rates = {
        r.phase: r.rate
        for r in phased.join(clk, "impression_id", "left")
        .groupBy("phase")
        .agg((F.count("click_id") / F.count(F.lit(1))).alias("rate"))
        .collect()
    }
    assert rates["drop"] < 0.03
    assert 0.35 < rates["spike"] < 0.45  # min(0.6, 0.1*4.0) = 0.4
    assert 0.07 < rates["flat1"] < 0.13


def test_streaming_equals_batch(spark, tmp_path):
    """AvailableNow drains the stream to max_events; the result must be
    row-identical to the batch read of the same index range."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("ad_events")
        .option("duration_sec", 20)
        .option("max_events", 1000)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out).orderBy("impression_id").collect()
    batch = _imp(spark, duration_sec=20).orderBy("impression_id").collect()
    assert len(streamed) == 1000
    assert streamed == batch


def test_e2e_ctr_pipeline_from_source(spark, tmp_path):
    """The reference's full topology driven from the registered source:
    ad_events (impressions + clicks) -> interval-join CTR windows ->
    sink, with the batch ctr_windows spec as the oracle on the SAME
    generated data. Three incremental AvailableNow passes against one
    checkpoint (growing max_events) stand in for a live producer: each
    restart resumes from the committed offset, the watermark carried
    in the checkpoint closes earlier windows, and append mode emits
    them -- also proving offset/watermark recovery across restarts.
    NOTE the interval join delays the downstream watermark by its
    10-minute band, so windows close only once the input watermark
    passes window_end + band -- the virtual span must comfortably
    exceed the band (1200s here, like the reference's fixture).
    This is the broker-less end-to-end the Kafka path (S1-S3) could
    never get in this sandbox."""
    from flink_ad_analytics_spark.operators.ctr import ctr_windows
    from flink_ad_analytics_spark.streaming.jobs import streaming_ctr_windows

    dur = 1200
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_pass(max_events):
        imp_s = (
            spark.readStream.format("ad_events")
            .option("duration_sec", dur)
            .option("max_events", max_events)
            .load()
            .withColumn("event_time", F.timestamp_millis("event_timestamp"))
            .withWatermark("event_time", "5 seconds")
        )
        clk_s = (
            spark.readStream.format("ad_events")
            .option("kind", "clicks")
            .option("duration_sec", dur)
            .option("max_events", max_events)
            .load()
            .withColumn("click_time", F.timestamp_millis("event_timestamp"))
            .drop("event_timestamp")
            .withWatermark("click_time", "5 seconds")
        )
        result = streaming_ctr_windows(
            imp_s, clk_s, window="1 minute", band="10 minutes"
        )
        q = (
            result.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for max_events in (20_000, 40_000, 60_000):
        run_pass(max_events)

    streamed = spark.read.parquet(out).collect()
    # passes 2 and 3 must have flushed the windows their predecessors
    # closed: >= 3 one-minute windows across 300s of virtual time
    assert len({r.window_start for r in streamed}) >= 3
    imp_b = (
        spark.read.format("ad_events").option("duration_sec", dur).load()
        .withColumn("event_time", F.timestamp_millis("event_timestamp"))
    )
    clk_b = (
        spark.read.format("ad_events").option("kind", "clicks")
        .option("duration_sec", dur).load()
        .withColumn("click_time", F.timestamp_millis("event_timestamp"))
        .drop("event_timestamp")
    )
    batch = {
        (r.window_start, r.campaign_id): r
        for r in ctr_windows(
            imp_b, clk_b, window="1 minute", band="10 minutes"
        ).collect()
    }
    assert streamed
    for r in streamed:
        b = batch[(r.window_start, r.campaign_id)]
        assert (r.impression_count, r.click_count) == (
            b.impression_count,
            b.click_count,
        ), r
        assert abs(r.ctr - b.ctr) < 1e-12


def test_generated_phases_fire_reference_alerts(spark):
    """Semantic fidelity end-to-end: the generated camp-1 DROP (boost
    0.1 at t=300s) and SPIKE (boost 4.0 at t=600s) phases must fire
    the reference's anomaly alerts when run through the actual
    CTR -> LAG -> SPIKE/DROP operator chain (anomaly_job.sql)."""
    from flink_ad_analytics_spark.operators.anomaly import detect_anomalies
    from flink_ad_analytics_spark.operators.ctr import ctr_windows

    imp = _imp(spark, duration_sec=1200)
    clk = (
        spark.read.format("ad_events")
        .option("kind", "clicks")
        .option("duration_sec", 1200)
        .load()
    )
    ctr = ctr_windows(
        imp.withColumn("event_time", F.timestamp_millis("event_timestamp")),
        clk.withColumn("click_time", F.timestamp_millis("event_timestamp"))
        .drop("event_timestamp"),
        window="1 minute",
        band="10 minutes",
    )
    alerts = detect_anomalies(ctr).filter(F.col("campaign_id") == "camp-1")
    kinds = {
        (r.alert_type, (r.alert_time.minute // 5))
        for r in alerts.collect()
    }
    # DROP fires entering minute 5 (t=300s), SPIKE entering minute 10,
    # and the return to boost 1.0 at t=900s shows as a DROP at minute 15
    types = {t for t, _ in kinds}
    assert "DROP" in types and "SPIKE" in types, kinds
