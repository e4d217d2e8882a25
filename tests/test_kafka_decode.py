"""Kafka wire-format decode (S1-S4) without a broker: the shared
``decode_json_value`` path is fed synthetic Kafka-shaped rows (binary
``value`` column of JSON bytes) including malformed and
wrong-schema records, which must be dropped leniently -- the
reference's `json.ignore-parse-errors = 'true'` (flink_job.sql:22)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_ad_analytics_spark.fixtures import VIRTUAL_START_MS, generate
from flink_ad_analytics_spark.schemas import IMPRESSION_SCHEMA
from flink_ad_analytics_spark.streaming.sources import decode_json_value


def test_decode_drops_malformed_leniently(spark):
    fx = generate(duration_sec=10, seed=3)
    good = [
        json.dumps(
            {
                "impression_id": r.impression_id,
                "user_id": r.user_id,
                "campaign_id": r.campaign_id,
                "ad_id": r.ad_id,
                "device_type": r.device_type,
                "browser": r.browser,
                "event_timestamp": int(r.event_timestamp),
                "cost": float(r.cost),
            }
        )
        for r in fx.impressions.head(50).itertuples()
    ]
    bad = [
        "{not json at all",
        '"just a string"',
        "12345",
        "",
    ]
    raw = spark.createDataFrame(
        [(v.encode(),) for v in good + bad], "value binary"
    )
    decoded = decode_json_value(raw, IMPRESSION_SCHEMA, watermark=None)
    rows = decoded.collect()
    assert len(rows) == len(good)
    assert decoded.filter(F.col("impression_id").isNull()).count() == 0
    first = rows[0]
    assert first.event_time is not None
    assert first.event_timestamp >= VIRTUAL_START_MS


def test_decode_roundtrips_sink_format(spark):
    """to_json(struct(*)) -> decode must round-trip typed rows (the
    sink/source wire-format pairing, flink_job.sql:44-57 x :5-24)."""
    fx = generate(duration_sec=5, seed=4)
    imp = spark.createDataFrame(fx.impressions.head(20))
    wire = imp.select(F.to_json(F.struct("*")).alias("j")).select(
        F.encode(F.col("j"), "UTF-8").alias("value")
    )
    decoded = decode_json_value(wire, IMPRESSION_SCHEMA, watermark=None)
    assert decoded.count() == 20
    a = {r.impression_id: r.campaign_id for r in decoded.collect()}
    b = {r.impression_id: r.campaign_id for r in imp.collect()}
    assert a == b
