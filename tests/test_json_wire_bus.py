"""JSON wire-format round trip over the two-stage bus, broker-less:
stage-1 CTR results serialized with the EXACT Kafka-sink payload
expression (to_json(struct(*)) -- streaming/sinks.py::to_kafka_json),
carried as text lines, decoded by stage-2 with from_json, then the
anomaly stage produces the same alerts as the unserialized batch
chain. Malformed lines injected on the wire are dropped, matching
`json.ignore-parse-errors` (flink_job.sql:22).

This closes the wire-format gap the broker's absence leaves: the
socket is the only untested piece; serialization, schema, lenient
decode, and the topology all round-trip here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from flink_ad_analytics_spark.fixtures import generate
from flink_ad_analytics_spark.operators.anomaly import detect_anomalies
from flink_ad_analytics_spark.operators.ctr import ctr_windows

CTR_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("window_end", T.TimestampType()),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("impression_count", T.LongType()),
        T.StructField("click_count", T.LongType()),
        T.StructField("ctr", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def ctr_results(spark):
    fx = generate(duration_sec=1200)
    imp = spark.createDataFrame(fx.impressions).withColumn(
        "event_time", F.timestamp_millis(F.col("event_timestamp"))
    )
    clk = (
        spark.createDataFrame(fx.clicks)
        .withColumn("click_time", F.timestamp_millis(F.col("event_timestamp")))
        .drop("event_timestamp")
    )
    return ctr_windows(imp, clk)


def test_kafka_payload_roundtrip_through_anomaly_stage(
    spark, tmp_path, ctr_results
):
    # stage-1 sink payload: the exact to_kafka_json value expression
    payload = ctr_results.select(F.to_json(F.struct("*")).alias("value"))
    wire = tmp_path / "wire"
    payload.coalesce(1).write.text(str(wire))

    # corrupt the wire: garbage + half-a-record lines appended
    (wire / "garbage.txt").write_text(
        'not json at all\n{"window_start": "2024-01-01T00:00:00"\n{}\n'
    )

    # stage-2: consume the topic, lenient decode, LAG alerts
    raw = spark.read.text(str(wire)).select(F.col("value"))
    decoded = (
        raw.select(
            F.from_json(F.col("value").cast("string"), CTR_WIRE_SCHEMA).alias("e")
        )
        .filter(F.col("e").isNotNull())
        .select("e.*")
        .filter(F.col("window_end").isNotNull())  # drop all-null rows
    )
    assert decoded.count() == ctr_results.count(), "garbage dropped, data kept"

    via_wire = {
        tuple(r)
        for r in detect_anomalies(decoded)
        .select("alert_time", "campaign_id", "current_ctr", "previous_ctr",
                "alert_type")
        .collect()
    }
    direct = {
        tuple(r)
        for r in detect_anomalies(ctr_results)
        .select("alert_time", "campaign_id", "current_ctr", "previous_ctr",
                "alert_type")
        .collect()
    }
    assert via_wire == direct and direct, "wire round trip must be lossless"


def test_wire_preserves_values_exactly(spark, ctr_results):
    """Serialize -> parse in-plan: every row survives bit-exactly
    (timestamps to the microsecond, doubles to the last bit via
    JSON's shortest-roundtrip encoding)."""
    round_tripped = (
        ctr_results.select(F.to_json(F.struct("*")).alias("value"))
        .select(F.from_json("value", CTR_WIRE_SCHEMA).alias("e"))
        .select("e.*")
    )
    a = {tuple(r) for r in ctr_results.collect()}
    b = {tuple(r) for r in round_tripped.collect()}
    assert a == b
