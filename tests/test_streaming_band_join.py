"""Streaming keyless band join == batch binned_range_join on the same
data; raw keyless band join is rejected by the streaming planner
(documenting why the bucket trick is required)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from flink_ad_analytics_spark.operators.range_join import binned_range_join
from flink_ad_analytics_spark.streaming.band_join import streaming_band_join

BASE = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

L_SCHEMA = T.StructType(
    [T.StructField("lid", T.LongType()), T.StructField("l_ms", T.LongType())]
)
R_SCHEMA = T.StructType(
    [T.StructField("rid", T.LongType()), T.StructField("r_ms", T.LongType())]
)


def _data(seed=3, n_left=25, n_right=120, span_s=600):
    rng = random.Random(seed)
    base_ms = int(BASE.timestamp() * 1000)
    lrows = sorted(
        (i, base_ms + int(rng.uniform(0, span_s) * 1000)) for i in range(n_left)
    )
    rrows = sorted(
        (j, base_ms + int(rng.uniform(0, span_s) * 1000)) for j in range(n_right)
    )
    return lrows, rrows


def _write_sorted(rows, cols, time_col, directory):
    directory.mkdir()
    d = pd.DataFrame(rows, columns=cols).sort_values(time_col).reset_index(drop=True)
    half = len(d) // 2
    d.iloc[:half].to_parquet(directory / "p0.parquet", index=False)
    d.iloc[half:].to_parquet(directory / "p1.parquet", index=False)


def test_streaming_band_join_equals_batch(spark, tmp_path):
    lrows, rrows = _data()
    _write_sorted(lrows, ["lid", "l_ms"], "l_ms", tmp_path / "l")
    _write_sorted(rrows, ["rid", "r_ms"], "r_ms", tmp_path / "r")

    def stream(path, schema, ms_col, t_col):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path))
            .withColumn(t_col, F.timestamp_millis(F.col(ms_col)))
            .withWatermark(t_col, "30 seconds")
        )

    ls = stream(tmp_path / "l", L_SCHEMA, "l_ms", "l_time")
    rs = stream(tmp_path / "r", R_SCHEMA, "r_ms", "r_time")
    joined = streaming_band_join(
        ls,
        rs,
        left_time="l_time",
        right_time="r_time",
        band_before="20 seconds",
        band_after="20 seconds",
        bin_width="40 seconds",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("band_join_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.lid, r.rid)
        for r in spark.table("band_join_stream").select("lid", "rid").collect()
    }

    lb = spark.createDataFrame(lrows, L_SCHEMA).select(
        "lid",
        (F.timestamp_millis(F.col("l_ms")) - F.expr("INTERVAL 20 SECONDS")).alias("lo"),
        (F.timestamp_millis(F.col("l_ms")) + F.expr("INTERVAL 20 SECONDS")).alias("hi"),
    )
    rb = spark.createDataFrame(rrows, R_SCHEMA).select(
        "rid", F.timestamp_millis(F.col("r_ms")).alias("pt")
    )
    expected = {
        (r.lid, r.rid)
        for r in binned_range_join(
            lb, rb, left_lo="lo", left_hi="hi", right_point="pt",
            bin_width="40 seconds",
        )
        .select("lid", "rid")
        .collect()
    }
    assert expected, "fixture must produce matches"
    assert got == expected


def test_raw_keyless_band_join_rejected_in_streaming(spark, tmp_path):
    """Why the operator exists: without the bucket equi key the
    streaming planner refuses a pure band-predicate stream-stream
    join."""
    lrows, rrows = _data(n_left=4, n_right=4)
    _write_sorted(lrows, ["lid", "l_ms"], "l_ms", tmp_path / "l")
    _write_sorted(rrows, ["rid", "r_ms"], "r_ms", tmp_path / "r")
    ls = (
        spark.readStream.schema(L_SCHEMA).parquet(str(tmp_path / "l"))
        .withColumn("l_time", F.timestamp_millis(F.col("l_ms")))
        .withWatermark("l_time", "30 seconds")
    )
    rs = (
        spark.readStream.schema(R_SCHEMA).parquet(str(tmp_path / "r"))
        .withColumn("r_time", F.timestamp_millis(F.col("r_ms")))
        .withWatermark("r_time", "30 seconds")
    )
    naive = ls.join(
        rs,
        (F.col("r_time") >= F.col("l_time") - F.expr("INTERVAL 20 SECONDS"))
        & (F.col("r_time") <= F.col("l_time") + F.expr("INTERVAL 20 SECONDS")),
        "inner",
    )
    with pytest.raises(Exception, match="[Ss]tream|join|equality|support"):
        q = (
            naive.writeStream.format("memory")
            .queryName("naive_band")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
