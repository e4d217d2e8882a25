"""Dynamic-config enrichment (Flink broadcast-state analogue): a
stream-static join re-resolves the static side every micro-batch, so
overwriting the config table between batches changes enrichment
mid-stream -- no restart. This pins the Spark behavior the engine's
stream-static enrichment relies on for live config (blocklists,
bid multipliers, routing tables)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def _write_config(path, rows):
    pd.DataFrame(rows, columns=["campaign_id", "multiplier"]).to_parquet(
        path / "config.parquet", index=False
    )


def test_config_overwrite_applies_to_later_batches(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    cfg = tmp_path / "config"
    cfg.mkdir()
    _write_config(cfg, [("camp-1", 10), ("camp-2", 20)])

    base_ms = 1_700_000_000_000
    pd.DataFrame(
        [(1, "camp-1", base_ms), (2, "camp-2", base_ms + 1000)],
        columns=["event_id", "campaign_id", "ts_ms"],
    ).to_parquet(src / "p0.parquet", index=False)

    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    # static side read lazily: resolved against the CURRENT parquet
    # contents at each micro-batch's planning time
    config = spark.read.schema(
        "campaign_id string, multiplier long"
    ).parquet(str(cfg))
    enriched = stream.join(F.broadcast(config), "campaign_id", "left").select(
        "event_id", "campaign_id", "multiplier"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("dyncfg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()

        # config change between batches: camp-1 re-weighted, camp-3 added
        _write_config(cfg, [("camp-1", 99), ("camp-3", 30)])
        pd.DataFrame(
            [(3, "camp-1", base_ms + 2000), (4, "camp-3", base_ms + 3000)],
            columns=["event_id", "campaign_id", "ts_ms"],
        ).to_parquet(src / "p1.parquet", index=False)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.event_id: r.multiplier for r in spark.table("dyncfg").collect()}
    # batch 1 used config v1; batch 2 used config v2 -- same campaign,
    # different multiplier across batches, new campaign resolves
    assert got == {1: 10, 2: 20, 3: 99, 4: 30}
