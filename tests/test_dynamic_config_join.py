"""Dynamic-config enrichment (Flink broadcast-state analogue).

The robust Spark pattern for live config is re-reading the config
table INSIDE foreachBatch: each micro-batch plans a fresh read, so
file listings, sizes, and names are re-resolved every batch (a plain
stream-static join pins the file index at plan time -- new/changed
config files there are version-dependent behavior, not a contract).
This test proves config overwritten between batches changes
enrichment mid-stream, no restart."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F, types as T

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("campaign_id", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def _write_atomic(directory, name, df):
    """Temp-file + rename: the watched directory must never expose a
    half-written parquet to a concurrent trigger."""
    tmp = directory.parent / f".__tmp_{name}"
    df.to_parquet(tmp, index=False)
    os.rename(tmp, directory / name)


def test_config_overwrite_applies_to_later_batches(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    cfg = tmp_path / "config"
    cfg.mkdir()
    out = tmp_path / "out"
    _write_atomic(
        cfg, "config.parquet",
        pd.DataFrame([("camp-1", 10), ("camp-2", 20)],
                     columns=["campaign_id", "multiplier"]),
    )
    base_ms = 1_700_000_000_000
    _write_atomic(
        src, "p0.parquet",
        pd.DataFrame([(1, "camp-1", base_ms), (2, "camp-2", base_ms + 1000)],
                     columns=["event_id", "campaign_id", "ts_ms"]),
    )

    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )

    def enrich(batch_df, batch_id):
        # fresh read per batch: THE dynamic-config contract
        config = batch_df.sparkSession.read.parquet(str(cfg))
        (
            batch_df.join(F.broadcast(config), "campaign_id", "left")
            .select("event_id", "campaign_id", "multiplier")
            .write.mode("append")
            .parquet(str(out))
        )

    q = (
        stream.writeStream.foreachBatch(enrich)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # config change between batches: camp-1 re-weighted, camp-3 added
        _write_atomic(
            cfg, "config.parquet",
            pd.DataFrame([("camp-1", 99), ("camp-3", 30)],
                         columns=["campaign_id", "multiplier"]),
        )
        _write_atomic(
            src, "p1.parquet",
            pd.DataFrame(
                [(3, "camp-1", base_ms + 2000), (4, "camp-3", base_ms + 3000)],
                columns=["event_id", "campaign_id", "ts_ms"],
            ),
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.event_id: r.multiplier
        for r in spark.read.parquet(str(out)).collect()
    }
    # batch 1 used config v1; batch 2 used config v2 -- same campaign,
    # different multiplier across batches, new campaign resolves
    assert got == {1: 10, 2: 20, 3: 99, 4: 30}
