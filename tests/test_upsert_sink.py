"""Streaming upsert (MERGE) sink: latest-per-key correctness under
out-of-order + stale updates, and the incremental-merge guarantee
that a micro-batch only rewrites the bucket partitions it touches."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.streaming.sinks import (
    read_upsert_table,
    upsert_sink,
)

SCHEMA = "k BIGINT, ver BIGINT, payload STRING"


def _write(feed, name, rows):
    pd.DataFrame(rows, columns=["k", "ver", "payload"]).to_parquet(
        f"{feed}/{name}", index=False
    )


def _snapshot_files(table):
    out = {}
    for entry in os.listdir(table):
        if entry.startswith("__bucket="):
            d = os.path.join(table, entry)
            out[entry] = sorted(
                (f, os.stat(os.path.join(d, f)).st_mtime_ns)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
    return out


def test_upsert_sink_latest_per_key_and_partial_rewrite(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    table = str(tmp_path / "table")
    _write(feed, "f0.parquet",
           [(k, 1, f"v1-{k}") for k in range(1, 9)])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed))
    )
    q = upsert_sink(
        stream,
        path=table,
        checkpoint=str(tmp_path / "ckpt"),
        keys=["k"],
        order_col="ver",
        tiebreak_col="payload",
        n_buckets=4,
    )
    q.processAllAvailable()
    before = _snapshot_files(table)
    assert len(before) > 1  # keys spread over several buckets

    # batch 2: update k=1, insert k=100, and a STALE row for k=2 that
    # must not win over its existing ver=1? (no -- ver=0 < 1: stale)
    _write(feed, "f1.parquet",
           [(1, 2, "v2-1"), (100, 1, "v1-100"), (2, 0, "v0-2-stale")])
    q.processAllAvailable()
    after = _snapshot_files(table)
    q.stop()

    cur = {
        r.k: (r.ver, r.payload)
        for r in read_upsert_table(spark, table).collect()
    }
    expect = {k: (1, f"v1-{k}") for k in range(1, 9)}
    expect[1] = (2, "v2-1")
    expect[100] = (1, "v1-100")
    assert cur == expect

    # incremental merge: buckets untouched by batch 2 keep their exact
    # files (same names, same mtimes) -- never read, never rewritten
    touched = {
        f"__bucket={r.b}"
        for r in spark.createDataFrame([(1,), (100,), (2,)], "k BIGINT")
        .select(F.pmod(F.xxhash64("k"), F.lit(4)).cast("int").alias("b"))
        .collect()
    }
    untouched = set(before) - touched
    assert untouched, "test needs at least one untouched bucket"
    for b in untouched:
        assert after[b] == before[b], f"bucket {b} was rewritten"
    for b in touched & set(before):
        assert after[b] != before[b]


def test_upsert_sink_out_of_order_batches(spark, tmp_path):
    """Versions arriving across batches in arbitrary order converge to
    the global latest -- merge compares order_col, not arrival time."""
    feed = tmp_path / "feed"
    feed.mkdir()
    table = str(tmp_path / "table")
    _write(feed, "f0.parquet", [(7, 5, "v5")])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed))
    )
    q = upsert_sink(
        stream,
        path=table,
        checkpoint=str(tmp_path / "ckpt"),
        keys=["k"],
        order_col="ver",
        tiebreak_col="payload",
        n_buckets=2,
    )
    q.processAllAvailable()
    _write(feed, "f1.parquet", [(7, 3, "v3"), (7, 9, "v9")])
    q.processAllAvailable()
    _write(feed, "f2.parquet", [(7, 8, "v8")])
    q.processAllAvailable()
    q.stop()
    [(ver, payload)] = [
        (r.ver, r.payload) for r in read_upsert_table(spark, table).collect()
    ]
    assert (ver, payload) == (9, "v9")


def test_update_mode_aggregation_is_incremental_matview(spark, tmp_path):
    """UPDATE-mode streaming aggregation + keyed upsert = an
    incrementally-maintained materialized view: each micro-batch emits
    only the groups that changed, the merge upserts them, and the
    final table equals the batch aggregate over all data."""
    import datetime as dt

    from flink_ad_analytics_spark.streaming.sinks import (
        read_upsert_table,
        upsert_sink,
    )

    feed = tmp_path / "ev_feed"
    feed.mkdir()
    table = str(tmp_path / "matview")
    t0 = dt.datetime(2024, 5, 1)
    schema = "event_id long, ts timestamp, event_type string"
    batch1 = [(i, t0 + dt.timedelta(seconds=i), "view") for i in range(6)] + [
        (10 + i, t0 + dt.timedelta(seconds=i), "click") for i in range(3)
    ]
    batch2 = [(20 + i, t0 + dt.timedelta(seconds=60 + i), "view") for i in range(2)] + [
        (30, t0 + dt.timedelta(seconds=70), "purchase")
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(
        str(feed)
    )

    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(feed)).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed))
    )
    counts = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("event_id").alias("max_id"),
    )
    q = upsert_sink(
        counts,
        path=table,
        checkpoint=str(tmp_path / "ckpt_mv"),
        keys=["event_type"],
        order_col="n_events",  # counts only grow: latest == greatest
        tiebreak_col="max_id",
        n_buckets=4,
        output_mode="update",
    )
    q.processAllAvailable()
    mid = {
        r.event_type: r.n_events
        for r in read_upsert_table(spark, table).collect()
    }
    assert mid == {"view": 6, "click": 3}

    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(
        str(feed)
    )
    q.processAllAvailable()
    q.stop()
    final = {
        r.event_type: r.n_events
        for r in read_upsert_table(spark, table).collect()
    }
    batch_truth = {
        r.event_type: r.n
        for r in spark.read.parquet(str(feed))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == batch_truth == {"view": 8, "click": 3, "purchase": 1}


def test_update_mode_matview_survives_restart(spark, tmp_path):
    """Exactly-once under restart: stop the update-mode matview stream
    after batch 1, start a NEW query from the same checkpoint, feed
    more data -- the final table equals the batch aggregate with no
    double-applied groups (merge idempotency + checkpoint replay)."""
    import datetime as dt

    from flink_ad_analytics_spark.streaming.sinks import (
        read_upsert_table,
        upsert_sink,
    )

    feed = tmp_path / "ev_feed_r"
    feed.mkdir()
    table = str(tmp_path / "matview_r")
    ckpt = str(tmp_path / "ckpt_mv_r")
    t0 = dt.datetime(2024, 5, 2)
    schema = "event_id long, ts timestamp, event_type string"
    spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=i), "view") for i in range(5)], schema
    ).coalesce(1).write.mode("append").parquet(str(feed))

    def start():
        stream = (
            spark.readStream.schema(spark.read.parquet(str(feed)).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(feed))
        )
        counts = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("event_id").alias("max_id"),
        )
        return upsert_sink(
            counts, path=table, checkpoint=ckpt, keys=["event_type"],
            order_col="n_events", tiebreak_col="max_id", n_buckets=4,
            output_mode="update",
        )

    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # simulated failure/stop between batches

    spark.createDataFrame(
        [(10 + i, t0 + dt.timedelta(seconds=60 + i), "click") for i in range(4)]
        + [(20, t0 + dt.timedelta(seconds=70), "view")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(feed))

    q2 = start()  # fresh query object, same checkpoint
    q2.processAllAvailable()
    q2.stop()

    final = {
        r.event_type: r.n_events
        for r in read_upsert_table(spark, table).collect()
    }
    assert final == {"view": 6, "click": 4}


def test_compaction_shrinks_files_preserves_rows(spark, tmp_path):
    """After many touching micro-batches the table accretes files;
    compaction rewrites each bucket to ~1 file with identical rows."""
    from flink_ad_analytics_spark.streaming.sinks import (
        compact_upsert_table,
        read_upsert_table,
        upsert_sink,
    )

    feed = tmp_path / "feed_c"
    feed.mkdir()
    table = str(tmp_path / "table_c")
    for i in range(4):  # 4 micro-batches touching the same keys
        _write(feed, f"f{i}.parquet", [(k, i, f"v{i}-{k}") for k in range(1, 7)])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(feed))
    )
    # at toy scale AQE coalesces each merge to one task per bucket, so
    # the fragmentation compaction exists for never appears; disable
    # coalescing to reproduce the at-scale layout (each merge writing
    # one file per shuffle partition per bucket)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        q = upsert_sink(
            stream, path=table, checkpoint=str(tmp_path / "ckpt_c"),
            keys=["k"], order_col="ver", tiebreak_col="payload", n_buckets=2,
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    before_rows = sorted(
        (r.k, r.ver, r.payload) for r in read_upsert_table(spark, table).collect()
    )
    stats = compact_upsert_table(spark, table, files_per_bucket=1)
    after_rows = sorted(
        (r.k, r.ver, r.payload) for r in read_upsert_table(spark, table).collect()
    )
    assert after_rows == before_rows
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 2  # ~1 per bucket
