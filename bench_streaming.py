#!/usr/bin/env python3
"""Streaming throughput benchmark: events/sec through the full
streaming CTR pipeline (dedup x2 + interval join + 2 windowed aggs +
agg-join), file source -> memory sink.

The reference's workload rate is 50 events/s (generate_events.py:18);
BASELINE.md sets >= 50 ev/s as the floor and >= 5000 ev/s single-node
as the stretch target. Prints one JSON line.

Usage: python3 bench_streaming.py [duration_sec] [--rocksdb]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_ad_analytics_spark.fixtures import generate  # noqa: E402
from flink_ad_analytics_spark.session import build_session  # noqa: E402
from flink_ad_analytics_spark.streaming.jobs import streaming_ctr_windows  # noqa: E402
from flink_ad_analytics_spark.streaming.sources import file_event_stream  # noqa: E402
from flink_ad_analytics_spark.streaming.metrics import (  # noqa: E402
    QueryMetricsRecorder,
)
from flink_ad_analytics_spark.streaming.state import use_rocksdb  # noqa: E402


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 3600
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="fas-stream-bench",
        cpus=cpus,
        shuffle_partitions=max(8, cpus // 2),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    store = "hdfs-backed"
    if "--rocksdb" in sys.argv:
        use_rocksdb(spark)
        store = "rocksdb"

    recorder = QueryMetricsRecorder()
    spark.streams.addListener(recorder)
    tmp = tempfile.mkdtemp(prefix="fas_stream_bench_")
    try:
        fx = generate(duration_sec=duration, seed=42)
        n_events = len(fx.impressions) + len(fx.clicks)
        imp_dir, clk_dir = f"{tmp}/imp", f"{tmp}/clk"
        os.makedirs(imp_dir)
        os.makedirs(clk_dir)
        # 8 files per side -> several micro-batches
        imp = fx.impressions.sort_values("event_timestamp")
        clk = fx.clicks.sort_values("event_timestamp")
        for i in range(8):
            imp.iloc[i * len(imp) // 8 : (i + 1) * len(imp) // 8].to_parquet(
                f"{imp_dir}/part-{i}.parquet", index=False
            )
            clk.iloc[i * len(clk) // 8 : (i + 1) * len(clk) // 8].to_parquet(
                f"{clk_dir}/part-{i}.parquet", index=False
            )

        # Methodology (pinned in round 4 so round-over-round numbers
        # are comparable): FIXED virtual duration, N independent
        # repeats of the full pipeline (fresh checkpoint + sink each),
        # 1-minute load average recorded immediately before each
        # repeat, and the reported value is the MEDIAN of the repeats
        # with the min/max band alongside. A repeat whose load average
        # exceeds ~25% of the core count is flagged loaded=true --
        # treat its number as suspect rather than silently averaging
        # it in.
        repeats = 3
        if "--repeats" in sys.argv:
            repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
        runs = []
        out_rows = 0
        for rep in range(repeats):
            load1 = os.getloadavg()[0]
            imp_s = file_event_stream(
                spark, imp_dir, spark.read.parquet(imp_dir).schema,
                watermark="5 seconds", max_files_per_trigger=1,
            )
            clk_s = (
                file_event_stream(
                    spark, clk_dir, spark.read.parquet(clk_dir).schema,
                    watermark=None, max_files_per_trigger=1,
                    event_time_col="click_time",
                )
                .drop("event_timestamp")
                .withWatermark("click_time", "5 seconds")
            )
            result = streaming_ctr_windows(
                imp_s, clk_s, window="1 minute", band="10 minutes"
            )
            t0 = time.perf_counter()
            q = (
                result.writeStream.format("memory")
                .queryName(f"bench_stream_r{rep}")
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt_r{rep}")
                .start()
            )
            q.processAllAvailable()
            rep_elapsed = time.perf_counter() - t0
            q.stop()
            out_rows = spark.table(f"bench_stream_r{rep}").count()
            runs.append(
                {
                    "events_per_sec": round(n_events / rep_elapsed, 1),
                    "elapsed_sec": round(rep_elapsed, 2),
                    "load_avg_1m_before": round(load1, 2),
                    "loaded": load1 > cpus * 0.25,
                }
            )
            print(json.dumps({"repeat": rep, **runs[-1]}), file=sys.stderr)
        # the reported value and elapsed_sec come from ONE
        # representative run (the lower-median by rate for even N) so
        # value * elapsed == n_events always holds -- independently
        # sorted medians would describe two different runs
        ordered = sorted(runs, key=lambda r: r["events_per_sec"])
        rep = ordered[(len(ordered) - 1) // 2]
        rates = [r["events_per_sec"] for r in ordered]
        median_rate = rep["events_per_sec"]
        elapsed = rep["elapsed_sec"]

        # second stage: stateful as-of attribution over the same feed
        from flink_ad_analytics_spark.streaming.asof import (
            streaming_click_attribution,
        )

        imp_s2 = file_event_stream(
            spark, imp_dir, spark.read.parquet(imp_dir).schema,
            watermark=None, max_files_per_trigger=1,
        )
        clk_s2 = file_event_stream(
            spark, clk_dir, spark.read.parquet(clk_dir).schema,
            watermark=None, max_files_per_trigger=1,
            event_time_col="click_time",
        )
        att = streaming_click_attribution(imp_s2, clk_s2)
        t1 = time.perf_counter()
        q2 = (
            att.writeStream.format("memory")
            .queryName("bench_asof")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt_asof")
            .start()
        )
        q2.processAllAvailable()
        asof_elapsed = time.perf_counter() - t1
        q2.stop()
        asof_rows = spark.table("bench_asof").count()

        # third stage: the MinHash-band near-dup ingest gate
        # (streaming/jobs.py::streaming_ingest_neardup) over a planted
        # 5%-dup document corpus -- per-row 16-way salted shingle
        # hashing + band dedup + verdict agg, the most compute-dense
        # stateful gate in the curation family; docs/sec is its ops
        # number (documents are ~40-120 tokens, i.e. hundreds of
        # hashed shingles per doc)
        import numpy as np
        import pandas as pd

        from bench_scale import make_corpus
        from flink_ad_analytics_spark.streaming.jobs import (
            streaming_ingest_neardup,
        )

        n_docs_nd = 25_000
        corpus, _planted = make_corpus(n_docs_nd)
        corpus = corpus.reset_index(drop=True)
        base_ms = 1_704_067_200_000
        corpus["event_time_ms"] = base_ms + np.arange(len(corpus)) * 40
        nd_dir = f"{tmp}/nd"
        os.makedirs(nd_dir)
        files = 8
        for i in range(files):
            corpus.iloc[
                i * len(corpus) // files : (i + 1) * len(corpus) // files
            ].to_parquet(f"{nd_dir}/part-{i}.parquet", index=False)
        from pyspark.sql import functions as F

        # FOUR micro-batch shapes (r6: the two endpoints plus the
        # intermediate settings the r5 irreducibility measurement
        # called for), because the gate's cost is dominated by
        # PER-TRIGGER stateful machinery (state-store commits +
        # planning), not by the hashing (the whole corpus signs in
        # ~3s batch-side): throughput scales with batch size, latency
        # with its inverse -- Spark's standard micro-batch dial,
        # exposed on the reader via maxFilesPerTrigger
        # (streaming/jobs.py::streaming_ingest_neardup docstring
        # carries the recommendation table).
        nd_stats = {}
        for shape, max_files in (
            ("8_triggers", "1"),
            ("4_triggers", "2"),
            ("2_triggers", "4"),
            ("1_trigger", None),
        ):
            reader = spark.readStream.schema(
                spark.read.parquet(nd_dir).schema
            )
            if max_files:
                reader = reader.option("maxFilesPerTrigger", max_files)
            nd_stream = reader.parquet(nd_dir).withColumn(
                "event_time", F.timestamp_millis(F.col("event_time_ms"))
            )
            verdicts = streaming_ingest_neardup(
                nd_stream, watermark="10 seconds", shuffle_docs=cpus
            )
            t2 = time.perf_counter()
            q3 = (
                verdicts.writeStream.format("memory")
                .queryName(f"bench_neardup_{shape}")
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt_nd_{shape}")
                .start()
            )
            q3.processAllAvailable()
            nd_el = time.perf_counter() - t2
            q3.stop()
            nd_stats[shape] = {
                "docs_per_sec": round(len(corpus) / nd_el, 1),
                "elapsed_sec": round(nd_el, 2),
                "kept": spark.table(f"bench_neardup_{shape}")
                .filter("kept")
                .count(),
            }

        # r5: the FUSED single-stateful-op gate (foreachBatch verdict
        # assembly -- streaming/jobs.py::streaming_ingest_neardup_fused)
        # at the same small-trigger shape, on the RocksDB provider (the
        # per-trigger instrumented decomposition showed the HDFS store's
        # commit clock was ~22% of addBatch; RocksDB removes it).
        from flink_ad_analytics_spark.streaming.jobs import (
            streaming_ingest_neardup_fused,
        )
        from flink_ad_analytics_spark.streaming.state import (
            use_default_store,
            use_rocksdb,
        )

        use_rocksdb(spark)
        try:
            reader = (
                spark.readStream.schema(spark.read.parquet(nd_dir).schema)
                .option("maxFilesPerTrigger", "1")
            )
            nd_stream = reader.parquet(nd_dir).withColumn(
                "event_time", F.timestamp_millis(F.col("event_time_ms"))
            )
            pioneers, verdicts_fn = streaming_ingest_neardup_fused(
                nd_stream, watermark="10 seconds", shuffle_docs=cpus
            )
            fused_rows: list = []
            t2 = time.perf_counter()
            q4 = (
                pioneers.writeStream.outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt_nd_fused")
                .foreachBatch(
                    lambda df, _b: fused_rows.extend(
                        verdicts_fn(df).collect()
                    )
                )
                .start()
            )
            q4.processAllAvailable()
            nd_el = time.perf_counter() - t2
            q4.stop()
            nd_stats["8_triggers_fused_rocksdb"] = {
                "docs_per_sec": round(len(corpus) / nd_el, 1),
                "elapsed_sec": round(nd_el, 2),
                "kept": sum(1 for r in fused_rows if r.kept),
            }
        finally:
            use_default_store(spark)

        # per-batch engine health from the listener -> committed
        # artifact (the ops story: rates, state size, watermark, late
        # drops for the exact run that produced the throughput number).
        # Listener delivery is async: poll until the recorder has seen
        # every input row of both queries (or time out) rather than
        # assuming a fixed drain time.
        expected = {
            **{
                f"bench_stream_r{i}": n_events + len(fx.impressions)
                for i in range(repeats)
            },
            "bench_asof": n_events,
            "bench_neardup_8_triggers": len(corpus),
        }
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            health = recorder.summary()
            if all(health.get(q, {}).get("total_input_rows", 0) >= n
                   for q, n in expected.items()):
                break
            time.sleep(0.25)
        health = recorder.summary()
        health_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            ".benchmarks", "streaming_health.json",
        )
        with open(health_path, "w") as f:
            json.dump(
                {
                    "methodology": {
                        "virtual_duration_sec": duration,
                        "repeats": repeats,
                        "cpus": cpus,
                        "state_store": store,
                        "value_is": "median events/sec over repeats",
                        "runs": runs,
                    },
                    "queries": health,
                    # r6 (VERDICT r5 #7): the near-dup gate's batch-size
                    # dial measured at 4 trigger sizings -- throughput
                    # scales with docs/trigger because per-trigger
                    # incremental execution dominates (the r5
                    # irreducibility measurement's conclusion, acted on)
                    "neardup_trigger_dial": nd_stats,
                },
                f,
                indent=1,
            )

        print(
            json.dumps(
                {
                    "metric": "streaming_ctr_throughput",
                    "value": median_rate,
                    "unit": "events/sec",
                    "band": [rates[0], rates[-1]],
                    "repeats": repeats,
                    "runs": runs,
                    "events": n_events,
                    "elapsed_sec": elapsed,
                    "result_rows": out_rows,
                    "state_store": store,
                    "virtual_duration_sec": duration,
                    "asof_throughput": round(n_events / asof_elapsed, 1),
                    "asof_elapsed_sec": round(asof_elapsed, 2),
                    "asof_rows": asof_rows,
                    "neardup_docs": len(corpus),
                    "neardup": nd_stats,
                    "health_artifact": "streaming_health.json",
                    "max_state_rows": max(
                        (h["max_state_rows"] for h in health.values()), default=0
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
