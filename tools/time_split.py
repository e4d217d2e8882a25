#!/usr/bin/env python3
"""Per-stage time split for named queries: scan vs shuffle vs compute.

Answers the round-4 verdict's demand: is the 2-3s absolute cost of the
small relational aggregates at sf10 a plan defect or Spark's
shuffle/scheduling floor? For each query we run once to warm the
template (analysis/codegen/JIT are one-time costs -- see
tools/query_floor.py), then run again inside a dedicated job group and
pull that run's completed stages from the local UI's REST API
(/api/v1/applications/<id>/stages), recording per stage:

  executorRunTime / executorCpuTime   -- where wall-clock went
  shuffleWriteTime / shuffleFetchWaitTime + bytes  -- exchange cost
  inputBytes / inputRecords           -- scan volume

The JSON artifact (.benchmarks/time_split_sf{sf}.json) groups stages
per query and sums the buckets so a reader can see e.g. "1.9s executor
time: 1.1s in the scan stage, 0.5s shuffle write, 0.3s reduce" and
compare against the single-process oracle engine's number.

Usage: [SPARK_GRAFT_SF_DIR=...] python3 tools/time_split.py q1,q2,...
Subset runs merge into an existing artifact.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_FIELDS = [
    "stageId",
    "name",
    "numTasks",
    "executorRunTime",
    "executorCpuTime",
    "inputBytes",
    "inputRecords",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "shuffleWriteTime",
    "shuffleFetchWaitTime",
]


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale_data/sf10")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = m.group(1) if m else "custom"
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "ctr_hourly", "engagement_hourly", "campaign_spend", "anomaly_alerts",
    ]

    from bench import materialize
    from flink_ad_analytics_spark.session import build_session
    import __spark_entry__ as entrymod

    spark = build_session(
        app_name="time-split",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    sc = spark.sparkContext
    base = f"http://localhost:4049/api/v1/applications/{sc.applicationId}"
    qs = entrymod.queries()

    out = {}
    for name in names:
        fn = qs[name]
        materialize(fn(spark, sf_dir))  # warm the template (one-time costs)
        sc.setJobGroup(name, name, interruptOnCancel=False)
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        wall = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle", interruptOnCancel=False)
        time.sleep(0.5)  # let the UI store flush listener events

        jobs = [j for j in _get(f"{base}/jobs") if j.get("jobGroup") == name]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        stages = []
        for sid in stage_ids:
            # poll briefly past the flat 0.5s sleep: a slow listener
            # bus would otherwise silently DROP a still-ACTIVE stage
            # from the totals
            infos = []
            for _ in range(20):
                try:
                    infos = _get(f"{base}/stages/{sid}")
                except Exception:
                    break
                if all(i.get("status") != "ACTIVE" for i in infos):
                    break
                time.sleep(0.25)
            done = [i for i in infos if i.get("status") == "COMPLETE"]
            if not done:
                continue
            # a retried stage reports one row per ATTEMPT; summing all
            # of them double-counts -- keep only the last attempt
            info = max(done, key=lambda i: i.get("attemptId", 0))
            row = {k: info.get(k) for k in STAGE_FIELDS}
            # ns -> ms for cpu & shuffle-write clocks
            row["executorCpuTime"] = round(row["executorCpuTime"] / 1e6, 1)
            row["shuffleWriteTime"] = round(row["shuffleWriteTime"] / 1e6, 1)
            stages.append(row)
        totals = {
            "wall_sec": round(wall, 2),
            "executor_run_ms": sum(s["executorRunTime"] for s in stages),
            "executor_cpu_ms": round(sum(s["executorCpuTime"] for s in stages), 1),
            "scan_input_bytes": sum(s["inputBytes"] for s in stages),
            "scan_input_records": sum(s["inputRecords"] for s in stages),
            "shuffle_write_bytes": sum(s["shuffleWriteBytes"] for s in stages),
            "shuffle_write_ms": round(sum(s["shuffleWriteTime"] for s in stages), 1),
            "shuffle_fetch_wait_ms": sum(s["shuffleFetchWaitTime"] for s in stages),
            "n_stages": len(stages),
        }
        out[name] = {"totals": totals, "stages": stages}
        print(name, json.dumps(totals), file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
        f"time_split_sf{sf}.json",
    )
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f).get("queries", {})
        prior.update(out)
        out = prior
    payload = {
        "sf_dir": sf_dir,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "note": (
            "Steady-state (post-warmup) per-stage UI metrics per query. "
            "executorRunTime is summed across 32 local threads, so "
            "run_ms/32 ~ the parallel wall contribution; wall_sec - "
            "run_ms/32 is scheduling/driver overhead. shuffleWriteTime "
            "is the serialize+spill clock inside executorRunTime."
        ),
        "queries": out,
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"written": path, "n": len(out)}))


if __name__ == "__main__":
    main()
