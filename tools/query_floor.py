#!/usr/bin/env python3
"""Separate each query's one-time cost (driver-side analysis, codegen,
JIT warmup -- constant in data size) from its steady-state execution
(the part that scales with data): run each query's pruning-proof
materializer once cold, then twice more on fresh DataFrames in the
same session, and record first vs min(steady).

Why it matters: local-mode bench totals at toy SFs are dominated by
the first-run constant (e.g. the pre-swap HLL++ profile spent ~8s of
its 12s compiling a 12K-attribute aggregation buffer), which a
1000-executor cluster pays once per query TEMPLATE, not per 100 TB of
input. The committed artifact quantifies that split per query so
bench regressions can be attributed to the right bucket.

Usage: [SPARK_GRAFT_SF_DIR=...] python3 tools/query_floor.py q1,q2,...
Writes .benchmarks/query_floor_sf{sf}.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scale_data/sf3")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = m.group(1) if m else "custom"
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    from bench import materialize
    from flink_ad_analytics_spark.session import build_session
    import __spark_entry__ as entrymod

    spark = build_session(
        app_name="query-floor",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    qs = entrymod.queries()
    if names is None:
        names = [n for n in qs]
    out = {}
    for name in names:
        # Host-load stamp (round 9): this host's numbers swing +/-35%
        # under sustained back-to-back-session load (COVERAGE.md
        # host-variance note; the coloc market_share row moved
        # 1.34->2.21->1.62 with zero code change). Stamping the
        # 1-minute load average into every row makes that variance
        # adjudicable from the committed artifact instead of from
        # narrative memory.
        load_before = round(os.getloadavg()[0], 1)
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        first = time.perf_counter() - t0
        steady = []
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            steady.append(time.perf_counter() - t0)
        out[name] = {
            "first_sec": round(first, 2),
            "steady_sec": round(min(steady), 2),
            "one_time_overhead_sec": round(first - min(steady), 2),
            "load_avg_1m_before": load_before,
        }
        print(name, out[name], file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
        f"query_floor_sf{sf}.json",
    )
    # Subset runs merge into the existing artifact (same contract as
    # bench.py): a re-measure of two queries must not clobber the
    # committed full-surface floor file.
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f).get("queries", {})
        prior.update(out)
        out = prior
    payload = {
        "sf_dir": sf_dir,
        "note": (
            "first_sec - steady_sec is driver-side analysis/codegen/JIT "
            "warmup: constant per query template, paid once on a real "
            "cluster regardless of data size. steady_sec is the part "
            "that scales with data."
        ),
        "queries": out,
        "total_one_time_sec": round(
            sum(v["one_time_overhead_sec"] for v in out.values()), 2
        ),
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps({"written": path,
                      "total_one_time_sec": payload["total_one_time_sec"]}))


if __name__ == "__main__":
    main()
