#!/usr/bin/env python3
"""Hot-key join skew evidence: the same deliberately-skewed join (one
key owning ~50% of the large side) executed three ways --

* AQE skew-join splitting ON (the engine-wide default conf);
* AQE skew splitting OFF (the unmitigated baseline: one straggler
  task processes half the table);
* functions/skew.py::salted_join (explicit per-KEY salting).

All three must return the identical aggregate checksum (same join,
different physical strategies); the artifact records wall-clock per
strategy plus the skew shape, answering "which mechanism wins where":
AQE splits oversized PARTITIONS after the shuffle (no plan change, no
small-side replication) and is the default choice; salting spreads a
single hot KEY before the shuffle at the cost of n_salts-replicating
the small side, and is the fallback when one key dominates so hard
that even a split partition is one key's rows (AQE cannot split WITHIN
a key for joins that need key co-location... it can for SMJ since rows
of one key stay mergeable across splits -- which the measurement shows:
see the artifact's relative timings rather than folklore).

Broadcast is disabled for the measurement (a broadcastable small side
would erase the shuffle entirely and say nothing about skew handling).

Writes .benchmarks/skew_join.json.
Usage: python3 tools/skew_bench.py [n_large_millions]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from flink_ad_analytics_spark.session import build_session  # noqa: E402
from flink_ad_analytics_spark.functions.skew import salted_join  # noqa: E402


def main() -> None:
    n_large = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 10_000_000
    n_keys = 10_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="fas-skew-bench",
        cpus=cpus,
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            # force a real shuffle join: broadcast would bypass skew
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # local-scale thresholds so AQE's skew detector engages on
            # a ~400MB table the way the defaults engage on multi-GB
            # partitions in a cluster
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # large side: ~50% of rows carry key 0 (the hot key); the rest
    # uniform over n_keys. Deterministic from the row id.
    large = (
        spark.range(n_large)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") % 997).alias("v"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("w")
    )

    def checksum(df):
        row = df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("w")).alias("s"),
        ).collect()[0]
        return (row.n, int(row.s))

    def run(label, fn, skew_on):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        t0 = time.perf_counter()
        c = checksum(fn())
        dt = round(time.perf_counter() - t0, 2)
        print(f"{label}: {dt}s checksum={c}", file=sys.stderr)
        return {"sec": dt, "checksum": list(c)}

    results = {}
    # warm the input scans once so strategy timings compare join work
    checksum(salted_join(large, small, "k"))
    results["aqe_skew_split"] = run(
        "aqe_skew_split", lambda: large.join(small, "k"), True
    )
    results["no_mitigation"] = run(
        "no_mitigation", lambda: large.join(small, "k"), False
    )
    results["salted_join_8"] = run(
        "salted_join_8", lambda: salted_join(large, small, "k"), True
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    checks = {tuple(v["checksum"]) for v in results.values()}
    assert len(checks) == 1, f"strategies disagree: {results}"

    payload = {
        "metric": "hot_key_join_seconds",
        "n_large": n_large,
        "n_keys": n_keys,
        "hot_key_share": 0.5,
        "results": results,
        "winner": min(results, key=lambda k: results[k]["sec"]),
        "note": (
            "identical checksums across strategies; broadcast disabled "
            "so the shuffle join's skew handling is what is measured"
        ),
    }
    out = json.dumps(payload)
    print(out)
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
    )
    with open(os.path.join(bench_dir, "skew_join.json"), "w") as f:
        f.write(out + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
