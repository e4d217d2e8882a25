#!/usr/bin/env python3
"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() materializes the full
plan; results are not collected to the driver). A warmup pass on the
smallest SF initializes JVM/codegen so measured times reflect steady
state, matching how a long-lived cluster session behaves.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_ad_analytics_spark.session import build_session  # noqa: E402

#: Headline set: the reference surface + the heaviest extension ops.
BENCH_QUERIES = (
    "ctr_hourly",
    "engagement_hourly",
    "anomaly_alerts",
    "events_json_stats",
    "user_sessions",
    "sliding_event_counts",
    "campaign_spend",
    "order_rollup",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "top_orders_per_customer",
    "urgent_undelivered",
    "above_average_orders",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "text_quality",
    "lang_id_confusion",
    "multimodal_decode",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="fas-bench",
        cpus=cpus,
        shuffle_partitions=max(32, cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # Warmup: JVM + codegen + parquet footer caches on the tiny SF.
    for name in BENCH_QUERIES:
        queries[name](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_set_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
