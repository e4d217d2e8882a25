#!/usr/bin/env python3
"""Benchmark driver: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a full-column checksum aggregate
(bit_xor(xxhash64(all output columns))), NOT .count(): count(1) lets
Catalyst prune every projection column, so projection-heavy queries
would bench as nearly free. The checksum forces every output column to
be computed while still collecting a single row to the driver.

A warmup pass on the smallest SF initializes JVM/codegen so measured
times reflect steady state, matching how a long-lived cluster session
behaves.

If a recorded DuckDB baseline exists for this SF
(.benchmarks/duckdb_sf{sf}.json, written by bench_duckdb.py), the
output also carries per-query and total ratios vs that baseline so the
"within 2x of DuckDB" criterion is checkable from artifacts alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_ad_analytics_spark.session import build_session  # noqa: E402

#: Headline set: every declared query (reference surface + extensions).
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
    "nation_coverage",
    "nation_revenue_salted",
    "order_priority_pivot",
    "urgent_undelivered",
    "customers_without_orders",
    "above_average_orders",
    "order_value_percentiles",
    "volume_shipping",
    "click_attribution_asof",
    "min_cost_supplier",
    "large_volume_customers",
    "sole_late_suppliers",
    "rolling_user_value",
    "lineitem_cube",
    "lineitem_unpivot",
    "daily_funnel_fullouter",
    "priority_history_scd2",
    "campaign_reach",
    "heavy_hitter_users",
    "order_seasonality",
    "latest_user_event",
    "zorder_buckets",
    "campaign_spend_gapfill",
    "user_funnel_cep",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "simhash_signatures",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_topk_vectorized",
    "ann_ivf_topk",
    "text_quality",
    "top_terms",
    "char_stats",
    "lang_id_confusion",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frames",
    "dataset_splits",
    "stratified_sample",
    "kfold_balance",
    "repetition_quality",
    "decontaminated",
    "pii_redaction",
    "embedding_quantization",
    "kmeans_step",
    "kmeans_clusters",
    "ann_ivf_kmeans",
    "ann_quantized_topk",
    "doc_chunks",
    "sequence_packing",
    "packing_offset",
    "dedup_verify_editdist",
)


def materialize(df) -> None:
    """Execute the full plan, pruning-proof.

    count(1) would let Catalyst drop every projection column; instead
    checksum all output columns so each one is actually computed. One
    aggregated row comes back to the driver. bit_xor (not sum): summing
    2^63-scale hashes overflows long under ANSI mode.
    """
    from pyspark.sql import functions as F

    df.select(F.bit_xor(F.xxhash64(*df.columns))).collect()


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
        materialize(queries[name](spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        materialize(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_query_set_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".benchmarks",
        f"duckdb_sf{sf}.json",
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        base_q = base.get("queries", {})
        common = [n for n in timings if base_q.get(n)]
        if common:
            spark_total = sum(timings[n] for n in common)
            duck_total = sum(base_q[n] for n in common)
            out["duckdb_baseline_sec"] = round(duck_total, 3)
            out["ratio_vs_duckdb"] = round(spark_total / duck_total, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
