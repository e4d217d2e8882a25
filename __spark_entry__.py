"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CTR query on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the extension operators, each with a DuckDB-runnable
ANSI-SQL oracle where SQL can express it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_ad_analytics_spark.queries import RELATIONAL_QUERIES

try:  # extension operators land incrementally; keep entry importable
    from flink_ad_analytics_spark.queries_ext import EXTENSION_QUERIES
except ImportError:  # pragma: no cover
    EXTENSION_QUERIES: dict[str, tuple] = {}

try:
    from flink_ad_analytics_spark.queries_pipeline import PIPELINE_QUERIES
except ImportError:  # pragma: no cover
    PIPELINE_QUERIES: dict[str, tuple] = {}

# --- driver correctness-window ordering (r11 verdict item 1 + ADVICE) ------
#
# The grading driver oracles only the FIRST 50 keys of ``queries()``.  To
# give every declared query an independent driver-verified row as fast as
# possible, order ``_ALL`` as:
#   1. every query that has NEVER appeared in a committed driver
#      CORRECTNESS_r*.json window, in a deterministic round-robin
#      interleave of the EXTENSION / PIPELINE / RELATIONAL families;
#   2. then the already-verified queries, same interleave order.
# ``_DRIVER_VERIFIED`` is an EXPLICIT COMMITTED CONSTANT -- the union of
# the key sets of CORRECTNESS_r01..r11.json -- bumped intentionally each
# round by appending the new round's window keys (ADVICE r11: deriving
# the ordering from artifact-file globbing made a fresh clone of HEAD and
# the local tree disagree whenever the round's own artifact was
# untracked; a source-level constant cannot drift).  With 91 verified /
# 83 pending at round 12, the r12 window is 50 first-time queries and
# round 13 covers the remaining 33.

_DRIVER_VERIFIED = frozenset((
    "above_average_orders", "ann_cosine_topk", "ann_filtered_topk",
    "ann_ivf_topk", "anomaly_alerts", "c4_quality",
    "campaign_reach", "campaign_spend", "campaign_spend_gapfill",
    "classifier_scores", "click_attribution_asof", "containment_pairs",
    "corpus_diff", "ctr_hourly", "customer_value_ranks",
    "customers_without_orders", "daily_funnel_fullouter", "data_quality",
    "dedup_clusters", "dedup_clusters_best", "dedup_clusters_star",
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_prefix_filter", "dedup_simhash_pairs",
    "dedup_verify_editdist_topk", "disjunctive_revenue", "domain_blocklist",
    "domain_caps", "domain_reputation", "dominant_suppliers",
    "engagement_hourly", "event_bursts", "events_json_stats",
    "heavy_hitter_users", "hopping_daily_actives", "idle_customer_balance",
    "incremental_dedup", "kcenter_coreset", "key_part_concentration",
    "knn_graph_edges", "knn_graph_pagerank", "lang_id_confusion",
    "large_volume_customers", "latest_user_event", "lineitem_cube",
    "lineitem_unpivot", "local_supplier_volume", "min_cost_supplier",
    "multimodal_decode", "multimodal_meta", "multimodal_phash",
    "nation_coverage", "nation_revenue_salted", "orc_corpus_stats",
    "order_count_distribution", "order_priority_pivot", "order_rollup",
    "order_seasonality", "order_value_percentiles",
    "order_value_percentiles_approx",
    "part_supplier_variety", "pcm_frame_stats", "pcm_frame_stats_arrow",
    "pricing_summary", "priority_history_scd2", "priority_late_counts",
    "product_profit", "promo_revenue", "returned_items",
    "rolling_user_value", "semantic_dedup", "sequence_packing",
    "shipmode_priority", "shipping_priority", "simhash_signatures",
    "sliding_event_counts", "small_qty_revenue", "sole_late_suppliers",
    "text_quality", "top_orders_per_customer", "top_revenue_supplier",
    "urgent_undelivered", "url_canonicalize", "url_dedup",
    "user_funnel_cep", "user_sessions", "volume_shipping",
    "zorder_buckets",
))


def _interleave(*families: dict) -> dict:
    merged = {**RELATIONAL_QUERIES, **EXTENSION_QUERIES, **PIPELINE_QUERIES}
    rr: list[str] = []
    width = max((len(f) for f in families), default=0)
    for i in range(width):
        for fam in families:
            keys = list(fam)
            if i < len(keys) and keys[i] not in rr:
                rr.append(keys[i])
    order = [k for k in rr if k not in _DRIVER_VERIFIED]
    order += [k for k in rr if k in _DRIVER_VERIFIED]
    return {k: merged[k] for k in order}


_ALL = _interleave(EXTENSION_QUERIES, PIPELINE_QUERIES, RELATIONAL_QUERIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (interval LEFT join + tumbling CTR) on sf0.001."""
    fn, _ = _ALL["ctr_hourly"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; callables take (spark, sf_dir)."""
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted -> rows-only check)."""
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
