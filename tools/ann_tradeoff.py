#!/usr/bin/env python3
"""ANN recall/latency tradeoff sweep: the committed evidence for the
IVF-kmeans index's tunability claim. For each nprobe, time the
IVF-kmeans top-k and measure recall@k against the exact brute-force
neighbors (cosine_topk_vectorized) on the same query batch.

At serving scale, nprobe is THE dial: lists probed ~ fraction of the
corpus scored per query. The sweep shows the recall curve saturating
well before nprobe reaches the list count -- the reason an IVF index
beats brute force at any corpus size where the index fits the
latency budget.

Usage: [SPARK_GRAFT_SF_DIR=...] python3 tools/ann_tradeoff.py
Writes .benchmarks/ann_tradeoff.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
NPROBES = (1, 2, 4, 8, 16)
N_LISTS = 16
QUERY_LIMIT = 20


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import pyspark.sql.functions as F

    from flink_ad_analytics_spark.operators.clustering import (
        ivf_kmeans_topk,
        kmeans_fit,
    )
    from flink_ad_analytics_spark.operators.similarity import (
        cosine_topk_vectorized,
    )
    from flink_ad_analytics_spark.session import build_session
    from flink_ad_analytics_spark.sources.batch import load_table

    spark = build_session(
        app_name="ann-tradeoff",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qf = F.col("vec_id") < QUERY_LIMIT

    exact = {}
    t0 = time.perf_counter()
    for r in cosine_topk_vectorized(emb, query_filter=qf, k=K).collect():
        exact.setdefault(r["q_id"], set()).add(r["c_id"])
    exact_sec = round(time.perf_counter() - t0, 2)

    cents, _ = kmeans_fit(emb, k=N_LISTS, max_iter=6, seed=11)
    points = []
    for nprobe in NPROBES:
        t0 = time.perf_counter()
        got: dict[int, set] = {}
        for r in ivf_kmeans_topk(
            emb, cents, query_filter=qf, k=K, nprobe=nprobe
        ).collect():
            got.setdefault(r["q_id"], set()).add(r["c_id"])
        sec = round(time.perf_counter() - t0, 2)
        hits = sum(len(got.get(q, set()) & s) for q, s in exact.items())
        total = sum(len(s) for s in exact.values())
        points.append(
            {
                "nprobe": nprobe,
                "recall_at_k": round(hits / total, 4),
                "sec": sec,
                "fraction_of_lists": round(nprobe / N_LISTS, 3),
            }
        )
        print(points[-1], file=sys.stderr)

    # Second sweep on PLANTED Gaussian clusters (the shape real
    # embedding corpora have -- SemDeDup exists because they cluster):
    # the fixture's near-uniform random vectors are IVF's worst case
    # (a query's neighbors scatter across arbitrary Voronoi cells), so
    # the fixture curve shows the dial's monotonicity while the
    # planted curve shows the deployment-shaped recall.
    import numpy as np

    rng = np.random.default_rng(3)
    kc, n_per, d = 8, 400, 16
    centers = rng.normal(size=(kc, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(kc):
        pts = centers[c] + 0.05 * rng.normal(size=(n_per, d))
        for i, p in enumerate(pts):
            rows.append((c * n_per + i, [float(x) for x in p]))
    planted = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    pqf = F.col("vec_id") % n_per == 0
    p_exact = {}
    for r in cosine_topk_vectorized(planted, query_filter=pqf, k=K).collect():
        p_exact.setdefault(r["q_id"], set()).add(r["c_id"])
    p_cents, _ = kmeans_fit(planted, k=kc, max_iter=10, seed=11)
    planted_points = []
    for nprobe in (1, 2, 4):
        got = {}
        for r in ivf_kmeans_topk(
            planted, p_cents, query_filter=pqf, k=K, nprobe=nprobe
        ).collect():
            got.setdefault(r["q_id"], set()).add(r["c_id"])
        hits = sum(len(got.get(q, set()) & s) for q, s in p_exact.items())
        total = sum(len(s) for s in p_exact.values())
        planted_points.append(
            {"nprobe": nprobe, "recall_at_k": round(hits / total, 4)}
        )
        print("planted", planted_points[-1], file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchmarks",
        "ann_tradeoff.json",
    )
    payload = {
        "sf_dir": sf_dir,
        "k": K,
        "n_lists": N_LISTS,
        "n_queries": len(exact),
        "exact_baseline_sec": exact_sec,
        "note": (
            "recall@k vs the exact brute-force neighbor set per nprobe; "
            "fraction_of_lists ~ fraction of the corpus scored per "
            "query, the quantity that stays the serving-cost dial at "
            "any corpus size. Local wall times are floor-dominated; "
            "the recall column is the scale-relevant curve. The driver "
            "fixture's near-uniform vectors are IVF's worst case; "
            "planted_clusters is the deployment-shaped curve on "
            "clustered data (one list per cluster)."
        ),
        "points": points,
        "planted_clusters": {
            "n_vectors": kc * n_per,
            "n_lists": kc,
            "points": planted_points,
        },
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"written": path, "points": points}))


if __name__ == "__main__":
    main()
