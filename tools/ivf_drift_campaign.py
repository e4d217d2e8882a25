#!/usr/bin/env python3
"""Measure the IVF staleness threshold (VERDICT r11 item 2).

The standing-IVF absorb contract fixes centroids forever -- that is
what makes ingest mergeable -- so under distribution drift serving
recall decays with no error anywhere. This campaign quantifies the
decay and calibrates the refit trigger:

  for drift magnitude delta in a grid:
    fresh(delta) = the standing corpus re-identified and perturbed by
        deterministic per-(vec_id, dim) uniform noise of amplitude
        delta (the classic embedding-drift model: the new shard's
        geometry no longer matches the fit-time partition; a uniform
        translation would NOT decay recall -- the whole shard just
        collapses into one bucket -- noise is the adversarial shape);
    drift_ratio = fresh mean assignment residual / fit-time standing
        mean (operators/clustering.py::ivf_drift_stats);
    recall_fixed = recall@5 of the fixed-centroid serve (nprobe=2)
        against the exact same-quantization search (nprobe=k probes
        every list => brute force), queries drawn from the fresh
        shard over the standing+fresh union;
    recall_refit = the same after ivf_absorb_or_refit's refit branch
        (re-fit on the union, rebuild lists once).

The pinned IVF_DRIFT_STALE_RATIO sits between the largest ratio with
no material recall loss and the first ratio with measurable decay, so
the trigger fires BEFORE serving quality degrades. Artifact:
.benchmarks/ivf_drift_threshold.json.

Usage: python tools/ivf_drift_campaign.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_ad_analytics_spark.operators.clustering import (  # noqa: E402
    ivf_drift_stats,
    ivf_fixedpoint_assign,
    ivf_fixedpoint_topk,
    kmeans_fixedpoint,
)
from flink_ad_analytics_spark.session import build_session  # noqa: E402
from flink_ad_analytics_spark.sources.batch import load_table  # noqa: E402

K, ITERS, SEED = 10, 4, 11
TOPK, NPROBE, N_QUERIES = 5, 2, 400
FRESH_ID_BASE = 1_000_000
#: noise amplitudes; testdata embeddings have per-dim std ~0.125, so
#: the grid spans 0.25x..4x the data scale
DELTAS = (0.0, 0.03, 0.06, 0.09, 0.125, 0.25, 0.5)
#: recall loss (absolute, recall@5 over N_QUERIES) counted as material
#: decay -- one SE of the measurement is ~0.01 at 400 queries, and ANN
#: serving SLOs tolerate a couple of points; 5 points is real damage
DECAY = 0.05


def perturbed_fresh(emb, delta: float):
    """The standing corpus re-identified (vec_id + FRESH_ID_BASE) with
    deterministic per-(vec_id, dim) uniform noise in [-delta, delta]."""
    from pyspark.sql import functions as F

    noise = (
        "transform(embedding, (x, d) -> CAST(x AS DOUBLE) + "
        f"{delta!r} * ((pmod(xxhash64(vec_id * 64 + d), 10007) "
        "/ 10007.0) * 2.0 - 1.0))"
    )
    return emb.select(
        (F.col("vec_id") + F.lit(FRESH_ID_BASE)).alias("vec_id"),
        F.expr(noise).alias("embedding"),
        "label",
    )


def recall_at_k(spark, union_emb, cent, assigned) -> float:
    """recall@TOPK of the NPROBE serve vs probing every list (exact
    under the same quantization and tie-breaks)."""
    from pyspark.sql import functions as F

    qf = (F.col("vec_id") >= FRESH_ID_BASE) & (
        F.col("vec_id") < FRESH_ID_BASE + N_QUERIES
    )

    def topk(nprobe):
        rows = ivf_fixedpoint_topk(
            union_emb, cent, query_filter=qf, k=TOPK, nprobe=nprobe,
            assigned=assigned,
        ).collect()
        out: dict = {}
        for r in rows:
            out.setdefault(r["q_id"], set()).add(r["c_id"])
        return out

    approx, exact = topk(NPROBE), topk(K)
    recalls = [
        len(approx.get(q, set()) & hits) / len(hits)
        for q, hits in exact.items()
    ]
    return round(sum(recalls) / len(recalls), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(
        app_name="ivf-drift-campaign", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    standing = emb.localCheckpoint(eager=True)
    cent = kmeans_fixedpoint(standing, k=K, iters=ITERS, seed=SEED)
    cent = cent.localCheckpoint(eager=True)
    lists = ivf_fixedpoint_assign(standing, cent).localCheckpoint(
        eager=True
    )

    rows = []
    for delta in DELTAS:
        t0 = time.perf_counter()
        fresh = perturbed_fresh(standing, delta).localCheckpoint(
            eager=True
        )
        fresh_assigned = ivf_fixedpoint_assign(fresh, cent)
        stats = ivf_drift_stats(lists, fresh_assigned).collect()[0]
        union_emb = standing.unionByName(fresh)
        merged = lists.unionByName(fresh_assigned)
        rec_fixed = recall_at_k(spark, union_emb, cent, merged)
        # the refit branch: re-fit on the union, rebuild lists once
        new_cent = kmeans_fixedpoint(
            union_emb, k=K, iters=ITERS, seed=SEED
        ).localCheckpoint(eager=True)
        new_lists = ivf_fixedpoint_assign(union_emb, new_cent)
        rec_refit = recall_at_k(spark, union_emb, new_cent, new_lists)
        # fixed-index bucket concentration: fraction of the fresh shard
        # landing in its single hottest bucket (1/K == perfectly even)
        from pyspark.sql import functions as F

        hot = (
            fresh_assigned.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("m"), F.sum("n").alias("t"))
            .collect()[0]
        )
        rows.append(
            {
                "delta": delta,
                "drift_ratio": round(stats["drift_ratio"], 4),
                "fresh_mean_dist2": round(stats["fresh_mean_dist2"], 1),
                "recall_fixed_centroids": rec_fixed,
                "recall_after_refit": rec_refit,
                "fresh_hot_bucket_frac": round(hot["m"] / hot["t"], 3),
                "sec": round(time.perf_counter() - t0, 1),
            }
        )
        print(json.dumps(rows[-1]))

    # CONTROL: uniform translation at 2x data scale -- same drift_ratio
    # magnitude as heavy noise, but recall must HOLD (the shard keeps
    # its geometry; it merely collapses toward few buckets), proving
    # the noise rows measure partition mismatch, not the translation's
    # benign re-bucketing. Documented in the artifact, excluded from
    # threshold selection.
    from pyspark.sql import functions as F

    shift = 0.25
    trans = standing.select(
        (F.col("vec_id") + F.lit(FRESH_ID_BASE)).alias("vec_id"),
        F.expr(
            f"transform(embedding, x -> CAST(x AS DOUBLE) + {shift!r})"
        ).alias("embedding"),
        "label",
    ).localCheckpoint(eager=True)
    ta = ivf_fixedpoint_assign(trans, cent)
    tstats = ivf_drift_stats(lists, ta).collect()[0]
    thot = (
        ta.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"), F.sum("n").alias("t"))
        .collect()[0]
    )
    control = {
        "kind": "uniform_translation",
        "delta": shift,
        "drift_ratio": round(tstats["drift_ratio"], 4),
        "recall_fixed_centroids": recall_at_k(
            spark,
            standing.unionByName(trans),
            cent,
            lists.unionByName(ta),
        ),
        "fresh_hot_bucket_frac": round(thot["m"] / thot["t"], 3),
    }
    print(json.dumps(control))

    base = rows[0]["recall_fixed_centroids"]
    # threshold selection: midpoint between the largest in-gate ratio
    # (recall within DECAY of the delta=0 level) and the first decayed
    ok = [r for r in rows if r["recall_fixed_centroids"] >= base - DECAY]
    bad = [r for r in rows if r["recall_fixed_centroids"] < base - DECAY]
    lo = max(r["drift_ratio"] for r in ok)
    hi = min(r["drift_ratio"] for r in bad) if bad else None
    out = {
        "grid": rows,
        "translation_control": control,
        "decay_rule_abs": DECAY,
        "recall_at_delta0": base,
        "largest_ratio_no_decay": lo,
        "first_ratio_with_decay": hi,
        "pinned_stale_ratio": (
            round((lo + hi) / 2, 2) if hi is not None else None
        ),
        "k": K, "iters": ITERS, "seed": SEED,
        "topk": TOPK, "nprobe": NPROBE, "n_queries": N_QUERIES,
        "sf_dir": sf_dir,
        "note": (
            "recall_fixed_centroids is the silent decay the trigger "
            "guards against; recall_after_refit shows the refit branch "
            "recovers it. Noise drift (not translation): a uniform "
            "shift collapses the shard into one bucket and recall "
            "holds while list balance degrades instead "
            "(fresh_hot_bucket_frac tracks that failure mode)."
        ),
    }
    path = os.path.join(REPO, ".benchmarks", "ivf_drift_threshold.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
