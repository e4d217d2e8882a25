#!/usr/bin/env python3
"""Scale curve for the dedup/curation family: exact dedup, text features,
MinHash-LSH, and SimHash over synthetic corpora at a sweep of sizes
(default 12.5k/25k/50k/100k docs, ~5% planted near-duplicates) and
prints ONE JSON line with, per size: op runtimes, LSH/SimHash
CANDIDATE-pair counts (the scale-defining intermediates), verified
pair counts, and LSH recall against the planted pairs.

The "survives 100x" claim rests on these measurements: doubling n
must grow candidates and runtime ~linearly (background collisions are
rare at realistic vocabulary sizes), far below the n^2/2 all-pairs
curve, which is also printed for contrast.

Usage: python3 bench_scale.py [n_docs ...]   (sizes override the sweep)
Writes the same payload to .benchmarks/scale_curve.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from flink_ad_analytics_spark.session import build_session  # noqa: E402

# Realistic vocabulary size: with a tiny vocabulary every doc pair
# shares most shingles (background Jaccard >> 0) and LSH candidate
# generation degenerates toward n^2 -- an artifact no natural corpus
# exhibits. 2000 word types puts background pair similarity near zero
# while planted near-dups stay >= 0.9.
VOCAB = [f"w{i:04d}" for i in range(2000)]


def make_corpus(n_docs: int, seed: int = 42) -> tuple[pd.DataFrame, set]:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.integers(40, 120)))
        for _ in range(n_docs)
    ]
    # plant near-dups: ~5% of docs get a copy with a few token edits
    n_pairs = n_docs // 20
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    planted = set()
    for k in range(n_pairs):
        src = rows[k]["text"].split()
        for _ in range(2):  # two point edits -> jaccard stays high
            src[rng.integers(0, len(src))] = rng.choice(VOCAB)
        rows.append({"doc_id": n_docs + k, "text": " ".join(src)})
        planted.add((k, n_docs + k))
    df = pd.DataFrame(rows)
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True), planted


def run_size(spark, n_docs: int) -> dict:
    from flink_ad_analytics_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_candidates,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from flink_ad_analytics_spark.operators.text import text_features

    tmp = tempfile.mkdtemp(prefix="fas_scale_")
    try:
        corpus, planted = make_corpus(n_docs)
        files = 16
        for i in range(files):
            corpus.iloc[
                i * len(corpus) // files : (i + 1) * len(corpus) // files
            ].to_parquet(f"{tmp}/part-{i:02d}.parquet", index=False)
        docs = spark.read.parquet(tmp)

        timings: dict[str, float] = {}

        def run(name, fn):
            t0 = time.perf_counter()
            r = fn()
            timings[name] = round(time.perf_counter() - t0, 2)
            return r

        run("exact_dedup", lambda: exact_dedup(docs).count())
        run("text_quality", lambda: text_features(docs).count())
        lsh_cands = run(
            "lsh_candidates", lambda: minhash_lsh_candidates(docs).count()
        )
        lsh_found = run(
            "minhash_lsh",
            lambda: {
                (r.doc_id_1, r.doc_id_2)
                for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
            },
        )
        # max_hamming=64 keeps every chunk-collision pair -> candidates
        sim_cands = run(
            "simhash_candidates", lambda: simhash_pairs(docs, max_hamming=64).count()
        )
        sim_pairs = run("simhash_pairs", lambda: simhash_pairs(docs).count())

        # round-2 curation ops on the same sweep
        from pyspark.sql import functions as F

        from flink_ad_analytics_spark.operators.dedup import decontaminate
        from flink_ad_analytics_spark.operators.text import repetition_features

        run("repetition", lambda: repetition_features(docs).count())
        # term-space similarity + LM scoring (round-2 cont.): candidate
        # counts of the inverted index are the scale-defining quantity,
        # like lsh_candidates above
        from flink_ad_analytics_spark.operators.text import (
            bigram_logprob,
            sparse_cosine_pairs,
        )

        sparse_pairs = run(
            "sparse_cosine",
            lambda: sparse_cosine_pairs(
                docs, max_df=50, min_cos=0.5
            ).count(),
        )
        run("lm_quality", lambda: bigram_logprob(docs).count())
        is_bench = F.expr(
            "substr(md5('bench:' || CAST(doc_id AS STRING)), 1, 1) = '0'"
        )
        n_clean = run(
            "decontaminate",
            lambda: decontaminate(
                docs.filter(~is_bench), docs.filter(is_bench), n=8
            ).count(),
        )
        # span-level dedup: the planted near-dup copies share long
        # exact token runs, so duplicated 16-token spans exist; the
        # span-hash exchange volume scales with total tokens (linear)
        from flink_ad_analytics_spark.operators.dedup import span_dedup

        run("span_dedup", lambda: span_dedup(docs).count())

        # sliding-window (stride-1) repeated-substring dedup: the
        # scale-defining quantities are total window occurrences
        # (exactly total tokens - (W-1)*docs: linear by construction)
        # and DUPLICATE occurrences (proportional to the planted
        # duplicated share, not the corpus) -- recorded so the curve
        # proves the shuffle volume stays ~linear per doubling
        from flink_ad_analytics_spark.operators.dedup import window_dedup

        wd = run(
            "window_dedup",
            lambda: window_dedup(docs)
            .agg(
                F.sum("n_windows").alias("w"),
                F.sum("n_dup_occurrences").alias("d"),
            )
            .collect()[0],
        )

        # connected components over the LSH pair graph: per-round cost
        # must track edge ENDPOINTS (sparse), not corpus size -- the
        # singleton-exclusion property this curve demonstrates. The
        # pair set was already computed above (lsh_found, on the
        # driver); feed it back as a small DataFrame so the timing
        # measures CC ALONE, not a re-run of the LSH pipeline.
        from flink_ad_analytics_spark.operators.dedup import (
            connected_components,
            decontaminate_bloom,
        )

        pairs_df = spark.createDataFrame(
            sorted(lsh_found) or [(-1, -1)], ["doc_id_1", "doc_id_2"]
        )
        run(
            "connected_components",
            lambda: connected_components(pairs_df, docs).count(),
        )
        # bloom-prefiltered decontamination: same answer as the exact
        # path (asserted below), zero probe-side shuffle. m_bits sized
        # from the benchmark gram count (~1/16 of docs x ~96 grams/doc
        # at 10 bits/gram) so the sweep exercises the ~1% FP design
        # regime rather than a saturated filter.
        n_bench_grams = int(n_docs / 16 * 100)
        m_bits = 1 << max(16, (n_bench_grams * 10).bit_length())
        n_clean_bloom = run(
            "decontaminate_bloom",
            lambda: decontaminate_bloom(
                docs.filter(~is_bench), docs.filter(is_bench), n=8,
                m_bits=m_bits,
            ).count(),
        )
        assert n_clean_bloom == n_clean, (
            f"bloom path diverged: {n_clean_bloom} != exact {n_clean}"
        )

        # SemDeDup: k grows with n so cluster population stays ~250 --
        # pair scoring per item is constant, but the exact-decimal
        # assignment is O(n*k), so the measured curve is SUPERLINEAR
        # (the honest cost model in clustering.py::semantic_dedup;
        # balanced k ~ sqrt(n) and the Arrow assignment are the scale
        # levers). 5% planted near-identical vectors; the rest
        # well-separated so the prescreen kills their pairs cheaply.
        from flink_ad_analytics_spark.operators.clustering import semantic_dedup

        rng2 = np.random.default_rng(7)
        n_vecs = max(1000, n_docs // 8)
        k_sem = max(8, n_vecs // 250)
        centers = rng2.normal(size=(k_sem, 16))
        cassign = rng2.integers(0, k_sem, n_vecs)
        vecs = centers[cassign] + rng2.normal(scale=0.6, size=(n_vecs, 16))
        n_planted_vec = n_vecs // 20
        vecs[n_vecs - n_planted_vec:] = vecs[:n_planted_vec] + rng2.normal(
            scale=1e-3, size=(n_planted_vec, 16)
        )
        emb_pdf = pd.DataFrame(
            {
                "vec_id": np.arange(n_vecs),
                "embedding": [v.astype(np.float32) for v in vecs],
            }
        )
        emb_path = f"{tmp}/emb.parquet"
        emb_pdf.to_parquet(emb_path, index=False)
        emb = spark.read.parquet(emb_path)
        sem_drops = run(
            "semantic_dedup",
            lambda: semantic_dedup(emb, k=k_sem, threshold=0.999)
            .filter(~F.col("keep"))
            .count(),
        )

        # binned range join at CONSTANT event density: span grows with
        # n, so per-bucket population is flat and runtime must track n,
        # not the n^2/2 all-pairs curve.
        from flink_ad_analytics_spark.operators.range_join import binned_range_join

        span_s = max(600, n_docs // 10)
        n_right_ev = n_docs
        n_left_ev = n_docs // 10
        base_ms = 1_704_067_200_000
        l_pdf = pd.DataFrame(
            {
                "lid": np.arange(n_left_ev),
                "lo_ms": base_ms
                + rng2.integers(0, span_s * 1000, n_left_ev),
            }
        )
        r_pdf = pd.DataFrame(
            {
                "rid": np.arange(n_right_ev),
                "pt_ms": base_ms
                + rng2.integers(0, span_s * 1000, n_right_ev),
            }
        )
        l_pdf.to_parquet(f"{tmp}/l.parquet", index=False)
        r_pdf.to_parquet(f"{tmp}/r.parquet", index=False)
        lev = spark.read.parquet(f"{tmp}/l.parquet").select(
            "lid",
            F.timestamp_millis(F.col("lo_ms")).alias("lo"),
            (
                F.timestamp_millis(F.col("lo_ms")) + F.expr("INTERVAL 60 SECONDS")
            ).alias("hi"),
        )
        rev = spark.read.parquet(f"{tmp}/r.parquet").select(
            "rid", F.timestamp_millis(F.col("pt_ms")).alias("pt")
        )
        band_matches = run(
            "range_join",
            lambda: binned_range_join(
                lev, rev, left_lo="lo", left_hi="hi", right_point="pt",
                bin_width="1 minute",
            ).count(),
        )

        n = len(corpus)
        return {
            "n_docs": n,
            "all_pairs": n * (n - 1) // 2,
            "planted_pairs": len(planted),
            "lsh_candidates": lsh_cands,
            "lsh_pairs_found": len(lsh_found),
            "lsh_recall": round(
                len(lsh_found & planted) / max(1, len(planted)), 4
            ),
            "simhash_candidates": sim_cands,
            "simhash_pairs_found": sim_pairs,
            "sparse_cosine_pairs": sparse_pairs,
            "window_occurrences": int(wd.w),
            "window_dup_occurrences": int(wd.d),
            "n_clean": n_clean,
            "semantic_n_vecs": n_vecs,
            "semantic_k": k_sem,
            "semantic_drops": sem_drops,
            "band_matches": band_matches,
            "ops": timings,
            "total_sec": round(sum(timings.values()), 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def make_corpus_vectorized(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """make_corpus at 0.5M-1M docs: the per-doc rng.choice loop is
    Python-bound (~100us/doc); this draws every token index in one
    numpy call and joins per doc. Same structure: 40-120-token docs
    over the 2000-word vocab, ~5% planted near-dup copies with two
    point edits, shuffled."""
    rng = np.random.default_rng(seed)
    sizes = rng.integers(40, 120, size=n_docs)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    vocab_arr = np.array(VOCAB)
    toks = vocab_arr[rng.integers(0, len(VOCAB), size=int(offs[-1]))]
    texts = [
        " ".join(toks[offs[i]:offs[i + 1]]) for i in range(n_docs)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    n_pairs = n_docs // 20
    for k in range(n_pairs):
        src = rows[k]["text"].split()
        for _ in range(2):
            src[rng.integers(0, len(src))] = rng.choice(VOCAB)
        rows.append({"doc_id": n_docs + k, "text": " ".join(src)})
    df = pd.DataFrame(rows)
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def run_big(spark, n_docs: int) -> dict:
    """Round-5 extension: minhash-LSH + window_dedup ONLY (the two ops
    whose 100 TB claim rides on the candidate-growth curve) at corpus
    sizes the full sweep doesn't reach (the other ops' curves are
    already characterized to 105k; simhash at max_hamming=64 and the
    O(n*k) exact semantic assignment would dominate the wall here
    without adding curve information)."""
    from pyspark.sql import functions as F

    from flink_ad_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
        window_dedup,
    )

    tmp = tempfile.mkdtemp(prefix="fas_scale_big_")
    try:
        corpus = make_corpus_vectorized(n_docs)
        files = 32
        for i in range(files):
            corpus.iloc[
                i * len(corpus) // files : (i + 1) * len(corpus) // files
            ].to_parquet(f"{tmp}/part-{i:02d}.parquet", index=False)
        docs = spark.read.parquet(tmp)
        timings: dict[str, float] = {}

        def run(name, fn):
            t0 = time.perf_counter()
            r = fn()
            timings[name] = round(time.perf_counter() - t0, 2)
            return r

        lsh_cands = run(
            "lsh_candidates", lambda: minhash_lsh_candidates(docs).count()
        )
        wd = run(
            "window_dedup",
            lambda: window_dedup(docs)
            .agg(
                F.sum("n_windows").alias("w"),
                F.sum("n_dup_occurrences").alias("d"),
            )
            .collect()[0],
        )
        n = len(corpus)
        return {
            "n_docs": n,
            "planted_pairs": n_docs // 20,
            "lsh_candidates": lsh_cands,
            "window_occurrences": int(wd.w),
            "window_dup_occurrences": int(wd.d),
            "ops": timings,
            "total_sec": round(sum(timings.values()), 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main_big(sizes: list[int]) -> None:
    """--big mode: append big_points/big_growth to the existing
    artifact (the full-sweep points stay untouched)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="fas-scale-big", cpus=cpus, shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    points = []
    for n in sizes:
        pt = run_big(spark, n)
        points.append(pt)
        print(json.dumps(pt), file=sys.stderr)
    growth = []
    for a, b in zip(points, points[1:]):
        growth.append(
            {
                "size_factor": round(b["n_docs"] / a["n_docs"], 2),
                "lsh_candidate_factor": round(
                    b["lsh_candidates"] / max(1, a["lsh_candidates"]), 2
                ),
                "window_occurrence_factor": round(
                    b["window_occurrences"] / max(1, a["window_occurrences"]),
                    2,
                ),
                "lsh_runtime_factor": round(
                    b["ops"]["lsh_candidates"]
                    / max(0.01, a["ops"]["lsh_candidates"]), 2
                ),
                "window_runtime_factor": round(
                    b["ops"]["window_dedup"]
                    / max(0.01, a["ops"]["window_dedup"]), 2
                ),
            }
        )
    with open(".benchmarks/scale_curve.json") as f:
        payload = json.load(f)
    payload["big_points"] = points
    payload["big_growth"] = growth
    with open(".benchmarks/scale_curve.json", "w") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps({"big_points": len(points), "big_growth": growth}))
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--big"]:
        main_big(
            [int(a) for a in sys.argv[2:]] or [250_000, 500_000, 1_000_000]
        )
        return
    sizes = [int(a) for a in sys.argv[1:]] or [12_500, 25_000, 50_000, 100_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="fas-scale-curve", cpus=cpus, shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    points = []
    for n in sizes:
        pt = run_size(spark, n)
        points.append(pt)
        print(json.dumps(pt), file=sys.stderr)

    # growth factors between consecutive points: sub-quadratic means
    # candidate/runtime factors track the size factor (~2x), not its
    # square (~4x)
    growth = []
    for a, b in zip(points, points[1:]):
        growth.append(
            {
                "size_factor": round(b["n_docs"] / a["n_docs"], 2),
                "lsh_candidate_factor": round(
                    b["lsh_candidates"] / max(1, a["lsh_candidates"]), 2
                ),
                "simhash_candidate_factor": round(
                    b["simhash_candidates"] / max(1, a["simhash_candidates"]), 2
                ),
                "window_occurrence_factor": round(
                    b["window_occurrences"] / max(1, a["window_occurrences"]),
                    2,
                ),
                "runtime_factor": round(b["total_sec"] / a["total_sec"], 2),
            }
        )
    payload = {
        "metric": "dedup_scale_curve",
        "value": points[-1]["total_sec"],
        "unit": "sec",
        "points": points,
        "growth": growth,
    }
    out = json.dumps(payload)
    print(out)
    os.makedirs(".benchmarks", exist_ok=True)
    with open(".benchmarks/scale_curve.json", "w") as f:
        f.write(out + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
