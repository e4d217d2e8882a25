#!/usr/bin/env python3
"""Scale smoke: the dedup/text pipeline on a synthetic corpus 20x the
sf0.1 bench (100k docs, ~5% planted near-duplicates), generated into a
temp dir as multiple parquet files (multi-partition input, like a real
lake layout). Prints one JSON line with per-op seconds and the LSH
recall against the planted-pair count.

Usage: python3 bench_scale.py [n_docs]
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


def make_corpus(n_docs: int, seed: int = 42) -> tuple[pd.DataFrame, int]:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(VOCAB, size=rng.integers(40, 120)))
        for _ in range(n_docs)
    ]
    # plant near-dups: ~5% of docs get a copy with a few token edits
    n_pairs = n_docs // 20
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    for k in range(n_pairs):
        src = rows[k]["text"].split()
        for _ in range(2):  # two point edits -> jaccard stays high
            src[rng.integers(0, len(src))] = rng.choice(VOCAB)
        rows.append({"doc_id": n_docs + k, "text": " ".join(src)})
    df = pd.DataFrame(rows)
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True), n_pairs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="fas-scale-smoke", cpus=cpus, shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="fas_scale_")
    try:
        corpus, n_planted = make_corpus(n_docs)
        files = 16
        for i in range(files):
            corpus.iloc[i * len(corpus) // files : (i + 1) * len(corpus) // files].to_parquet(
                f"{tmp}/part-{i:02d}.parquet", index=False
            )
        docs = spark.read.parquet(tmp)

        from flink_ad_analytics_spark.operators.dedup import (
            exact_dedup,
            minhash_lsh_pairs,
            simhash_pairs,
        )
        from flink_ad_analytics_spark.operators.text import text_features

        timings: dict[str, float] = {}

        def run(name, fn):
            t0 = time.perf_counter()
            r = fn()
            timings[name] = round(time.perf_counter() - t0, 2)
            return r

        run("exact_dedup", lambda: exact_dedup(docs).count())
        run("text_quality", lambda: text_features(docs).count())
        lsh_pairs = run(
            "minhash_lsh", lambda: minhash_lsh_pairs(docs, threshold=0.5).count()
        )
        sim_pairs = run("simhash_pairs", lambda: simhash_pairs(docs).count())

        print(
            json.dumps(
                {
                    "metric": "scale_smoke",
                    "value": round(sum(timings.values()), 2),
                    "unit": "sec",
                    "n_docs": len(corpus),
                    "planted_pairs": n_planted,
                    "lsh_pairs_found": lsh_pairs,
                    "simhash_pairs_found": sim_pairs,
                    "ops": timings,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
