#!/usr/bin/env python3
"""VERDICT r10 item 4: the measurement campaign that pins the
exact-pairs regime selector in ``operators/dedup.py``
(PREFIX_FILTER_MIN_T, _PREFIX_MIN_EXH_CANDIDATES,
_PREFIX_VERIFY_COST_RATIO).

Three corpora, chosen to put every selector branch on both sides of
its pinned constant:

* A -- the sf0.1 documents table (uniform df, no hot shingles):
  threshold sweep of BOTH cores. Exhaustive wins at every t (its
  candidate volume is tiny and pure codegen); this is the corpus
  class the round-10 docstring mis-read as a threshold crossover.
* B -- boilerplate-DOMINANT (docs sharing ~94% of their tokens):
  candidate volume explodes AND the prefixes cannot prune (unique
  shingles run out, hot shingles leak into every prefix), so the
  array-intersect verify pays near-exhaustive volume at ~1000x the
  per-row price. Exhaustive wins ~40x; the selector's verify-volume
  guard exists because of this corpus.
* C -- unique-heavy with a short hot run (the 100 TB web shape:
  boilerplate = hot keys, content = unique): 6e8 exhaustive
  candidates whose pair-grain aggregate spills catastrophically,
  while every prefix is df=1. Prefix wins ~60x; this is the regime
  the prefix filter is FOR.

Each point also asserts value-equality of the two cores (the
selector must be a pure plan choice). Writes
.benchmarks/prefix_filter_crossover.json.

Runtime is dominated by the deliberately pathological sides (B's
prefix ~30s, C's exhaustive ~6min); those run once, no warmup --
they are order-of-magnitude regime evidence, not serving numbers.

Usage: [SPARK_GRAFT_SF_DIR=...] python3 tools/prefix_crossover.py [--skip-slow]
  --skip-slow re-records only the fast sides and carries the slow-side
  numbers over from the existing artifact (for refreshing A's sweep
  without a 7-minute pass).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import materialize  # noqa: E402
from flink_ad_analytics_spark.operators.dedup import (  # noqa: E402
    PREFIX_FILTER_MIN_T,
    _PREFIX_MIN_EXH_CANDIDATES,
    _PREFIX_VERIFY_COST_RATIO,
    _ngram_jaccard_from_shingles,
    _prefix_filter_from_shingles,
    doc_shingles,
)
from flink_ad_analytics_spark.session import build_session  # noqa: E402
from flink_ad_analytics_spark.sources.batch import load_table  # noqa: E402

THRESHOLDS = (0.2, 0.35, 0.5, 0.65, 0.8)
ARTIFACT = ".benchmarks/prefix_filter_crossover.json"


def timed(fn, warm=1, reps=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def df_stats(sh):
    """(postings, exhaustive candidate volume) for a shingles frame."""
    r = (
        sh.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.sum("df").alias("P"),
            F.sum(
                F.col("df").cast("double") * (F.col("df") - 1).cast("double") / 2
            ).alias("cand"),
        )
        .collect()[0]
    )
    return int(r["P"]), float(r["cand"] or 0.0)


def equal_outputs(sh, t):
    a = {
        (r["doc_id_1"], r["doc_id_2"], round(r["jaccard"], 9))
        for r in _prefix_filter_from_shingles(sh, "doc_id", t).collect()
    }
    b = {
        (r["doc_id_1"], r["doc_id_2"], round(r["jaccard"], 9))
        for r in _ngram_jaccard_from_shingles(sh, "doc_id", t).collect()
    }
    return a == b, len(b)


def main() -> None:
    skip_slow = "--skip-slow" in sys.argv
    prior: dict = {}
    if skip_slow and os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            prior = json.load(f)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    spark = build_session(
        app_name="prefix-crossover",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "pinned": {
            "PREFIX_FILTER_MIN_T": PREFIX_FILTER_MIN_T,
            "_PREFIX_MIN_EXH_CANDIDATES": _PREFIX_MIN_EXH_CANDIDATES,
            "_PREFIX_VERIFY_COST_RATIO": _PREFIX_VERIFY_COST_RATIO,
        },
        "protocol": (
            "A: 1 warm + min of 2 steady per (core, t), shingles "
            "pre-persisted; B/C pathological sides: single cold run"
        ),
    }

    # ---- corpus A: uniform (the declared-query corpus) -------------
    docs = load_table(spark, sf_dir, "documents")
    shA = doc_shingles(docs, "doc_id", "text").persist()
    shA.count()
    PA, cA = df_stats(shA)
    ptsA = {}
    for t in THRESHOLDS:
        p_sec = timed(lambda: materialize(_prefix_filter_from_shingles(shA, "doc_id", t)))
        e_sec = timed(lambda: materialize(_ngram_jaccard_from_shingles(shA, "doc_id", t)))
        eq, n = equal_outputs(shA, t)
        ptsA[str(t)] = {
            "prefix_sec": p_sec,
            "exhaustive_sec": e_sec,
            "winner": "prefix" if p_sec < e_sec else "exhaustive",
            "n_pairs": n,
            "values_equal": eq,
        }
        print(f"A t={t}: prefix {p_sec}s exhaustive {e_sec}s equal={eq}", flush=True)
    out["corpus_A_uniform"] = {
        "source": sf_dir,
        "n_docs": docs.count(),
        "postings": PA,
        "exh_candidates": cA,
        "cand_per_posting": round(cA / max(1, PA), 1),
        "selector_route": "exhaustive at every t (candidates below gate)",
        "points": ptsA,
    }
    shA.unpersist()

    # ---- corpus B: boilerplate-dominant (verify-guard regime) ------
    if skip_slow and "corpus_B_boilerplate_dominant" in prior:
        out["corpus_B_boilerplate_dominant"] = prior[
            "corpus_B_boilerplate_dominant"
        ]
        print("B: carried over from prior artifact", flush=True)
    else:
        boiler = " ".join(f"common{j}" for j in range(40))
        rowsB = [
            (i, boiler + " " + " ".join(f"tail{i}x{j}" for j in range(10)))
            for i in range(1500)
        ]
        docsB = spark.createDataFrame(rowsB, ["doc_id", "text"]).repartition(32)
        shB = doc_shingles(docsB, "doc_id", "text").persist()
        shB.count()
        PB, cB = df_stats(shB)
        t = 0.8
        e_sec = timed(lambda: materialize(_ngram_jaccard_from_shingles(shB, "doc_id", t)))
        t0 = time.perf_counter()
        materialize(_prefix_filter_from_shingles(shB, "doc_id", t))
        p_sec = round(time.perf_counter() - t0, 3)
        eq, n = equal_outputs(shB, t)
        out["corpus_B_boilerplate_dominant"] = {
            "n_docs": 1500,
            "postings": PB,
            "exh_candidates": cB,
            "cand_per_posting": round(cB / max(1, PB), 1),
            "t": t,
            "prefix_sec": p_sec,
            "exhaustive_sec": e_sec,
            "n_pairs": n,
            "values_equal": eq,
            "selector_route": (
                "verify-volume guard bails to exhaustive (prefixes "
                "cannot prune: hot shingles leak in)"
            ),
        }
        print(f"B t={t}: prefix {p_sec}s exhaustive {e_sec}s equal={eq}", flush=True)
        shB.unpersist()

    # ---- corpus C: unique-heavy + hot run (prefix regime) ----------
    if skip_slow and "corpus_C_hot_run" in prior:
        out["corpus_C_hot_run"] = prior["corpus_C_hot_run"]
        print("C: carried over from prior artifact", flush=True)
    else:
        N = 20000
        docsC = (
            spark.range(N)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.sequence(F.lit(1), F.lit(120)),
                            lambda j: F.concat(
                                F.lit("u"), F.col("id"), F.lit("x"), j
                            ),
                        ),
                    ),
                    F.lit("h1 h2 h3 h4 h5"),
                ).alias("text"),
            )
            .repartition(32)
        )
        shC = doc_shingles(docsC, "doc_id", "text").persist()
        shC.count()
        PC, cC = df_stats(shC)
        t = 0.8
        t0 = time.perf_counter()
        n_p = _prefix_filter_from_shingles(shC, "doc_id", t).count()
        p_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_e = _ngram_jaccard_from_shingles(shC, "doc_id", t).count()
        e_sec = round(time.perf_counter() - t0, 3)
        out["corpus_C_hot_run"] = {
            "n_docs": N,
            "postings": PC,
            "exh_candidates": cC,
            "cand_per_posting": round(cC / max(1, PC), 1),
            "t": t,
            "prefix_sec": p_sec,
            "exhaustive_sec": e_sec,
            "n_pairs_prefix": n_p,
            "n_pairs_exhaustive": n_e,
            "values_equal": n_p == n_e,  # both 0 on this construction
            "selector_route": "prefix (candidates over gate, prefixes all df=1)",
        }
        print(f"C t={t}: prefix {p_sec}s exhaustive {e_sec}s", flush=True)
        shC.unpersist()

    os.makedirs(".benchmarks", exist_ok=True)
    with open(ARTIFACT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"written": ARTIFACT}))
    spark.stop()


if __name__ == "__main__":
    main()
