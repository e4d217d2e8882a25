"""Deterministic sampling/split properties.

The load-bearing property of hash-based splits is *stability*: a row's
assignment depends only on (seed, id), never on what else is in the
corpus, its order, or its partitioning. That is what makes the split
safe on a growing 100 TB corpus -- appending a new crawl dump cannot
flip old rows between train and val.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.sampling import (
    hash_split,
    kfold_assign,
    stratified_sample,
)
from flink_ad_analytics_spark.sources.batch import load_table
from tests.conftest import SF_CORRECT


def _docs(spark):
    return load_table(spark, SF_CORRECT, "documents")


def test_split_fractions_and_exhaustiveness(spark):
    docs = _docs(spark)
    n = docs.count()
    got = dict(
        hash_split(docs, weights={"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .count()
        .collect()
    )
    assert set(got) == {"train", "val", "test"}
    assert sum(got.values()) == n  # exhaustive, disjoint by construction
    # 32-bit hash at n=500: binomial noise ~ +/-3 sigma
    assert abs(got["train"] / n - 0.8) < 0.06
    assert abs(got["val"] / n - 0.1) < 0.05


def test_split_stable_under_corpus_growth(spark):
    """Same doc -> same split, whether hashed in a subset or the full corpus."""
    docs = _docs(spark)
    full = {
        r.doc_id: r.split
        for r in hash_split(docs).select("doc_id", "split").collect()
    }
    subset = {
        r.doc_id: r.split
        for r in hash_split(docs.filter(F.col("doc_id") < 100))
        .select("doc_id", "split")
        .collect()
    }
    assert subset == {k: v for k, v in full.items() if k < 100}


def test_split_seed_changes_assignment(spark):
    docs = _docs(spark)
    a = {r.doc_id: r.split for r in hash_split(docs, seed=1).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, seed=2).collect()}
    assert a != b  # 500 docs all landing identically across seeds: ~0


def test_stratified_sample_is_subset_and_deterministic(spark):
    docs = _docs(spark)
    fr = {"en": 0.25, "es": 0.5, "fr": 1.0}
    kept1 = {r.doc_id for r in stratified_sample(docs, "lang", fr).collect()}
    kept2 = {r.doc_id for r in stratified_sample(docs, "lang", fr).collect()}
    assert kept1 == kept2
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert kept1 < all_ids
    # fr stratum kept entirely
    fr_ids = {r.doc_id for r in docs.filter("lang = 'fr'").collect()}
    assert fr_ids <= kept1


def test_kfold_partitions_corpus(spark):
    docs = _docs(spark)
    folds = kfold_assign(docs, k=5)
    per = dict(folds.groupBy("fold").count().collect())
    assert set(per) == set(range(5))
    assert sum(per.values()) == docs.count()
    # no fold degenerate at n=500
    assert min(per.values()) > 50


def test_shuffle_shards_is_permutation(spark):
    from flink_ad_analytics_spark.operators.sampling import shuffle_shards

    docs = _docs(spark)
    n = docs.count()
    out = shuffle_shards(docs, "doc_id", n_shards=8, seed=99).cache()
    # every row exactly once, shards cover [0, 8)
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    shards = [r[0] for r in out.select("shard").distinct().collect()]
    assert set(shards) <= set(range(8))
    # positions within each shard are 1..len (a proper permutation)
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("nd"),
    )
    for r in per.collect():
        assert (r["lo"], r["hi"], r["nd"]) == (1, r["n"], r["n"])
    # stability: appending rows never moves an existing doc's shard
    half = shuffle_shards(docs.filter(F.col("doc_id") < 250), "doc_id", n_shards=8, seed=99)
    joined = out.select("doc_id", "shard").join(
        half.select("doc_id", F.col("shard").alias("shard2")), "doc_id"
    )
    assert joined.filter(F.col("shard") != F.col("shard2")).count() == 0
    out.unpersist()


def test_group_sample_fixed_size_and_determinism(spark):
    from flink_ad_analytics_spark.operators.sampling import group_sample_fixed

    docs = _docs(spark)
    m = 15
    kept = group_sample_fixed(docs, "lang", m, seed=23).cache()
    sizes = dict(kept.groupBy("lang").count().collect())
    full = dict(docs.groupBy("lang").count().collect())
    for lang, n in full.items():
        assert sizes.get(lang, 0) == min(m, n)
    # deterministic: identical membership on rerun over repartitioned input
    again = group_sample_fixed(docs.repartition(7), "lang", m, seed=23)
    sym_diff = kept.select("doc_id").exceptAll(again.select("doc_id")).count()
    assert sym_diff == 0
    kept.unpersist()


def test_sparse_cosine_pairs_identical_docs_score_one(spark):
    from flink_ad_analytics_spark.operators.text import sparse_cosine_pairs

    docs = _docs(spark)
    # plant an exact duplicate pair with distinct ids beyond the corpus
    seed_doc = docs.filter(F.col("doc_id") == 7)
    dup = seed_doc.select(
        F.lit(100001).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    dup2 = seed_doc.select(
        F.lit(100002).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    # max_df above corpus size: no vocabulary pruning (the synthetic
    # docs share a tiny vocabulary, so every term's df is high)
    corpus = docs.select("doc_id", "text", "lang", "source", "n_chars").union(dup).union(dup2)
    pairs = sparse_cosine_pairs(corpus, max_df=10**6, min_cos=0.999)
    planted = pairs.filter(
        (F.col("doc1") == 100001) & (F.col("doc2") == 100002)
    ).collect()
    assert len(planted) == 1 and abs(planted[0]["cos"] - 1.0) < 1e-12


def test_rebalance_to_mix_hits_target_and_is_stable(spark):
    """Kept counts land near target_share * total (binomial bound);
    weight-1.0 strata keep everything; the kept id set is a
    deterministic pure function of (seed, id) -- identical across
    reruns and unaffected by row order."""
    from flink_ad_analytics_spark.operators.sampling import rebalance_to_mix

    docs = load_table(spark, SF_CORRECT, "documents")
    total = docs.count()
    target = {f"src{i}": ((i % 4) + 1) / 50.0 for i in range(20)}
    kept = rebalance_to_mix(docs, "source", target, seed=29)
    per = {r.source: r.n for r in kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    per_in = {r.source: r.n for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for src, n_in in per_in.items():
        w = min(1.0, target[src] * total / n_in)
        n = per.get(src, 0)
        if w == 1.0:
            assert n == n_in  # downsample-only: never drops below cap
        else:
            sd = (n_in * w * (1 - w)) ** 0.5
            assert abs(n - n_in * w) <= 4 * sd + 1, (src, n, n_in * w)
    ids1 = sorted(r.doc_id for r in kept.select("doc_id").collect())
    reordered = docs.orderBy(F.desc("doc_id"))
    ids2 = sorted(
        r.doc_id
        for r in rebalance_to_mix(reordered, "source", target, seed=29)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_negative_samples_never_self_and_deterministic(spark):
    """Invariants the oracle cannot distinguish from a shared bug: no
    negative equals its anchor; every anchor gets exactly k slots; the
    map is identical across reruns and row orders."""
    from flink_ad_analytics_spark.operators.sampling import negative_samples

    docs = load_table(spark, SF_CORRECT, "documents")
    out = negative_samples(docs, k=4, seed=17).collect()
    n = docs.count()
    assert len(out) == 4 * n
    assert all(r.neg_id != r.doc_id for r in out)
    assert all(0 <= r.neg_id < n for r in out)
    m1 = {(r.doc_id, r.neg_rank): r.neg_id for r in out}
    m2 = {
        (r.doc_id, r.neg_rank): r.neg_id
        for r in negative_samples(
            docs.orderBy(F.desc("doc_id")), k=4, seed=17
        ).collect()
    }
    assert m1 == m2


def test_weighted_sample_properties(spark):
    from flink_ad_analytics_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 10).alias("m")
    )
    all_kept = weighted_sample(
        df.withColumn("w", F.lit(1.0)), weight_col="w"
    ).count()
    assert all_kept == 2000, "w=1 keeps everything"
    none = weighted_sample(df.withColumn("w", F.lit(0.0)), weight_col="w").count()
    assert none == 0, "w=0 keeps nothing"
    nulls = weighted_sample(
        df.withColumn("w", F.lit(None).cast("double")), weight_col="w"
    ).count()
    assert nulls == 0, "NULL weight drops the row (no lottery)"
    # clamping: out-of-range weights behave as the bounds
    assert (
        weighted_sample(df.withColumn("w", F.lit(7.5)), weight_col="w").count()
        == 2000
    )
    # monotone nesting: raising every weight only ADDS rows (same seed
    # -> same per-row lottery number)
    lo = {
        r.doc_id
        for r in weighted_sample(
            df.withColumn("w", F.lit(0.3)), weight_col="w"
        ).collect()
    }
    hi = {
        r.doc_id
        for r in weighted_sample(
            df.withColumn("w", F.lit(0.6)), weight_col="w"
        ).collect()
    }
    assert lo <= hi and len(lo) < len(hi)
    # binomial sanity at w=0.3: expect ~600 of 2000
    assert 450 <= len(lo) <= 750, len(lo)


def test_token_budget_invariants(spark):
    from flink_ad_analytics_spark.queries_pipeline import (
        _BUDGET_TOKENS,
        _MAX_EPOCHS,
        q_token_budget,
    )

    rows = q_token_budget(spark, SF_CORRECT).collect()
    n_src = len(rows)
    assert n_src > 1
    for r in rows:
        assert r.epochs <= _MAX_EPOCHS + 1e-12
        assert r.alloc_tokens <= _BUDGET_TOKENS / n_src + 1e-9
        assert r.alloc_tokens == pytest.approx(r.epochs * r.n_tokens)
    assert sum(r.alloc_tokens for r in rows) <= _BUDGET_TOKENS + 1e-6


def _dsir_corpus(spark):
    """Two disjoint vocabularies: target speaks A, raw pool is A+B."""
    a_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    b_words = ["zeta", "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(40):
        words = [(a_words if i < 20 else b_words)[(i * 7 + j) % 5]
                 for j in range(30)]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_target_like_docs_higher(spark):
    from flink_ad_analytics_spark.operators.sampling import dsir_logweights

    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("doc_id") < 20)  # vocabulary-A half
    w = {r["doc_id"]: r["log_w"]
         for r in dsir_logweights(docs, target).collect()}
    assert len(w) == 40
    a_scores = [w[i] for i in range(20)]
    b_scores = [w[i] for i in range(20, 40)]
    # every A-vocabulary doc outscores every B-vocabulary doc
    assert min(a_scores) > max(b_scores)


def test_dsir_target_pred_identical_to_two_pass(spark):
    """The r12 fused path (target_pred slices the raw hashed-feature
    pass) must produce bit-identical weights to hashing the
    predicate-filtered corpus as a separate target -- same occurrence
    rows, partitioned instead of recomputed."""
    from flink_ad_analytics_spark.operators.sampling import (
        dsir_logweights,
        dsir_select,
    )

    docs = _dsir_corpus(spark)
    pred = F.col("doc_id") < 20
    two_pass = sorted(dsir_logweights(docs, docs.filter(pred)).collect())
    fused = sorted(dsir_logweights(docs, target_pred=pred).collect())
    assert two_pass == fused  # exact, incl. the double log_w
    sel_two = dsir_select(docs, docs.filter(pred), k=7).collect()
    sel_fused = dsir_select(docs, target_pred=pred, k=7).collect()
    assert sel_two == sel_fused
    with pytest.raises(ValueError):
        dsir_logweights(docs, docs.filter(pred), target_pred=pred)


def test_dsir_weights_partitioning_invariant(spark):
    from flink_ad_analytics_spark.operators.sampling import dsir_logweights

    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("doc_id") < 20)
    base = sorted(dsir_logweights(docs, target).collect())
    shuffled = sorted(
        dsir_logweights(docs.repartition(7), target.repartition(3)).collect()
    )
    assert base == shuffled  # exact equality incl. the double log_w


def test_dsir_select_prefers_target_like_docs(spark):
    from flink_ad_analytics_spark.operators.sampling import dsir_select

    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("doc_id") < 20)
    picked = dsir_select(docs, target, k=10).collect()
    assert [r["rank"] for r in picked] == list(range(1, 11))
    # weights dominate the bounded Gumbel noise on this separation:
    # at least 8 of 10 picks come from the target-like half
    assert sum(1 for r in picked if r["doc_id"] < 20) >= 8


def test_dsir_standing_index_equals_direct(spark, tmp_path):
    """The deployment path: target bucket counts persisted once as a
    tiny parquet index, every later raw dump scored against it --
    weights identical to hashing the target inline."""
    from flink_ad_analytics_spark.operators.sampling import (
        dsir_logweights,
        dsir_target_index,
    )

    docs = _dsir_corpus(spark)
    target = docs.filter(F.col("doc_id") < 20)
    direct = sorted(dsir_logweights(docs, target).collect())

    idx_path = str(tmp_path / "dsir_index")
    dsir_target_index(target).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    assert idx.count() <= 10_000
    via_index = sorted(
        dsir_logweights(docs, target_index=idx).collect()
    )
    assert direct == via_index  # exact, incl. the double log_w

    with pytest.raises(ValueError, match="exactly one"):
        dsir_logweights(docs)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_logweights(docs, target, target_index=idx)


class TestKCenterCoreset:
    def test_planted_clusters_one_pick_each(self, spark):
        """k-center with k = #clusters must land one pick per planted
        cluster -- the property that makes it a DIVERSITY sampler
        (uniform/random sampling concentrates in the big cluster)."""
        import random

        from flink_ad_analytics_spark.operators.sampling import kcenter_coreset

        rng = random.Random(7)
        centers = [[50.0 * c] * 8 for c in range(4)]
        rows = []
        vid = 0
        # cluster 0 is 10x the size of the others: a frequency-driven
        # sampler would pick it 4 times
        for c, n in [(0, 100), (1, 10), (2, 10), (3, 10)]:
            for _ in range(n):
                rows.append(
                    (vid, [v + rng.uniform(-1, 1) for v in centers[c]])
                )
                vid += 1
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        picks = kcenter_coreset(emb, k=4).collect()

        # map vec_id back to its cluster by construction order
        def cluster_of(v):
            if v < 100: return 0
            return 1 + (v - 100) // 10
        assert sorted({cluster_of(r.vec_id) for r in picks}) == [0, 1, 2, 3]

    def test_radius_curve_monotone_nonincreasing(self, spark):
        from flink_ad_analytics_spark.operators.sampling import kcenter_coreset
        from flink_ad_analytics_spark.sources.batch import load_table
        from tests.conftest import SF_CORRECT

        emb = load_table(spark, SF_CORRECT, "embeddings")
        picks = kcenter_coreset(emb, k=6).collect()
        d = [r.dist2 for r in sorted(picks, key=lambda r: r.sel_rank)][1:]
        assert d == sorted(d, reverse=True)
        assert all(x > 0 for x in d)

    def test_corpus_smaller_than_k(self, spark):
        from flink_ad_analytics_spark.operators.sampling import kcenter_coreset

        emb = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        picks = kcenter_coreset(emb, k=5).collect()
        assert len(picks) == 2
        assert {r.vec_id for r in picks} == {1, 2}

    def test_kcenter_arrow_identical(self, spark):
        """arrow=True (vectorized numpy int64 update) must reproduce
        the HOF path's trace exactly -- same picks, same radii."""
        from flink_ad_analytics_spark.operators.sampling import kcenter_coreset
        from flink_ad_analytics_spark.sources.batch import load_table
        from tests.conftest import SF_CORRECT

        emb = load_table(spark, SF_CORRECT, "embeddings")
        a = sorted(map(tuple, kcenter_coreset(emb, k=6).collect()))
        b = sorted(map(tuple, kcenter_coreset(emb, k=6, arrow=True).collect()))
        assert a == b

    def test_assignment_partitions_corpus_and_radius_bounds_trace(self, spark):
        """Every vector lands in exactly one cell, and no cell radius
        exceeds the last greedy pick's dist2 (the farthest unpicked
        vector at stop time is by definition the coverage bound)."""
        from flink_ad_analytics_spark.operators.sampling import (
            kcenter_assign,
            kcenter_coreset,
        )
        from flink_ad_analytics_spark.sources.batch import load_table
        from tests.conftest import SF_CORRECT

        emb = load_table(spark, SF_CORRECT, "embeddings")
        picks = kcenter_coreset(emb, k=8)
        cells = kcenter_assign(emb, picks).collect()
        assert sum(r.n_members for r in cells) == emb.count()
        assert {r.center_id for r in cells} == {
            r.vec_id for r in picks.collect()
        }
        # the greedy trace's LAST pick distance upper-bounds nothing,
        # but the max cell radius can't exceed the would-be 9th pick;
        # weaker invariant that needs no 9th run: every radius is
        # below the FIRST non-seed pick's distance (max over corpus)
        first = [r.dist2 for r in picks.collect() if r.sel_rank == 2][0]
        assert all(r.radius2 <= first for r in cells)


def test_sqrt_temperature_mix_flattens_skew(spark):
    """The point of temperature smoothing: the head stratum's kept
    share must land BELOW its corpus share, tail strata above --
    checked against the exact expected keep fractions, not just
    directionally. Also: deterministic across reruns."""
    import math

    from flink_ad_analytics_spark.operators.sampling import sqrt_temperature_mix

    docs = load_table(spark, SF_CORRECT, "documents")
    per_in = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    n_target = 150
    kept = sqrt_temperature_mix(docs, "lang", n_target)
    per_out = {r[0]: r[1] for r in kept.groupBy("lang").count().collect()}
    s = {k: math.floor(math.sqrt(n) * 1e6 + 0.5) for k, n in per_in.items()}
    tot_s = sum(s.values())
    total_in = sum(per_in.values())
    for lang, n in per_in.items():
        frac = min(1.0, n_target * s[lang] / (tot_s * n))
        exp = n * frac
        sd = math.sqrt(n * frac * (1 - frac)) if frac < 1 else 0.0
        assert abs(per_out.get(lang, 0) - exp) <= 4 * sd + 1, (
            lang, per_out.get(lang, 0), exp)
    # smoothing direction: en (head, 218/500) keeps a smaller fraction
    # than fr (tail, 64/500)
    assert per_out["en"] / per_in["en"] < per_out["fr"] / per_in["fr"]
    # sqrt target shares flatten the mix vs corpus shares
    assert s["en"] / tot_s < per_in["en"] / total_in
    again = {r[0]: r[1] for r in sqrt_temperature_mix(
        docs.repartition(11), "lang", n_target).groupBy("lang").count().collect()}
    assert again == per_out


def test_sqrt_temperature_mix_membership_matches_python_exact(spark):
    """Exact decision parity with an independent pure-Python
    computation of the integer thresholds and md5 lottery -- pins the
    whole floor/sqrt/DIV pipeline, not just kept-count statistics."""
    import hashlib
    import math

    from flink_ad_analytics_spark.operators.sampling import sqrt_temperature_mix

    rows = []
    doc = 0
    sizes = {"a": 3, "b": 17, "c": 100, "d": 1, "e": 44}
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((doc, s))
            doc += 1
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    n_target, seed = 60, 31
    kept = {r.doc_id for r in
            sqrt_temperature_mix(df, "stratum", n_target, seed=seed).collect()}

    units = {s: math.floor(math.sqrt(n) * 1_000_000 + 0.5)
             for s, n in sizes.items()}
    tot = sum(units.values())
    thr = {s: min(2**32, (2**32 * n_target * units[s]) // (tot * n))
           for s, n in sizes.items()}
    expected = set()
    for d, s in rows:
        h = int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8], 16)
        if h < thr[s]:
            expected.add(d)
    assert kept == expected and expected  # non-empty, exact membership
