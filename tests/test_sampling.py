"""Deterministic sampling/split properties.

The load-bearing property of hash-based splits is *stability*: a row's
assignment depends only on (seed, id), never on what else is in the
corpus, its order, or its partitioning. That is what makes the split
safe on a growing 100 TB corpus -- appending a new crawl dump cannot
flip old rows between train and val.
"""

from __future__ import annotations

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
