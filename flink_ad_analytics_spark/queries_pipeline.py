"""Pipeline query registry: deterministic sampling/splits, repetition
quality, decontamination, PII redaction, embedding quantization --
the corpus-curation operators a large-scale training-data pipeline
runs before anything touches a model.

Same contract as queries_ext.py: each entry is (spark_fn, duckdb_sql)
with identical column aliases on both sides, engineered for value-
exact cross-engine parity (integer counts, exact int/int double
ratios, md5-hex portable hashing, single terminal ROUND).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.sampling import (
    hash_split,
    hash_split_case_sql,
    kfold_assign,
    kfold_case_sql,
    stratified_keep_sql,
    stratified_sample,
)
from .sources.batch import load_table

# -- dataset splits -------------------------------------------------------

_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SEED = 42


def q_dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment audit: per-(split, lang) volumes.

    The interesting property is determinism: the same doc lands in the
    same split on every engine, rerun, and cluster size -- proven by
    the oracle computing the identical CASE over md5 thresholds.
    """
    docs = load_table(spark, sf_dir, "documents")
    assigned = hash_split(docs, "doc_id", _SPLIT_WEIGHTS, seed=_SPLIT_SEED)
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


DATASET_SPLITS_SQL = f"""
SELECT {hash_split_case_sql('doc_id', _SPLIT_WEIGHTS, _SPLIT_SEED)} AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""

# -- stratified sampling --------------------------------------------------

#: Rebalance the corpus: downsample the dominant strata, keep the tail.
_STRATA_FRACTIONS = {"en": 0.25, "es": 0.5, "fr": 1.0}
_STRATA_DEFAULT = 0.1
_STRATA_SEED = 7


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic downsampling, audited per lang.

    min/max surviving doc_id pin the exact membership (not just the
    count) into the hash gate.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "lang",
        _STRATA_FRACTIONS,
        id_col="doc_id",
        seed=_STRATA_SEED,
        default_fraction=_STRATA_DEFAULT,
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang,
       COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
WHERE {stratified_keep_sql('lang', _STRATA_FRACTIONS, 'doc_id', _STRATA_SEED, _STRATA_DEFAULT)}
GROUP BY lang
"""

# -- k-fold ---------------------------------------------------------------

_KFOLD_K = 5
_KFOLD_SEED = 13


def q_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold balance audit: every fold's size and char volume.

    xor of doc-id hashes (bit_xor of xxhash-free md5 prefix would not
    be portable; the sum of doc_id is) pins membership per fold.
    """
    docs = load_table(spark, sf_dir, "documents")
    folds = kfold_assign(docs, "doc_id", k=_KFOLD_K, seed=_KFOLD_SEED)
    return folds.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum("doc_id").alias("sum_ids"),
    )


KFOLD_BALANCE_SQL = f"""
SELECT {kfold_case_sql('doc_id', _KFOLD_K, _KFOLD_SEED)} AS fold,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM documents
GROUP BY 1
"""


PIPELINE_QUERIES: dict[str, tuple] = {
    "dataset_splits": (q_dataset_splits, DATASET_SPLITS_SQL),
    "stratified_sample": (q_stratified_sample, STRATIFIED_SAMPLE_SQL),
    "kfold_balance": (q_kfold_balance, KFOLD_BALANCE_SQL),
}
