"""Hashed-feature linear classifier (operators/text.py): folded-weights
form == materialized-vector form, hand-computed scores, zero-shuffle
plan."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.text import (
    LINEAR_DIM,
    LINEAR_WEIGHT_MOD,
    LINEAR_WEIGHT_SHIFT,
    hashed_linear_score,
    hashed_linear_score_from_vector,
    linear_weights,
)


def _py_score(text: str) -> tuple[int, int]:
    toks = text.strip().split()
    if text.strip() == "":
        toks = [""]
    total = 0
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % LINEAR_DIM
        w = (
            int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16)
            % LINEAR_WEIGHT_MOD
            - LINEAR_WEIGHT_SHIFT
        )
        total += w
    return len(toks), total


def test_matches_hand_computed_reference(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "hash join key value value value"),
        (2, "x"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_tokens, r.weight_sum)
        for r in hashed_linear_score(docs).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_score(text), (doc_id, text)


def test_folded_weights_equal_materialized_vector(spark):
    """The oracle-able arithmetic form and the production array-lookup
    form (the swap-in point for actually-learned weights) must score
    identically token-for-token."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    a = hashed_linear_score(docs).orderBy("doc_id").collect()
    b = (
        hashed_linear_score_from_vector(docs, linear_weights())
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.n_tokens, r.weight_sum) for r in a] == [
        (r.doc_id, r.n_tokens, r.weight_sum) for r in b
    ]
    assert a, "fixture produced no rows"


def test_score_bounds_and_zero_shuffle_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = hashed_linear_score(docs)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    out_of_range = scored.filter(
        (F.abs(F.col("weight_sum")) > LINEAR_WEIGHT_SHIFT * F.col("n_tokens"))
        | (F.abs(F.col("lr_score")) > 1.0)
    ).count()
    assert out_of_range == 0
