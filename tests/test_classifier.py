"""Hashed-feature linear classifier (operators/text.py): folded-weights
form == materialized-vector form, hand-computed scores, zero-shuffle
plan."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F, types as T

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


def test_null_text_matches_oracle_semantics(spark):
    """NULL text: n_tokens NULL (not legacy size(NULL) = -1),
    weight_sum 0, lr_score NULL -- the DuckDB oracle's exact behavior,
    in both weight forms."""
    docs = spark.createDataFrame(
        [(0, None), (1, "real text")],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    for fn in (
        lambda d: hashed_linear_score(d),
        lambda d: hashed_linear_score_from_vector(d, linear_weights()),
    ):
        row = {r.doc_id: r for r in fn(docs).collect()}
        assert row[0].n_tokens is None
        assert row[0].weight_sum == 0
        assert row[0].lr_score is None
        assert row[1].n_tokens == 2 and row[1].weight_sum != 0
