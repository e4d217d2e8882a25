"""SemDeDup (operators/clustering.py::semantic_dedup): planted
near-duplicate recovery, min-id survivorship, greedy chain semantics,
zero-vector handling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F, types as T

from flink_ad_analytics_spark.operators.clustering import semantic_dedup

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def test_planted_duplicates_dropped_min_id_kept(spark):
    """Two tight groups of near-identical vectors plus isolated
    vectors: each group keeps exactly its min id; isolated vectors
    survive."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),      # ~dup of 0
        (2, [0.998, -0.02, 0.01, 0.0]),    # ~dup of 0
        (3, [0.0, 1.0, 0.0, 0.0]),         # isolated
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.005, 0.999, 0.0]),     # ~dup of 4
        (6, [0.0, 0.0, 0.0, 1.0]),         # isolated
    ]
    out = {
        r.vec_id: r.keep
        for r in semantic_dedup(
            _df(spark, rows), k=3, threshold=0.95
        ).collect()
    }
    assert out[0] and out[4], "group minima kept"
    assert not out[1] and not out[2] and not out[5], "planted dups dropped"
    assert out[3] and out[6], "isolated vectors kept"


def test_greedy_chain_semantics(spark):
    """a~b and b~c with a!~c: greedy id-order drops BOTH b and c (b
    via a, c via b) -- the documented parallel-greedy behavior. All
    three vectors must land in one cluster for pairs to form, so k=1."""
    t = math.radians(40)  # cos 40deg ~ 0.766 >= 0.7; cos 80deg ~ 0.17 < 0.7
    rows = [
        (0, [1.0, 0.0]),
        (1, [math.cos(t), math.sin(t)]),
        (2, [math.cos(2 * t), math.sin(2 * t)]),
    ]
    out = {
        r.vec_id: r.keep
        for r in semantic_dedup(_df(spark, rows), k=1, threshold=0.7).collect()
    }
    assert out == {0: True, 1: False, 2: False}


def test_zero_vectors_always_kept(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.001]),   # dup of 0
        (2, [0.0, 0.0]),     # zero vector: cosine undefined, kept
        (3, [0.0, 0.0]),     # even two zero vectors never pair
    ]
    out = {
        r.vec_id: r.keep
        for r in semantic_dedup(_df(spark, rows), k=1, threshold=0.9).collect()
    }
    assert out == {0: True, 1: False, 2: True, 3: True}


def test_every_input_row_appears_exactly_once(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, k=5, threshold=0.4)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()
    clusters = out.select("cluster_id").distinct().count()
    assert 1 <= clusters <= 5


def test_negative_ids_still_pair(spark):
    """Signed (e.g. hashed) ids: salting must use pmod so negative-id
    query rows still meet the candidate replicas; min-id keep rule
    orders over the signed values."""
    rows = [
        (-5, [1.0, 0.0]),
        (-1, [0.999, 0.01]),   # near-dup of -5; -5 < -1 so -1 drops
        (7, [0.0, 1.0]),
    ]
    out = {
        r.vec_id: r.keep
        for r in semantic_dedup(_df(spark, rows), k=1, threshold=0.9).collect()
    }
    assert out == {-5: True, -1: False, 7: True}


def test_checkpoint_materialization_value_neutral(spark):
    """r13: the in-query localCheckpoint of the assignment pass is an
    execution detail -- output must be row-identical to the recompute
    form on a real fixture (and the checkpoint must actually be in
    effect by default)."""
    import flink_ad_analytics_spark.operators.clustering as cl

    assert cl._SEMANTIC_DEDUP_CHECKPOINT is True
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with_ckpt = sorted(
        map(tuple, semantic_dedup(emb, k=5, threshold=0.4).collect())
    )
    cl._SEMANTIC_DEDUP_CHECKPOINT = False
    try:
        without = sorted(
            map(tuple, semantic_dedup(emb, k=5, threshold=0.4).collect())
        )
    finally:
        cl._SEMANTIC_DEDUP_CHECKPOINT = True
    assert with_ckpt == without
