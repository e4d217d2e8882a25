"""Salted-join equivalence and vectorized-ANN agreement tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.functions.skew import salted_join
from flink_ad_analytics_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_vectorized,
)
from tests.conftest import SF_CORRECT


def test_salted_join_equals_plain_join(spark):
    """On a deliberately skewed workload (90% of rows on one key) the
    salted join must return exactly the plain join's result."""
    large = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))  # hot key 0: 90% of rows
        .otherwise((F.col("id") % 100).cast("long"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_val")
    )
    plain = large.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(large, small, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())
    # left join preserves unmatched large rows
    large2 = large.withColumn("k", F.col("k") + 1000)  # no matches
    left = salted_join(large2, small, "k", n_salts=4, how="left")
    assert left.count() == large2.count()
    assert left.filter(F.col("dim_val").isNotNull()).count() == 0


def test_vectorized_topk_agrees_with_exact(spark):
    """The NumPy-matmul path must agree with the decimal-exact
    reference: same neighbor sets, cosines within 1e-9."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    exact = {
        (r.q_id, r.c_id): r.cosine
        for r in cosine_topk(emb, query_filter=F.col("vec_id") < 10, k=5).collect()
    }
    fast = {
        (r.q_id, r.c_id): r.cosine
        for r in cosine_topk_vectorized(
            emb, query_filter=F.col("vec_id") < 10, k=5
        ).collect()
    }
    assert set(exact) == set(fast)
    # the exact path rounds to 6dp; the raw float64 result must sit
    # within that rounding granularity
    for key, v in exact.items():
        assert fast[key] == pytest.approx(v, abs=6e-7)


def test_vectorized_topk_empty_queries(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    out = cosine_topk_vectorized(emb, query_filter=F.col("vec_id") < -1, k=5)
    assert out.count() == 0


def test_zero_norm_vectors_excluded_everywhere(spark):
    """A single all-zero embedding must not crash (ANSI DIVIDE_BY_ZERO)
    or outrank real candidates (NaN sorts first in desc order) in ANY
    cosine path -- it is excluded, like the quantized path's NULL-q."""
    from flink_ad_analytics_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_vectorized,
        ivf_topk,
        quantized_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 2.0, 3.0, 4.0]),
            (2, [1.0, 2.0, 3.0, 3.9]),
            (3, [-1.0, 0.5, 2.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    for fn, score_col in (
        (cosine_topk, "cosine"),
        (ivf_topk, "cosine"),
        (cosine_topk_vectorized, "cosine"),
        (quantized_topk, "qcosine"),
    ):
        rows = fn(emb, query_filter=F.col("vec_id") < 2, k=2).collect()
        assert all(r.q_id != 0 and r.c_id != 0 for r in rows), fn.__name__
        assert all(r[score_col] is not None for r in rows), fn.__name__


def test_evolving_table_defaults_absent_column(spark, tmp_path):
    """A default for a column absent from EVERY file must be added,
    not silently ignored."""
    from flink_ad_analytics_spark.sources.batch import load_evolving_table

    spark.createDataFrame([(1, "a")], "id long, txt string").write.parquet(
        str(tmp_path / "t")
    )
    df = load_evolving_table(
        spark, str(tmp_path / "t"), defaults={"split": "train"}
    )
    assert df.select("split").collect()[0].split == "train"


def test_hard_negatives_exclude_near_dups_but_fill_k(spark):
    from flink_ad_analytics_spark.queries_ext import (
        q_ann_topk_vectorized,
        q_hard_negatives,
    )
    from tests.conftest import SF_CORRECT

    hn = q_hard_negatives(spark, SF_CORRECT).collect()
    assert all(r.cosine < 0.4 for r in hn)
    per_q = {}
    for r in hn:
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 6)) for v in per_q.values())
    ann = {
        (r.q_id, r.c_id)
        for r in q_ann_topk_vectorized(spark, SF_CORRECT).collect()
    }
    hn_pairs = {(r.q_id, r.c_id) for r in hn}
    # non-vacuity: the near-dup exclusion changes at least one list
    assert any(p not in hn_pairs for p in ann)
