"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk`` -- brute-force exact top-k: every query vector
  against every candidate. The correctness baseline.
* ``ivf_topk``    -- IVF-style bucketed ANN: vectors are coarsely
  quantized by the sign pattern of their leading dimensions; queries
  search only their own bucket. The scale path: at 100 TB the
  candidate set per query drops by ~2^k, and buckets are
  hash-partitionable (bucket id is the shuffle key), so the search is
  embarrassingly parallel with no cross-partition traffic.

Determinism engineering (oracle = DuckDB): dot products and norms are
accumulated as DECIMAL(20,16) terms (each term is the exact double
product of two floats, rounded once, deterministically, to 16dp), so
the SUM is order-independent and exact; the decimal sum is rounded to
12dp before the double cast (keeps the conversion exact); sqrt and
division are correctly-rounded IEEE ops; ranking orders by the
*rounded* cosine with vec_id tiebreak, so rank is engine-independent.

At production scale the exact-decimal trick is unnecessary (we'd rank
by raw double cosine, or go through a vectorized pandas_udf over
Arrow batches); it exists so correctness is *provable* against an
independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Exact, order-independent dot-product accumulation (see module doc).
_TERM = "CAST(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE) AS DECIMAL(20,16))"


def _unnested(df: DataFrame, id_alias: str, val_alias: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.posexplode("embedding").alias("pos", val_alias),
    )


def vector_norms(embeddings: DataFrame) -> DataFrame:
    """(vec_id, nrm): deterministic L2 norm per vector."""
    un = _unnested(embeddings, "vec_id", "v")
    return un.groupBy("vec_id").agg(
        F.sqrt(
            F.round(F.sum(F.expr(_TERM.format(a="v", b="v"))), 12).cast("double")
        ).alias("nrm")
    )


def cosine_topk(
    embeddings: DataFrame,
    *,
    query_filter,
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k for the query subset.

    ``query_filter``: Column predicate choosing query vectors (they
    search against the full table, excluding self).
    Output: (q_id, c_id, cosine, rank), rank 1..k per query.
    """
    queries = embeddings.filter(query_filter)
    qe = _unnested(queries, "q_id", "qv")
    ce = _unnested(embeddings, "c_id", "cv")
    dots = (
        qe.join(ce, "pos")
        .groupBy("q_id", "c_id")
        .agg(
            F.round(F.sum(F.expr(_TERM.format(a="qv", b="cv"))), 12)
            .cast("double")
            .alias("dot")
        )
    )
    norms = vector_norms(embeddings)
    qn = norms.select(F.col("vec_id").alias("q_id"), F.col("nrm").alias("qn"))
    cn = norms.select(F.col("vec_id").alias("c_id"), F.col("nrm").alias("cn"))
    scored = (
        dots.filter(F.col("q_id") != F.col("c_id"))
        .join(F.broadcast(qn), "q_id")
        .join(F.broadcast(cn), "c_id")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    *,
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, sign-bucketed.

    All same-bucket vector pairs with rounded cosine >= threshold.
    The bucket restriction is the scale lever (candidates ~ n^2 / 2^k
    per bucket, shuffle key = bucket); recall is bucket-bounded and
    deterministic, with brute-force ``cosine_topk`` as the exact
    reference. Output: (vec_id_1, vec_id_2, bucket, cosine).
    """
    bucketed = embeddings.withColumn("bucket", sign_bucket())
    a = bucketed.select(
        F.col("vec_id").alias("vec_id_1"),
        F.col("bucket"),
        F.posexplode("embedding").alias("pos", "v1"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_id_2"),
        F.col("bucket"),
        F.posexplode("embedding").alias("pos", "v2"),
    )
    dots = (
        a.join(b, ["bucket", "pos"])
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
        .groupBy("bucket", "vec_id_1", "vec_id_2")
        .agg(
            F.round(F.sum(F.expr(_TERM.format(a="v1", b="v2"))), 12)
            .cast("double")
            .alias("dot")
        )
    )
    norms = vector_norms(embeddings)
    n1 = norms.select(F.col("vec_id").alias("vec_id_1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("vec_id").alias("vec_id_2"), F.col("nrm").alias("nrm2"))
    return (
        dots.join(F.broadcast(n1), "vec_id_1")
        .join(F.broadcast(n2), "vec_id_2")
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_id_1", "vec_id_2", "bucket", "cosine")
    )


IVF_SIGN_DIMS = 4  # 2^4 = 16 coarse buckets


def sign_bucket(emb_col: str = "embedding", dims: int = IVF_SIGN_DIMS) -> F.Column:
    """Coarse quantizer: bitmask of sign bits of the leading dims."""
    total = None
    for i in range(dims):
        bit = F.when(F.element_at(F.col(emb_col), i + 1) > 0, 1 << i).otherwise(0)
        total = bit if total is None else total + bit
    return total.cast("int")


def ivf_topk(
    embeddings: DataFrame,
    *,
    query_filter,
    k: int = 5,
) -> DataFrame:
    """Bucketed ANN: search only the query's sign-pattern bucket.

    Recall < 1 by construction (neighbors in other buckets are
    unseen) -- deterministically so, in engine and oracle alike;
    cosine_topk is the exact reference. Output adds the bucket id.
    """
    bucketed = embeddings.withColumn("bucket", sign_bucket())
    queries = bucketed.filter(query_filter)
    qe = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("bucket"),
        F.posexplode("embedding").alias("pos", "qv"),
    )
    ce = bucketed.select(
        F.col("vec_id").alias("c_id"),
        F.col("bucket"),
        F.posexplode("embedding").alias("pos", "cv"),
    )
    dots = (
        qe.join(ce, ["bucket", "pos"])
        .groupBy("bucket", "q_id", "c_id")
        .agg(
            F.round(F.sum(F.expr(_TERM.format(a="qv", b="cv"))), 12)
            .cast("double")
            .alias("dot")
        )
    )
    norms = vector_norms(embeddings)
    qn = norms.select(F.col("vec_id").alias("q_id"), F.col("nrm").alias("qn"))
    cn = norms.select(F.col("vec_id").alias("c_id"), F.col("nrm").alias("cn"))
    scored = (
        dots.filter(F.col("q_id") != F.col("c_id"))
        .join(F.broadcast(qn), "q_id")
        .join(F.broadcast(cn), "c_id")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "bucket", "cosine", "rank")
    )
