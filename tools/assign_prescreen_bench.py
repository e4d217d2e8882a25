#!/usr/bin/env python3
"""Prescreen experiment for the exact-decimal assignment family
(r13 session 2): `_assign_to_init` and `pq_codes_stats` evaluate the
exact DECIMAL(20,16)-per-term distance fold for EVERY (vector,
centroid) candidate -- n*k folds -- although only the argmin winner's
distance is ever emitted. The similarity.py house idiom (double
prescreen + exact rescore inside a provable margin) applied here:

* collect the k hash-sampled centroids (k <= 16 rows -- the same
  bounded-state collect kmeans_fit/pq_fit already do),
* per row, compute all k DOUBLE distance folds (primitive arithmetic,
  no BigDecimal allocation),
* keep the candidates within 1e-6 of the double minimum (the double
  fold's deviation from the exact fold is < 1e-11 at these magnitudes:
  64 terms, |d2| <= ~1e3 -- see OPTIMIZATION_r13.md for the bound),
* evaluate the exact decimal fold ONLY for those survivors (~1 per
  row) and take the (d2, cid)-min among them.

This is NOT the r12-rejected map-side argmin (which kept all k decimal
folds and added a struct allocation per candidate); the prescreen
attacks the fold cost itself, and the pure-projection form also
deletes the pair blow-up + argmin window exchange outright.

Verifies collect-equality (new vs incumbent, sorted rows) at sf0.01
and sf0.001 before timing; then same-session interleaved A/B
(min-of-N, both orders) at sf0.1.

Usage: python3 tools/assign_prescreen_bench.py [reps]
Writes .benchmarks/assign_prescreen_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_ad_analytics_spark.session import build_session  # noqa: E402
from flink_ad_analytics_spark.sources.batch import load_table  # noqa: E402
from flink_ad_analytics_spark.operators.clustering import (  # noqa: E402
    _assign_to_init_reference,
    hash_sampled_centroids,
)

# NOTE: after this experiment shipped, the package's `_assign_to_init`
# and `pq_codes_stats` BECAME the prescreen forms; the incumbents below
# therefore call the preserved window-form reference so the A/B stays
# reproducible on the shipped tree.

EPS = "1.0E-6"


def _dbl_arr(vals) -> str:
    return "CAST(array(" + ",".join(repr(float(v)) for v in vals) + ") AS ARRAY<DOUBLE>)"


def _winner_expr(cent_arrs: list[list[float]], vec_expr: str) -> str:
    """struct<d2: decimal(38,12), cid: int> argmin over literal
    centroids: double prescreen, exact decimal rescore of survivors."""
    k = len(cent_arrs)
    cc = "array(" + ",".join(_dbl_arr(c) for c in cent_arrs) + ")"
    d2a = ",".join(
        f"aggregate(zip_with({vec_expr}, {_dbl_arr(c)}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"CAST(0 AS DOUBLE), (a, t) -> a + t)"
        for c in cent_arrs
    )
    exact_j = (
        f"CAST(round(aggregate(zip_with({vec_expr}, element_at({cc}, j + 1), "
        f"(x, y) -> CAST((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) "
        f"AS DECIMAL(20,16))), "
        f"CAST(0 AS DECIMAL(38,16)), "
        f"(acc, t) -> CAST(acc + t AS DECIMAL(38,16))), 12) AS DECIMAL(38,12))"
    )
    zero = "named_struct('d2', CAST(NULL AS DECIMAL(38,12)), 'cid', -1)"
    return (
        f"aggregate(array(array({d2a})), {zero}, (z, ds) -> "
        f"aggregate("
        f"filter(sequence(0, {k - 1}), j -> "
        f"element_at(ds, j + 1) <= array_min(ds) + {EPS}), "
        f"{zero}, "
        f"(best, j) -> IF(best.cid = -1 OR {exact_j} < best.d2, "
        f"named_struct('d2', {exact_j}, 'cid', j), best)))"
    )


def pq_codes_window_reference(
    emb, *, m=8, k=16, id_col="vec_id", vec_col="embedding", seed=11
):
    """The pre-r13 pq_codes_stats (n*m*k candidate relation + argmin
    window, exact decimal fold per candidate), preserved verbatim so
    the A/B stays reproducible on the shipped tree."""
    from pyspark.sql import Window
    from flink_ad_analytics_spark.operators.clustering import _DIST2_FOLD

    d = len(emb.select(vec_col).first()[0])
    dsub = d // m
    spark = emb.sparkSession
    cents = hash_sampled_centroids(emb, k, id_col, vec_col, seed).select(
        "centroid_id",
        F.expr("transform(centroid, x -> CAST(x AS DOUBLE))").alias("centroid"),
    )
    subs = spark.range(m).select(F.col("id").cast("int").alias("sub"))
    vs = f"slice({vec_col}, sub * {dsub} + 1, {dsub})"
    cs = f"slice(centroid, sub * {dsub} + 1, {dsub})"
    dist2 = _DIST2_FOLD.format(v=vs, c=cs)
    pairs = (
        emb.select(id_col, vec_col)
        .crossJoin(F.broadcast(subs))
        .crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.col("sub"),
            F.col("centroid_id"),
            F.expr(dist2).alias("d2"),
        )
    )
    w = Window.partitionBy(id_col, "sub").orderBy(
        F.col("d2").asc(), F.col("centroid_id").asc()
    )
    return (
        pairs.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(
            F.col(id_col),
            F.col("sub").cast("long").alias("sub"),
            F.col("centroid_id").cast("long").alias("code"),
            F.round(F.col("d2"), 6).cast("double").alias("d2"),
        )
    )


def assign_to_init_prescreen(emb, k, id_col, vec_col, seed):
    rows = hash_sampled_centroids(emb, k, id_col, vec_col, seed).collect()
    cents = [
        [float(x) for x in r.centroid]
        for r in sorted(rows, key=lambda r: r.centroid_id)
    ]
    if not cents:
        return emb.sparkSession.createDataFrame(
            [], f"{id_col} long, centroid_id int, d2 decimal(38,12)"
        )
    w = _winner_expr(cents, vec_col)
    return emb.select(
        F.col(id_col),
        F.expr(f"({w}).cid").alias("centroid_id"),
        F.expr(f"({w}).d2").alias("d2"),
    )


def pq_codes_prescreen(emb, *, m=8, k=16, id_col="vec_id", vec_col="embedding", seed=11):
    d = len(emb.select(vec_col).first()[0])
    dsub = d // m
    rows = hash_sampled_centroids(emb, k, id_col, vec_col, seed).collect()
    cents = [
        [float(x) for x in r.centroid]
        for r in sorted(rows, key=lambda r: r.centroid_id)
    ]
    winners = []
    for sub in range(m):
        vs = f"slice({vec_col}, {sub * dsub} + 1, {dsub})"
        sliced = [c[sub * dsub : (sub + 1) * dsub] for c in cents]
        winners.append(_winner_expr(sliced, vs))
    warr = "array(" + ",".join(winners) + ")"
    return emb.select(
        F.col(id_col), F.posexplode(F.expr(warr)).alias("sub", "w")
    ).select(
        F.col(id_col),
        F.col("sub").cast("long").alias("sub"),
        F.col("w.cid").cast("long").alias("code"),
        F.round(F.col("w.d2"), 6).cast("double").alias("d2"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_session(
        app_name="assign-prescreen-ab",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import materialize

    out: dict = {"equality": {}, "ab": {}, "load_1m": round(os.getloadavg()[0], 2)}

    # -- value equality on the small SFs --------------------------------
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = load_table(spark, sf, "embeddings")
        a = _rows(_assign_to_init_reference(emb, 10, "vec_id", "embedding", 11))
        b = _rows(assign_to_init_prescreen(emb, 10, "vec_id", "embedding", 11))
        assert a == b, f"assign mismatch at {sf}: {len(a)} vs {len(b)} rows"
        p = _rows(pq_codes_window_reference(emb, m=8, k=16, seed=11))
        q = _rows(pq_codes_prescreen(emb, m=8, k=16, seed=11))
        assert p == q, f"pq mismatch at {sf}"
        out["equality"][sf] = {"assign_rows": len(a), "pq_rows": len(p)}
        print(f"equality OK at {sf}: assign={len(a)} pq={len(p)}", flush=True)

    # -- interleaved A/B at sf0.1 ----------------------------------------
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    variants = {
        "assign_incumbent": lambda: _assign_to_init_reference(emb, 10, "vec_id", "embedding", 11),
        "assign_prescreen": lambda: assign_to_init_prescreen(emb, 10, "vec_id", "embedding", 11),
        "pq_incumbent": lambda: pq_codes_window_reference(emb, m=8, k=16, seed=11),
        "pq_prescreen": lambda: pq_codes_prescreen(emb, m=8, k=16, seed=11),
    }
    times: dict[str, list[float]] = {n: [] for n in variants}
    # warmup each once
    for n, f in variants.items():
        materialize(f())
    order = list(variants)
    for r in range(reps):
        seq = order if r % 2 == 0 else order[::-1]
        for n in seq:
            t0 = time.perf_counter()
            materialize(variants[n]())
            times[n].append(round(time.perf_counter() - t0, 3))
    for n, ts in times.items():
        out["ab"][n] = {"min": min(ts), "median": sorted(ts)[len(ts) // 2], "all": ts}
        print(n, out["ab"][n], flush=True)
    with open("/root/repo/.benchmarks/assign_prescreen_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out["ab"].items()}, indent=1))


if __name__ == "__main__":
    main()
