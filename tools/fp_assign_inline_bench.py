#!/usr/bin/env python3
"""Struct-free literal argmin for the FIXED-POINT assignment family
(r13 session 2, follow-up to the decimal prescreen): `_fp_assign`
joins every quantized row against the broadcast k-row centroid
relation (n*k joined rows, each copying the 64-bigint `q` array) and
ranks a per-id window. The r12 map-side rewrite of this family was
REJECTED because its per-candidate struct allocation cost more than
the (WindowGroupLimit-pruned) exchange it saved. This variant
allocates NO per-candidate structs: centroids ride in as literal
arrays, the k integer distances land in one bound array, and

    cid   = element_at(cids, array_position(ds, array_min(ds)))
    dist2 = array_min(ds)

-- array_position returns the FIRST index of the minimum, which IS the
lowest-cid tie-break, so no (dist2, cid) struct ordering is needed at
all. The broadcast join, the n*k joined-row materialization, and the
window exchange+sort all leave the plan.

Verifies collect-equality vs the incumbent at sf0.001/sf0.01, then
interleaved A/B (min-of-N, both orders) at sf0.1 on:
  * the one-shot corpus assignment (kmeans_clusters shape),
  * the full 4-iteration kmeans_fixedpoint fit (kmeans_fit shape).

Usage: python3 tools/fp_assign_inline_bench.py [reps]
Writes .benchmarks/fp_assign_inline_ab.json.
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
    _fp_assign,
    _fp_assign_reference,
    _fp_quantize,
    kmeans_fixedpoint,
)

# NOTE: after this experiment shipped, the package's `_fp_assign`
# BECAME the inline form (and kmeans_fixedpoint composes it); the
# incumbents below call the preserved window-form reference so the A/B
# stays reproducible on the shipped tree, and `fp_assign_inline` /
# `kmeans_fixedpoint_inline` below are the prototypes the shipped code
# mirrors.


def _int_arr(vals) -> str:
    return (
        "CAST(array(" + ",".join(str(int(v)) for v in vals) + ") AS ARRAY<BIGINT>)"
    )


def fp_assign_inline(qv, cent, id_col):
    """Prototype: same contract as _fp_assign (keeps q, adds cid +
    dist2), centroids collected to literals."""
    rows = sorted(cent.select("cid", "c").collect(), key=lambda r: r.cid)
    if not rows:
        return qv.sparkSession.createDataFrame(
            [], qv.schema.simpleString()[7:-1] + ", cid int, dist2 bigint"
        )
    cids = "CAST(array(" + ",".join(str(int(r.cid)) for r in rows) + ") AS ARRAY<INT>)"
    d2 = ",".join(
        f"aggregate(zip_with(q, {_int_arr(r.c)}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        for r in rows
    )
    win = (
        f"aggregate(array(array({d2})), "
        f"named_struct('cid', CAST(-1 AS INT), 'dist2', CAST(-1 AS BIGINT)), "
        f"(z, ds) -> named_struct("
        f"'cid', element_at({cids}, CAST(array_position(ds, array_min(ds)) AS INT)), "
        f"'dist2', array_min(ds)))"
    )
    return qv.select("*", F.expr(f"inline(array({win}))"))


def kmeans_fixedpoint_reference(emb, *, k=10, iters=4, id_col="vec_id",
                              vec_col="embedding", seed=11):
    """kmeans_fixedpoint with the pre-r13 window-form assign."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    qv = _fp_quantize(emb, id_col, vec_col)
    init = (
        qv.withColumn("__h", h)
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(k)
    )
    w0 = Window.orderBy(F.col("__h").asc(), F.col(id_col).asc())
    cent = init.select(
        (F.row_number().over(w0) - 1).cast("int").alias("cid"),
        F.col("q").alias("c"),
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = _fp_assign_reference(qv, cent, id_col)
        upd = (
            assigned.select("cid", F.posexplode("q").alias("d", "v"))
            .groupBy("cid", "d")
            .agg(F.sum("v").alias("S"), F.count(F.lit(1)).alias("n"))
            .withColumn("nv", F.expr("(2 * S + n) div (2 * n)"))
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(d, nv))), "
                    "s -> s.nv)"
                ).alias("c_new")
            )
        )
        cent = (
            cent.join(upd, "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("c_new"), F.col("c")).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    return cent


def kmeans_fixedpoint_inline(emb, *, k=10, iters=4, id_col="vec_id",
                             vec_col="embedding", seed=11):
    """kmeans_fixedpoint with the inline assign in the loop."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    qv = _fp_quantize(emb, id_col, vec_col)
    init = (
        qv.withColumn("__h", h)
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(k)
    )
    w0 = Window.orderBy(F.col("__h").asc(), F.col(id_col).asc())
    cent = init.select(
        (F.row_number().over(w0) - 1).cast("int").alias("cid"),
        F.col("q").alias("c"),
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = fp_assign_inline(qv, cent, id_col)
        upd = (
            assigned.select("cid", F.posexplode("q").alias("d", "v"))
            .groupBy("cid", "d")
            .agg(F.sum("v").alias("S"), F.count(F.lit(1)).alias("n"))
            .withColumn("nv", F.expr("(2 * S + n) div (2 * n)"))
            .groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(d, nv))), "
                    "s -> s.nv)"
                ).alias("c_new")
            )
        )
        cent = (
            cent.join(upd, "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("c_new"), F.col("c")).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    return cent


def _cent_for(spark, emb, k=10, seed=11):
    """A standing centroid relation (one fit) shared by the assign A/B."""
    return kmeans_fixedpoint(emb, k=k, iters=2, seed=seed)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_session(
        app_name="fp-assign-inline-ab",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bench import materialize

    out: dict = {"equality": {}, "ab": {}, "load_1m": round(os.getloadavg()[0], 2)}

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = load_table(spark, sf, "embeddings")
        cent = _cent_for(spark, emb)
        qv = _fp_quantize(emb, "vec_id", "embedding")
        a = _rows(_fp_assign_reference(qv, cent, "vec_id").select("vec_id", "cid", "dist2"))
        b = _rows(fp_assign_inline(qv, cent, "vec_id").select("vec_id", "cid", "dist2"))
        assert a == b, f"assign mismatch at {sf}"
        fa = _rows(kmeans_fixedpoint_reference(emb, k=10, iters=4, seed=11))
        fb = _rows(kmeans_fixedpoint_inline(emb, k=10, iters=4, seed=11))
        assert fa == fb, f"fit mismatch at {sf}"
        out["equality"][sf] = {"assign_rows": len(a), "fit_rows": len(fa)}
        print(f"equality OK at {sf}: assign={len(a)} fit={len(fa)}", flush=True)

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    cent = _cent_for(spark, emb).localCheckpoint(eager=True)
    qv = _fp_quantize(emb, "vec_id", "embedding")
    variants = {
        "assign_incumbent": lambda: _fp_assign_reference(qv, cent, "vec_id").drop("q"),
        "assign_inline": lambda: fp_assign_inline(qv, cent, "vec_id").drop("q"),
        "fit_incumbent": lambda: kmeans_fixedpoint_reference(emb, k=10, iters=4, seed=11),
        "fit_inline": lambda: kmeans_fixedpoint_inline(emb, k=10, iters=4, seed=11),
    }
    times: dict[str, list[float]] = {n: [] for n in variants}
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
    with open("/root/repo/.benchmarks/fp_assign_inline_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
