#!/usr/bin/env python3
"""Aggregate the committed per-SF bench artifacts into one scaling
curve: for each scale factor with both a Spark run and a DuckDB
baseline (.benchmarks/bench_sf{X}.json + duckdb_sf{X}.json), the
headline-set totals, the Spark/DuckDB ratio, and per-query growth
between consecutive points, restricted to the queries present at
EVERY point (the sf>=1 headline set).

The point of the curve: Spark's ~1-2s/query local scheduling floor
dominates at toy SFs, so the ratio vs an in-process engine should
FALL as data grows -- this artifact is the committed evidence that it
does (and that no per-query growth is superlinear in data size).

Writes .benchmarks/scale_points.json. Rerun after refreshing any
per-SF bench artifact.
"""

from __future__ import annotations

import json
import os
import re

BDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".benchmarks")


def main() -> None:
    points: dict[float, dict] = {}
    for fn in os.listdir(BDIR):
        m = re.fullmatch(r"bench_sf([0-9.]+)\.json", fn)
        if not m:
            continue
        sf = float(m.group(1))
        duck = os.path.join(BDIR, f"duckdb_sf{m.group(1)}.json")
        if not os.path.exists(duck):
            continue
        with open(os.path.join(BDIR, fn)) as f:
            bench = json.load(f)
        with open(duck) as f:
            oracle = json.load(f)
        points[sf] = {"bench": bench, "oracle": oracle}

    if not points:
        raise SystemExit(
            "no bench_sf*.json + duckdb_sf*.json artifact pairs found "
            f"in {BDIR}; run bench.py and bench_duckdb.py first"
        )
    sfs = sorted(points)
    # queries timed at every point (the sf>=1 headline set)
    common = set.intersection(
        *(set(points[sf]["bench"]["queries"]) for sf in sfs)
    )
    # ratio denominators must compare the SAME query set on both
    # engines: restrict to queries with a DuckDB oracle at every point
    # (rows-only entries like table_profile_approx have no oracle SQL)
    shared = common & set.intersection(
        *(set(points[sf]["oracle"]["queries"]) for sf in sfs)
    )
    out = {
        "note": (
            "ratio_vs_duckdb over the shared headline set falls as data "
            "grows because Spark's ~1-2s/query local scheduling floor "
            "amortizes: at sf0.1 DuckDB finishes each relational query "
            "in <0.1s while Spark pays the floor; by sf3 the engines "
            "run comparable plans on real data volumes. The trend, not "
            "the toy-SF level, is the 100TB-relevant number."
        ),
        "sfs": sfs,
        "n_common_queries": len(common),
        "n_ratio_queries": len(shared),
        "points": {},
        "growth": {},
    }
    for sf in sfs:
        q = points[sf]["bench"]["queries"]
        oq = points[sf]["oracle"]["queries"]
        spark_total = round(sum(q[n] for n in shared), 3)
        duck_total = round(sum(oq[n] for n in shared), 3)
        # the pooled ratio can be dominated by one huge oracle
        # denominator (dedup_verify_editdist_topk costs DuckDB 1462s
        # at sf10 vs Spark's 29s), so record the per-query ratio
        # distribution and the largest denominator alongside the sum
        ratios = sorted(q[n] / oq[n] for n in shared if oq[n] > 0)
        mid = len(ratios) // 2
        median = (
            ratios[mid]
            if len(ratios) % 2
            else (ratios[mid - 1] + ratios[mid]) / 2
        )
        top_denom = max(shared, key=lambda n: oq[n])
        out["points"][str(sf)] = {
            "spark_shared_sec": spark_total,
            "duckdb_shared_sec": duck_total,
            "ratio_vs_duckdb": round(spark_total / duck_total, 3),
            "median_query_ratio": round(median, 3),
            "largest_oracle_denominator": {
                "query": top_denom,
                "duckdb_sec": oq[top_denom],
                "spark_sec": q[top_denom],
            },
        }
    for lo, hi in zip(sfs, sfs[1:]):
        ql, qh = points[lo]["bench"]["queries"], points[hi]["bench"]["queries"]
        growth = {
            n: round(qh[n] / ql[n], 2) for n in sorted(common) if ql[n] > 0
        }
        out["growth"][f"sf{lo}->sf{hi}"] = {
            "data_factor": round(hi / lo, 2),
            "total_growth": round(
                sum(qh[n] for n in common) / sum(ql[n] for n in common), 2
            ),
            "max_query_growth": max(growth.values(), default=0.0),
            "queries": growth,
        }
    path = os.path.join(BDIR, "scale_points.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    summary = {
        "written": path,
        "ratios": {
            str(sf): out["points"][str(sf)]["ratio_vs_duckdb"] for sf in sfs
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
