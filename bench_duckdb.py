#!/usr/bin/env python3
"""Record the DuckDB oracle baseline for bench.py's ratio report.

Runs each bench query's oracle SQL in DuckDB against the same parquet
tables (default /root/testdata/sf0.1) and writes per-query wall times
to .benchmarks/duckdb_sf{sf}.json. bench.py picks that file up and
prints spark/duckdb ratios, making the "within 2x of baseline"
criterion checkable from committed artifacts alone.

Run standalone (not concurrently with pytest/bench) so timings are
clean. DuckDB uses all cores by default, mirroring local[32].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from bench import bench_queries  # noqa: E402
from flink_ad_analytics_spark.schemas import DRIVER_TABLES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    # $SPARK_GRAFT_QUERIES="a,b,c" re-times only those queries and
    # merges into the existing baseline file -- the two deliberately
    # naive all-pairs oracles run ~400s each at sf0.1, so incremental
    # refresh is how new queries get baselined without an ~15 min
    # full pass.
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    names = subset.split(",") if subset else list(bench_queries())

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchmarks")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"duckdb_sf{sf}.json")

    timings: dict[str, float] = {}
    if subset and os.path.exists(out_path):
        with open(out_path) as f:
            timings = json.load(f)["queries"]

    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
    timings = {n: timings[n] for n in bench_queries() if n in timings}
    payload = {
        "engine": "duckdb",
        "duckdb_version": duckdb.__version__,
        "sf_dir": sf_dir,
        "total_sec": round(sum(timings.values()), 3),
        "queries": timings,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"written": out_path, "total_sec": payload["total_sec"]}))


if __name__ == "__main__":
    main()
