#!/usr/bin/env python3
"""Measure the single-row-group scan floor (claimed in COVERAGE.md).

The driver's fixture parquet ships ONE row group per file, and parquet
splits at row-group granularity -- so every scan stage runs as one
task regardless of `spark.sql.files.maxPartitionBytes`, which puts a
constant floor under every toy-scale bench number. This tool proves
that claim by measurement instead of assertion:

1. run a scan-bound query (pricing_summary's scan->filter->agg shape)
   against the stock sf0.1 lineitem;
2. rewrite the same rows with 20k-row groups into a temp dir
   (exactly what a production writer's `parquet.block.size` does);
3. run the identical query against the rewrite;
4. report both times, the speedup, and the scan-task counts.

Writes .benchmarks/rowgroup_floor.json. The engine and the plan are
IDENTICAL in both runs -- only the file layout changes, isolating the
floor to the writer side.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from flink_ad_analytics_spark.session import build_session  # noqa: E402


def measure(spark, lineitem_path: str) -> dict:
    """Scan-shape probe: per-task row distribution (the structural
    fact -- parquet assigns a whole row group to the one split
    containing its midpoint, so split COUNT overstates parallelism;
    what matters is the largest task's share of rows) plus the timed
    scan-bound aggregate."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(lineitem_path)
    dist = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    rows = sum(r["count"] for r in dist)
    busiest = max(r["count"] for r in dist)
    q = (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    q.collect()  # warm (codegen + footer cache)
    t0 = time.perf_counter()
    q.collect()
    elapsed = time.perf_counter() - t0
    return {
        "sec": round(elapsed, 3),
        "splits": df.rdd.getNumPartitions(),
        "nonempty_tasks": sum(1 for r in dist if r["count"] > 0),
        "max_task_row_share": round(busiest / rows, 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="rowgroup-floor", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "false",
            # make splitting possible down to small granules so the
            # rewrite's 20k-row groups actually fan out
            "spark.sql.files.maxPartitionBytes": str(1 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    stock = os.path.join(sf_dir, "lineitem.parquet")
    stock_stats = measure(spark, stock)

    tmp = tempfile.mkdtemp(prefix="fas_rg_")
    try:
        tbl = pq.read_table(stock)
        rewrite = os.path.join(tmp, "lineitem_rg.parquet")
        pq.write_table(tbl, rewrite, row_group_size=20_000)
        multi_stats = measure(spark, rewrite)

        out = {
            "metric": "single_rowgroup_scan_floor",
            "sf_dir": sf_dir,
            "rows": tbl.num_rows,
            "stock": stock_stats,
            "rewritten_20k_row_groups": multi_stats,
            "finding": (
                "stock fixture: every row lands in ONE task "
                f"(max share {stock_stats['max_task_row_share']}) however "
                "many splits exist; multi-row-group rewrite spreads the "
                f"same rows over {multi_stats['nonempty_tasks']} tasks "
                f"(max share {multi_stats['max_task_row_share']}). At sf0.1 "
                "the timed agg is overhead-dominated so wall-clock barely "
                "moves; the task-share numbers are the floor that scales."
            ),
        }
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".benchmarks",
            "rowgroup_floor.json",
        )
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
