#!/usr/bin/env python3
"""Partition sizing advisor: parquet footer stats -> cluster knobs.

The two knobs that decide whether a 100 TB job runs well are set
BEFORE any query runs:

* ``spark.sql.files.maxPartitionBytes`` -- scan-task granularity.
  Too big: tasks outlive executors' memory (decoded columnar data is
  typically 3-8x its compressed size); too small: task-scheduling
  overhead dominates.
* ``spark.sql.shuffle.partitions`` -- reduce-side granularity. The
  rule of thumb this tool encodes: target ~150 MB of *compressed*
  shuffle input per partition, then let AQE coalesce down when a
  stage turns out smaller.

This tool reads ONLY parquet footers (no data pages): per-table rows,
compressed/uncompressed bytes, per-row-group sizes, and row-group
count. From those it reports, for a user-supplied scale multiplier
(e.g. 1000x the local fixture = the cluster dataset):

* projected table sizes,
* a maxPartitionBytes that yields >= 2 tasks per executor core wave,
* a shuffle.partitions estimate for the largest fact table,
* row-group health: files whose single row group exceeds
  maxPartitionBytes can never split (the exact single-task scan floor
  measured on this repo's fixtures -- COVERAGE.md "Known toy-scale
  bench floor"), flagged so the WRITER gets fixed (parquet.block.size)
  rather than the reader blamed.

Usage: python3 tools/partition_advisor.py [sf_dir] [--scale N]
       [--cores C]. Prints one JSON document.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pyarrow.parquet as pq

TARGET_SHUFFLE_PARTITION_BYTES = 150 * 1024 * 1024
DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def table_stats(path: str) -> dict:
    md = pq.ParquetFile(path).metadata
    rg_uncompressed = [
        md.row_group(i).total_byte_size for i in range(md.num_row_groups)
    ]
    # footer's total_byte_size is the UNCOMPRESSED size (hence the
    # variable name above); on-disk compressed bytes come from
    # column-chunk totals
    rg_disk = [
        sum(
            md.row_group(i).column(c).total_compressed_size
            for c in range(md.num_columns)
        )
        for i in range(md.num_row_groups)
    ]
    return {
        "rows": md.num_rows,
        "row_groups": md.num_row_groups,
        "uncompressed_bytes": sum(rg_uncompressed),
        "compressed_bytes": sum(rg_disk),
        "max_row_group_uncompressed": max(rg_uncompressed, default=0),
        "max_row_group_compressed": max(rg_disk, default=0),
    }


def advise(sf_dir: str, scale: float, cores: int) -> dict:
    tables = {}
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        tables[name] = table_stats(path)

    out = {"sf_dir": sf_dir, "scale": scale, "cores": cores, "tables": {}}
    biggest = None
    for name, s in tables.items():
        proj_comp = int(s["compressed_bytes"] * scale)
        proj_unc = int(s["uncompressed_bytes"] * scale)
        out["tables"][name] = {
            **s,
            "projected_compressed_bytes": proj_comp,
            "projected_uncompressed_bytes": proj_unc,
        }
        if biggest is None or proj_comp > out["tables"][biggest][
            "projected_compressed_bytes"
        ]:
            biggest = name

    # scan knob: >= 2 waves of tasks per core on the biggest table,
    # capped at the 128 MB default (smaller is fine; bigger risks
    # memory amplification on decode)
    big = out["tables"][biggest] if biggest else {"projected_compressed_bytes": 0}
    per_task = min(
        DEFAULT_MAX_PARTITION_BYTES,
        max(4 * 1024 * 1024, big["projected_compressed_bytes"] // (2 * cores) or 1),
    )
    shuffle_parts = max(
        cores,
        -(-big["projected_compressed_bytes"] // TARGET_SHUFFLE_PARTITION_BYTES),
    )
    out["advice"] = {
        "spark.sql.files.maxPartitionBytes": int(per_task),
        "spark.sql.shuffle.partitions": int(shuffle_parts),
        "largest_table": biggest,
        "note": "AQE coalesces small stages down; these bound the big ones",
    }
    out["row_group_warnings"] = [
        {
            "table": name,
            "max_row_group_compressed": s["max_row_group_compressed"],
            "advised_task_bytes": int(per_task),
            "row_groups": s["row_groups"],
            "issue": "a row group larger than one task's target can never "
            "split across tasks (parquet splits at row-group granularity); "
            "fix the writer (parquet.block.size), not the reader",
        }
        for name, s in tables.items()
        if s["max_row_group_compressed"] > per_task
    ]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", type=float, default=1000.0)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    print(json.dumps(advise(args.sf_dir, args.scale, args.cores), indent=1))


if __name__ == "__main__":
    main()
