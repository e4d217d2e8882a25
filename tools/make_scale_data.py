#!/usr/bin/env python3
"""Materialize an sf1-equivalent dataset by key-offset replication of
the driver's sf0.1 parquet (10 replicas, disjoint key ranges), for the
sf1 bench point -- correctness stays gated on the driver-generated SFs;
this data exists ONLY to measure how the headline plans scale 10x.

Replication preserves what a runtime bench needs:

* per-replica referential integrity -- every foreign key is offset by
  the SAME replica stride as its target's primary key, so replica r of
  lineitem joins replica r of orders/part/supplier. Join fan-outs and
  per-key group sizes therefore match the base data; only cardinality
  grows 10x (TPC-H sf1 scale: 6M lineitem, 1.5M orders, 1M events).
* events keep their timestamps (10x the event rate over the same
  window -- how real traffic scales), with event/user ids offset so
  sessionization and per-user windows grow in users, not in rows per
  user.
* nation/region are fixed-size dimensions in TPC-H and are copied
  unchanged.
* documents/embeddings replicate with offset ids and UNCHANGED
  payloads. That makes text/vector content 10x redundant, which is
  why pair-generating dedup queries are NOT in the sf1 headline set
  (each doc would near-dup its 9 clones -- a degenerate graph no real
  corpus exhibits; the dedup family's scale evidence is
  bench_scale.py's planted-dup sweep instead). Per-row text/vector
  queries (quality scoring, lang-id, ANN top-k) scale honestly.

Output: $OUT_DIR (default /root/repo/.scale_data/sf1), one
{table}.parquet per driver table, written by DuckDB. ~170 MB; the
directory is gitignored -- the committed artifacts are the bench
results, not the data.

Usage: python3 tools/make_scale_data.py [replicas] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: table -> columns offset by (stride of the named key domain).
#: stride = 1 + max(key) over the source table that OWNS the domain.
OFFSETS = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}

COPY_UNCHANGED = ("region", "nation")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/.scale_data/sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for table, cols in OFFSETS.items():
        for domain in cols.values():
            src_table, key = domain.split(".")
            if domain not in strides:
                strides[domain] = (
                    con.execute(
                        f"SELECT 1 + MAX({key}) FROM '{SRC}/{src_table}.parquet'"
                    ).fetchone()[0]
                )

    for table in COPY_UNCHANGED:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
            f"'{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied unchanged")

    for table, cols in OFFSETS.items():
        src = f"'{SRC}/{table}.parquet'"
        names = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        select = ", ".join(
            f"{c} + r.r * {strides[cols[c]]} AS {c}" if c in cols else c
            for c in names
        )
        con.execute(
            f"COPY (SELECT {select} FROM {src} CROSS JOIN "
            f"(SELECT unnest(range({replicas})) AS r) r) TO "
            f"'{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out_dir}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({replicas}x)")


if __name__ == "__main__":
    main()
