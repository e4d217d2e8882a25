"""Z-order (Morton) clustering keys: multi-dimensional data skipping.

A table sorted on ONE column gets tight parquet row-group min/max
stats on that column only -- point queries on any other column prune
nothing. Interleaving the bits of two columns into a Morton key and
sorting on THAT gives every file a bounded range in BOTH dimensions,
so either predicate skips most files (the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER; at 100 TB it is the difference between
scanning a full day of files and the handful covering one user).

The key is pure integer bit arithmetic -- the same expression runs in
Spark and DuckDB (shifts/AND/OR on BIGINT), so z-keyed queries stay
oracle-checkable. Inputs must already be scaled to [0, 2^bits).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEFAULT_BITS = 16


def zorder_key_sql(a: str, b: str, *, bits: int = DEFAULT_BITS) -> str:
    """SQL expression (Spark AND DuckDB dialect-common) interleaving
    `a`'s bits into odd positions and `b`'s into even ones."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def zorder_key(a: str, b: str, *, bits: int = DEFAULT_BITS) -> Column:
    return F.expr(zorder_key_sql(a, b, bits=bits))
