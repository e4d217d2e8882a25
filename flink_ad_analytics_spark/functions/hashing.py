"""Portable deterministic hashing primitives.

Everything here is chosen to produce IDENTICAL results in Spark SQL
and DuckDB (and any engine with standard md5), which is what lets the
dedup/similarity operators be verified value-exactly by an independent
oracle:

* md5 of a UTF-8 string -> same lowercase hex everywhere;
* a fixed-width lowercase-hex prefix compares lexicographically like
  the underlying unsigned integer, so MIN/MAX/ORDER BY over hex
  strings equal integer semantics without hex->int conversion (which
  engines disagree on);
* salting with a ``j:`` prefix yields independent members of a hash
  family for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_fingerprint(col: Column) -> Column:
    """128-bit content fingerprint as 32 lowercase hex chars."""
    return F.md5(col)


def hex_minhash_term(col: Column, salt: int, width: int = 16) -> Column:
    """The j-th MinHash family member of a value: a fixed-width hex
    prefix of md5(salt || ':' || value). MIN over these strings is a
    valid minhash (hex order == integer order at fixed width)."""
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, width)
