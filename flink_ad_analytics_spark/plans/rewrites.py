"""Streaming-mode plan rewrites.

Structured Streaming does not support COUNT(DISTINCT) (the reference
uses it at flink_job.sql:83,85 to defuse left-join fan-out). The
engine-level rewrite is: deduplicate rows by id *within the watermark*
before aggregating, then use plain count() -- count(col) still skips
NULLs, preserving the left-join "unmatched adds 0" semantics.

This is a query-construction-layer rewrite, not a Catalyst rule: the
batch plan (countDistinct) remains the semantic spec, and
tests/test_streaming.py asserts streaming == batch on the parity
fixtures.

Scale: dropDuplicatesWithinWatermark keeps one state entry per id only
until the watermark passes -- bounded state, unlike an unbounded
dropDuplicates. State goes to the configured state store (RocksDB for
large keyspaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    df: DataFrame, keys: list[str], time_col: str, delay: str
) -> DataFrame:
    """Attach a watermark and deduplicate by ``keys`` with bounded state.

    Falls back to plain dropDuplicates for batch DataFrames (where the
    watermark is a no-op and exact dedup is cheap).
    """
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    wm = df.withWatermark(time_col, delay)
    # dropDuplicatesWithinWatermark (Spark 3.5+) expires dedup state;
    # plain dropDuplicates on a stream would grow state forever.
    return wm.dropDuplicatesWithinWatermark(keys)
