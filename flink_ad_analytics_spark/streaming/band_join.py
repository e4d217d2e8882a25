"""Streaming keyless band join via bucket replication.

Structured Streaming stream-stream joins REQUIRE an equality clause --
a pure band predicate ("all right events within +-B of each left
event", no shared key) is rejected by the planner outright, so the
burst-detection / co-occurrence shape simply cannot be written as a
raw streaming join. The batch engine's answer
(`operators/range_join.py`) transfers directly: replicate each left
row to every time bucket its band overlaps, bucket the right point,
and the bucket becomes the equi key the streaming join needs. The
residual band condition stays in the join predicate ON EVENT-TIME
COLUMNS, which is exactly what Spark's state-cleanup analysis wants:
together with both sides' watermarks it derives a bounded state TTL
(left rows expire once the watermark passes their band end; right
rows once no live left band can cover them).

Matching the batch operator, each (left, right) pair meets in exactly
one bucket -- the right point's -- so replication introduces no
duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.range_join import (
    _interval_micros,
    check_column_clash,
    floor_bucket,
)


def streaming_band_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_time: str,
    right_time: str,
    band_before: str = "30 seconds",
    band_after: str = "30 seconds",
    bin_width: str = "1 minute",
    extra_on: list[str] | None = None,
) -> DataFrame:
    """INNER stream-stream join of `right` points into the interval
    `[left_time - band_before, left_time + band_after]` (inclusive),
    optionally also equi-matching `extra_on`.

    Both inputs must already carry watermarks on their time columns
    (the caller owns lateness policy). Output: all left columns, then
    right's non-`extra_on` columns. Inner-only: streaming outer joins
    would null-extend once per bucket replica; aggregate-and-join-back
    for left semantics, as in the batch query.
    """
    extra_on = extra_on or []
    check_column_clash(left, right, extra_on, "streaming_band_join")
    width_us = _interval_micros(bin_width)

    lo = F.col(left_time) - F.expr(f"INTERVAL {band_before}")
    hi = F.col(left_time) + F.expr(f"INTERVAL {band_after}")
    l_binned = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(floor_bucket(lo, width_us), floor_bucket(hi, width_us))
        ),
    )
    r_binned = right.withColumn(
        "__bucket", floor_bucket(F.col(right_time), width_us)
    )

    # The band condition references both raw event-time columns, so the
    # streaming planner derives join-state watermarks from it. Reuses
    # the SAME lo/hi expressions that sized the bucket replication --
    # one definition, so an edit to a band bound cannot desynchronize
    # the replication range from the residual predicate.
    band = (F.col(right_time) >= lo) & (F.col(right_time) <= hi)
    cond = F.col("__bucket") == F.col("__rbucket")
    r_binned = r_binned.withColumnRenamed("__bucket", "__rbucket")
    for c in extra_on:
        r_binned = r_binned.withColumnRenamed(c, f"__r_{c}")
        cond = cond & (F.col(c) == F.col(f"__r_{c}"))
    joined = l_binned.join(r_binned, cond & band, "inner")
    out_cols = [*left.columns, *[c for c in right.columns if c not in extra_on]]
    return joined.select(*out_cols)
