"""Binned range join: band-predicate joins without an equi key.

The reference's interval join carries an equi key
(`/root/reference/flink/flink_job.sql:94`: `i.impression_id =
c.impression_id` plus the BETWEEN band), so Catalyst plans a hash or
sort-merge join keyed on the id and evaluates the band as a residual.
Drop the equi key -- "all right events inside each left row's time
interval", the shape of burst detection, sessionless co-occurrence, or
feature windows around anomalies -- and Spark has nothing to hash on:
the optimized plan degenerates to BroadcastNestedLoopJoin (or a raw
CartesianProduct), which is O(|L| x |R|) comparisons. At 100 TB that
plan never finishes; it is the canonical missing-operator of open-source
Spark (Databricks ships a closed-source range-join optimization for
exactly this gap).

This module restores a shuffle-linear plan with pure built-ins:

1. pick a bin width W (ideally ~ the interval length);
2. replicate each LEFT row to every W-bucket its [lo, hi] interval
   overlaps (`explode(sequence(lo div W, hi div W))` -- for an interval
   of length B that is ceil(B/W)+1 <= 3 replicas when W >= B);
3. map each RIGHT row to the single bucket containing its point;
4. equi-join on the bucket (plus any extra keys), then re-check the
   exact band as a residual filter.

Each matching (left, right) pair meets in EXACTLY one bucket -- the
bucket of the right point, which lies in exactly one of the left row's
replicated buckets -- so no dedup is needed. Cost: one shuffle of
~2-3|L| + |R| rows on a high-cardinality bucket key, per-bucket work
bounded by local density (skew from a hot minute is AQE-splittable
because the residual filter runs after the join, per partition).

Bucket arithmetic is integer end-to-end (`div` on epoch micros), so
band edges land in exact buckets -- no float rounding can leak or
duplicate an edge match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_point: str,
    bin_width: str = "1 minute",
    extra_on: list[str] | None = None,
) -> DataFrame:
    """INNER join of `right` points into `left` intervals.

    Emits one row per (left row, right row) pair with
    `left[left_lo] <= right[right_point] <= left[left_hi]` (inclusive
    both ends, matching SQL BETWEEN), optionally also equi-matching
    `extra_on` columns. Output columns: all of `left`'s, then `right`'s
    non-`extra_on` columns (names must not clash -- rename first).

    `bin_width` is a calendar-free duration string ("30 seconds",
    "1 minute", ...). Choose it close to the typical interval length:
    the left side is replicated ceil(span/W)+1 times, while a too-wide
    W packs unrelated rows into each bucket. Correctness never depends
    on the choice.

    LEFT-outer semantics: aggregate this result and join it back to
    `left` (see `queries_pipeline.q_event_bursts`) -- replicating the
    null-extension through bucket replicas would emit one null row per
    replica, so the operator stays inner and unambiguous.
    """
    width_us = _interval_micros(bin_width)
    return _binned_join(
        left, right, left_lo, left_hi, right_point,
        lambda c: floor_bucket(c, width_us),
        extra_on, "binned_range_join",
    )


def numeric_binned_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_point: str,
    bin_width: int,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """`binned_range_join` over INTEGER domains instead of time: price
    bands (cents), length bands (tokens), size bands (bytes) -- any
    "right value inside each left row's numeric interval" join with no
    equi key, which Spark otherwise plans as a nested loop.

    Columns must be integral (cast floats to a fixed-point long with
    an explicit floor FIRST: double->long casts truncate in Spark but
    round in DuckDB, the classic cross-engine trap). `bin_width` is a
    positive integer; bucket arithmetic shares the time form's
    `_floor_div` (exact within its documented |x| < 2^53 domain --
    epoch NANOS and values adjacent to Long.MIN_VALUE are outside it).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")

    def bucket(c: Column) -> Column:
        return _floor_div(c.cast("long"), bin_width)

    return _binned_join(
        left, right, left_lo, left_hi, right_point, bucket,
        extra_on, "numeric_binned_range_join",
    )


def _binned_join(
    left, right, left_lo, left_hi, right_point, bucket, extra_on, opname
) -> DataFrame:
    """Shared core: replicate left intervals to their buckets, bucket
    the right point, equi-join, residual BETWEEN. Each pair meets in
    exactly one bucket (the right point's)."""
    extra_on = extra_on or []
    check_column_clash(left, right, extra_on, opname)
    l_binned = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(bucket(F.col(left_lo)), bucket(F.col(left_hi)))
        ),
    )
    r_binned = right.withColumn("__bucket", bucket(F.col(right_point)))
    joined = l_binned.join(r_binned, ["__bucket", *extra_on]).filter(
        F.col(right_point).between(F.col(left_lo), F.col(left_hi))
    )
    out_cols = [*left.columns, *[c for c in right.columns if c not in extra_on]]
    return joined.select(*out_cols)


def _floor_div(x: Column, w: int) -> Column:
    """Floor division on long columns: subtract the positive modulus,
    divide the exact multiple. THE one bucket-arithmetic definition --
    time and numeric band joins (batch and streaming) all route here,
    so the modes cannot drift.

    Exactness domain: |x| < 2^53 (the quotient's double round-trip is
    exact there -- epoch micros reach ~1.7e15, centuries of headroom;
    epoch NANOS at ~1.8e18 do NOT fit, convert to micros first) and x
    at least `w` above Long.MIN_VALUE (x - pmod would wrap below it).
    Outside that domain bucket indices can misround; practical id/
    price/time domains sit far inside it.
    """
    return ((x - F.pmod(x, F.lit(w))) / F.lit(w)).cast("long")


def floor_bucket(col: Column, width_us: int) -> Column:
    """Time bucket index of `col` for a `width_us`-microsecond grid.

    NTZ columns cast through the session zone first; the cast is
    monotone and applied identically to both sides, so bucket
    alignment (the only thing micros are used for) is preserved.
    """
    return _floor_div(F.unix_micros(col.cast("timestamp")), width_us)


def check_column_clash(
    left: DataFrame, right: DataFrame, extra_on: list[str], opname: str
) -> None:
    """Reject non-key output column collisions up front (two
    identically-named columns are unusable downstream)."""
    clash = (set(right.columns) - set(extra_on)) & set(left.columns)
    if clash:
        raise ValueError(
            f"{opname}: column name(s) {sorted(clash)} exist on "
            "both sides; rename one side first"
        )


def _interval_micros(duration: str) -> int:
    """Duration string -> microseconds, supporting the day-time units
    Spark's window() accepts. Calendar units (month/year) are rejected:
    a bin width must be a fixed physical duration."""
    parts = duration.strip().lower().split()
    if len(parts) != 2:
        raise ValueError(f"bin_width must look like '30 seconds', got {duration!r}")
    n = float(parts[0])
    unit = parts[1].rstrip("s")
    scale = {
        "microsecond": 1,
        "millisecond": 1_000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }.get(unit)
    if scale is None:
        raise ValueError(f"unsupported bin_width unit {unit!r} (fixed units only)")
    us = int(n * scale)
    if us <= 0:
        raise ValueError("bin_width must be positive")
    return us
