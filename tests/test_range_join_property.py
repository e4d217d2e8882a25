"""Property tests for the band-join bucket arithmetic plus a pinned
pre-1970 (negative epoch) engine example.

The bucket expression `(x - pmod(x, w)) / w` must be exact FLOOR
division for any sign -- the completeness of the bucket replication
scheme reduces to that arithmetic plus monotonicity, so hypothesis
explores it as pure math (microseconds per example) and one Spark
query pins the engine's evaluation on negative epochs."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from flink_ad_analytics_spark.operators.range_join import (
    _interval_micros,
    binned_range_join,
)

WIDTHS = [1, 7, 1_000_000, 60_000_000, 3_600_000_000]

#: mirror of the engine expression: pmod is the positive modulus
def _bucket(x: int, w: int) -> int:
    return (x - (x % w if x % w >= 0 else x % w + w)) // w


@given(
    x=st.integers(min_value=-(2**54), max_value=2**54),
    w=st.sampled_from(WIDTHS),
)
@settings(max_examples=300, deadline=None)
def test_bucket_is_floor_division(x, w):
    assert _bucket(x, w) == x // w  # Python // IS floor division


@given(
    lo=st.integers(min_value=-(2**53), max_value=2**53),
    span=st.integers(min_value=0, max_value=10**9),
    frac=st.floats(min_value=0.0, max_value=1.0),
    w=st.sampled_from(WIDTHS),
)
@settings(max_examples=300, deadline=None)
def test_in_band_point_always_meets_a_left_replica(lo, span, frac, w):
    """Completeness: pt in [lo, hi] implies bucket(pt) lies within
    [bucket(lo), bucket(hi)] -- the left row is replicated to every
    bucket in that range, so the pair can never be missed; and the
    meeting bucket (the point's own) is unique by construction."""
    hi = lo + span
    pt = lo + int(frac * span)
    assert lo <= pt <= hi
    assert _bucket(lo, w) <= _bucket(pt, w) <= _bucket(hi, w)


def test_engine_handles_pre_1970_timestamps(spark):
    """Negative epoch micros: the pmod form floors correctly (plain %
    would truncate toward zero and shift 1969 points one bucket up)."""
    base = dt.datetime(1969, 12, 31, 23, 0, 0)  # pre-epoch
    left = spark.createDataFrame(
        [(0, base, base + dt.timedelta(minutes=90))], ["lid", "lo", "hi"]
    )
    right = spark.createDataFrame(
        [
            (0, base + dt.timedelta(minutes=30)),   # pre-epoch point
            (1, base + dt.timedelta(minutes=70)),   # post-epoch point
            (2, base - dt.timedelta(minutes=1)),    # outside band
        ],
        ["rid", "pt"],
    )
    got = {
        r.rid
        for r in binned_range_join(
            left, right, left_lo="lo", left_hi="hi", right_point="pt",
            bin_width="1 hour",
        ).collect()
    }
    assert got == {0, 1}


def test_interval_micros_widths_match_test_mirror():
    assert _interval_micros("1 minute") == 60_000_000
    assert set(WIDTHS) >= {1_000_000, 60_000_000, 3_600_000_000}
