"""Binned range join (operators/range_join.py): equivalence to the
naive band join, edge inclusivity, bin-width invariance, and the plan
property that motivates it (no nested-loop join)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.range_join import (
    _interval_micros,
    binned_range_join,
)

BASE = dt.datetime(2024, 1, 1)


def _frames(spark, seed=7, n_left=60, n_right=200, span_s=3600):
    rng = random.Random(seed)
    lrows = []
    for i in range(n_left):
        t = BASE + dt.timedelta(seconds=rng.uniform(0, span_s))
        lrows.append((i, t - dt.timedelta(seconds=45), t + dt.timedelta(seconds=45)))
    rrows = [
        (j, BASE + dt.timedelta(seconds=rng.uniform(0, span_s)))
        for j in range(n_right)
    ]
    left = spark.createDataFrame(lrows, ["lid", "lo", "hi"])
    right = spark.createDataFrame(rrows, ["rid", "pt"])
    return left, right


def _naive(left, right):
    return left.join(right, F.col("pt").between(F.col("lo"), F.col("hi")))


def _pairs(df):
    return {(r.lid, r.rid) for r in df.select("lid", "rid").collect()}


def test_matches_naive_join(spark):
    left, right = _frames(spark)
    expected = _pairs(_naive(left, right))
    got = _pairs(
        binned_range_join(
            left, right, left_lo="lo", left_hi="hi", right_point="pt",
            bin_width="90 seconds",
        )
    )
    assert got == expected
    assert expected, "fixture must generate at least one in-band pair"


@pytest.mark.parametrize("width", ["7 seconds", "90 seconds", "1 hour"])
def test_bin_width_never_changes_the_answer(spark, width):
    """Correctness is bin-width independent (only cost varies): widths
    far below the interval span (many replicas), comparable, and far
    above (everything in few buckets) all reproduce the naive join."""
    left, right = _frames(spark, seed=11, n_left=30, n_right=80)
    expected = _pairs(_naive(left, right))
    got = _pairs(
        binned_range_join(
            left, right, left_lo="lo", left_hi="hi", right_point="pt",
            bin_width=width,
        )
    )
    assert got == expected


def test_band_edges_inclusive_both_ends(spark):
    """BETWEEN keeps both endpoints; a point one microsecond outside
    either edge is dropped -- and edges are exercised exactly on a
    bucket boundary (lo a multiple of the bin width) so an off-by-one
    in the integer bucket floor would show here."""
    lo = BASE  # epoch-micros multiple of any whole-second bin width
    hi = BASE + dt.timedelta(seconds=60)
    left = spark.createDataFrame([(0, lo, hi)], ["lid", "lo", "hi"])
    us = dt.timedelta(microseconds=1)
    right = spark.createDataFrame(
        [
            (0, lo - us),
            (1, lo),
            (2, lo + us),
            (3, hi - us),
            (4, hi),
            (5, hi + us),
        ],
        ["rid", "pt"],
    )
    got = _pairs(
        binned_range_join(
            left, right, left_lo="lo", left_hi="hi", right_point="pt",
            bin_width="30 seconds",
        )
    )
    assert got == {(0, 1), (0, 2), (0, 3), (0, 4)}


def test_extra_on_keys_partition_the_match_space(spark):
    left = spark.createDataFrame(
        [("a", 0, BASE, BASE + dt.timedelta(60)),
         ("b", 1, BASE, BASE + dt.timedelta(60))],
        ["k", "lid", "lo", "hi"],
    )
    right = spark.createDataFrame(
        [("a", 0, BASE + dt.timedelta(seconds=5)),
         ("b", 1, BASE + dt.timedelta(seconds=5))],
        ["k", "rid", "pt"],
    )
    got = _pairs(
        binned_range_join(
            left, right, left_lo="lo", left_hi="hi", right_point="pt",
            bin_width="1 minute", extra_on=["k"],
        )
    )
    assert got == {(0, 0), (1, 1)}


def test_column_clash_raises(spark):
    left, right = _frames(spark, n_left=2, n_right=2)
    with pytest.raises(ValueError, match="clash|both sides|exist on"):
        binned_range_join(
            left.withColumnRenamed("lid", "rid"), right,
            left_lo="lo", left_hi="hi", right_point="pt",
        )


def test_no_nested_loop_where_naive_degenerates(spark):
    """The reason this operator exists: the naive keyless band join
    plans as BroadcastNestedLoopJoin; the binned form is an equi
    (hash/sort-merge) join."""
    left, right = _frames(spark, n_left=5, n_right=5)
    naive_plan = _naive(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan
    binned = binned_range_join(
        left, right, left_lo="lo", left_hi="hi", right_point="pt",
        bin_width="90 seconds",
    )
    bplan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in bplan
    assert "CartesianProduct" not in bplan


def test_interval_micros_parsing():
    assert _interval_micros("30 seconds") == 30_000_000
    assert _interval_micros("1 minute") == 60_000_000
    assert _interval_micros("2 hours") == 7_200_000_000
    for bad in ("1 month", "0 seconds", "-5 seconds", "fast"):
        with pytest.raises(ValueError):
            _interval_micros(bad)


def test_numeric_matches_naive_and_rejects_bad_width(spark):
    from flink_ad_analytics_spark.operators.range_join import (
        numeric_binned_range_join,
    )

    import random

    rng = random.Random(5)
    left = spark.createDataFrame(
        [(i, v - 7, v + 7) for i, v in
         ((i, rng.randint(-100, 100)) for i in range(40))],
        ["lid", "lo", "hi"],
    )
    right = spark.createDataFrame(
        [(j, rng.randint(-100, 100)) for j in range(120)], ["rid", "pt"]
    )
    expected = _pairs(left.join(right, F.col("pt").between(F.col("lo"), F.col("hi"))))
    for width in (3, 14, 1000):
        got = _pairs(
            numeric_binned_range_join(
                left, right, left_lo="lo", left_hi="hi", right_point="pt",
                bin_width=width,
            )
        )
        assert got == expected, width
    assert expected, "fixture must produce matches"
    with pytest.raises(ValueError, match="positive"):
        numeric_binned_range_join(
            left, right, left_lo="lo", left_hi="hi", right_point="pt",
            bin_width=0,
        )
