"""As-of join: randomized brute-force parity + edge cases.

The operator (operators/asof.py) composes union + ordered
carry-forward; these tests pin its semantics against an O(n*m)
per-row brute force: inclusive at-or-before match, deterministic
under unique (key, time), LEFT retention of unmatched rows, and
tolerance nulling.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.asof import asof_join


def brute_force(left_rows, right_rows, tolerance=None):
    """Expected output: per left row, the right row with max time <=
    left time on the same key (unique per (key, time) by
    construction), nulled if older than tolerance."""
    out = []
    for lid, key, lt in left_rows:
        cands = [(rt, rv) for rkey, rt, rv in right_rows
                 if rkey == key and rt <= lt]
        if cands:
            rt, rv = max(cands)
            if tolerance is not None and rt < lt - tolerance:
                rt, rv = None, None
        else:
            rt, rv = None, None
        out.append((lid, key, lt, rt, rv))
    return sorted(out)


@pytest.fixture(scope="module")
def frames(spark):
    rng = random.Random(7)
    # times on a small integer grid to force ties and collisions;
    # right side unique per (key, time) per the operator's contract
    right = {}
    for i in range(400):
        right[(rng.randrange(25), rng.randrange(120))] = i
    right_rows = [(k, t, v) for (k, t), v in right.items()]
    left_rows = [(i, rng.randrange(30), rng.randrange(140))
                 for i in range(500)]  # keys 25-29 never match
    ldf = spark.createDataFrame(left_rows, "lid INT, key INT, lt INT")
    rdf = spark.createDataFrame(right_rows, "key INT, rt INT, rv INT")
    return left_rows, right_rows, ldf, rdf


def run(ldf, rdf, tolerance=None):
    tol = f"{tolerance} seconds" if tolerance is not None else None
    # integer grid times -> timestamps so INTERVAL tolerance applies
    l2 = ldf.withColumn("lt_ts", F.timestamp_seconds("lt"))
    r2 = rdf.withColumn("rt_ts", F.timestamp_seconds("rt"))
    out = asof_join(
        l2, r2, on=["key"], left_time="lt_ts", right_time="rt_ts",
        tolerance=tol,
    )
    return sorted(
        (r.lid, r.key, r.lt,
         None if r.rt is None else r.rt,
         None if r.rv is None else r.rv)
        for r in out.select("lid", "key", "lt", "rt", "rv").collect()
    )


def test_asof_matches_brute_force(frames):
    left_rows, right_rows, ldf, rdf = frames
    assert run(ldf, rdf) == brute_force(left_rows, right_rows)


def test_asof_tolerance(frames):
    left_rows, right_rows, ldf, rdf = frames
    got = run(ldf, rdf, tolerance=10)
    want = brute_force(left_rows, right_rows, tolerance=10)
    assert got == want
    # tolerance must differ from the unbounded run somewhere
    assert got != brute_force(left_rows, right_rows)


def test_asof_tie_is_inclusive(spark):
    ldf = spark.createDataFrame([(1, 5, 100)], "lid INT, key INT, lt INT")
    rdf = spark.createDataFrame([(5, 100, 77)], "key INT, rt INT, rv INT")
    [row] = run(ldf, rdf)
    assert row == (1, 5, 100, 100, 77)


def test_asof_left_rows_all_survive(frames):
    left_rows, _, ldf, rdf = frames
    out = run(ldf, rdf)
    assert len(out) == len(left_rows)
    assert any(rt is None for (_, _, _, rt, _) in out)  # unmatched kept
