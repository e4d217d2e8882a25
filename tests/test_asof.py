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


def test_position_attribution_exact_splits(spark):
    """Hand-computed U-shaped credits: 1-touch 10000; 2-touch
    5000/5000; 5-touch 4000 | 666+1,666+1,666 | 4000 (remainder
    2000%3=2 goes to the earliest middles); every click sums to
    exactly 10000."""
    from flink_ad_analytics_spark.operators.ctr import position_attribution

    t0 = 1_700_000_000_000

    def imp(i, user, camp, ms):
        return (f"imp-{i}", user, camp, ms)

    imps_rows = (
        [imp(0, "u1", "A", t0)]                                  # 1-touch
        + [imp(i, "u2", c, t0 + i * 1000)                        # 2-touch
           for i, c in [(10, "A"), (11, "B")]]
        + [imp(i, "u3", c, t0 + i * 1000)                        # 5-touch
           for i, c in [(20, "A"), (21, "B"), (22, "C"), (23, "D"), (24, "E")]]
    )
    imps = spark.createDataFrame(
        imps_rows, "impression_id string, user_id string, campaign_id string, ts long"
    ).select("impression_id", "user_id", "campaign_id",
             F.timestamp_millis(F.col("ts")).alias("event_time"))
    clicks = spark.createDataFrame(
        [("c1", "u1", t0 + 60_000), ("c2", "u2", t0 + 60_000),
         ("c3", "u3", t0 + 60_000)],
        "click_id string, user_id string, ts long",
    ).select("click_id", "user_id",
             F.timestamp_millis(F.col("ts")).alias("click_time"))
    got = {r.campaign_id: (r.credit_bp, r.n_click_touches)
           for r in position_attribution(imps, clicks).collect()}
    # u1: A=10000. u2: A=5000 (first), B=5000 (last).
    # u3 middles (pos 2,3,4 -> B,C,D): base 666, remainder 2 -> B,C +1
    assert got == {
        "A": (10000 + 5000 + 4000, 3),
        "B": (5000 + 667, 2),
        "C": (667, 1),
        "D": (666, 1),
        "E": (4000, 1),
    }
    assert sum(bp for bp, _ in got.values()) == 30000


def test_position_attribution_conserves_credit_and_is_order_stable(spark):
    """Property over randomized touch chains: total credit == 10000 *
    n_clicks regardless of chain lengths, and the result is identical
    when the input rows arrive in a different order/partitioning
    (the (time, impression_id) tie rule at work)."""
    import random

    from flink_ad_analytics_spark.operators.ctr import position_attribution

    rng = random.Random(4242)
    t0 = 1_700_000_000_000
    imps, clicks = [], []
    iid = 0
    for u in range(30):
        n = rng.randint(1, 9)
        for j in range(n):
            # duplicate timestamps on purpose: exercise the id tie-break
            ts = t0 + rng.choice([0, 1000, 1000, 2000, 5000])
            imps.append((f"i{iid}", f"u{u}", f"camp-{rng.randint(0, 4)}", ts))
            iid += 1
        clicks.append((f"c{u}", f"u{u}", t0 + 60_000))
    imp_df = spark.createDataFrame(
        imps, "impression_id string, user_id string, campaign_id string, ts long"
    ).select("impression_id", "user_id", "campaign_id",
             F.timestamp_millis(F.col("ts")).alias("event_time"))
    clk_df = spark.createDataFrame(
        clicks, "click_id string, user_id string, ts long"
    ).select("click_id", "user_id",
             F.timestamp_millis(F.col("ts")).alias("click_time"))
    out = position_attribution(imp_df, clk_df).collect()
    assert sum(r.credit_bp for r in out) == 10000 * len(clicks)
    reordered = position_attribution(
        imp_df.orderBy(F.desc("impression_id")).repartition(7), clk_df
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, reordered))
