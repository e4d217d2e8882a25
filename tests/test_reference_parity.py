"""Reference-parity tests: the engine's CTR/engagement/anomaly
semantics on fixtures generated to the reference's own spec
(generate_events.py + FIXTURES.md edge cases), checked against a
DuckDB oracle and hand-computable truths.

These cover the exact correctness traps where the reference found
Flink buggy (README.md:127): LEFT JOIN fan-out vs COUNT(DISTINCT),
out-of-band clicks, duplicate deliveries.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.fixtures import generate, write_parquet
from flink_ad_analytics_spark.operators.anomaly import detect_anomalies
from flink_ad_analytics_spark.operators.ctr import ctr_windows
from flink_ad_analytics_spark.operators.engagement import engagement_windows
from tests.oracle import compare


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ad_fixture")
    fx = generate(duration_sec=1200, seed=42)
    write_parquet(fx, str(d))
    return str(d)


@pytest.fixture(scope="module")
def ad_tables(spark, fixture_dir):
    imp = spark.read.parquet(f"{fixture_dir}/impressions.parquet").withColumn(
        "event_time", F.timestamp_millis(F.col("event_timestamp"))
    )
    clk = spark.read.parquet(f"{fixture_dir}/clicks.parquet").withColumn(
        "click_time", F.timestamp_millis(F.col("event_timestamp"))
    ).drop("event_timestamp")
    return imp, clk


@pytest.fixture(scope="module")
def con(fixture_dir):
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW impressions AS SELECT *, make_timestamp(event_timestamp * 1000)"
        f" AS event_time FROM '{fixture_dir}/impressions.parquet'"
    )
    c.execute(
        f"CREATE VIEW clicks AS SELECT click_id, impression_id, user_id,"
        f" make_timestamp(event_timestamp * 1000) AS click_time"
        f" FROM '{fixture_dir}/clicks.parquet'"
    )
    yield c
    c.close()


CTR_ORACLE = """
SELECT time_bucket(INTERVAL 1 MINUTE, i.event_time) AS window_start,
       time_bucket(INTERVAL 1 MINUTE, i.event_time) + INTERVAL 1 MINUTE AS window_end,
       i.campaign_id,
       COUNT(DISTINCT i.impression_id) AS impression_count,
       COUNT(DISTINCT c.click_id) AS click_count,
       CASE WHEN COUNT(DISTINCT i.impression_id) > 0
            THEN CAST(COUNT(DISTINCT c.click_id) AS DOUBLE)
                 / CAST(COUNT(DISTINCT i.impression_id) AS DOUBLE)
            ELSE 0.0 END AS ctr
FROM impressions i
LEFT JOIN clicks c
  ON i.impression_id = c.impression_id
 AND c.click_time >= i.event_time
 AND c.click_time <= i.event_time + INTERVAL 10 MINUTE
GROUP BY 1, 2, 3
"""


def test_ctr_matches_oracle(spark, ad_tables, con):
    """Full 1-minute-window CTR vs DuckDB on the reference fixture."""
    imp, clk = ad_tables
    result = ctr_windows(imp, clk, window="1 minute", band="10 minutes")
    compare(result, con, CTR_ORACLE, name="ctr_fixture")


def test_engagement_matches_oracle(spark, ad_tables, con):
    imp, clk = ad_tables
    result = engagement_windows(imp, clk, window="1 minute", band="10 minutes")
    oracle = CTR_ORACLE.replace(
        "i.campaign_id", "COALESCE(i.device_type, 'Unknown') AS device_type", 1
    )
    compare(result, con, oracle, name="engagement_fixture")


def test_edge_semantics(spark, ad_tables):
    """Hand-computable edge cases (FIXTURES.md §2):
    multi-click and duplicate deliveries must count distinctly;
    out-of-band clicks must not count; band-edge clicks must."""
    imp, clk = ad_tables
    first_min = ctr_windows(
        imp.filter(F.col("impression_id").isin("imp-0", "imp-1", "imp-2", "imp-3")),
        clk,
        window="1 minute",
        band="10 minutes",
        group_key="ad_id",  # any key; check totals via sum
    )
    rows = first_min.collect()
    total_imps = sum(r.impression_count for r in rows)
    total_clicks = sum(r.click_count for r in rows)
    # imp-0: 3 distinct clicks (fan-out!), imp-1: out-of-band only -> 0,
    # imp-2: band-edge -> 1, imp-3: duplicated delivery -> 1 distinct
    # (plus each may have an organic click from the random pass)
    assert total_imps == 4  # each impression counted once despite fan-out
    organic = clk.filter(
        F.col("click_id").rlike("^clk-")
        & F.col("impression_id").isin("imp-0", "imp-1", "imp-2", "imp-3")
    )
    organic_in_band = (
        organic.join(
            imp.select("impression_id", "event_time"), "impression_id"
        )
        .filter(
            (F.col("click_time") >= F.col("event_time"))
            & (
                F.col("click_time")
                <= F.col("event_time") + F.expr("INTERVAL 10 MINUTES")
            )
        )
        .select("click_id")
        .distinct()
        .count()
    )
    assert total_clicks == 5 + organic_in_band


def test_anomaly_phases(spark, ad_tables, con):
    """camp-1 phase schedule must produce DROP then SPIKE alerts.

    Phases (generate_events.py:108-121): ctr ~0.10 until 300s, ~0.01
    until 600s, ~0.40 until 900s, then ~0.10. On 1-min windows the
    alert sequence for camp-1 must contain a DROP at the 300s boundary
    and a SPIKE at the 600s boundary.
    """
    imp, clk = ad_tables
    ctr = ctr_windows(imp, clk, window="1 minute", band="10 minutes")
    alerts = detect_anomalies(ctr).filter(F.col("campaign_id") == "camp-1")
    got = {
        (r.alert_time.minute, r.alert_type)
        for r in alerts.collect()
    }
    # alert_time is the WINDOW END. Phase 2 (drop) starts at 300s =
    # minute 5; the first fully-dropped window is [5,6) -> alert at
    # end minute 6. Phase 3 (spike) at 600s -> [10,11) -> 11; recovery
    # at 900s -> [15,16) -> 16. Low-count CTR jitter mid-phase can add
    # extra alerts (ratio thresholds on ~3 clicks/window) -- those are
    # correct behavior, so assert containment, not equality.
    assert (6, "DROP") in got
    assert (11, "SPIKE") in got
    assert (16, "DROP") in got


def test_ctr_statistical_sanity(spark, ad_tables):
    """The reference's own acceptance criterion (README.md:127):
    ctr < 1.0 and impressions >= clicks in every window (the Flink
    bug made these equal)."""
    imp, clk = ad_tables
    res = ctr_windows(imp, clk, window="1 minute", band="10 minutes").collect()
    assert len(res) > 0
    for r in res:
        assert r.impression_count >= r.click_count
    overall = sum(r.click_count for r in res) / sum(r.impression_count for r in res)
    assert 0.05 < overall < 0.25  # base click ratio 0.1 +/- phases


def test_capped_sessions_splits_marathon_and_gaps(spark):
    """A never-idle marathon user is chopped at exact 2h boundaries
    (slice 0/1/2); a 31-min gap starts a new session with slice_idx
    reset -- the two spec halves, pinned on a synthetic trace."""
    import datetime as dt

    from flink_ad_analytics_spark.queries import q_capped_sessions

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # marathon user 1: an event every 10 min for 5h (31 events)
    for i in range(31):
        rows.append((i, t0 + dt.timedelta(minutes=10 * i), 1, "view", 1.0, "{}"))
    # gapped user 2: two bursts separated by 31 min
    rows.append((100, t0, 2, "view", 1.0, "{}"))
    rows.append((101, t0 + dt.timedelta(minutes=5), 2, "view", 1.0, "{}"))
    rows.append((102, t0 + dt.timedelta(minutes=36), 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = q_capped_sessions(spark, d).collect()
    u1 = sorted(
        [r for r in out if r.user_id == 1], key=lambda r: r.slice_idx
    )
    # 5h span / 2h cap -> slices 0 (12 events: 0..110min), 1 (12), 2 (7)
    assert [(r.slice_idx, r.n_events) for r in u1] == [(0, 12), (1, 12), (2, 7)]
    assert all(r.session_start == t0 for r in u1)  # one gap-session
    u2 = sorted(
        [r for r in out if r.user_id == 2], key=lambda r: r.session_start
    )
    assert [(r.slice_idx, r.n_events) for r in u2] == [(0, 2), (0, 1)]
    assert u2[1].session_start == t0 + dt.timedelta(minutes=36)


def test_linear_attribution_splits_credit(spark):
    """One click with 3 in-band touches across 2 campaigns: camp A
    (2 touches) gets 6666 bp, camp B (1 touch) 3333 bp -- the integer
    DIV spec, exercised with a multi-campaign user the driver
    fixture's user-derived surrogate cannot produce. An out-of-band
    impression earns nothing."""
    import datetime as dt

    from flink_ad_analytics_spark.operators.ctr import linear_attribution

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    imps = spark.createDataFrame(
        [
            ("i1", 1, "A", t0 - dt.timedelta(minutes=9)),
            ("i2", 1, "A", t0 - dt.timedelta(minutes=5)),
            ("i3", 1, "B", t0 - dt.timedelta(minutes=1)),
            ("i4", 1, "C", t0 - dt.timedelta(minutes=11)),  # out of band
        ],
        "impression_id string, user_id long, campaign_id string, event_time timestamp",
    )
    clicks = spark.createDataFrame(
        [("c1", 1, t0)],
        "click_id string, user_id long, click_time timestamp",
    )
    out = {
        r.campaign_id: (r.credit_bp, r.n_click_touches)
        for r in linear_attribution(imps, clicks).collect()
    }
    assert out == {"A": (6666, 1), "B": (3333, 1)}


def test_pit_join_covers_every_order_exactly_once(spark):
    """PIT correctness invariant the cross-engine oracle CANNOT see
    (a fan-out bug would reproduce on both sides): the half-open SCD2
    validity intervals tile each customer's timeline, so the join
    matches every order exactly once -- total joined rows == |orders|.
    Also: an order AT a change date takes the new value (>= from,
    < to), never the outgoing one."""
    from flink_ad_analytics_spark.queries import q_pit_feature_join
    from flink_ad_analytics_spark.sources.batch import load_table
    from tests.conftest import SF_CORRECT

    out = q_pit_feature_join(spark, SF_CORRECT).collect()
    n_orders = load_table(spark, SF_CORRECT, "orders").count()
    assert sum(r.n_orders for r in out) == n_orders
    # change points exist: some orders' own priority differs from the
    # PIT feature (inherited from an earlier change)
    assert any(r.n_matching_own < r.n_orders for r in out)
