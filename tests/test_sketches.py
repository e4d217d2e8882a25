"""Sketch guarantees vs exact ground truth: CMS upper-bound +
mergeability, HLL accuracy, approx-percentile accuracy. The exact
companions (campaign_reach, heavy_hitter_users) are oracle-gated in
test_oracle_parity; these tests pin the sketch-to-exact agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    reach_approx,
)
from flink_ad_analytics_spark.sources.batch import load_events
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF_CORRECT).cache()


def test_cms_never_undercounts_and_is_tight(spark, events):
    cms = cms_build(events, "user_id")
    est = {r.user_id: r.est_count
           for r in cms_estimate(cms, events, "user_id").collect()}
    true = {r.user_id: r.n
            for r in events.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(true)
    overshoot = {k: est[k] - true[k] for k in true}
    assert all(v >= 0 for v in overshoot.values())  # CMS hard guarantee
    # 150 keys in 4x2048 cells: min-over-depths should be exact here
    assert sum(v > 0 for v in overshoot.values()) == 0


def test_cms_is_mergeable(spark, events):
    """Sketch(A union B) == cell-wise sum of Sketch(A) + Sketch(B) --
    the property that makes CMS a distributed aggregate (partial
    sketches merge associatively across partitions/days/clusters)."""
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(a, "user_id").unionByName(cms_build(b, "user_id"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(events, "user_id")
    diff = (
        merged.alias("m")
        .join(whole.alias("w"), ["d", "bucket"], "full_outer")
        .filter(
            F.coalesce(F.col("m.cnt"), F.lit(0))
            != F.coalesce(F.col("w.cnt"), F.lit(0))
        )
    )
    assert diff.count() == 0


def test_hll_reach_within_rsd(spark, events):
    imp = events.filter(F.col("event_type") == "view").withColumn(
        "campaign_id", (F.col("user_id") % 10).cast("string")
    )
    approx = {r.campaign_id: r.approx_reach
              for r in reach_approx(imp, "campaign_id", "user_id",
                                    rsd=0.02).collect()}
    exact = {r.campaign_id: r.reach
             for r in imp.groupBy("campaign_id").agg(
                 F.countDistinct("user_id").alias("reach")).collect()}
    for c, ex in exact.items():
        assert abs(approx[c] - ex) <= max(2, 0.06 * ex), (c, approx[c], ex)


def test_approx_percentile_close_to_exact(spark, events):
    row = events.agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("ap"),
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("ex"),
    ).collect()[0]
    for a, e in zip(row.ap, row.ex):
        assert abs(a - e) <= 0.02 * max(abs(e), 1.0), (a, e)


def test_cms_absent_key_estimates_zero_and_geometry_validated(spark):
    """A key never seen at build time must estimate 0 (not vanish from
    the output), and a depth/width mismatch must raise rather than
    silently probe the wrong cells."""
    import pytest

    from flink_ad_analytics_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    cms = cms_build(df, "k", depth=4, width=512)
    probe = spark.createDataFrame([("a",), ("zzz-never-seen",)], ["k"])
    est = {r.k: r.est_count for r in cms_estimate(cms, probe, "k", depth=4, width=512).collect()}
    assert est["a"] >= 2
    assert est["zzz-never-seen"] == 0  # present in output, floor 0
    with pytest.raises(ValueError, match="does not match"):
        cms_estimate(cms, probe, "k", depth=4, width=2048).collect()
