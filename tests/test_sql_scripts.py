"""SQL-script entry points == DataFrame builders on the reference
fixture, plus runner/splitter unit coverage."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.fixtures import generate
from tests.conftest import assert_df_equal
from flink_ad_analytics_spark.operators.anomaly import detect_anomalies
from flink_ad_analytics_spark.operators.ctr import ctr_windows
from flink_ad_analytics_spark.operators.engagement import engagement_windows
from flink_ad_analytics_spark.sql import run_script, split_statements
from flink_ad_analytics_spark.sql.runner import script_path


@pytest.fixture(scope="module")
def ad_views(spark):
    fx = generate(duration_sec=1200)
    imp = spark.createDataFrame(fx.impressions).withColumn(
        "event_time", F.timestamp_millis(F.col("event_timestamp"))
    )
    clk = (
        spark.createDataFrame(fx.clicks)
        .withColumn("click_time", F.timestamp_millis(F.col("event_timestamp")))
        .drop("event_timestamp")
    )
    imp.createOrReplaceTempView("impressions")
    clk.createOrReplaceTempView("clicks")
    return imp, clk


def test_ctr_script_equals_builder(spark, ad_views):
    imp, clk = ad_views
    script = run_script(spark, script_path("ctr_job.sql"))[-1]
    assert_df_equal(script, ctr_windows(imp, clk), "ctr_job.sql")


def test_engagement_script_equals_builder(spark, ad_views):
    imp, clk = ad_views
    script = run_script(spark, script_path("engagement_job.sql"))[-1]
    assert_df_equal(
        script, engagement_windows(imp, clk), "engagement_job.sql"
    )


def test_anomaly_script_equals_builder_two_stage(spark, ad_views):
    """Job chaining: ctr_job output registered as the ctr_results view
    (the reference's topic bus, anomaly_job.sql:21), then the anomaly
    script == detect_anomalies on the same input."""
    imp, clk = ad_views
    ctr = run_script(spark, script_path("ctr_job.sql"))[-1]
    ctr.createOrReplaceTempView("ctr_results")
    alerts = run_script(spark, script_path("anomaly_job.sql"))[-1]
    assert_df_equal(alerts, detect_anomalies(ctr), "anomaly_job.sql")
    # fixture phase schedule guarantees camp-1 DROP then SPIKE alerts
    kinds = {r.alert_type for r in alerts.filter(F.col("campaign_id") == "camp-1").collect()}
    assert {"DROP", "SPIKE"} <= kinds


def test_split_statements_lexer():
    script = """
    -- leading comment; with semicolon
    CREATE OR REPLACE TEMPORARY VIEW v AS SELECT 'a;b' AS s, "q;i" FROM t;
    /* block; comment */
    SELECT * FROM v WHERE s <> ';' AND s <> 'it''s;fine';
    SELECT 1
    """
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert stmts[0].startswith("-- leading")
    assert "'a;b'" in stmts[0]
    assert "'it''s;fine'" in stmts[1]
    assert stmts[2].strip().endswith("SELECT 1")
    assert split_statements("  -- only a comment\n") == []


def test_run_script_params_and_inline_text(spark):
    dfs = run_script(
        spark,
        "SELECT ${x} AS a; SELECT ${x} + 1 AS b",
        params={"x": "41"},
    )
    assert [df.collect()[0][0] for df in dfs] == [41, 42]


def test_comment_only_fragments_dropped():
    """Trailing block comments and comment-only fragments between
    semicolons must not reach spark.sql (ParseException otherwise)."""
    stmts = split_statements(
        "SELECT 1; -- note\n; /* mid */ ; SELECT 2;\n/* end of job */"
    )
    assert len(stmts) == 2
    assert stmts[0].strip() == "SELECT 1"
    assert stmts[1].strip().endswith("SELECT 2")
