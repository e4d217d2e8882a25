"""Anomaly detection: LAG-based SPIKE/DROP alerts over windowed CTR.

Reference semantics (`/root/reference/flink/anomaly_job.sql:46-84`):

    ctr_with_previous AS (
      SELECT ..., LAG(ctr, 1) OVER (PARTITION BY campaign_id
                                    ORDER BY event_time) AS previous_ctr)
    SELECT window_end AS alert_time, campaign_id, ctr AS current_ctr,
           previous_ctr,
           CASE WHEN previous_ctr > 0 AND ctr > previous_ctr * 2.0
                THEN 'SPIKE'
                WHEN ctr < previous_ctr * 0.5 THEN 'DROP' END
    WHERE previous_ctr IS NOT NULL
      AND ((previous_ctr > 0 AND ctr > previous_ctr * 2.0)
           OR ctr < previous_ctr * 0.5)

Batch uses the exact window-function form. The streaming counterpart
(OVER is unsupported on streams) lives in streaming/stateful.py as an
applyInPandasWithState operator keyed by campaign_id.

Scale: the input here is already aggregated (one row per window x
campaign), so volume is tiny relative to raw events; the window
function shuffles on campaign_id once. No further tuning needed even
at 100 TB of *raw* input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SPIKE_FACTOR = 2.0
DROP_FACTOR = 0.5


def detect_anomalies(
    ctr_results: DataFrame,
    *,
    key: str = "campaign_id",
    order_col: str = "window_end",
    metric: str = "ctr",
) -> DataFrame:
    """SPIKE/DROP alerts comparing each window's metric to the previous.

    First window per key never alerts (LAG yields NULL -> filtered).
    The CASE has no ELSE, matching the reference (unclassifiable rows
    would carry NULL alert_type, but the WHERE makes that unreachable).
    """
    w = Window.partitionBy(key).orderBy(order_col)
    cur = F.col(metric)
    prev = F.lag(metric, 1).over(w)
    with_prev = ctr_results.select(
        F.col(order_col).alias("alert_time"),
        F.col(key),
        cur.alias("current_ctr"),
        prev.alias("previous_ctr"),
    )
    spike = (F.col("previous_ctr") > 0) & (
        F.col("current_ctr") > F.col("previous_ctr") * SPIKE_FACTOR
    )
    drop = F.col("current_ctr") < F.col("previous_ctr") * DROP_FACTOR
    return (
        with_prev.withColumn(
            "alert_type", F.when(spike, "SPIKE").when(drop, "DROP")
        )
        .filter(F.col("previous_ctr").isNotNull() & (spike | drop))
    )
