"""Engagement aggregation: tumbling-window metrics per segment key.

Reference semantics (`/root/reference/flink/flink_job.sql:102-118`):
same interval-join upstream as CTR, grouped by window and
``COALESCE(device_type, 'Unknown')``, emitting distinct impressions,
distinct matched clicks, and ctr.

Generalized here to any segment column with a COALESCE default
(P7 in SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ctr import ctr_windows


def engagement_windows(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    segment_col: str = "device_type",
    default: str = "Unknown",
    **kwargs,
) -> DataFrame:
    """CTR-style windowed aggregation keyed by a null-defaulted segment."""
    segmented = impressions.withColumn(
        "segment", F.coalesce(F.col(segment_col), F.lit(default))
    )
    out = ctr_windows(segmented, clicks, group_key="segment", **kwargs)
    return out.withColumnRenamed("segment", segment_col)
