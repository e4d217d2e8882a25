"""In-flight data-quality metrics for streaming (and batch) plans.

The reference deployment watches its jobs through the Flink dashboard
(numRecordsIn/Out, watermark lag -- docker-compose.yml exposes the Web
UI; SURVEY.md §6). Spark's native counterpart for *semantic* counters
is ``Dataset.observe``: named aggregates evaluated inline with the
plan (no second pass, no extra action) and surfaced per micro-batch in
``StreamingQueryProgress.observedMetrics`` (or on the
QueryExecutionListener for batch).

These helpers standardize the engine's quality counters so every job
can report rows / malformed-rate / event-time bounds without paying a
second scan -- the at-scale property: a 100 TB pipeline cannot afford
`df.count()` side-queries for monitoring, so the counters ride the
existing plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Name under which quality metrics are observed; progress consumers
#: key on it.
QUALITY_OBSERVATION = "quality"


def with_quality_metrics(
    df: DataFrame,
    event_time_col: str = "event_time",
    malformed_predicate: F.Column | None = None,
    name: str = QUALITY_OBSERVATION,
) -> DataFrame:
    """Attach inline quality counters to a (streaming) DataFrame.

    Observed per micro-batch:
      n_rows         rows flowing through this point of the plan
      n_malformed    rows matching ``malformed_predicate`` (0 if None)
      min_event_time / max_event_time   event-time bounds (watermark
                     lag = processing time - max_event_time)

    ``observe`` is plan-transparent: Catalyst still pushes filters and
    prunes columns around it, and the aggregates are computed by the
    same tasks that process the data.
    """
    malformed = (
        F.count_if(malformed_predicate)
        if malformed_predicate is not None
        else F.lit(0).cast("long")
    )
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        malformed.alias("n_malformed"),
        F.min(event_time_col).alias("min_event_time"),
        F.max(event_time_col).alias("max_event_time"),
    )


def last_quality(progress: dict, name: str = QUALITY_OBSERVATION) -> dict | None:
    """Extract the quality row from a StreamingQueryProgress dict
    (``q.lastProgress`` / ``q.recentProgress`` entries)."""
    if not progress:
        return None
    return (progress.get("observedMetrics") or {}).get(name)
