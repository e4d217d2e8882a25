"""Event-time helpers shared by batch and streaming plans.

The engine's time semantics (UTC session timezone, integer-exact
epoch conversions) live here; see session.ENGINE_RUNTIME_CONF for the
session-level contract.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def epoch_millis_to_ts(col: Column) -> Column:
    """Epoch milliseconds -> timestamp. The analogue of the
    reference's computed column `TO_TIMESTAMP_LTZ(event_timestamp, 3)`
    (flink_job.sql:14)."""
    return F.timestamp_millis(col)


def epoch_nanos_to_ts(col_name: str) -> Column:
    """Epoch nanoseconds (BIGINT, as surfaced by nanosAsLong parquet
    reads) -> microsecond timestamp via integer FLOOR division --
    exact on int64, unlike float division which loses precision above
    2^53. DIV alone truncates toward zero, which would shift PRE-EPOCH
    (negative) nanos one microsecond late vs the oracle's true floor
    (epoch_ns // 1000); subtracting pmod first makes the numerator
    exactly divisible, so DIV and floor agree for every sign."""
    return F.timestamp_micros(
        F.expr(f"({col_name} - pmod({col_name}, 1000)) DIV 1000")
    )


def tumble(col: Column, width: str) -> Column:
    """Tumbling event-time window, epoch-aligned -- `TUMBLE(ts, w)`
    (flink_job.sql:97). Returns the window struct with .start/.end."""
    return F.window(col, width)
