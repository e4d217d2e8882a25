"""Schema registry for the reference event model and driver tables.

The impression/click/ctr-result schemas mirror the reference DDLs
(`/root/reference/flink/flink_job.sql:5-41`, `:44-71`;
`/root/reference/flink/anomaly_job.sql:8-28`): flat JSON records with
string ids, epoch-millis BIGINT timestamps, DECIMAL(10,2) cost.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Reference impression event (flink_job.sql:5-24; generate_events.py:67-86).
IMPRESSION_SCHEMA = T.StructType(
    [
        T.StructField("impression_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("campaign_id", T.StringType(), True),
        T.StructField("ad_id", T.StringType(), True),
        T.StructField("device_type", T.StringType(), True),
        T.StructField("browser", T.StringType(), True),
        T.StructField("event_timestamp", T.LongType(), False),  # epoch millis
        T.StructField("cost", T.DecimalType(10, 2), True),
    ]
)

# Reference click event (flink_job.sql:26-41; generate_events.py:143-154).
CLICK_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.StringType(), False),
        T.StructField("impression_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_timestamp", T.LongType(), False),  # epoch millis
    ]
)

# Stage-1 output / stage-2 input (flink_job.sql:44-57; anomaly_job.sql:8-28).
CTR_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("campaign_id", T.StringType(), False),
        T.StructField("impression_count", T.LongType(), False),
        T.StructField("click_count", T.LongType(), False),
        T.StructField("ctr", T.DoubleType(), False),
    ]
)

# Anomaly alert output (anomaly_job.sql:31-43).
ANOMALY_ALERT_SCHEMA = T.StructType(
    [
        T.StructField("alert_time", T.TimestampType(), False),
        T.StructField("campaign_id", T.StringType(), False),
        T.StructField("current_ctr", T.DoubleType(), False),
        T.StructField("previous_ctr", T.DoubleType(), True),
        T.StructField("alert_type", T.StringType(), True),
    ]
)

#: Driver-provided star-schema + event/document/embedding tables
#: (/root/testdata/sf*/; TESTDATA.md). Names only -- schemas come from
#: parquet footers.
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
