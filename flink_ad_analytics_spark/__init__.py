"""PySpark-native analytics engine with the query surface of
``isaipina/flink-ad-analytics`` (reference: Flink SQL ad-analytics
pipeline), rebuilt Spark-first.

The reference declares two Flink SQL jobs (``flink/flink_job.sql``,
``flink/anomaly_job.sql``): Kafka JSON sources, an event-time interval
LEFT join between impressions and clicks, 1-minute tumbling-window CTR
and engagement aggregations, and a LAG-based SPIKE/DROP anomaly stage.
This package re-expresses those semantics as mode-agnostic DataFrame
plan builders (batch + Structured Streaming from one definition), and
adds the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
    session     -- SparkSession factory with scale-tuned defaults
    schemas     -- StructTypes for the reference event model + fixtures
    sources/    -- batch parquet loaders, streaming readers (kafka/file)
    operators/  -- ctr, engagement, anomaly, relational, dedup,
                   similarity, text, multimodal
    functions/  -- portable hashing, time helpers, vector math
    plans/      -- streaming rewrites (countDistinct -> dedup+count)
    streaming/  -- watermarked jobs, stateful LAG, sinks
"""

__version__ = "0.1.0"
