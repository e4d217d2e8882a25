"""Streaming sinks: Kafka JSON writers (reference parity), file/memory
sinks, and the multi-sink statement-set analogue.

Reference mapping (SURVEY.md §2.1 S7-S10): the Kafka JSON sinks
(`/root/reference/flink/flink_job.sql:44-71`) become
``to_json(struct(*)) -> writeStream.format("kafka")``; the
``BEGIN STATEMENT SET`` dual-INSERT sharing one source
(flink_job.sql:74-120) becomes a single ``foreachBatch`` writing both
outputs from one upstream (one scan, two writes -- same sharing Flink
achieves with the statement set).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def to_kafka_json(
    df: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
) -> StreamingQuery:
    """JSON-serialize all columns and write to a Kafka topic.

    No key column is set, so the Kafka default partitioner round-robins
    -- matching `'sink.partitioner' = 'round-robin'` (flink_job.sql:56).
    """
    return (
        df.select(F.to_json(F.struct("*")).alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def to_parquet_dir(
    df: DataFrame, *, path: str, checkpoint: str, output_mode: str = "append"
) -> StreamingQuery:
    """Append-mode parquet sink; doubles as the inter-job bus in the
    two-stage topology (job 2 tails the directory as a stream, the
    file-based analogue of the reference's `ctr_results` topic)."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )


def dual_sink(
    df: DataFrame,
    write_a: Callable[[DataFrame], None],
    write_b: Callable[[DataFrame], None],
    *,
    checkpoint: str,
) -> StreamingQuery:
    """Statement-set analogue: one upstream plan, two sinks, one
    checkpoint lineage.

    The micro-batch is persisted so both writers consume one
    materialization (the reference's shared-source-scan property).
    Each writer must be idempotent on (batch_id) replay for
    exactly-once output.
    """

    def write_both(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            write_a(batch)
            write_b(batch)
        finally:
            batch.unpersist()

    return (
        df.writeStream.foreachBatch(write_both)
        .option("checkpointLocation", checkpoint)
        .start()
    )
