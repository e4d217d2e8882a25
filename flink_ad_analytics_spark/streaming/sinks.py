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


def upsert_sink(
    df: DataFrame,
    *,
    path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str,
    tiebreak_col: str,
    n_buckets: int = 16,
    output_mode: str = "append",
) -> StreamingQuery:
    """Keyed upsert (MERGE) sink: maintains a parquet table holding
    the LATEST row per key -- the warehouse primitive Flink spells as
    an upsert connector and lakehouses spell MERGE INTO.

    Incremental merge-on-write, bucket-partitioned so a micro-batch
    only rewrites the key ranges it touches:

    * the table is hive-partitioned on __bucket =
      pmod(xxhash64(keys), n_buckets);
    * each batch computes the bucket set it touches, reads ONLY those
      partitions back (partition pruning on the scan), unions the
      batch, keeps row_number()==1 per key ordered by (order_col,
      tiebreak_col) DESC, and dynamic-partition-overwrites just those
      buckets. Untouched buckets are never read or written.
    * idempotent under foreachBatch REPLAY: re-running a batch whose
      overwrite COMPLETED recomputes the same buckets from the same
      inputs. The merged frame is localCheckpoint'ed before the write
      so the scan of the old partition data completes before the
      overwrite clobbers it. CAVEAT (the honest limit of parquet
      merge-on-write): the dynamic overwrite itself is not atomic --
      a crash BETWEEN partition delete and file publish can lose the
      touched buckets' prior rows, and replay then merges against the
      damaged table. True exactly-once under mid-write crashes needs
      an atomic-commit table format (a Delta/Iceberg-style manifest),
      which is exactly what those formats exist for; this sink is the
      engine-level primitive beneath them.

    At 100 TB, n_buckets scales with the table (thousands), and a
    micro-batch touching k keys rewrites O(k/n_buckets of the table),
    not all of it. Determinism: (order_col, tiebreak_col) must be
    unique per key -- ties would make "latest" engine-dependent.
    """
    # cast to int: the value read back from the hive partition path is
    # int32, and unionByName must see one type
    bucket = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
    ).cast("int")

    def merge(batch: DataFrame, batch_id: int) -> None:
        import os

        from pyspark.sql import Window

        spark = batch.sparkSession
        # persist: the batch plan is evaluated twice (bucket collect +
        # merged write); without this an expensive upstream (e.g. a
        # streaming aggregation) recomputes per action (dual_sink
        # applies the same rule)
        tagged = batch.withColumn("__bucket", bucket).persist()
        try:
            _merge_tagged(spark, tagged)
        finally:
            # foreachBatch retries re-enter merge(); without the
            # finally a transient failure between persist and the end
            # of the merge would leak one cached batch per attempt
            # (dual_sink guards its writers the same way)
            tagged.unpersist()

    def _merge_tagged(spark: "SparkSession", tagged: DataFrame) -> None:
        import os

        from pyspark.sql import Window

        touched = [r[0] for r in tagged.select("__bucket").distinct().collect()]
        if not touched:
            return
        if os.path.isdir(path) and any(
            e.startswith("__bucket=") for e in os.listdir(path)
        ):
            cur = spark.read.parquet(path).filter(F.col("__bucket").isin(touched))
            unioned = cur.unionByName(tagged)
        else:
            unioned = tagged
        w = Window.partitionBy(*keys).orderBy(
            F.col(order_col).desc(), F.col(tiebreak_col).desc()
        )
        latest = (
            unioned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint()  # materialize BEFORE overwriting the source partitions
        )
        # writer-scoped dynamic mode: setting the SESSION conf would
        # leak dynamic-overwrite semantics to every other write on the
        # shared SparkSession for the lifetime of the stream
        (latest.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("__bucket").parquet(path))

    return (
        df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        # "update" turns a streaming aggregation feeding this sink into
        # an incrementally-maintained materialized view: each batch
        # emits only the CHANGED groups, and the merge upserts them.
        .outputMode(output_mode)
        .start()
    )


def read_upsert_table(spark, path: str) -> DataFrame:
    """Current snapshot of an upsert_sink table (drops the bucket
    column)."""
    return spark.read.parquet(path).drop("__bucket")


def compact_upsert_table(
    spark, path: str, *, files_per_bucket: int = 1
) -> dict[str, int]:
    """Small-file compaction for an upsert_sink table: rewrite each
    bucket partition down to ``files_per_bucket`` files.

    Merge-on-write accretes one file set per touching micro-batch;
    thousands of batches mean thousands of small files per bucket --
    the lakehouse small-file problem. Compaction is a pure LAYOUT
    rewrite (same rows, fewer files): per bucket, read -> coalesce ->
    dynamic-partition-overwrite, so concurrent READERS of other
    buckets are untouched and the operation is idempotent (rerun =
    same layout). It must NOT race a live upsert_sink on the same
    table: compaction snapshots all buckets then overwrites all
    buckets, so a merge committed in between would be clobbered with
    pre-snapshot rows -- run it with the stream stopped (or between
    batches from the stream's own foreachBatch), the same discipline
    every lakehouse compactor without a commit log requires. Run it
    from a maintenance schedule, not the hot path.

    Returns {"files_before": n, "files_after": m}.
    """
    import os

    from pyspark.sql import functions as F

    def count_files() -> int:
        n = 0
        for b in os.listdir(path):
            if b.startswith("__bucket="):
                n += sum(
                    1
                    for f in os.listdir(os.path.join(path, b))
                    if f.endswith(".parquet")
                )
        return n

    before = count_files()
    cur = spark.read.parquet(path)
    n_buckets = max(1, cur.select("__bucket").distinct().count())
    # repartition on (__bucket, salt): partitioning on __bucket alone
    # hashes each bucket's rows into ONE task -> one file, making
    # files_per_bucket > 1 a no-op and un-splittable oversized
    # buckets; the salt spreads each bucket over files_per_bucket
    # tasks so the parameter actually controls the file count
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(files_per_bucket))
    compacted = cur.withColumn("__salt", salt).repartition(
        files_per_bucket * n_buckets, F.col("__bucket"), F.col("__salt")
    ).drop("__salt").localCheckpoint()
    (compacted.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("__bucket").parquet(path))
    return {"files_before": before, "files_after": count_files()}
