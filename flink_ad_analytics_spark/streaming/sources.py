"""Streaming sources: Kafka JSON (reference parity) and file-based
(test/fixture) readers producing identical typed DataFrames.

Reference mapping (SURVEY.md §2.1 S1-S5): the reference's Kafka JSON
DDLs (`/root/reference/flink/flink_job.sql:5-41`) become
``readStream.format("kafka")`` + ``from_json`` + computed event-time.
This environment has no Kafka broker, so the Kafka path is a thin,
untested-by-CI wiring function behind the same interface; the file
source delivers identical semantics (schema, event-time, watermark)
and is what the streaming tests drive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def _with_event_time(df: DataFrame, ts_col: str, out_col: str, watermark: str | None) -> DataFrame:
    # Computed column: epoch millis -> timestamp, the analogue of
    # `event_time AS TO_TIMESTAMP_LTZ(event_timestamp, 3)` (flink_job.sql:14).
    out = df.withColumn(out_col, F.timestamp_millis(F.col(ts_col)))
    if watermark:
        out = out.withWatermark(out_col, watermark)
    return out


def decode_json_value(
    raw: DataFrame,
    schema: T.StructType,
    *,
    ts_col: str = "event_timestamp",
    event_time_col: str = "event_time",
    watermark: str | None = "5 seconds",
) -> DataFrame:
    """Kafka-wire decode: binary ``value`` column -> typed rows.

    ``from_json`` in default PERMISSIVE mode nulls malformed records
    (the reference's `json.ignore-parse-errors=true`,
    flink_job.sql:22); rows that fail to parse entirely are dropped,
    matching Flink's drop behavior. Shared by the Kafka stream and the
    broker-less tests (tests/test_kafka_decode.py), so the parse logic
    is exercised even without a broker.
    """
    parsed = (
        raw.select(F.from_json(F.col("value").cast("string"), schema).alias("e"))
        .filter(F.col("e").isNotNull())
        .select("e.*")
        # PERMISSIVE mode yields an all-null ROW (not a null struct)
        # for malformed input; requiring the event-time field drops
        # those, matching Flink's ignore-parse-errors record drop.
        .filter(F.col(ts_col).isNotNull())
    )
    return _with_event_time(parsed, ts_col, event_time_col, watermark)


def kafka_json_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    schema: T.StructType,
    starting_offsets: str = "earliest",
    ts_col: str = "event_timestamp",
    event_time_col: str = "event_time",
    watermark: str | None = "5 seconds",
) -> DataFrame:
    """Kafka topic -> typed stream, lenient JSON parse (S1-S4)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_json_value(
        raw, schema, ts_col=ts_col, event_time_col=event_time_col,
        watermark=watermark,
    )


def file_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    ts_col: str = "event_timestamp",
    event_time_col: str = "event_time",
    watermark: str | None = "5 seconds",
    max_files_per_trigger: int | None = 1,
    starting_position: str = "earliest",
    latest_marker: str | None = None,
) -> DataFrame:
    """Parquet-directory stream with the same typed output as the
    Kafka path (used by tests; also the shape of a data-lake tailing
    job in production).

    ``starting_position`` mirrors Kafka ``startingOffsets`` (S3/T10):
    ``"earliest"`` consumes the pre-existing backlog (the reference
    main job, flink_job.sql:23); ``"latest"`` skips files last
    modified before the SUBSCRIPTION, so a late subscriber sees only
    post-subscription data -- the file-source analogue of the anomaly
    job's ``scan.startup.mode = latest-offset`` (anomaly_job.sql:27).
    The cutoff is evaluated per-file from the
    ``_metadata.file_modification_time`` column, i.e. distributed, no
    driver-side listing.

    Restart semantics matter here: Kafka's latest-offset cut applies
    ONLY on first start -- after a crash, offsets resume from the
    checkpoint with no loss. A cutoff recomputed at every stream
    (re)definition would silently drop files written during downtime
    (listed by the source, marked processed in the checkpoint,
    filtered to zero rows -- permanent loss). So the subscription
    instant is PERSISTED: pass ``latest_marker`` (a path stored with
    your checkpoint); the first definition writes now() there, every
    restart reads the original instant back. Without a marker the
    cutoff is this definition's now() and restart-loss is on the
    caller (acceptable only for marker-less tests).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    if starting_position == "latest":
        import datetime as _dt
        import os as _os

        if latest_marker is not None and _os.path.exists(latest_marker):
            with open(latest_marker) as fh:
                cutoff = _dt.datetime.fromisoformat(fh.read().strip())
        else:
            cutoff = _dt.datetime.now(_dt.timezone.utc)
            if latest_marker is not None:
                marker_dir = _os.path.dirname(latest_marker)
                if marker_dir:  # bare filename -> cwd, nothing to make
                    _os.makedirs(marker_dir, exist_ok=True)
                tmp = latest_marker + ".tmp"
                with open(tmp, "w") as fh:
                    fh.write(cutoff.isoformat())
                _os.replace(tmp, latest_marker)  # atomic: no torn reads
        df = (
            df.select(
                "*",
                F.col("_metadata.file_modification_time").alias("_file_mtime"),
            )
            .filter(F.col("_file_mtime") >= F.lit(cutoff))
            .drop("_file_mtime")
        )
    elif starting_position != "earliest":
        raise ValueError(
            f"starting_position must be 'earliest' or 'latest', got {starting_position!r}"
        )
    return _with_event_time(df, ts_col, event_time_col, watermark)
