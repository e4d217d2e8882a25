"""Batch parquet loaders for the driver tables.

Mirrors the reference's source layer (Kafka JSON scans with computed
event-time columns, ``flink/flink_job.sql:5-41``) for the batch track:
parquet scan + computed ``event_time`` column. Filters and projections
applied downstream of these loaders push into the parquet scan via
Catalyst (verify with ``df.explain``: PushedFilters / ReadSchema).

Scale notes: loaders never collect, never infer schemas row-wise, and
keep the raw scan lazy so partition pruning and column pruning apply.
At 100 TB the same code reads a partitioned table directory; nothing
here assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.time import epoch_nanos_to_ts
from ..schemas import DRIVER_TABLES
from ..session import ensure_engine_conf


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; applies required runtime confs first."""
    ensure_engine_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` with a proper event-time column.

    Adapts to the physical type of ``ts`` (driver regenerations have
    shipped both): INT64 TIMESTAMP(NANOS) arrives as nanosecond BIGINT
    under ``nanosAsLong`` and is floor-divided to microseconds
    (``DIV`` -- exact on int64, unlike float division which loses
    precision above 2^53); TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ
    and is cast to session-time (UTC) TIMESTAMP, preserving wall-clock
    values. Either way ``event_time`` is a microsecond TIMESTAMP --
    the analogue of the reference's computed column ``event_time AS
    TO_TIMESTAMP_LTZ(event_timestamp, 3)`` (flink_job.sql:14).
    """
    ev = load_table(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return ev.withColumn("event_time", epoch_nanos_to_ts("ts"))
    return ev.withColumn("event_time", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table into a dict (events gains event_time)."""
    out: dict[str, DataFrame] = {}
    for name in DRIVER_TABLES:
        out[name] = (
            load_events(spark, sf_dir) if name == "events" else load_table(spark, sf_dir, name)
        )
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def load_evolving_table(
    spark: SparkSession, path: str, *, defaults: dict | None = None
) -> DataFrame:
    """Read a parquet directory whose files span SCHEMA VERSIONS
    (columns added over time -- the normal life of a lake table).

    ``mergeSchema`` unions the per-file footers (a metadata operation,
    not a data scan: each footer is read once, distributed); files
    missing a newer column yield NULL there, and ``defaults`` fills
    business defaults ONLY where the column is null -- old rows keep
    their semantics, new rows keep their values.

    At 100 TB: schema merge cost is O(#files) footer reads, so tables
    with millions of files should pin a table schema instead
    (spark.read.schema(...)); this loader is the discovery path.
    """
    ensure_engine_conf(spark)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, default in (defaults or {}).items():
        if col in df.columns:
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
        else:
            # column absent from EVERY file (directory predates it
            # entirely): add it as the default rather than silently
            # ignoring the caller's schema expectation -- downstream
            # select(col) would otherwise die on UNRESOLVED_COLUMN
            df = df.withColumn(col, F.lit(default))
    return df


def load_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    drop_malformed: bool = True,
    required_col: str | None = None,
) -> DataFrame:
    """JSONL corpus reader: the wire format training corpora actually
    arrive in (one JSON document per line -- the Common Crawl / Dolma
    / RedPajama distribution shape) with lenient parsing.

    Parsing goes text -> ``from_json`` -- the SAME decode shape as the
    Kafka wire path (streaming/sources.py::decode_json_value), so one
    lenient-parse semantic serves both ingestion surfaces. This also
    sidesteps the native JSON source's corrupt-record-column trap:
    filtering on ``_corrupt_record`` breaks under column pruning
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN on a plain ``.count()``), while
    a null ``from_json`` struct filters safely in any plan.
    ``drop_malformed`` removes unparseable lines (the batch analogue
    of `json.ignore-parse-errors`, flink_job.sql:22); ``required_col``
    additionally drops records that parsed but lack the field (e.g.
    text-less metadata lines). An explicit schema is REQUIRED: schema
    inference would re-read the corpus once just to guess types -- at
    100 TB that is a full extra scan.
    """
    ensure_engine_conf(spark)
    parsed = spark.read.text(path).select(
        F.from_json(F.col("value"), schema).alias("e")
    )
    if drop_malformed:
        # PERMISSIVE salvage yields an all-null STRUCT (not a null
        # struct) for some malformed shapes -- same behavior the Kafka
        # decode guards against (streaming/sources.py). An all-null
        # record is indistinguishable from garbage and drops with it.
        parsed = parsed.filter(
            F.col("e").isNotNull() & (F.to_json("e") != F.lit("{}"))
        )
    df = parsed.select("e.*")
    if required_col is not None:
        df = df.filter(F.col(required_col).isNotNull())
    return df
