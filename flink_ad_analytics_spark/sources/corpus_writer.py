"""Partitioned corpus writes: the layout half of a 100 TB pipeline.

A curation pipeline's output is read hundreds of times by downstream
training jobs; the write is the one chance to buy every later scan
partition pruning, row-group min/max pruning, and sane file sizes.
Three levers, all encoded here:

* **Hive partitioning** (``partitionBy``): coarse, low-cardinality
  columns (lang, source, split) become directories; a reader filtering
  on them never opens the other directories (PartitionFilters in the
  scan, proven by test).
* **File count control**: Spark writes one file per task per output
  partition, so an unplanned write produces tasks x partitions small
  files. Repartitioning by (partition cols [+ salt]) first puts each
  output partition's rows in exactly ``files_per_partition`` tasks.
* **Sort within files** (``sortWithinPartitions``): an in-task sort
  (no exchange) that turns the sort column's parquet row-group min/max
  stats into a range index -- point/range reads on that column skip
  row groups. Sorting by a content key (e.g. fingerprint) also
  clusters duplicates for downstream dedup locality.

Salting note: the salt is hash(id) % files_per_partition -- pure,
deterministic, and evenly spread; using rand() would break task retry
idempotency (a retried task would re-deal rows differently).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = ("lang",),
    sort_within: Sequence[str] = ("doc_id",),
    files_per_partition: int = 1,
    id_col: str = "doc_id",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
    exact_files: bool = False,
    dynamic_overwrite: bool = False,
) -> None:
    """Write ``df`` as a partitioned, sorted, file-count-controlled
    columnar corpus under ``path``.

    ``file_format`` is ``"parquet"`` (default) or ``"orc"`` -- the two
    columnar formats Spark ships natively. Every layout lever above
    applies identically to ORC: Hive directory partitioning, file-count
    control, and in-file sorting (ORC keeps per-stripe/rowgroup min/max
    plus optional bloom filters, so the sorted column prunes stripes
    the way parquet prunes row groups).
    """
    parts = [F.col(c) for c in partition_by]
    if exact_files and not parts:
        # compaction contract: the file budget is EXACT, including 1
        # (the default branch below would keep incoming scan
        # parallelism -- hundreds of files for a 1-file budget)
        salt = F.pmod(
            F.xxhash64(F.col(id_col)), F.lit(files_per_partition)
        ).alias("__salt")
        out = df.repartition(files_per_partition, salt)
    elif files_per_partition > 1:
        # pmod, not %: xxhash64 is signed and Spark's % keeps the
        # sign, which would silently double the salt space
        salt = F.pmod(
            F.xxhash64(F.col(id_col)), F.lit(files_per_partition)
        ).alias("__salt")
        out = df.repartition(*(parts + [salt]))
    elif parts:
        out = df.repartition(*parts)
    else:
        # unpartitioned layout: keep the incoming task parallelism
        # (files = tasks, each capped by max_records_per_file)
        out = df
    if sort_within:
        out = out.sortWithinPartitions(
            *[F.col(c) for c in (list(partition_by) + list(sort_within))]
        )
    if file_format not in ("parquet", "orc"):
        raise ValueError(
            f"write_partitioned_corpus: unsupported format {file_format!r} "
            "(parquet and orc are the natively-shipped columnar formats)"
        )
    writer = out.write.mode(mode)
    if dynamic_overwrite:
        # scope the overwrite to the partitions present in df (per-write
        # option, not session conf, so concurrent writers keep their own
        # semantics)
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).format(file_format).save(path)


def read_corpus(
    spark: SparkSession, path: str, *, file_format: str = "parquet"
) -> DataFrame:
    """Read a partitioned corpus (partition columns come back typed as
    written by partition discovery)."""
    return spark.read.format(file_format).load(path)


def compact_corpus(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
    id_col: str = "doc_id",
    file_format: str = "parquet",
) -> int:
    """Rewrite a fragmented corpus with file counts sized from its
    ACTUAL on-disk bytes -- the small-files fix every long-lived
    100 TB corpus eventually needs (each incremental ingest appends a
    few files; a thousand ingests later every scan pays a thousand
    file-open round trips and the NameNode/listing layer groans).

    The file budget comes from measured compressed bytes, not row
    counts: n_files = ceil(total_bytes / target_file_bytes), floored
    at one file per output partition. Rows are routed with the same
    deterministic hash-salt as write_partitioned_corpus (task-retry
    idempotent), and within-file sort is reapplied so the rewrite
    RESTORES row-group pruning rather than destroying it.

    Returns the file budget used. The budget applies PER OUTPUT
    PARTITION (write_partitioned_corpus semantics): for the common
    unpartitioned compaction it is the global file count; when
    ``partition_by`` is set, size ``target_file_bytes`` for the
    per-directory share. Listing cost is one driver-side directory
    walk of file SIZES (no data read; swap os.walk for the Hadoop
    FileSystem listing on an object store); the rewrite itself is one
    exchange of the corpus -- the price of fixing layout once instead
    of paying it on every later scan.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith((".parquet", ".orc")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = read_corpus(spark, src, file_format=file_format)
    write_partitioned_corpus(
        df,
        dst,
        partition_by=partition_by,
        sort_within=sort_within,
        files_per_partition=n_files,
        id_col=id_col,
        file_format=file_format,
        exact_files=True,
    )
    return n_files


def overwrite_partitions(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str],
    sort_within: Sequence[str] = ("doc_id",),
    files_per_partition: int = 1,
    id_col: str = "doc_id",
    max_records_per_file: int | None = None,
    file_format: str = "parquet",
) -> None:
    """Idempotent partition backfill: rewrite ONLY the Hive partitions
    present in ``df``, leaving every other directory untouched -- the
    re-run semantics an incremental ingest needs (reprocessing one
    day/dump must not truncate the table, which is exactly what a
    plain mode=overwrite does).

    A thin wrapper over :func:`write_partitioned_corpus` with dynamic
    partition-overwrite: same layout levers, same format validation,
    and the SAME default within-file sort -- a default-args backfill
    must not silently replace sorted partitions with unsorted files
    and destroy their row-group pruning. Re-running the same input is
    a no-op rewrite of the same directories (deterministic salt
    routing).
    """
    if not partition_by:
        raise ValueError(
            "overwrite_partitions requires partition_by: without "
            "partition directories there is nothing to scope the "
            "overwrite to (use write_partitioned_corpus for full "
            "rewrites)"
        )
    write_partitioned_corpus(
        df,
        path,
        partition_by=partition_by,
        sort_within=sort_within,
        files_per_partition=files_per_partition,
        id_col=id_col,
        max_records_per_file=max_records_per_file,
        mode="overwrite",
        file_format=file_format,
        dynamic_overwrite=True,
    )
