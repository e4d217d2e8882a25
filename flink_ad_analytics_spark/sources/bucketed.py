"""Bucketed tables: shuffle-free co-located joins for repeated
large-x-large joins on a stable key.

At 100 TB the dominant cost of orders<->lineitem-shaped joins is the
exchange of both sides on the key, re-paid by every query. Bucketing
pre-partitions the STORED data into a fixed number of hash buckets on
the join key (Spark: ``DataFrameWriter.bucketBy`` + ``saveAsTable``;
files carry bucket ids, the catalog carries the spec). A join of two
tables bucketed on the same key with the same bucket count needs NO
exchange on either side -- SortMergeJoin reads co-located buckets
directly. That converts an O(data) network shuffle per query into a
one-time write-side cost.

Spark specifics encoded here:
* bucketed tables must be saved via the catalog (``saveAsTable``);
  plain ``.parquet(path)`` writes ignore bucketBy.
* both sides must have the SAME bucket count (or a divisor, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) on the SAME
  key, and ``spark.sql.sources.bucketing.enabled`` (default true).
* one file per bucket per task: write with a pre-shuffle
  ``repartition(n_buckets, key)`` so each task holds exactly one
  bucket's rows -- otherwise every task writes a file per bucket
  (tasks x buckets small files).

Proof of the no-shuffle property: tests/test_plan_quality.py asserts
the joined plan of two co-bucketed tables contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save ``df`` as a catalog table bucketed on ``bucket_col``.

    ``sort_col`` additionally sorts within buckets (lets SortMergeJoin
    skip its sort for sort-key joins). The pre-repartition keeps the
    file count at one per bucket instead of tasks-x-buckets.

    ``path`` makes the table EXTERNAL at that location -- used by the
    atomic derived-layout build (queries.py::_coloc_derived): write to
    a private temp dir, os.rename into the final location, then drop
    the temp catalog entry (external drop never deletes files).
    """
    out = df.repartition(n_buckets, df[bucket_col])
    writer = out.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (bucket spec comes from the
    catalog; the scan reports outputPartitioning = hash(bucket_col))."""
    return spark.table(table)
