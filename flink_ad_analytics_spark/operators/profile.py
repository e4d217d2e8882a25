"""Standing profile index: mergeable per-shard table statistics.

The 100 TB form of `q_table_profile`: instead of re-scanning the
corpus per profile request, maintain ONE ROW PER INGEST SHARD carrying
per-column mergeable statistics -- binary DataSketches HLL sketches
for distinct counts plus the trivially mergeable stats (row count /
null count / typed min / typed max). Then:

* serving a full-table profile = one aggregate over the index rows
  (``hll_union_agg`` + sums + min/max), no corpus rescan;
* ingesting a new shard = sketch only the new rows, append one row;
* exact distinct counts are NOT mergeable without the sketch -- the
  exact plan re-pays a full scan + distinct exchanges per refresh.

Batch measurement: tools/table_profile_shard_merge.py (sf10: serve
0.42s = 6.6x vs exact recompute, 675 KB index for 15M rows, merged
estimates within 1.41% of exact). Streaming maintenance:
streaming/jobs.py::streaming_profile_index appends one index row per
micro-batch via foreachBatch -- the same batch/streaming duality
contract as the events-family rollups.

The typed sketch inputs match q_table_profile_approx exactly
(queries.py::_sketch_input): longs feed directly, 2dp money as exact
cents, timestamps as unix_micros -- order-preserving, so the SAME
typed value serves both the sketch and min/max, rendered to the
canonical string only at serve time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: lgConfigK for every profile sketch -- must be uniform across index
#: rows so hll_union_agg merges losslessly (same as
#: q_table_profile_approx).
PROFILE_LG_K = 14


def _typed_input(col: str, kind: str) -> F.Column:
    from ..queries import _cents

    if kind == "int":
        return F.col(col)
    if kind == "num":
        return _cents(col).cast("long")
    if kind == "ts":
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col).cast("string")


def profile_index_aggs(cols: tuple) -> list:
    """The per-shard aggregate list: n_rows plus, per (col, kind),
    null count / binary HLL sketch / typed min / typed max."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, kind in cols:
        x = _typed_input(col, kind)
        aggs += [
            F.sum(F.col(col).isNull().cast("long")).alias(f"{col}__nulls"),
            F.hll_sketch_agg(x, F.lit(PROFILE_LG_K)).alias(
                f"{col}__sketch"
            ),
            F.min(x).alias(f"{col}__min"),
            F.max(x).alias(f"{col}__max"),
        ]
    return aggs


def build_profile_index(
    df: DataFrame,
    cols: tuple,
    *,
    n_shards: int,
    shard_key: str,
    namespace: str = "batch",
) -> DataFrame:
    """Batch build: one index row per hash shard of ``shard_key``.

    ``__shard`` is a NAMESPACED string (``{namespace}/{i}``) so that
    index rows from different producers -- two batch builds, or a
    batch build unioned with the streaming-maintained index (whose
    namespace is the streaming query's checkpoint lineage id) -- can
    never collide on shard id. ``profile_from_index`` loud-fails on a
    collision instead of silently dropping rows (ADVICE r10).
    """
    return df.groupBy(
        F.concat_ws(
            "/",
            F.lit(namespace),
            F.pmod(F.xxhash64(shard_key), F.lit(n_shards)).cast("string"),
        ).alias("__shard")
    ).agg(*profile_index_aggs(cols))


def profile_from_index(idx: DataFrame, cols: tuple) -> DataFrame:
    """Serve the full-table profile from index rows alone: merge the
    sketches (union), sum the counts, fold min/max. Output schema
    matches q_table_profile / q_table_profile_approx (col_name,
    n_nulls, n_distinct, min_repr, max_repr + n_rows), with
    n_distinct the merged HLL estimate."""
    from ..queries import _profile_repr_spark

    def _render(c: F.Column, kind: str) -> F.Column:
        if kind == "num":
            return F.format_string("%.2f", c.cast("double") / 100)
        if kind == "ts":
            return F.date_format(
                F.timestamp_micros(c), "yyyy-MM-dd HH:mm:ss"
            )
        return _profile_repr_spark(c, kind)

    shard_guarded = "__shard" in idx.columns
    if shard_guarded:
        # Replay idempotence (streaming_profile_index's at-least-once
        # foreachBatch): a retried batch re-appends a row with the
        # same shard id and IDENTICAL deterministic stats (n_rows,
        # nulls, typed min/max) -- but the binary HLL sketch bytes
        # need NOT be identical (DataSketches LIST/SET-mode coupon
        # order follows insertion/partial-merge order, which varies
        # with task scheduling; ADVICE r11). So dedup on the
        # DETERMINISTIC columns only, keeping whichever row's sketch
        # survives -- any legit replay's sketch summarizes the same
        # rows, so the merged estimate is unaffected. Deduping on
        # __shard alone would silently discard real data when two
        # producers collide on a shard id (e.g. a batch index using
        # hash shards 0..n-1 unioned with a streaming index whose
        # batch ids also start at 0, or a stream restarted from a
        # reset checkpoint) -- instead the serve aggregate below
        # counts rows vs distinct shard ids and raises in-plan on any
        # shard id carrying two rows with DIFFERENT deterministic
        # stats (ADVICE r10). Shard ids are namespaced by producer
        # precisely so this guard never fires in correct use.
        det_cols = [c for c in idx.columns if not c.endswith("__sketch")]
        idx = idx.dropDuplicates(det_cols)
    aggs = [F.sum("n_rows").alias("n_rows")]
    if shard_guarded:
        aggs += [
            F.count(F.lit(1)).alias("__n_index_rows"),
            F.count_distinct("__shard").alias("__n_shard_ids"),
        ]
    for col, kind in cols:
        aggs += [
            F.sum(f"{col}__nulls").alias(f"{col}__nulls"),
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col(f"{col}__sketch"), F.lit(False))
            ).alias(f"{col}__distinct"),
            _render(F.min(f"{col}__min"), kind).alias(f"{col}__min"),
            _render(F.max(f"{col}__max"), kind).alias(f"{col}__max"),
        ]
    wide = idx.agg(*aggs)
    stack = ", ".join(
        f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col, _ in cols
    )
    n_rows_col: F.Column = F.col("n_rows")
    if shard_guarded:
        # in-plan loud-fail (zero extra jobs -- the serve aggregate is
        # one row): after deterministic-column dedup, rows > distinct
        # shard ids means some shard id carries two DIFFERENT stat
        # rows -- a producer-namespace collision that would
        # undercount.
        n_rows_col = F.when(
            F.col("__n_index_rows") == F.col("__n_shard_ids"),
            F.col("n_rows"),
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "profile index shard-id collision: %s index rows over"
                    " %s distinct shard ids after deterministic-stat dedup --"
                    " producers must use distinct __shard namespaces"
                    " (build_profile_index(namespace=...) /"
                    " streaming checkpoint lineage)",
                    F.col("__n_index_rows").cast("string"),
                    F.col("__n_shard_ids").cast("string"),
                )
            ).cast("long")
        )
    return wide.select(
        n_rows_col.alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(col_name, n_nulls, n_distinct, min_repr, max_repr)"
        ),
    ).orderBy("col_name")
