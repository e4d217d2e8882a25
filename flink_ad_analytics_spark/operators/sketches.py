"""Sketch operators: count-min heavy hitters + HLL reach.

At 100 TB, exact per-key distincts and frequencies are sometimes too
expensive to keep around; production pipelines maintain SKETCHES --
mergeable, fixed-size summaries. Spark ships HLL++ as
``approx_count_distinct``; count-min it only offers on RDDs
(``df.stat.countMinSketch`` collects to the driver), so this module
builds CMS as a DataFrame AGGREGATION -- fully distributed, mergeable
by construction, and queryable with a join:

* build: each row fans out to ``depth`` (row, bucket) pairs
  (bucket = xxhash64(key, depth_i) mod width), then a single
  groupBy(depth, bucket) count. Map-side partial aggregation caps the
  shuffle at depth x width rows PER PARTITION no matter the input
  size; the sketch itself is depth x width rows total (~4k), a
  broadcast-sized summary of any input.
* estimate: join candidate keys to the sketch on each depth's bucket
  and take MIN(count) over depths -- the classic CMS upper-bound
  estimate (est >= true always; overshoot bounded by the width).

Exactness contract: estimates are upper bounds, never undercounts --
asserted as a hard property in tests/test_sketches.py, alongside
accuracy-vs-exact agreement for both CMS and HLL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 2048


def _bucket(key_col: str, d: int, width: int) -> F.Column:
    # one independent hash per depth row: xxhash64 seeded by mixing the
    # depth index into the input (portable, no UDF)
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Count-min sketch of `key_col` frequencies: (d, bucket, cnt,
    width), at most depth x width rows. The `width` column rides along
    (constant) so `cms_estimate` can VALIDATE its probe geometry
    against the sketch's -- a silent depth/width mismatch would probe
    the wrong cells and break the never-undercount guarantee."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(key_col, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return rows.groupBy("cell.d", "cell.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn("width", F.lit(width))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Frequency estimates for each distinct key in `keys`: the min
    over depths of the sketch cells the key hashes to. The sketch side
    is broadcast (depth x width rows, fixed size).

    Keys absent from the build input estimate 0 (an empty cell means
    count 0; the LEFT join + coalesce keeps the key in the output --
    an inner join would silently drop it, and a PARTIAL cell miss
    would take the min over only non-empty cells, inflating it).
    Probe geometry is validated against the sketch's recorded
    depth/width -- a mismatch raises instead of silently breaking the
    est >= true guarantee."""
    geo = cms.agg(
        F.max("d").alias("max_d"), F.max("width").alias("w")
    ).collect()[0]
    if geo.max_d is not None and (geo.max_d != depth - 1 or geo.w != width):
        raise ValueError(
            f"cms_estimate(depth={depth}, width={width}) does not match "
            f"the sketch (depth={geo.max_d + 1}, width={geo.w})"
        )
    k = keys.select(key_col).distinct()
    probes = k.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(key_col, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.d", "cell.bucket")
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def reach_approx(
    df: DataFrame, group_col: str, key_col: str, *, rsd: float = 0.02
) -> DataFrame:
    """HLL++ distinct-count per group (Spark's approx_count_distinct;
    fixed-size mergeable registers, no distinct expand/shuffle of the
    raw keys -- THE reach aggregate at 100 TB)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(key_col, rsd).alias("approx_reach")
    )
