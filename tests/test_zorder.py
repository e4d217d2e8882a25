"""Z-order layout: a Morton-keyed sort must yield parquet file stats
that prune point queries in BOTH dimensions, where a single-column
sort prunes only its own column. Measured from the actual parquet
footers -- the same min/max stats Spark's scan uses to skip."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.functions.layout import zorder_key

N_FILES = 32
DOMAIN = 1 << 16


@pytest.fixture(scope="module")
def points(spark):
    return spark.range(200_000).select(
        F.pmod(F.xxhash64("id"), F.lit(DOMAIN)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(DOMAIN)).alias("y"),
    )


def _file_ranges(directory, col):
    out = []
    for f in os.listdir(directory):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(directory, f)).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def _skip_fraction(ranges, probes):
    skipped = sum(
        sum(1 for lo, hi in ranges if not (lo <= p <= hi))
        for p in probes
    )
    return skipped / (len(ranges) * len(probes))


def test_zorder_prunes_both_dims_single_sort_does_not(spark, points, tmp_path):
    zdir, xdir = str(tmp_path / "byz"), str(tmp_path / "byx")
    withz = points.withColumn("z", zorder_key("x", "y"))
    withz.repartitionByRange(N_FILES, "z").sortWithinPartitions("z").write.parquet(zdir)
    withz.repartitionByRange(N_FILES, "x").sortWithinPartitions("x").write.parquet(xdir)

    probes = [1000, 17000, 33000, 49000, 64000]
    z_skip_x = _skip_fraction(_file_ranges(zdir, "x"), probes)
    z_skip_y = _skip_fraction(_file_ranges(zdir, "y"), probes)
    x_skip_x = _skip_fraction(_file_ranges(xdir, "x"), probes)
    x_skip_y = _skip_fraction(_file_ranges(xdir, "y"), probes)

    # single-column sort: near-perfect on its own column, blind on the other
    assert x_skip_x > 0.9
    assert x_skip_y < 0.1
    # z-order: substantial pruning on BOTH
    assert z_skip_x > 0.5, z_skip_x
    assert z_skip_y > 0.5, z_skip_y


def test_zorder_key_is_a_bijection_on_the_grid(spark):
    """Interleaving must be collision-free: distinct (x, y) pairs give
    distinct keys (checked on a 256x256 exhaustive grid)."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    n = grid.select(zorder_key("x", "y", bits=8).alias("z")).distinct().count()
    assert n == 256 * 256
