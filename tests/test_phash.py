"""Perceptual near-dup (operators/multimodal.py): true perceptual
locality on synthetic pixel grids, pigeonhole recall, exact-dup
payloads via the fake decoder, strict-mean bit semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.multimodal import (
    PHASH_BITS,
    ahash_signatures,
    assets_from_documents,
    decode_pixels,
    phash_pairs,
)


def _pixels_df(spark, rows):
    return spark.createDataFrame(rows, "asset_id long, pixels array<int>")


def test_perturbed_grid_found_distinct_grid_not(spark):
    """A grid with a few flipped pixels keeps a small Hamming distance
    and is found through the bands (pigeonhole: < n_bands flips always
    leave one band intact); an unrelated grid is far."""
    base = [10 * ((i * 7) % 13) for i in range(PHASH_BITS)]
    # sum-preserving perturbation: push one dark pixel above the mean
    # and one bright pixel below it, so the grid mean (and thus every
    # OTHER pixel's bit) is untouched -- exactly 2 bits flip
    near = list(base)
    lo = base.index(0)
    hi = base.index(120)
    near[lo], near[hi] = 120, 0
    far = [10 * ((i * 11) % 17) for i in range(PHASH_BITS)]
    sigs = ahash_signatures(
        _pixels_df(spark, [(0, base), (1, near), (2, far)])
    )
    got = {
        (r.asset_id_1, r.asset_id_2): r.hamming
        for r in phash_pairs(sigs, n_bands=6, max_hamming=5).collect()
    }
    assert got.get((0, 1)) == 2, got
    assert (0, 2) not in got and (1, 2) not in got


def test_identical_payloads_hamming_zero(spark):
    docs = spark.createDataFrame(
        [(0, "same payload bytes", "en", "s", 18),
         (1, "same payload bytes", "en", "s", 18),
         (2, "different payload", "en", "s", 17)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sigs = ahash_signatures(
        decode_pixels(assets_from_documents(docs), fake=True)
    )
    pairs = {
        (r.asset_id_1, r.asset_id_2): r.hamming
        for r in phash_pairs(sigs, n_bands=6).collect()
    }
    assert pairs.get((0, 1)) == 0, pairs


def test_strict_mean_bit(spark):
    """pixel * n > total is STRICT: an all-equal grid (every pixel at
    the mean) hashes to 0, not all-ones -- the documented tie rule."""
    flat = [(0, [7] * PHASH_BITS)]
    sig = ahash_signatures(_pixels_df(spark, flat)).collect()[0].phash
    assert sig == 0


def test_bad_band_count_raises(spark):
    sigs = ahash_signatures(_pixels_df(spark, [(0, [1] * PHASH_BITS)]))
    with pytest.raises(ValueError, match="divide"):
        phash_pairs(sigs, n_bands=7)


def test_decode_without_fake_raises(spark):
    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    px = decode_pixels(assets_from_documents(docs))
    with pytest.raises(Exception, match="NotImplementedError|image librar"):
        px.collect()
