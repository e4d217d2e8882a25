"""Multimodal stub contract: every media op must (a) run its real
Arrow/mapInPandas plumbing with the deterministic fake, and (b) fail
loudly with NotImplementedError -- not silently fake -- when asked for
real decoding in this media-lib-less container."""

from __future__ import annotations

import pytest

from flink_ad_analytics_spark.operators.multimodal import (
    assets_from_documents,
    decode_assets,
    resize_assets,
    sample_frames,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def assets(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return assets_from_documents(docs)


@pytest.mark.parametrize(
    "op", [decode_assets, resize_assets, sample_frames],
    ids=["decode", "resize", "frames"],
)
def test_real_decode_raises_not_implemented(assets, op):
    with pytest.raises(Exception) as exc_info:
        op(assets).collect()  # fake defaults to False
    # the executor wraps the python error; the contract message must
    # survive into the driver-visible exception
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_fake_paths_produce_rows(assets):
    assert decode_assets(assets, fake=True).count() > 0
    resized = resize_assets(assets, fake=True, max_side=64)
    rows = resized.collect()
    assert rows and all(max(r.width, r.height) <= 240 for r in rows)
    # anything that needed scaling tops out at exactly max_side
    scaled = [r for r in rows if max(r.width, r.height) <= 64]
    assert scaled, "some asset should scale to the 64px bound"
    frames = sample_frames(assets, fake=True)
    per_asset = frames.groupBy("asset_id").count().collect()
    assert per_asset and all(1 <= r["count"] <= 30 for r in per_asset)
