from __future__ import annotations

import pytest

from flink_ad_analytics_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="fas-tests", cpus=8, shuffle_partitions=8,
                          extra_conf={"spark.ui.enabled": "false"})
    yield spark
    spark.stop()


def sorted_rows(df):
    """Column-name-sorted tuples for order-insensitive comparison."""
    cols = sorted(df.columns)
    return [tuple(r[c] for c in cols) for r in df.select(*cols).collect()], cols


def assert_df_equal(a, b, name):
    """Order-insensitive non-empty value equality of two DataFrames."""
    ra, ca = sorted_rows(a)
    rb, cb = sorted_rows(b)
    assert ca == cb, f"{name}: columns {ca} != {cb}"

    # None-safe ordering (recursively, so array columns with NULL
    # elements sort too): a column mixing None and values would make a
    # bare sorted() raise TypeError inside the assertion instead of
    # reporting the value diff. No type tag in the key -- 1 and 1.0
    # must stay in one equality class, as they were under plain sort.
    def _kv(v):
        if v is None:
            return (1, 0)
        if isinstance(v, (list, tuple)):
            return (0, tuple(_kv(x) for x in v))
        return (0, v)

    def _key(t):
        return [_kv(v) for v in t]

    assert sorted(ra, key=_key) == sorted(rb, key=_key), (
        f"{name}: values differ"
    )
    assert ra, f"{name}: empty result"
