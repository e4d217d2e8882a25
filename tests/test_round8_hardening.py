"""Targeted tests for the round-7 hardening branches (VERDICT r7 #4/#5):
fitstore's TOCTOU / tmp-cleanup / algo-version paths, content_stamp's
errno contract, the zero-token fertility group, and _coloc_derived's
atomic build + re-register DDL path."""

from __future__ import annotations

import errno
import os
import shutil
import uuid

import pytest

from flink_ad_analytics_spark import fitstore
from flink_ad_analytics_spark.sources.batch import content_stamp


def _warehouse(spark) -> str:
    return spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")


def _mk_corpus(spark, tmp_path, rows=20):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, float(i)) for i in range(rows)], "id long, v double"
    ).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    return sf


# -- fitstore.persisted_fit ---------------------------------------------------


def test_persisted_fit_toctou_serves_concurrent_winner(
    spark, tmp_path, monkeypatch
):
    """A concurrent session completing its atomic rename between the
    outer _SUCCESS check and the clear must be SERVED, never deleted:
    simulate the race by making the first _SUCCESS probe miss (the
    outer check sees 'incomplete') while the artifact on disk is in
    fact complete -- the inner re-check must catch it."""
    sf = _mk_corpus(spark, tmp_path)
    # seed a complete artifact exactly where persisted_fit will look
    import hashlib

    stamp = content_stamp(os.path.join(sf, "embeddings.parquet"))
    params = ("toctou",)
    tag = hashlib.md5(
        f"v{fitstore.FIT_ALGO_VERSION}|{sf}|{stamp}|tk|{params}".encode()
    ).hexdigest()[:10]
    loc = os.path.join(_warehouse(spark), f"fit_tk_{tag}")
    anchor = spark.range(1)
    spark.createDataFrame([(42,)], "winner int").write.mode(
        "overwrite"
    ).parquet(loc)
    success = os.path.join(loc, "_SUCCESS")
    assert os.path.exists(success)

    real_exists = os.path.exists
    state = {"misses": 1}

    def racy_exists(p):
        if os.path.abspath(str(p)) == os.path.abspath(success) and state[
            "misses"
        ]:
            state["misses"] -= 1
            return False  # outer check: artifact looks incomplete
        return real_exists(p)

    monkeypatch.setattr(fitstore.os.path, "exists", racy_exists)

    def never_fit():
        raise AssertionError("fit_fn ran over a completed artifact")

    out = fitstore.persisted_fit(anchor, sf, "tk", params, never_fit)
    assert [r.winner for r in out.collect()] == [42]
    assert real_exists(success)  # never rmtree'd


def test_persisted_fit_failed_fit_leaves_no_tmp(spark, tmp_path):
    """A fit_fn that raises must propagate AND leave no uuid temp dir
    (or half-written final dir) behind in the warehouse."""
    sf = _mk_corpus(spark, tmp_path)
    anchor = spark.range(1)
    kind = f"tfail{uuid.uuid4().hex[:6]}"

    with pytest.raises(RuntimeError, match="boom"):
        fitstore.persisted_fit(
            anchor,
            sf,
            kind,
            ("p",),
            lambda: (_ for _ in ()).throw(RuntimeError("boom")),
        )
    leftovers = [
        d
        for d in os.listdir(_warehouse(spark))
        if d.startswith(f"fit_{kind}_")
    ]
    assert leftovers == [], leftovers


def test_persisted_fit_algo_version_bump_refits(spark, tmp_path, monkeypatch):
    """Bumping FIT_ALGO_VERSION must re-run fit_fn under a NEW tag and
    leave the old artifact untouched (no in-place mutation a reader of
    the old tag could observe)."""
    sf = _mk_corpus(spark, tmp_path)
    anchor = spark.range(1)
    calls = {"n": 0}
    kind = f"tver{uuid.uuid4().hex[:6]}"

    def fit():
        calls["n"] += 1
        return spark.createDataFrame([(calls["n"],)], "fitted int")

    out1 = fitstore.persisted_fit(anchor, sf, kind, ("p",), fit)
    assert calls["n"] == 1 and out1.collect()[0].fitted == 1
    # same version: served from the warehouse, no re-fit
    out2 = fitstore.persisted_fit(anchor, sf, kind, ("p",), fit)
    assert calls["n"] == 1 and out2.collect()[0].fitted == 1
    old_dirs = {
        d
        for d in os.listdir(_warehouse(spark))
        if d.startswith(f"fit_{kind}_")
    }
    assert len(old_dirs) == 1

    monkeypatch.setattr(fitstore, "FIT_ALGO_VERSION", 999_998)
    out3 = fitstore.persisted_fit(anchor, sf, kind, ("p",), fit)
    assert calls["n"] == 2 and out3.collect()[0].fitted == 2
    new_dirs = {
        d
        for d in os.listdir(_warehouse(spark))
        if d.startswith(f"fit_{kind}_")
    }
    assert old_dirs < new_dirs and len(new_dirs) == 2
    # the old artifact still serves its original value
    old_loc = os.path.join(_warehouse(spark), next(iter(old_dirs)))
    assert spark.read.parquet(old_loc).collect()[0].fitted == 1


# -- content_stamp errno contract ---------------------------------------------


def test_content_stamp_missing_raises_file_not_found(tmp_path):
    with pytest.raises(FileNotFoundError, match="cannot stat corpus"):
        content_stamp(str(tmp_path / "nope.parquet"))


def test_content_stamp_preserves_non_enoent_errno(tmp_path, monkeypatch):
    """ADVICE r7: EACCES (or any non-ENOENT OSError) must keep its
    real class, not be relabeled 'file not found'."""
    p = tmp_path / "corpus.parquet"
    p.write_bytes(b"x")

    real_stat = os.stat

    def denied(path, *a, **kw):
        if str(path) == str(p):
            raise PermissionError(errno.EACCES, "denied", str(path))
        return real_stat(path, *a, **kw)

    monkeypatch.setattr(os, "stat", denied)
    with pytest.raises(PermissionError):
        content_stamp(str(p))


# -- zero-token fertility group -----------------------------------------------


def test_tokenizer_fertility_all_empty_group_null_ratios(spark, tmp_path):
    """An all-empty (lang, source) group must yield NULL ratios on the
    Spark side AND on the DuckDB oracle (the NULLIF twin), not 0/0 ->
    NaN/error divergence."""
    import duckdb

    from flink_ad_analytics_spark.queries_pipeline import (
        TOKENIZER_FERTILITY_SQL,
        q_tokenizer_fertility,
    )

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [
            ("en", "web", "hello world"),
            ("en", "web", "three token doc"),
            ("xx", "blank", ""),
            ("xx", "blank", "   "),
        ],
        "lang string, source string, text string",
    ).write.parquet(f"{sf}/documents.parquet")

    got = {
        (r.lang, r.source): r
        for r in q_tokenizer_fertility(spark, sf).collect()
    }
    blank = got[("xx", "blank")]
    assert blank.n_tokens == 0
    assert blank.bytes_per_token is None
    assert blank.chars_per_token is None
    en = got[("en", "web")]
    assert en.n_tokens == 5 and en.bytes_per_token is not None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    odf = con.execute(TOKENIZER_FERTILITY_SQL).fetchdf()
    orow = odf[(odf.lang == "xx") & (odf.source == "blank")].iloc[0]
    import math

    assert orow.n_tokens == 0
    assert math.isnan(orow.bytes_per_token)  # pandas NULL -> NaN
    assert math.isnan(orow.chars_per_token)


# -- _coloc_derived: atomic build + re-register path ---------------------------


def _derived_fixture(spark, tmp_path, rows=60):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, i % 5) for i in range(rows)], "o_orderkey long, grp long"
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    return sf


def test_coloc_derived_reregister_and_version_bump(spark, tmp_path):
    """New-session re-registration (VERDICT r7 #5): with the catalog
    entry gone but a complete _SUCCESS directory surviving, the CREATE
    TABLE ... CLUSTERED BY/SORTED BY DDL path must re-register the
    files WITHOUT re-running the build, the scan must still be
    bucketed, and a _DERIVED_LAYOUT_VERSION bump must rebuild."""
    import flink_ad_analytics_spark.queries as qmod

    sf = _derived_fixture(spark, tmp_path)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return (
            spark.read.parquet(f"{sf}/orders.parquet")
            .selectExpr("o_orderkey", "grp * 10 as derived")
        )

    t1 = qmod._coloc_derived(
        spark, sf, "t8drv", "o_orderkey", ["orders"], build,
        sort_col="o_orderkey",
    )
    assert t1.count() == 60 and calls["n"] == 1

    # locate the table this fixture minted
    wh = _warehouse(spark)
    tables = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("coloc_t8drv_")
    ]
    assert len(tables) == 1
    table = tables[0]
    loc = os.path.join(wh, table)
    assert os.path.exists(os.path.join(loc, "_SUCCESS"))
    # no build temp leftovers in the warehouse or the catalog
    assert not [d for d in os.listdir(wh) if "__build_" in d]
    assert not [
        t.name for t in spark.catalog.listTables() if "__build_" in t.name
    ]

    # simulate a NEW SESSION: catalog forgets, files persist. DROP
    # TABLE would delete managed files -- but this table is registered
    # via CREATE ... LOCATION (external), so dropping keeps the files.
    spark.sql(f"DROP TABLE {table}")
    assert os.path.exists(os.path.join(loc, "_SUCCESS"))

    t2 = qmod._coloc_derived(
        spark, sf, "t8drv", "o_orderkey", ["orders"], build,
        sort_col="o_orderkey",
    )
    assert t2.count() == 60
    assert calls["n"] == 1, "re-register path must not rebuild"
    # re-registered schema comes from the files on disk
    assert dict(t2.dtypes)["derived"] == "bigint"
    # the re-registered table still bucket-scans (self-join: 0 exchange)
    j = t2.alias("a").join(
        t2.alias("b").hint("shuffle_hash"), "o_orderkey"
    )
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan, plan[:2000]

    # version bump: new tag, rebuild, old files untouched
    orig_v = qmod._DERIVED_LAYOUT_VERSION
    qmod._DERIVED_LAYOUT_VERSION = orig_v + 1_000
    try:
        t3 = qmod._coloc_derived(
            spark, sf, "t8drv", "o_orderkey", ["orders"], build,
            sort_col="o_orderkey",
        )
        assert calls["n"] == 2 and t3.count() == 60
        assert os.path.exists(os.path.join(loc, "_SUCCESS"))
    finally:
        qmod._DERIVED_LAYOUT_VERSION = orig_v


def test_coloc_derived_failed_build_cleans_up(spark, tmp_path):
    """A build_fn that raises must propagate, leave no __build_ temp
    dir or catalog entry, and not register the final table."""
    import flink_ad_analytics_spark.queries as qmod

    sf = _derived_fixture(spark, tmp_path)
    name = f"t8bad{uuid.uuid4().hex[:6]}"

    def bad_build():
        raise RuntimeError("derive-boom")

    with pytest.raises(RuntimeError, match="derive-boom"):
        qmod._coloc_derived(
            spark, sf, name, "o_orderkey", ["orders"], bad_build
        )
    wh = _warehouse(spark)
    assert not [d for d in os.listdir(wh) if d.startswith(f"coloc_{name}_")]
    assert not [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(f"coloc_{name}_")
    ]


def test_coloc_derived_markerless_leftover_rebuilt(spark, tmp_path):
    """A killed mid-write directory (no _SUCCESS) must be cleared and
    rebuilt, never re-registered (stale-garbage guard)."""
    import hashlib

    import flink_ad_analytics_spark.queries as qmod

    sf = _derived_fixture(spark, tmp_path)
    stamps = content_stamp(os.path.join(sf, "orders.parquet"))
    tag = hashlib.md5(
        f"v{qmod._DERIVED_LAYOUT_VERSION}|{sf}|{stamps}|o_orderkey".encode()
    ).hexdigest()[:10]
    loc = os.path.join(_warehouse(spark), f"coloc_t8part_{tag}")
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "part-garbage"), "w") as f:
        f.write("not parquet")

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(f"{sf}/orders.parquet")

    t = qmod._coloc_derived(
        spark, sf, "t8part", "o_orderkey", ["orders"], build
    )
    assert calls["n"] == 1 and t.count() == 60
    assert os.path.exists(os.path.join(loc, "_SUCCESS"))
    assert not os.path.exists(os.path.join(loc, "part-garbage"))


# -- overload contracts ---------------------------------------------------------


def test_market_share_from_partial_inputs_raise(spark):
    from flink_ad_analytics_spark.queries import _market_share_from

    li = spark.range(1).selectExpr("id as l_orderkey")
    with pytest.raises(TypeError, match="orders_f"):
        _market_share_from(li, orders=spark.range(1))


def test_volume_shipping_from_partial_inputs_raise(spark):
    from flink_ad_analytics_spark.queries import _volume_shipping_from

    li = spark.range(1).selectExpr("id as l_orderkey")
    with pytest.raises(TypeError, match="orders_f"):
        _volume_shipping_from(li, supp=spark.range(1))
