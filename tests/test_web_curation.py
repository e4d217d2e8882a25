"""URL canonicalization + domain curation (operators/web.py): crafted
edge-case rows for every canonicalization rule, cap boundary
semantics, and the reputation gate's exact-integer thresholds."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.web import (
    canonicalize_url,
    domain_caps,
    domain_reputation,
    with_synth_url,
)


def _canon(spark, url: str) -> dict:
    df = spark.createDataFrame([(url,)], "raw_url string")
    return canonicalize_url(df).collect()[0].asDict()


def test_canonicalize_rules(spark):
    # fragment + default https port + www + tracking params + slash
    r = _canon(
        spark,
        "HTTPS://WWW.News.Example.COM:443/a/b/?gclid=9&z=1&utm_medium=m#frag",
    )
    assert r["canon_url"] == "https://news.example.com/a/b?z=1"
    assert r["url_host"] == "www.news.example.com"
    assert r["url_domain"] == "news.example.com"
    assert r["url_path"] == "/a/b"

    # http default port dropped; non-default kept; params sorted
    assert (
        _canon(spark, "http://h.example.com:80/x?b=2&a=1")["canon_url"]
        == "http://h.example.com/x?a=1&b=2"
    )
    assert (
        _canon(spark, "http://h.example.com:8080/x")["canon_url"]
        == "http://h.example.com:8080/x"
    )
    # cross-scheme default port is NOT dropped
    assert (
        _canon(spark, "http://h.example.com:443/x")["canon_url"]
        == "http://h.example.com:443/x"
    )

    # all params tracking -> no '?' at all; fbclid and ref covered
    assert (
        _canon(spark, "https://h.example.com/p?ref=tw&fbclid=abc")["canon_url"]
        == "https://h.example.com/p"
    )

    # no query, no port, no fragment: only case + slash normalization
    assert (
        _canon(spark, "HTTP://A.B.Example.com/Q/")["canon_url"]
        == "http://a.b.example.com/Q"  # path case is preserved
    )


def test_synth_url_is_deterministic_and_messy(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    urls = [r.raw_url for r in with_synth_url(docs).orderBy("doc_id").collect()]
    assert urls == [
        r.raw_url for r in with_synth_url(docs).orderBy("doc_id").collect()
    ]
    # every variation axis is actually exercised
    assert any("HTTPS://WWW." in u for u in urls)
    assert any(":8080" in u for u in urls)
    assert any(":443" in u for u in urls)
    assert any("#section-2" in u for u in urls)
    assert any("utm_source" in u for u in urls)
    assert any("&ref=rss" in u for u in urls)


def test_canonicalization_collapses_host_variants(spark):
    """The point of the operator: raw hosts are 4-way ambiguous per
    source, canonical domains are exactly one per source."""
    docs = spark.createDataFrame(
        [(i, f"src{i % 5}") for i in range(100)], "doc_id long, source string"
    )
    out = canonicalize_url(with_synth_url(docs))
    n_raw_hosts = out.select(
        F.regexp_extract("raw_url", "^[^:]+://([^/:?]+)", 1)
    ).distinct().count()
    n_domains = out.select("url_domain").distinct().count()
    assert n_domains == 5
    assert n_raw_hosts > n_domains  # www/case variants existed


def test_domain_caps_boundary(spark):
    docs = spark.createDataFrame(
        [(i, "d.com", 100 + (i % 4)) for i in range(7)]
        + [(100 + i, "e.com", 50) for i in range(2)],
        "doc_id long, url_domain string, n_chars long",
    )
    out = domain_caps(docs, cap=5).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r.url_domain, []).append(r)
    assert sum(r.kept for r in by_dom["d.com"]) == 5  # capped
    assert sum(r.kept for r in by_dom["e.com"]) == 2  # under cap
    # rank 1 = longest doc, ties by doc_id: doc 3 (103 chars) wins
    top = [r for r in by_dom["d.com"] if r.domain_rank == 1][0]
    assert top.doc_id == 3


def test_domain_reputation_thresholds(spark):
    rows = (
        # good: 5 docs, 2 quality (40% >= 30%)
        [(i, "good.com", 250 if i < 2 else 10, "t") for i in range(5)]
        # low quality: 10 docs, 2 quality (20% < 30%)
        + [(10 + i, "lowq.com", 250 if i < 2 else 10, "t") for i in range(10)]
        # tiny: 4 docs all quality, but < 5 docs
        + [(30 + i, "tiny.com", 999, "t") for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, url_domain string, n_chars long, text string"
    )
    rep = {r.url_domain: r for r in domain_reputation(docs).collect()}
    assert rep["good.com"].rep_keep and rep["good.com"].n_docs_admitted == 5
    assert not rep["lowq.com"].rep_keep and rep["lowq.com"].n_docs_admitted == 0
    assert not rep["tiny.com"].rep_keep
    # exact boundary: 3 of 10 quality == exactly 30% -> keep
    edge = spark.createDataFrame(
        [(i, "edge.com", 250 if i < 3 else 10, "t") for i in range(10)],
        "doc_id long, url_domain string, n_chars long, text string",
    )
    assert domain_reputation(edge).collect()[0].rep_keep


def test_url_dedup_collapses_raw_variants(spark):
    from flink_ad_analytics_spark.operators.web import url_dedup

    rows = [
        (1, "HTTPS://WWW.A.Example.com:443/p?utm_x=1"),
        (2, "https://a.example.com/p"),           # same canonical as 1
        (3, "https://a.example.com/p/#frag"),     # same canonical as 1
        (4, "https://a.example.com/q"),           # distinct
    ]
    docs = spark.createDataFrame(rows, "doc_id long, raw_url string")
    from flink_ad_analytics_spark.operators.web import canonicalize_url

    out = {r.canon_url: r for r in url_dedup(canonicalize_url(docs)).collect()}
    grp = out["https://a.example.com/p"]
    assert grp.n_docs == 3 and grp.keeper_doc_id == 1
    assert grp.n_raw_variants == 3
    assert out["https://a.example.com/q"].n_docs == 1


def test_domain_blocklist_suffix_semantics(spark):
    from flink_ad_analytics_spark.operators.web import (
        domain_blocklist_filter,
    )

    docs = spark.createDataFrame(
        [
            (1, "bad.example.com"),
            (2, "a.b.bad.example.com"),   # subdomain of a blocked entry
            (3, "notbad.example.com"),    # suffix must respect label
                                          # boundaries: NOT blocked
            (4, "good.example.org"),
            (5, "bad.example.com.evil.net"),  # blocked name as a NON-
                                              # suffix infix: not blocked
        ],
        "doc_id long, url_domain string",
    )
    bl = spark.createDataFrame(
        [("bad.example.com",)], "blocked_domain string"
    )
    got = {
        r.doc_id: r.blocked
        for r in domain_blocklist_filter(docs, bl).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False}


def test_canonicalize_is_idempotent_on_fixture_corpus(spark):
    """Canonical URLs are FIXED POINTS of the canonicalizer: feeding
    canon_url back in as raw_url must return it unchanged, over the
    full messy fixture synthesis (both variants). A canonicalizer
    without this property silently splits URL-dedup groups depending
    on how many normalization passes a pipeline happened to run."""
    from flink_ad_analytics_spark.operators.web import (
        synth_url_colliding_expr,
    )

    for expr in (None, synth_url_colliding_expr()):
        docs = spark.createDataFrame(
            [(i, f"src{i % 7}") for i in range(200)],
            "doc_id long, source string",
        )
        if expr is None:
            first = canonicalize_url(with_synth_url(docs))
        else:
            first = canonicalize_url(
                docs.withColumn("raw_url", F.expr(expr))
            )
        again = canonicalize_url(
            first.select("doc_id", F.col("canon_url").alias("raw_url"))
        )
        diff = (
            first.select("doc_id", "canon_url")
            .join(
                again.select("doc_id", F.col("canon_url").alias("c2")),
                "doc_id",
            )
            .filter(F.col("canon_url") != F.col("c2"))
        )
        assert diff.count() == 0, diff.limit(3).collect()
