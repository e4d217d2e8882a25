"""C4 rule battery (operators/text.py::c4_rules): crafted rows for
each line rule and page rule, mirroring the Gopher battery's
line-and-symbol path tests."""

from __future__ import annotations

import hashlib

from flink_ad_analytics_spark.operators.text import c4_rules


def _run(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_rules(df).collect()[0].asDict()


GOOD = "One two three four five six." # 6 words, terminal punct


def test_line_rules(spark):
    r = _run(
        spark,
        "\n".join(
            [
                GOOD,                       # kept
                "Too short line.",          # < 5 words -> dropped
                "No terminal punctuation here at all",   # dropped
                "Enable JavaScript to view this page.",  # dropped
                "Does it end with a question mark?",     # kept (?)
                "It ends with an exclamation mark!",     # kept (!)
            ]
        ),
    )
    assert r["n_lines"] == 6
    assert r["n_kept_lines"] == 3
    expected = "\n".join(
        [
            GOOD,
            "Does it end with a question mark?",
            "It ends with an exclamation mark!",
        ]
    )
    assert r["clean_md5"] == hashlib.md5(expected.encode()).hexdigest()
    assert r["n_sentences"] == 3 and r["rule_min_sentences"]
    assert r["c4_keep"]


def test_sentence_count_is_per_mark_within_kept_lines(spark):
    # one kept line with three sentences inside it
    r = _run(spark, "First one. Second one. And a third one here.")
    assert r["n_kept_lines"] == 1
    assert r["n_sentences"] == 3
    assert r["rule_min_sentences"] and r["c4_keep"]
    # two sentences -> below the 3-sentence page minimum
    r2 = _run(spark, "First one here. Second sentence right there.")
    assert r2["n_sentences"] == 2
    assert not r2["rule_min_sentences"] and not r2["c4_keep"]


def test_page_rules(spark):
    base = f"{GOOD} Another good sentence right here. And one more."
    assert _run(spark, base)["c4_keep"]
    r = _run(spark, base + " lorem ipsum dolor")
    assert not r["rule_no_lorem"] and not r["c4_keep"]
    r = _run(spark, base + " LOREM IPSUM")  # case-insensitive
    assert not r["rule_no_lorem"]
    r = _run(spark, base + " function() { return 1; }")
    assert not r["rule_no_brace"] and not r["c4_keep"]


def test_no_kept_lines_fails_page(spark):
    r = _run(spark, "short.\nno punct line here at all")
    assert r["n_kept_lines"] == 0
    assert r["clean_md5"] == hashlib.md5(b"").hexdigest()
    assert not r["c4_keep"]


def test_javascript_case_insensitive(spark):
    r = _run(spark, "This page needs JAVASCRIPT to work properly.")
    assert r["n_kept_lines"] == 0
