"""Sliding-window repeated-substring dedup (operators/dedup.py::
window_dedup): keep-first-occurrence semantics on planted boilerplate,
within-doc repeats, and short-doc edges."""

from __future__ import annotations

import hashlib

from flink_ad_analytics_spark.operators.dedup import window_dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_keep_first_occurrence_cross_doc(spark):
    boiler = _words("b", 6)  # 6 shared tokens, window 4
    d1 = f"{_words('x', 3)} {boiler}"  # doc 1: unique + boilerplate
    d2 = f"{_words('y', 3)} {boiler}"  # doc 2: unique + same boilerplate
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in window_dedup(df, window_tokens=4).collect()}
    # doc 1 holds the first occurrence of every shared window -> intact
    assert out[1].n_removed_tokens == 0
    assert out[1].clean_md5 == _md5(d1)
    # doc 2: windows fully inside the boilerplate ([s..s+3] within the
    # 6 shared trailing tokens at positions 3..8: starts 3,4,5) repeat;
    # straddling windows contain unique y-tokens and do not. Trimmed
    # region = union of the repeated windows' coverage = positions 3..8.
    assert out[2].n_dup_occurrences == 3
    assert out[2].n_removed_tokens == 6
    assert out[2].clean_md5 == _md5(_words("y", 3))
    assert out[2].clean_tokens == 3


def test_within_doc_repeat_trimmed(spark):
    seg = _words("r", 4)
    text = f"{seg} {_words('m', 4)} {seg}"  # repeat 4-gram inside one doc
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    r = window_dedup(df, window_tokens=4).collect()[0]
    assert r.n_dup_occurrences == 1  # second occurrence of the r-window
    assert r.n_removed_tokens == 4
    assert r.clean_md5 == _md5(f"{seg} {_words('m', 4)}")


def test_short_doc_no_windows(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    rows = window_dedup(df, window_tokens=4).collect()
    assert all(r.n_windows == 0 and r.n_removed_tokens == 0 for r in rows)
    assert all(r.clean_md5 == _md5("a b c") for r in rows)


def test_long_repeat_fully_covered(spark):
    """A repeat of length >= 2W-1 is fully covered by repeated
    windows (the operator's documented guarantee)."""
    W = 4
    rep = _words("z", 2 * W - 1)  # length 7 >= 2*4-1
    d1 = rep
    d2 = f"{_words('u', 2)} {rep} {_words('v', 2)}"
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in window_dedup(df, window_tokens=W).collect()}
    assert out[1].n_removed_tokens == 0  # first occurrence kept
    assert out[2].n_removed_tokens == len(rep.split())
    assert out[2].clean_md5 == _md5(f"{_words('u', 2)} {_words('v', 2)}")
