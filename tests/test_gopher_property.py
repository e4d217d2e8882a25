"""Property test: gopher_rules (operators/text.py) vs an independent
pure-Python reference over randomized texts covering every rule's
trigger alphabet (bullets, ellipses, hashes, numerics, stop words,
newlines, leading whitespace). One Spark job per hypothesis example
would be seconds each, so each example is a BATCH of texts."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from flink_ad_analytics_spark.operators.text import (
    GOPHER_STOPWORDS,
    gopher_rules,
)

_WORDS = [
    "the", "a", "of", "to", "and", "table", "scan", "value", "#",
    "...", "-", "*", "•", "word", "supercalifragilistic", "42",
    "7", "x1", "...", "end...",
]

_token = st.sampled_from(_WORDS)
_line = st.builds(
    lambda lead, toks: lead + " ".join(toks),
    st.sampled_from(["", " ", "  "]),
    st.lists(_token, min_size=1, max_size=12),
)
_text = st.builds("\n".join, st.lists(_line, min_size=1, max_size=6))


def _ref(text: str) -> dict:
    """Independent reimplementation of every gopher_rules metric."""
    ws = re.split(r"\s+", text.strip())
    lns = text.split("\n")
    n_words = len(ws)
    n_chars = len(re.sub(r"\s", "", text))
    n_alpha = sum(1 for w in ws if re.search("[A-Za-z]", w))
    n_stop = sum(1 for s in GOPHER_STOPWORDS if s in ws)
    n_symbols = text.count("#") + (
        (len(text) - len(text.replace("...", ""))) // 3
    )
    n_bullet = sum(1 for l in lns if re.search(r"^\s*[-*•]", l))
    n_ell = sum(1 for l in lns if re.search(r"\.\.\.\s*$", l))
    n_lines = len(lns)
    return {
        "rule_word_count": 50 <= n_words <= 100_000,
        "rule_mean_word_len": 3 * n_words <= n_chars <= 10 * n_words,
        "rule_symbol_ratio": 10 * n_symbols <= n_words,
        "rule_bullet_lines": 10 * n_bullet < 9 * n_lines,
        "rule_ellipsis_lines": 10 * n_ell < 3 * n_lines,
        "rule_alpha_words": 5 * n_alpha >= 4 * n_words,
        "rule_stopwords": n_stop >= 2,
        "n_words": n_words,
        "n_stop_hits": n_stop,
        "n_symbols": n_symbols,
    }


@settings(max_examples=8, deadline=None)
@given(st.lists(_text, min_size=1, max_size=40))
def test_gopher_rules_match_python_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    for i, text in enumerate(texts):
        exp = _ref(text)
        for k, v in exp.items():
            assert got[i][k] == v, (k, repr(text), got[i][k], v)
        keep = all(v for k, v in exp.items() if k.startswith("rule_"))
        assert got[i]["gopher_keep"] == keep, repr(text)
