"""Behavioral tests for the corpus-curation operators (decontamination,
PII redaction, quantization) -- properties the oracle-parity hash gate
can't express, like "the planted contamination is actually gone"."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.dedup import decontaminate, ngram_set
from flink_ad_analytics_spark.operators.similarity import quantize_int8
from flink_ad_analytics_spark.operators.text import PII_PATTERNS, redact_pii
from flink_ad_analytics_spark.sources.batch import load_table
from tests.conftest import SF_CORRECT


def test_decontaminate_removes_exact_overlap(spark):
    """A doc sharing an 8-gram with the benchmark must be dropped; a
    doc sharing nothing must survive."""
    docs = load_table(spark, SF_CORRECT, "documents").limit(50)
    # benchmark = doc 0's text verbatim under a new id
    bench = docs.filter("doc_id = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    clean = decontaminate(docs, bench, n=8)
    ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert 0 not in ids, "verbatim-contaminated doc survived"
    # docs sharing no 8-gram with doc 0 must all survive
    g0 = {
        r.gram
        for r in ngram_set(docs.filter("doc_id = 0"), 8).collect()
    }
    overlapping = {
        r.doc_id
        for r in ngram_set(docs, 8).filter(F.col("gram").isin(g0)).collect()
    }
    expected = {r.doc_id for r in docs.collect()} - overlapping
    assert ids == expected


def test_decontaminate_no_false_positives_on_disjoint_corpora(spark):
    docs = load_table(spark, SF_CORRECT, "documents").limit(30)
    bench = spark.createDataFrame(
        [(999999, "completely unrelated zzz qqq " + "xyzzy " * 10, "en", "x", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert decontaminate(docs, bench, n=8).count() == 30


def test_redacted_text_has_no_remaining_matches(spark):
    docs = load_table(spark, SF_CORRECT, "documents").limit(40)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" a@b.io 555-123-4567 10.0.0.255 c.d@e.org end"),
        ).alias("text"),
    )
    red = redact_pii(planted)
    for name, pat in PII_PATTERNS.items():
        leftover = red.filter(
            F.regexp_count("redacted", F.lit(pat)) > 0
        ).count()
        assert leftover == 0, f"{name} spans survived redaction"
    counts = red.agg(
        F.min("n_email"), F.min("n_phone"), F.min("n_ipv4")
    ).first()
    assert counts[0] >= 2 and counts[1] >= 1 and counts[2] >= 1


def test_quantization_roundtrip_error_bound(spark):
    """Dequantized values must sit within half a quantization step."""
    emb = load_table(spark, SF_CORRECT, "embeddings").limit(100)
    q = quantize_int8(emb)
    joined = emb.join(q, "vec_id").select(
        "vec_id",
        F.expr(
            "aggregate(zip_with(embedding, split(q_csv, ','), "
            "(x, qi) -> abs(CAST(x AS DOUBLE) - CAST(qi AS DOUBLE) "
            "* scale / 127.0D)), CAST(0.0 AS DOUBLE), "
            "(acc, e) -> greatest(acc, e))"
        ).alias("max_err"),
        (F.col("scale") / 127.0 * 0.5 + 1e-12).alias("bound"),
    )
    assert joined.filter(F.col("max_err") > F.col("bound")).count() == 0


def test_quantization_saturates_at_127(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings").limit(100)
    q = quantize_int8(emb)
    mx = q.select(
        F.max(
            F.expr(
                "array_max(transform(split(q_csv, ','), "
                "x -> abs(CAST(x AS BIGINT))))"
            )
        )
    ).first()[0]
    assert mx == 127  # the max-|x| component maps exactly to +/-127


def test_quantized_topk_recall_vs_exact(spark):
    from flink_ad_analytics_spark.operators.similarity import (
        cosine_topk,
        quantized_topk,
    )

    emb = load_table(spark, SF_CORRECT, "embeddings")
    qf = F.col("vec_id") < 20
    exact = {
        (r.q_id, r.c_id)
        for r in cosine_topk(emb, query_filter=qf, k=10).collect()
    }
    quant = {
        (r.q_id, r.c_id)
        for r in quantized_topk(emb, query_filter=qf, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.95, f"int8 recall {recall}"


def test_bigram_logprob_flags_improbable_docs(spark):
    """A doc stitched from across-the-corpus rare transitions must
    score below a doc made of the corpus's most common bigram."""
    from pyspark.sql import functions as F

    from flink_ad_analytics_spark.operators.text import bigram_logprob
    from flink_ad_analytics_spark.sources.batch import load_table
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    # most frequent bigram in the corpus
    bg = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(split(trim(text), '\\\\s+'))-2),"
                " i -> struct(split(trim(text), '\\\\s+')[i] AS w1,"
                "             split(trim(text), '\\\\s+')[i+1] AS w2))"
            )
        ).alias("b")
    )
    top = bg.groupBy("b.w1", "b.w2").count().orderBy(F.col("count").desc()).first()
    likely_text = " ".join([top["w1"], top["w2"]] * 10)
    # reversed top bigram ~ much rarer transition
    unlikely_text = " ".join([top["w2"], top["w1"]] * 10)
    extra = spark.createDataFrame(
        [(900001, likely_text), (900002, unlikely_text)], ["doc_id", "text"]
    )
    corpus = docs.select("doc_id", "text").union(extra)
    scores = {
        r["doc_id"]: r["avg_lp"]
        for r in bigram_logprob(corpus).filter(F.col("doc_id") > 900000).collect()
    }
    assert scores[900001] > scores[900002]


# -- BPE tokenizer induction ----------------------------------------------


def test_bpe_learns_classic_merges(spark):
    """Sennrich's toy corpus shape: 'low' x5 + 'lower' x2 + 'newest'
    x6 + 'widest' x3. The first merges must fuse the most frequent
    adjacent pairs ('es' at 9, then 'est' at 9, then 'est</w>')."""
    from flink_ad_analytics_spark.operators.text import bpe_fit

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_fit(docs, n_merges=3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")


def test_bpe_segment_compresses_monotonically(spark):
    """More merges -> fewer symbols, never more; 0 merges = chars+1
    per word."""
    from flink_ad_analytics_spark.operators.text import bpe_fit, bpe_segment

    text = " ".join(["sharing"] * 4 + ["shared"] * 4 + ["caring"] * 4)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    base = bpe_segment(docs, []).collect()[0]
    assert base.n_words == 12
    assert base.n_symbols == sum(len(w) + 1 for w in text.split())
    prev = base.n_symbols
    merges = bpe_fit(docs, n_merges=6)
    assert len(merges) >= 3
    for k in (2, len(merges)):
        n = bpe_segment(docs, merges[:k]).collect()[0].n_symbols
        assert n < prev or k == 0
        prev = n


def test_bpe_merge_fold_handles_overlaps(spark):
    """'aaaa' with merge (a,a): greedy left-to-right gives [aa, aa,
    </w>], not [aa, a, a, </w>] or a crash."""
    from flink_ad_analytics_spark.operators.text import (
        _apply_merge,
        bpe_symbolize,
    )

    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    out = _apply_merge(bpe_symbolize(docs), "a", "a").collect()
    assert list(out[0].symbols) == ["aa", "aa", "</w>"]


def test_bpe_oracle_replays_fit_on_overlap_corpus(spark):
    """The DuckDB recursive oracle's wrapped-symbol replace() must
    replay bpe_fit exactly on a corpus ENGINEERED to stress the greedy
    apply: odd self-overlap runs ('aaa', 'aaaaa'), a merge whose
    output immediately re-pairs, and ties broken lexicographically."""
    import duckdb
    import pandas as pd

    from flink_ad_analytics_spark.operators.text import bpe_fit
    from flink_ad_analytics_spark.queries_pipeline import BPE_VOCAB_SQL

    rows = [
        (1, "aaa aaa aaaaa bcbc bcbc"),
        (2, "aaa bc bc xy xy xy"),
        (3, "aaaaa xy aaa bcbc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_fit(docs, n_merges=8)
    got = [(i, l, r, l + r) for i, (l, r) in enumerate(merges)]

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = [tuple(r) for r in con.execute(BPE_VOCAB_SQL).fetchall()]
    assert got == exp and len(got) >= 4

    # the APPLY oracle (final recursion state as the segmentation) must
    # also replay bpe_segment on the same stress corpus
    from flink_ad_analytics_spark.operators.text import bpe_segment
    from flink_ad_analytics_spark.queries_pipeline import BPE_SEGMENT_SQL

    seg = {
        (r.doc_id, r.n_words, r.n_symbols)
        for r in bpe_segment(docs, merges).collect()
    }
    seg_exp = {tuple(r) for r in con.execute(BPE_SEGMENT_SQL).fetchall()}
    assert seg == seg_exp


def test_corpus_has_no_bpe_oracle_separator():
    """chr(30) is the oracle's symbol-wrapping separator; it must not
    occur in the documents corpus at any test SF (the Spark side works
    on arrays and is immune -- only the oracle encodes)."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        n = duckdb.connect().execute(
            f"SELECT count(*) FROM '/root/testdata/sf{sf}/documents.parquet' "
            "WHERE contains(text, chr(30))"
        ).fetchone()[0]
        assert n == 0, f"sf{sf}: {n} docs contain chr(30)"


def test_bm25_rare_term_outranks_common(spark):
    """IDF dominance: a doc matching a corpus-rare query term must
    outrank a doc matching (equally often) a term every doc contains;
    longer docs score lower at equal tf (length normalization)."""
    rows = [
        (1, "common rare"),          # rare term, short doc
        (2, "common rare filler filler filler filler"),  # rare, long
        (3, "common common"),        # only the ubiquitous term
        (4, "common filler"),
    ] + [(i, "common filler") for i in range(5, 25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from flink_ad_analytics_spark.operators.text import bm25_topk

    out = bm25_topk(docs, ("rare", "common"), k=4).collect()
    ranked = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    # both rare-matching docs above every common-only doc
    assert set(ranked[:2]) == {1, 2}
    # length normalization: the short rare doc beats the long one
    assert ranked[0] == 1
    scores = {r.doc_id: r.bm25 for r in out}
    assert scores[1] > scores[2] > scores[3]
    assert all(r.rank <= 4 for r in out) and len(out) == 4


def test_gopher_rules_line_and_symbol_paths(spark):
    """The driver fixture is single-line symbol-free prose, so the
    bullet/ellipsis/symbol rules are constant there; this exercises
    them on crafted rows (the oracle gate covers the mixed-outcome
    word-count/mean-length/stopword rules on the fixture)."""
    from flink_ad_analytics_spark.operators.text import gopher_rules

    rows = [
        # 9 of 10 lines bullet-initial (0.9 -> NOT < 0.9: fail)
        (1, "\n".join(["- item"] * 9 + ["plain closing line"])),
        # 8 of 10 bullet-initial (0.8 < 0.9: pass)
        (2, "\n".join(["* item"] * 8 + ["plain one", "plain two"])),
        # 3 of 10 lines ellipsis-terminal (0.3 -> NOT < 0.3: fail)
        (3, "\n".join(["trails off..."] * 3 + ["plain line"] * 7)),
        # 2 of 10 ellipsis-terminal (0.2 < 0.3: pass)
        (4, "\n".join(["trails off..."] * 2 + ["plain line"] * 8)),
        # 2 symbols ('#' + '...') over 20 words = 0.1 (pass, boundary)
        (5, "# start " + "word " * 17 + "end..."),
        # 3 symbols over 20 words > 0.1 (fail)
        (6, "# a # " + "word " * 16 + "end..."),
        # every word numeric: alpha fraction 0 (fail)
        (7, " ".join(str(i) for i in range(60))),
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert not out[1]["rule_bullet_lines"]
    assert out[2]["rule_bullet_lines"]
    assert not out[3]["rule_ellipsis_lines"]
    assert out[4]["rule_ellipsis_lines"]
    assert out[5]["rule_symbol_ratio"] and out[5]["n_symbols"] == 2
    assert not out[6]["rule_symbol_ratio"] and out[6]["n_symbols"] == 3
    assert not out[7]["rule_alpha_words"]
    assert not any(r["gopher_keep"] for r in out.values())


def test_semantic_decontaminate_contract(spark):
    """Operator-level gates for semantic_decontaminate: threshold
    boundary is inclusive, ties break to the smaller eval id, empty
    eval side yields an empty typed frame, and the bounded-collect
    cap fails loudly (the eval side is the broadcast side)."""
    import pytest

    from flink_ad_analytics_spark.operators.similarity import (
        semantic_decontaminate,
    )
    from pyspark.sql import functions as F

    # lattice-friendly vectors (scale 1000): dims 0/1 carry the signal
    def vec(a, b):
        return [a, b] + [0.0] * 62

    rows = [
        (7, vec(1.0, 0.0)),    # eval A
        (14, vec(1.0, 0.0)),   # eval B -- same vector: forces a tie
        (1, vec(1.0, 0.0)),    # train: dot 1e6 with BOTH evals -> tie
        (2, vec(0.3, 0.0)),    # train: dot exactly 300000 (inclusive)
        (3, vec(0.29, 0.0)),   # train: dot 290000 (below)
        (4, vec(0.0, 1.0)),    # train: dot 0
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    is_eval = F.col("vec_id").isin(7, 14)
    out = {
        r.vec_id: (r.eval_id, r.dot)
        for r in semantic_decontaminate(
            emb, is_eval, threshold=300_000
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1] == (7, 1_000_000)  # tie -> smaller eval id
    assert out[2] == (7, 300_000)    # inclusive boundary

    # empty eval side: empty typed result, no job failure
    none_eval = semantic_decontaminate(
        emb, F.col("vec_id") < 0, threshold=1
    )
    assert none_eval.count() == 0
    assert [f.name for f in none_eval.schema.fields] == [
        "vec_id", "eval_id", "dot",
    ]

    # cap: a too-large eval side must fail loudly before broadcast
    with pytest.raises(ValueError, match="max_eval"):
        semantic_decontaminate(
            emb, F.lit(True), threshold=1, max_eval=3
        )


def test_shingle_novelty_paths_equal(spark):
    """The r12 skew-split path (broadcast-anti hot vocabulary + cold-
    only SMJ + arithmetic n_boiler) must be value-identical to the
    annotate join on a mixed corpus, and the auto selector must keep
    the declared-query corpus on the annotate path (max_df far below
    the measured crossover pin)."""
    from flink_ad_analytics_spark.operators.text import (
        _NOVELTY_SPLIT_MIN_DF,
        _novelty_df_probe,
        shingle_novelty,
    )
    from flink_ad_analytics_spark.operators.dedup import doc_shingles

    boiler = "common one two three four"
    rows = [(i, f"{boiler} tail{i}a tail{i}b") for i in range(25)]
    rows.append((100, "totally unique words only here now"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def key(df):
        return sorted(
            (
                r["doc_id"],
                r["n_shingles"],
                r["n_novel"],
                r["n_boiler"],
                round(r["novelty"], 9),
                round(r["boilerplate"], 9),
            )
            for r in df.collect()
        )

    annotate = key(shingle_novelty(docs, skew_split=False))
    split = key(shingle_novelty(docs, skew_split=True))
    auto = key(shingle_novelty(docs))
    assert annotate == split == auto
    assert len(annotate) == 26

    # selector routing: this corpus's hottest shingle (df=25) is far
    # under the pinned crossover, so auto must take the annotate path
    sh = doc_shingles(docs, "doc_id", "text")
    posting = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    df_tbl = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    max_df, vocab = _novelty_df_probe(df_tbl, 10)
    assert max_df == 25 and max_df < _NOVELTY_SPLIT_MIN_DF


def test_shingle_novelty_planted_boilerplate(spark):
    """Semantic pin for shingle_novelty: docs sharing a >=10-doc
    boilerplate run score boilerplate > 0 and novelty < 1 on exactly
    the shared shingles; a fully unique doc scores novelty 1.0 /
    boilerplate 0.0; a <3-token doc is absent (no shingles)."""
    from flink_ad_analytics_spark.operators.text import shingle_novelty

    boiler = "common one two three four"  # 3 boilerplate shingles
    rows = [(i, f"{boiler} tail{i}a tail{i}b") for i in range(10)]
    rows.append((100, "totally unique words only here now"))
    rows.append((101, "xy"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in shingle_novelty(docs).collect()}

    assert 101 not in out
    u = out[100]
    assert u["novelty"] == 1.0 and u["boilerplate"] == 0.0
    for i in range(10):
        r = out[i]
        # 7 tokens -> 5 shingles: 3 shared by all 10 docs (df=10),
        # 2 involve the per-doc tail (df=1)
        assert r["n_shingles"] == 5
        assert r["n_boiler"] == 3 and r["n_novel"] == 2
        assert r["boilerplate"] == 0.6 and r["novelty"] == 0.4
