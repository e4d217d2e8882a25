"""CSV corpus reader (sources/batch.py::load_csv_corpus): explicit
schema, quoted-field handling, malformed-row drop, required-field
filter, and pipeline compatibility (dedup over a CSV ingest) — the
CSV sibling of test_jsonl_corpus.py."""

from __future__ import annotations

from pyspark.sql import types as T

from flink_ad_analytics_spark.operators.dedup import exact_dedup
from flink_ad_analytics_spark.sources.batch import load_csv_corpus

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _write(tmp_path):
    lines = [
        "doc_id,text,lang",
        "0,alpha beta gamma,en",
        '1,"delta, with comma",en',          # quoted comma
        "not-a-number,broken row,xx",        # type-malformed -> dropped
        "2,,de",                             # empty text -> required filter
        "3,alpha beta gamma,en",             # dup of 0
        '4,"she said ""hi""",fr',            # escaped quotes
    ]
    p = tmp_path / "corpus.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_lenient_parse_and_filters(spark, tmp_path):
    df = load_csv_corpus(
        spark, _write(tmp_path), SCHEMA, required_col="text"
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {0, 1, 3, 4}
    assert rows[1]["text"] == "delta, with comma"
    assert rows[4]["text"] == 'she said "hi"'


def test_permissive_keeps_malformed_as_nulls(spark, tmp_path):
    df = load_csv_corpus(
        spark, _write(tmp_path), SCHEMA, drop_malformed=False
    )
    assert df.filter("doc_id IS NULL").count() >= 1  # the broken row


def test_pipeline_compatibility_dedup(spark, tmp_path):
    df = load_csv_corpus(
        spark, _write(tmp_path), SCHEMA, required_col="text"
    )
    groups = exact_dedup(df).collect()
    keepers = {r["keeper_doc_id"] for r in groups}
    assert 0 in keepers and 3 not in keepers  # duplicate text keeps min id
    assert {1, 4} <= keepers
    assert {r["keeper_doc_id"]: r["n_docs"] for r in groups}[0] == 2


def test_malformed_drop_is_projection_independent(spark, tmp_path):
    """Malformed-row membership must not depend on which columns a
    downstream query selects. Under parser-side DROPMALFORMED with
    column pruning (the Spark default), a type-malformed row is
    dropped by collect() but counted by count() and resurrected by
    select('text') -- this reader validates DECLARATIVELY (all-string
    scan + try_cast + overflow column as plan predicates), so all
    projections agree by construction."""
    p = tmp_path / "c.csv"
    p.write_text(
        "doc_id,text,lang\n"
        "1,good row,en\n"
        "not-a-number,broken row,xx\n"
        "2,another,de\n"
    )
    df = load_csv_corpus(spark, str(p), SCHEMA, required_col="text")
    assert df.count() == 2
    assert len(df.collect()) == 2
    texts = {r.text for r in df.select("text").collect()}
    assert texts == {"good row", "another"}
    langs = {r.lang for r in df.select("lang").collect()}
    assert langs == {"en", "de"}


def test_arity_contract(spark, tmp_path):
    """Over-long (shifted-field) rows dropped via the overflow column;
    short rows kept with nulls but catchable via required_col; legit
    empty fields survive."""
    p = tmp_path / "arity.csv"
    p.write_text(
        "doc_id,text,lang\n"
        "1,good,en\n"
        "2,shifted text,xx,EXTRA,EXTRA2\n"   # unescaped-delimiter shape
        "3,short-no-lang\n"
        "4,,de\n"                             # empty text: legit null
    )
    df = load_csv_corpus(spark, str(p), SCHEMA)
    rows = {r.doc_id: (r.text, r.lang) for r in df.collect()}
    assert 2 not in rows                      # over-long dropped
    assert rows[3] == ("short-no-lang", None)  # short kept with null
    assert rows[4] == (None, "de")             # empty field survives
    # presence enforced explicitly where it matters
    strict = load_csv_corpus(spark, str(p), SCHEMA, required_col="lang")
    assert {r.doc_id for r in strict.collect()} == {1, 4}
    # projection independence holds for the arity drop too
    assert df.count() == len(df.collect()) == 3
