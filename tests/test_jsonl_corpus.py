"""JSONL corpus reader (sources/batch.py::load_jsonl_corpus): lenient
line parsing, malformed drop, required-field filter, full pipeline
compatibility (dedup over a JSONL ingest)."""

from __future__ import annotations

from pyspark.sql import types as T

from flink_ad_analytics_spark.operators.dedup import exact_dedup
from flink_ad_analytics_spark.sources.batch import load_jsonl_corpus

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _write(tmp_path):
    lines = [
        '{"doc_id": 0, "text": "alpha beta gamma", "lang": "en"}',
        '{"doc_id": 1, "text": "delta epsilon", "lang": "en"}',
        'not json at all',
        '{"doc_id": 2, "lang": "de"}',                      # no text field
        '{"doc_id": 3, "text": "alpha beta gamma", "lang": "en"}',  # dup of 0
        '{"doc_id": 4, "text": "zeta", "lang": "fr", "extra": 1}',  # extra ok
        '{"doc_id": 5, "text": "broken',                    # truncated
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_lenient_parse_and_required_field(spark, tmp_path):
    path = _write(tmp_path)
    docs = load_jsonl_corpus(spark, path, SCHEMA, required_col="text")
    got = {r.doc_id for r in docs.collect()}
    assert got == {0, 1, 3, 4}, "malformed + text-less lines dropped"
    # without the required-field filter the metadata-only line survives
    loose = load_jsonl_corpus(spark, path, SCHEMA)
    assert {r.doc_id for r in loose.collect()} == {0, 1, 2, 3, 4}


def test_jsonl_feeds_the_dedup_pipeline(spark, tmp_path):
    docs = load_jsonl_corpus(
        spark, _write(tmp_path), SCHEMA, required_col="text"
    )
    keepers = {r.keeper_doc_id for r in exact_dedup(docs).collect()}
    assert keepers == {0, 1, 4}, "JSONL ingest flows into dedup; dup 3 collapsed"


def test_count_action_works_on_default_path(spark, tmp_path):
    """Regression: the corrupt-record-column approach crashed a plain
    .count() (QUERY_ONLY_CORRUPT_RECORD_COLUMN under pruning); the
    text+from_json shape must survive any action."""
    docs = load_jsonl_corpus(spark, _write(tmp_path), SCHEMA)
    assert docs.count() == 5
