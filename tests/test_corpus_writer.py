"""Partitioned-corpus write layout: directory structure, file-count
control, within-file sort (row-group range index), partition pruning
at read, and round-trip parity."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_ad_analytics_spark.sources.batch import load_table
from flink_ad_analytics_spark.sources.corpus_writer import (
    read_corpus,
    write_partitioned_corpus,
)
from tests.conftest import SF_CORRECT


def _data_files(path):
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.basename(f) != "_SUCCESS"
    ]


def test_layout_file_count_and_sort(spark, tmp_path):
    docs = load_table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(
        docs, out, partition_by=("lang",), sort_within=("doc_id",),
        files_per_partition=2,
    )
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    for lang in langs:
        files = _data_files(os.path.join(out, f"lang={lang}"))
        assert 1 <= len(files) <= 2, (lang, files)
        for f in files:
            ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            assert ids == sorted(ids), f"{f} not sorted within file"


def test_roundtrip_parity(spark, tmp_path):
    docs = load_table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, out)
    back = read_corpus(spark, out)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    assert a == b


def test_partition_pruning_at_read(spark, tmp_path):
    docs = load_table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, out)
    df = read_corpus(spark, out).filter(F.col("lang") == "en")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    assert re.search(r"PartitionFilters:.*lang#\d+ = en", plan), plan
    # the en filter must not appear as a data filter (it's directory-level)
    n_en = docs.filter("lang = 'en'").count()
    assert df.count() == n_en


def test_max_records_per_file(spark, tmp_path):
    docs = load_table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(
        docs, out, partition_by=(), sort_within=("doc_id",),
        max_records_per_file=100, id_col="doc_id", files_per_partition=1,
    )
    files = _data_files(out)
    assert files
    for f in files:
        assert pq.read_metadata(f).num_rows <= 100
