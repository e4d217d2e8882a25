"""Partitioned-corpus write layout: directory structure, file-count
control, within-file sort (row-group range index), partition pruning
at read, and round-trip parity."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
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


def test_sorted_layout_makes_row_groups_skippable(spark, tmp_path):
    """The zone-map claim behind sort_within: with multi-row-group
    files, sorting the sort column clusters its values so row-group
    min/max stats become a range index -- a point/range predicate can
    skip almost every group, where the same data written unsorted has
    every group's [min, max] spanning the whole domain (nothing
    skippable). Measured directly on the parquet footers, which is
    what every engine's row-group pruning reads."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    # ~64 KB row groups so each file holds many groups
    hconf.setInt("parquet.block.size", 64 * 1024)
    try:
        df = spark.range(200_000).select(
            F.col("id").alias("doc_id"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("v"),
        )
        sorted_path = str(tmp_path / "sorted")
        unsorted_path = str(tmp_path / "unsorted")
        write_partitioned_corpus(
            df, sorted_path, partition_by=(), sort_within=("v",),
        )
        write_partitioned_corpus(
            df, unsorted_path, partition_by=(), sort_within=(),
        )
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    def group_ranges(path):
        out = []
        for f in _data_files(path):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("v")
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                out.append((st.min, st.max))
        return out

    def skippable_fraction(ranges, probe):
        hit = sum(1 for lo, hi in ranges if lo <= probe <= hi)
        return 1 - hit / len(ranges)

    sorted_rg = group_ranges(sorted_path)
    unsorted_rg = group_ranges(unsorted_path)
    assert len(sorted_rg) >= 8, "need multi-row-group files to prove anything"
    probe = 500_000  # mid-domain point predicate
    assert skippable_fraction(sorted_rg, probe) >= 0.8
    assert skippable_fraction(unsorted_rg, probe) <= 0.2


def test_orc_roundtrip_and_pruning(spark, tmp_path):
    """ORC leg of the same layout levers: identical round-trip values,
    directory partition pruning in the ORC scan, and sorted files."""
    docs = load_table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "orc_corpus")
    write_partitioned_corpus(
        docs, out, partition_by=("lang",), sort_within=("doc_id",),
        file_format="orc",
    )
    orc_files = glob.glob(os.path.join(out, "**", "*.orc"), recursive=True)
    assert orc_files, "no .orc data files written"
    back = read_corpus(spark, out, file_format="orc")
    a = {tuple(r) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    assert a == b
    df = back.filter(F.col("lang") == "en")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    assert re.search(r"PartitionFilters:.*lang#\d+ = en", plan), plan
    assert df.count() == docs.filter("lang = 'en'").count()


def test_orc_rejects_unknown_format(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    import pytest

    with pytest.raises(ValueError, match="unsupported format"):
        write_partitioned_corpus(docs, "/tmp/never", file_format="avro")


def test_compact_corpus_reduces_files_and_preserves_content(spark, tmp_path):
    """Fragmented write (1 file per task x no repartition) -> compact
    -> file count collapses to the byte-sized budget, values and the
    within-file sort survive."""
    from flink_ad_analytics_spark.sources.corpus_writer import compact_corpus

    docs = load_table(spark, SF_CORRECT, "documents")
    frag = str(tmp_path / "fragmented")
    # force fragmentation: many tiny files
    docs.repartition(40).write.parquet(frag)
    n_frag = len(_data_files(frag))
    assert n_frag >= 30
    out = str(tmp_path / "compacted")
    total = sum(os.path.getsize(f) for f in _data_files(frag))
    budget = compact_corpus(
        spark, frag, out,
        target_file_bytes=(total // 2) + 1,  # expect a 2-file budget
        sort_within=("doc_id",),
    )
    assert budget == 2
    files = _data_files(out)
    assert len(files) <= 2
    back = read_corpus(spark, out)
    a = {tuple(r) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    assert a == b
    for f in files:
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids), f"{f} lost its sort"


def test_compact_to_single_file_budget(spark, tmp_path):
    """The flagship small-files case: many fragments, budget computes
    to ONE file -- the output must actually be one file, not one per
    scan task (the silent-claim bug the exact_files branch fixes)."""
    from flink_ad_analytics_spark.sources.corpus_writer import compact_corpus

    docs = load_table(spark, SF_CORRECT, "documents")
    frag = str(tmp_path / "frag1")
    docs.repartition(30).write.parquet(frag)
    assert len(_data_files(frag)) >= 25
    out = str(tmp_path / "one")
    budget = compact_corpus(spark, frag, out, target_file_bytes=10**12)
    assert budget == 1
    assert len(_data_files(out)) == 1
    assert read_corpus(spark, out).count() == docs.count()


def test_overwrite_partitions_touches_only_present_dirs(spark, tmp_path):
    """Backfill semantics: rewriting one lang's rows replaces that
    directory only; other partitions keep their exact prior files and
    rows (a plain overwrite would truncate them)."""
    from flink_ad_analytics_spark.sources.corpus_writer import (
        overwrite_partitions,
        write_partitioned_corpus,
    )

    docs = load_table(spark, SF_CORRECT, "documents")
    out = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, out, partition_by=("lang",))
    before = {
        f: os.path.getmtime(f)
        for f in _data_files(out)
        if "lang=en" not in f
    }
    n_before = read_corpus(spark, out).count()
    # backfill: en rows with text rewritten
    en_fixed = docs.filter(F.col("lang") == "en").withColumn(
        "text", F.concat(F.lit("fixed: "), F.col("text"))
    )
    overwrite_partitions(en_fixed, out, partition_by=("lang",))
    after = read_corpus(spark, out)
    assert after.count() == n_before
    assert after.filter("lang = 'en'").filter(
        ~F.col("text").startswith("fixed: ")
    ).count() == 0
    assert after.filter("lang != 'en'").filter(
        F.col("text").startswith("fixed: ")
    ).count() == 0
    untouched = {
        f: os.path.getmtime(f)
        for f in _data_files(out)
        if "lang=en" not in f
    }
    assert untouched == before  # other partitions' files not rewritten

    with pytest.raises(ValueError, match="requires partition_by"):
        overwrite_partitions(docs, out, partition_by=())
