"""Chunking/packing invariants beyond the oracle gate: greedy bin
capacity, order preservation, oversized-document handling, and
lossless chunk reconstruction."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.packing import (
    chunk_documents,
    pack_sequences_greedy,
    pack_sequences_offset,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id BIGINT, source STRING, text STRING"
    )


def test_greedy_respects_capacity_and_order(spark):
    rows = [
        (i, f"s{i % 3}", " ".join(["w"] * (7 + (i * 13) % 40)))
        for i in range(60)
    ]
    out = pack_sequences_greedy(
        _docs(spark, rows), capacity=100
    ).collect()
    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r.source, r.bin_id), []).append(r)
    for (_, _), members in by_bin.items():
        if len(members) > 1:
            assert sum(m.n_tokens for m in members) <= 100
    # bin ids are monotone in doc order within each shard
    for shard in {r.source for r in out}:
        ms = sorted((r for r in out if r.source == shard),
                    key=lambda r: r.doc_id)
        bins = [r.bin_id for r in ms]
        assert bins == sorted(bins) and bins[0] == 0
        # contiguous: no skipped bin ids
        assert set(bins) == set(range(max(bins) + 1))


def test_greedy_oversized_doc_gets_own_bin(spark):
    rows = [
        (1, "s", " ".join(["a"] * 10)),
        (2, "s", " ".join(["b"] * 50)),  # > capacity
        (3, "s", " ".join(["c"] * 10)),
    ]
    out = {r.doc_id: r.bin_id for r in
           pack_sequences_greedy(_docs(spark, rows), capacity=20).collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_offset_packing_bins_by_cumsum(spark):
    rows = [(i, "s", " ".join(["w"] * 10)) for i in range(10)]
    out = {r.doc_id: r.bin_id for r in
           pack_sequences_offset(_docs(spark, rows), capacity=25).collect()}
    # cum-before: 0,10,20,...,90 -> bins 0,0,0,1,1,2,2,2,3,3
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_chunks_reconstruct_document(spark):
    text = " ".join(f"t{i}" for i in range(37))
    docs = _docs(spark, [(1, "s", text)])
    # non-overlapping chunks partition the token stream exactly
    chunks = chunk_documents(docs, chunk_tokens=10).collect()
    assert [c.n_chunk_tokens for c in
            sorted(chunks, key=lambda c: c.chunk_idx)] == [10, 10, 10, 7]
    assert sum(c.n_chunk_tokens for c in chunks) == 37
    # overlapping: one window per stride offset, each <= chunk size
    over = chunk_documents(docs, chunk_tokens=10, stride=5).collect()
    assert len(over) == 8  # offsets 0,5,...,35
    assert all(c.n_chunk_tokens <= 10 for c in over)
    starts = sorted(c.chunk_start for c in over)
    assert starts == [0, 5, 10, 15, 20, 25, 30, 35]
