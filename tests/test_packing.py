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


def test_token_budget_shards_bounds_and_determinism(spark):
    from flink_ad_analytics_spark.operators.packing import (
        token_budget_shards,
    )

    rows = [
        (i, "s0", " ".join(["w"] * (5 + (i * 17) % 50))) for i in range(200)
    ]
    budget = 300
    out = token_budget_shards(
        _docs(spark, rows), seed=7, shard_token_budget=budget
    ).collect()
    assert len(out) == 200
    by_pos = sorted(out, key=lambda r: r.global_pos)
    # global_pos is a 1..N permutation and tokens_before is its exact
    # running sum in key order
    assert [r.global_pos for r in by_pos] == list(range(1, 201))
    assert [r.shuffle_key for r in by_pos] == sorted(r.shuffle_key for r in out)
    run = 0
    for r in by_pos:
        assert r.tokens_before == run
        assert r.shard_id == run // budget
        run += r.doc_tokens
    # budget bounds: every shard's token span covers [k*budget, ...)
    # and holds < budget + its last doc (docs are never split)
    by_shard: dict[int, list] = {}
    for r in by_pos:
        by_shard.setdefault(r.shard_id, []).append(r)
    n_shards = max(by_shard) + 1
    assert sorted(by_shard) == list(range(n_shards))
    for k, members in by_shard.items():
        tot = sum(m.doc_tokens for m in members)
        if k < n_shards - 1:
            assert tot >= budget - (members[0].tokens_before - k * budget)
        assert members[0].tokens_before < (k + 1) * budget
    # same seed -> bit-identical assignment; different seed -> a
    # different permutation
    again = token_budget_shards(
        _docs(spark, rows), seed=7, shard_token_budget=budget
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    other = token_budget_shards(
        _docs(spark, rows), seed=8, shard_token_budget=budget
    ).collect()
    assert [r.doc_id for r in sorted(other, key=lambda r: r.global_pos)] != [
        r.doc_id for r in by_pos
    ]


def test_write_token_budget_shards_replays_global_order(spark, tmp_path):
    from flink_ad_analytics_spark.operators.packing import (
        token_budget_shards,
        write_token_budget_shards,
    )

    rows = [
        (i, "s0", " ".join(["w"] * (5 + (i * 31) % 40))) for i in range(150)
    ]
    plan = token_budget_shards(
        _docs(spark, rows), seed=3, shard_token_budget=250
    )
    expected = [
        (r.shard_id, r.global_pos, r.doc_id)
        for r in sorted(plan.collect(), key=lambda r: r.global_pos)
    ]
    out = str(tmp_path / "shards")
    write_token_budget_shards(plan, out)
    # reading shard dirs in shard order, rows in file order, replays
    # exactly the seed-determined global training order
    import glob

    replayed = []
    for k in sorted(
        int(p.rsplit("=", 1)[1]) for p in glob.glob(f"{out}/shard_id=*")
    ):
        pdf = spark.read.parquet(f"{out}/shard_id={k}").toPandas()
        replayed += [(k, int(p), int(d))
                     for p, d in zip(pdf.global_pos, pdf.doc_id)]
    assert replayed == expected


def test_token_budget_shards_matches_pandas_oracle_property(spark):
    """Property test: on random corpora (random sizes, ids with gaps,
    budgets), the distributed prefix-sum output equals a trivial
    single-threaded pandas replay of the same definition."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_ad_analytics_spark.operators.packing import (
        token_budget_shards,
    )

    corpus_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc_id (gappy)
            st.integers(min_value=1, max_value=60),      # n tokens
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
        ],
    )
    @given(corpus=corpus_st, seed=st.integers(0, 50),
           budget=st.integers(50, 500))
    def check(corpus, seed, budget):
        rows = [(i, "s", " ".join(["w"] * n)) for i, n in corpus]
        got = sorted(
            (
                (r.doc_id, r.shuffle_key, r.global_pos, r.doc_tokens,
                 r.tokens_before, r.shard_id)
                for r in token_budget_shards(
                    _docs(spark, rows), seed=seed, shard_token_budget=budget
                ).collect()
            ),
            key=lambda t: t[2],
        )
        # single-threaded replay of the definition
        ref = sorted(
            (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i, n)
            for i, n in corpus
        )
        run, exp = 0, []
        for pos, (key, i, n) in enumerate(ref, start=1):
            exp.append((i, key, pos, n, run, run // budget))
            run += n
        assert got == exp

    check()


def test_token_budget_mix_selection_rules(spark):
    from flink_ad_analytics_spark.operators.packing import token_budget_mix

    rows = []
    for i in range(40):
        rows.append((i, "a" if i % 2 else "b", " ".join(["w"] * 10)))
    rows.append((100, "c", "ten tokens " * 5))  # group not in budgets
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, lang STRING, text STRING"
    )
    out = token_budget_mix(
        docs, {"a": 95, "b": 10_000}, seed=7, group_col="lang"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r)
    # group not in budgets dropped entirely
    assert set(by) == {"a", "b"}
    # b's budget exceeds its total -> every doc kept
    assert len(by["b"]) == 20
    # a: 10-token docs, budget 95 -> greedy prefix keeps 10 docs (the
    # 10th starts at tokens_before=90 < 95 and straddles the boundary)
    a = sorted(by["a"], key=lambda r: r.group_pos)
    assert len(a) == 10
    assert [r.group_pos for r in a] == list(range(1, 11))
    assert [r.tokens_before for r in a] == [10 * i for i in range(10)]
    # order follows the seeded md5 key
    assert [r.mix_key for r in a] == sorted(r.mix_key for r in a)

    # empty budgets: a clear ValueError, not an opaque analyzer error
    # from isin() with zero args / create_map with no pairs (ADVICE r5)
    import pytest

    with pytest.raises(ValueError, match="budgets must be non-empty"):
        token_budget_mix(docs, {}, group_col="lang")
