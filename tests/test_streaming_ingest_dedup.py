"""Streaming at-ingest exact dedup == batch exact_dedup keepers when
arrival follows id order; later-arriving duplicate content is dropped
across micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F, types as T

from flink_ad_analytics_spark.operators.dedup import exact_dedup
from flink_ad_analytics_spark.streaming.jobs import streaming_ingest_dedup

BASE = dt.datetime(2024, 1, 1)

# files carry epoch millis (parquet INT64 -- robust under the engine's
# nanosAsLong conf); the stream derives the timestamp, as the event
# sources do (S5).
SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time_ms", T.LongType()),
    ]
)


def _docs() -> list[tuple[int, str]]:
    uniq = [f"document body number {i} with distinct content" for i in range(12)]
    rows = [(i, uniq[i]) for i in range(12)]
    # same-batch duplicate (normalized: case/whitespace-insensitive)
    rows.append((12, uniq[3].upper()))
    # cross-batch duplicates land in the second file
    rows.append((13, "  " + uniq[5] + "  "))
    rows.append((14, uniq[0]))
    return rows


def test_streaming_ingest_dedup_equals_batch(spark, tmp_path):
    rows = _docs()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    base_ms = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    pdf["event_time_ms"] = [base_ms + 1000 * i for i in range(len(pdf))]

    src = tmp_path / "docs_in"
    src.mkdir()
    # id-ordered arrival: first file ids 0-11, second file the dup tail
    pdf.iloc[:12].to_parquet(src / "part-0.parquet", index=False)
    pdf.iloc[12:].to_parquet(src / "part-1.parquet", index=False)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("event_time_ms")))
    )
    deduped = streaming_ingest_dedup(stream, watermark="10 seconds")
    q = (
        deduped.writeStream.format("memory")
        .queryName("ingest_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = spark.table("ingest_dedup").select("doc_id", "fingerprint").collect()
    kept_ids = sorted(r.doc_id for r in kept)
    kept_fps = {r.fingerprint for r in kept}
    assert len(kept_fps) == len(kept), "one survivor per fingerprint"

    batch = exact_dedup(
        spark.createDataFrame(pdf, schema=SCHEMA)
    ).collect()
    assert kept_ids == sorted(r.keeper_doc_id for r in batch)
    assert kept_fps == {r.fingerprint for r in batch}
    # the three planted duplicates (12, 13, 14) were all dropped
    assert set(kept_ids) == set(range(12))


def test_streaming_curation_chain_equals_batch(spark, tmp_path):
    """Composed streaming curation: ingest dedup -> model-based quality
    gate (hashed_linear_score, stateless codegen -- runs unchanged on
    the stream) -> append sink. Final output == the batch chain
    (exact_dedup keepers -> score -> same filter) row-for-row."""
    from flink_ad_analytics_spark.operators.text import hashed_linear_score

    rows = _docs()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    base_ms = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    pdf["event_time_ms"] = [base_ms + 1000 * i for i in range(len(pdf))]
    src = tmp_path / "cur_in"
    src.mkdir()
    pdf.iloc[:12].to_parquet(src / "part-0.parquet", index=False)
    pdf.iloc[12:].to_parquet(src / "part-1.parquet", index=False)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("event_time_ms")))
    )
    deduped = streaming_ingest_dedup(stream, watermark="10 seconds")
    scored = hashed_linear_score(deduped.select("doc_id", "text"))
    gated = scored.filter(F.col("lr_score") > -0.36)
    q = (
        gated.writeStream.format("memory")
        .queryName("curation_chain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.doc_id, r.n_tokens, r.weight_sum)
        for r in spark.table("curation_chain").collect()
    }

    batch_docs = spark.createDataFrame(pdf, schema=SCHEMA).withColumn(
        "event_time", F.timestamp_millis(F.col("event_time_ms"))
    )
    keepers = exact_dedup(batch_docs).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    batch = {
        (r.doc_id, r.n_tokens, r.weight_sum)
        for r in hashed_linear_score(
            batch_docs.join(keepers, "doc_id").select("doc_id", "text")
        )
        .filter(F.col("lr_score") > -0.36)
        .collect()
    }
    assert streamed == batch
    assert streamed, "gate must pass at least one document"
    assert len(streamed) < 12, "gate must also reject some documents"


def test_streaming_ingest_neardup_equals_batch_lsh(spark, tmp_path):
    """MinHash-band streaming gate == batch minhash_lsh_candidates
    keep-first keepers on a planted near-dup corpus, with dups
    arriving after their originals (id order)."""
    import numpy as np

    from flink_ad_analytics_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from flink_ad_analytics_spark.streaming.jobs import (
        streaming_ingest_neardup,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(500)]
    rows: list[tuple[int, str]] = []
    for i in range(40):
        rows.append(
            (i, " ".join(rng.choice(vocab, size=int(rng.integers(30, 60)))))
        )
    # near-dup copies of docs 0..4 with two point edits (j >= 0.9)
    for k in range(5):
        toks = rows[k][1].split()
        for _ in range(2):
            toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
        rows.append((100 + k, " ".join(toks)))
    rows.append((99, "too short"))  # < 3 tokens: bypasses the gate

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    base_ms = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    pdf["event_time_ms"] = [base_ms + 1000 * i for i in range(len(pdf))]
    # far-future sentinel: pushes the watermark past every emit window
    sentinel = pd.DataFrame(
        [(9999, "sentinel " + " ".join(vocab[:40]),
          base_ms + 3_600_000)],
        columns=["doc_id", "text", "event_time_ms"],
    )

    src = tmp_path / "nd_in"
    src.mkdir()
    pdf.iloc[:41].to_parquet(src / "part-0.parquet", index=False)
    pdf.iloc[41:].to_parquet(src / "part-1.parquet", index=False)
    sentinel.to_parquet(src / "part-2-s.parquet", index=False)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("event_time", F.timestamp_millis(F.col("event_time_ms")))
    )
    verdicts = streaming_ingest_neardup(stream, watermark="10 seconds")
    q = (
        verdicts.writeStream.format("memory")
        .queryName("ingest_neardup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_nd"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.table("ingest_neardup").filter(F.col("doc_id") != 9999)
    kept_stream = sorted(r.doc_id for r in out.filter("kept").collect())
    # the short doc bypasses with zero bands
    bypass = out.filter(F.col("doc_id") == 99).collect()
    assert len(bypass) == 1 and bypass[0].n_bands == 0 and bypass[0].kept

    batch_docs = spark.createDataFrame(pdf, schema=SCHEMA)
    cands = minhash_lsh_candidates(batch_docs).collect()
    dropped_batch = {r.doc_id_2 for r in cands}
    kept_batch = sorted(set(pdf.doc_id) - dropped_batch)
    assert kept_stream == kept_batch
    # the gate actually fired: every planted copy is gone
    assert all(100 + k not in kept_stream for k in range(5))
    # one-row-per-doc contract (round 5): EVERY doc gets a verdict --
    # fully-collided docs emit an explicit kept=false row instead of
    # silently vanishing, so drop-counting consumers see them
    verdict_ids = sorted(r.doc_id for r in out.collect())
    assert verdict_ids == sorted(pdf.doc_id)
    dropped_rows = out.filter(~F.col("kept")).collect()
    assert {r.doc_id for r in dropped_rows} == {100 + k for k in range(5)}
    assert all(r.n_pioneer_bands < r.n_bands for r in dropped_rows)


def test_fused_neardup_gate_equals_two_op_gate(spark, tmp_path):
    """The single-stateful-op foreachBatch gate (r5) must produce
    EXACTLY the two-op gate's verdicts -- same keepers, same
    kept=false rows, same bypass -- on the planted corpus with dups
    arriving after originals."""
    import numpy as np

    from flink_ad_analytics_spark.streaming.jobs import (
        streaming_ingest_neardup,
        streaming_ingest_neardup_fused,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(500)]
    rows: list[tuple[int, str]] = []
    for i in range(40):
        rows.append(
            (i, " ".join(rng.choice(vocab, size=int(rng.integers(30, 60)))))
        )
    for k in range(5):
        toks = rows[k][1].split()
        for _ in range(2):
            toks[int(rng.integers(0, len(toks)))] = str(rng.choice(vocab))
        rows.append((100 + k, " ".join(toks)))
    rows.append((99, "too short"))

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    base_ms = int(BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    pdf["event_time_ms"] = [base_ms + 1000 * i for i in range(len(pdf))]
    src = tmp_path / "ndf_in"
    src.mkdir()
    pdf.iloc[:41].to_parquet(src / "part-0.parquet", index=False)
    pdf.iloc[41:].to_parquet(src / "part-1.parquet", index=False)

    def stream():
        return (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .withColumn(
                "event_time", F.timestamp_millis(F.col("event_time_ms"))
            )
        )

    pioneers, verdicts_fn = streaming_ingest_neardup_fused(
        stream(), watermark="10 seconds"
    )
    collected: list = []
    qf = (
        pioneers.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_f"))
        .foreachBatch(
            lambda df, _bid: collected.extend(verdicts_fn(df).collect())
        )
        .start()
    )
    qf.processAllAvailable()
    qf.stop()
    fused = {r.doc_id: (r.n_bands, r.n_pioneer_bands, r.kept)
             for r in collected}

    # reference: the two-op gate (needs a sentinel to close windows)
    sentinel = pd.DataFrame(
        [(9999, "sentinel " + " ".join(vocab[:40]), base_ms + 3_600_000)],
        columns=["doc_id", "text", "event_time_ms"],
    )
    sentinel.to_parquet(src / "part-2-s.parquet", index=False)
    v2 = streaming_ingest_neardup(stream(), watermark="10 seconds")
    q2 = (
        v2.writeStream.format("memory")
        .queryName("ndf_two_op")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    two_op = {
        r.doc_id: (r.n_bands, r.n_pioneer_bands, r.kept)
        for r in spark.table("ndf_two_op").collect()
        if r.doc_id != 9999
    }
    assert fused == two_op
    assert len(fused) == len(pdf)
