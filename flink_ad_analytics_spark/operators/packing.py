"""Context-window operators: document chunking and sequence packing.

The step between a curated corpus and a training run: split long
documents into model-context-sized token windows (chunking, 1->N),
then pack short sequences into fixed-capacity bins so batches waste no
padding (packing, N->bins). Both are deterministic corpus transforms,
so they get full DuckDB oracles like every other operator here.

Scale design:

* chunking is embarrassingly parallel -- one generator expression per
  row, no shuffle at all; the explode multiplies rows ~n_tokens/stride
  so downstream partition sizing must account for the fan-out (same
  consideration as dedup.doc_shingles).
* packing is sequential WITHIN a shard but parallel ACROSS shards --
  the shard column (source / path / date) is the unit of
  distribution, exactly how a 100 TB corpus is packed in practice
  (each worker packs its own file group; no global order exists).
  One shuffle on the shard key; greedy state never leaves a shard.
  Shards are assumed executor-sized (documents of one source file
  group); a pathologically hot shard is split upstream by the corpus
  writer's file-count control (sources/corpus_writer.py).

Greedy packing (next-fit) is inherently iterative; the Spark side
runs it as an Arrow-batched applyInPandas per shard, and the oracle
reproduces it with a per-shard-parallel recursive CTE -- see
NEXT_FIT_RECURSIVE_SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .text import TOKENS


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 32,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's whitespace-token stream into windows of
    `chunk_tokens` tokens starting every `stride` tokens (default:
    non-overlapping, stride = chunk_tokens).

    Output: id, chunk_idx, chunk_start (token offset), n_chunk_tokens,
    chunk_md5 (portable hash of the re-joined window text -- the
    cross-engine fingerprint idiom used throughout this repo).
    """
    if stride is not None and stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    stride = stride or chunk_tokens
    toks = docs.select(
        F.col(id_col), F.expr(TOKENS.format(col=text_col)).alias("ws")
    )
    # one start offset per window: 0, stride, 2*stride, ... < n_tokens
    starts = F.expr("sequence(0, size(ws) - 1, {s})".format(s=stride))
    exploded = toks.select(
        id_col, "ws", F.explode(starts).alias("chunk_start")
    )
    chunk = F.expr(f"slice(ws, chunk_start + 1, {chunk_tokens})")
    return exploded.select(
        F.col(id_col),
        (F.col("chunk_start") / stride).cast("bigint").alias("chunk_idx"),
        F.col("chunk_start").cast("bigint"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def pack_sequences_offset(
    docs: DataFrame,
    *,
    capacity: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Offset packing: bin = (tokens before this doc in shard order)
    DIV capacity. Docs straddle bin boundaries (the reader skips the
    tail at training time) -- the streaming-friendly packing that
    needs only a running sum, no greedy state.

    Output: one row per doc with shard, id, n_tokens, bin_id.
    """
    toks = docs.select(
        F.col(shard_col),
        F.col(id_col),
        F.expr(f"size({TOKENS.format(col=text_col)})").cast("bigint").alias(
            "n_tokens"
        ),
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.withColumn(
        "bin_id", F.floor(cum_before / capacity).cast("bigint")
    )


def pack_sequences_greedy(
    docs: DataFrame,
    *,
    capacity: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy next-fit packing per shard: walk docs in (shard,
    order_col) order; a doc that would overflow the current bin opens
    the next one. A doc longer than capacity gets a bin to itself
    (bins never split documents).

    Sequential state per shard, parallel across shards
    (applyInPandas). Output: shard, id, n_tokens, bin_id.
    """
    toks = docs.select(
        F.col(shard_col).alias("__shard"),
        F.col(order_col).alias("__ord"),
        F.col(id_col).alias("__id"),
        F.expr(f"size({TOKENS.format(col=text_col)})").cast("bigint").alias(
            "n_tokens"
        ),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord", kind="mergesort").reset_index(drop=True)
        bins, bin_id, fill = [], 0, 0
        for n in pdf["n_tokens"]:
            if fill and fill + n > capacity:
                bin_id, fill = bin_id + 1, 0
            fill += n
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    # derive the shard/order/id field types from the INPUT schema: a
    # hardcoded "string/bigint" triple would break any non-default
    # shard (e.g. a numeric file-group id or date) at the Arrow
    # boundary, despite the generic parameter surface.
    in_types = {f.name: f.dataType.simpleString() for f in toks.schema.fields}
    out_schema = (
        f"__shard {in_types['__shard']}, __ord {in_types['__ord']}, "
        f"__id {in_types['__id']}, n_tokens bigint, bin_id bigint"
    )
    packed = toks.groupBy("__shard").applyInPandas(pack, schema=out_schema)
    return packed.select(
        F.col("__shard").alias(shard_col),
        F.col("__id").alias(id_col),
        "n_tokens",
        "bin_id",
    )


def token_budget_shards(
    docs: DataFrame,
    *,
    seed: int = 41,
    shard_token_budget: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic GLOBAL corpus shuffle + fixed-token-budget shard
    assignment: the training-order materialization step between a
    packed corpus and a data loader.

    Every doc gets a pseudo-random total-order key -- the repo's
    cross-engine decision variable ``md5('<seed>:' || id)`` (same
    scheme as operators/sampling.py), so membership AND order are
    exactly reconstructable from (seed, doc ids) alone and the DuckDB
    oracle reproduces them bit-for-bit. Shards are cut by CUMULATIVE
    token count in key order: ``shard_id = tokens_before DIV budget``,
    so every shard except possibly the last spans at least the budget
    and a doc is never split (the chunker upstream handles
    over-budget docs).

    Scale design -- the global cumulative sum is the classic
    distributed prefix-sum, decomposed WITHOUT a single-partition
    window and with ZERO driver involvement:

    * the first ``bucket_chars`` hex chars of the key form an ORDERED
      bucket (256 at 2 chars; dial up at 100 TB), so key order ==
      (bucket, key) order;
    * per-bucket local row_number + running token sum: one shuffle on
      the bucket key, windows parallel across buckets (skew bounded by
      md5 uniformity);
    * bucket prefix offsets: an aggregate of #buckets rows, windowed
      over that tiny relation and BROADCAST-joined back.

    Output (one row per doc): id, shuffle_key, global_pos (1-based),
    doc_tokens, tokens_before, shard_id.
    """
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col),
        key.alias("shuffle_key"),
        F.expr(f"size({TOKENS.format(col=text_col)})").cast("bigint").alias(
            "doc_tokens"
        ),
    ).withColumn("__bucket", F.substring("shuffle_key", 1, bucket_chars))

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy("shuffle_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("__bucket").orderBy("shuffle_key", id_col)
    local = base.select(
        id_col,
        "shuffle_key",
        "__bucket",
        "doc_tokens",
        F.row_number().over(w_rn).cast("bigint").alias("__local_pos"),
        (F.sum("doc_tokens").over(w_in) - F.col("doc_tokens")).alias(
            "__local_before"
        ),
    )
    totals = base.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("doc_tokens").alias("__t")
    )
    w_b = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(w_b), F.lit(0)).alias("__n_before"),
        F.coalesce(F.sum("__t").over(w_b), F.lit(0)).alias("__t_before"),
    )
    tokens_before = F.col("__t_before") + F.col("__local_before")
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .select(
            id_col,
            "shuffle_key",
            (F.col("__n_before") + F.col("__local_pos")).alias("global_pos"),
            "doc_tokens",
            tokens_before.alias("tokens_before"),
            F.expr(
                f"(__t_before + __local_before) div {shard_token_budget}"
            ).alias("shard_id"),
        )
    )


def write_token_budget_shards(
    plan: DataFrame, path: str, *, id_col: str = "doc_id"
) -> None:
    """Materialize a ``token_budget_shards`` plan as one directory per
    shard (``shard_id=K/``), rows stored in global training order.

    ``repartition(shard_id)`` keeps each shard's rows in one task (one
    file per shard, no tasks-x-shards small files) and
    ``sortWithinPartitions`` fixes the in-file order, so a loader
    streaming shard directories in id order replays EXACTLY the
    (seed)-determined global order with no further sorting.
    """
    (
        plan.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "global_pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def token_budget_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    *,
    seed: int = 23,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    bucket_chars: int = 2,
) -> DataFrame:
    """Token-budgeted MIXTURE selection: for each group (language /
    source), keep a deterministic pseudo-random prefix of its docs
    whose cumulative token count fits the group's budget -- the
    materialization step of a training-mix spec ("60B tokens of en,
    25B of de, ..."), which is written in TOKENS, not doc counts.

    Selection rule: within each group, docs ordered by the seeded md5
    key; a doc is kept iff the tokens BEFORE it (in that order) are
    still under the group's budget -- greedy prefix, the last kept doc
    may straddle the boundary, groups missing from ``budgets`` are
    dropped entirely. Deterministic from (seed, budgets) alone, so
    membership AND order replay exactly on any engine.

    Scale design: same two-level prefix-sum as token_budget_shards,
    with the ordered md5-hex bucket UNDER the group key -- per-
    (group, bucket) windows stay parallel even when one group holds
    90% of the corpus (partitioning by the group alone would put an
    entire language on one task: the classic mixture-skew hazard);
    the offset relation is #groups x #buckets rows, broadcast back.

    Output (one row per KEPT doc): id, group, mix_key, group_pos
    (1-based within group), doc_tokens, tokens_before.
    """
    if not budgets:
        # fail loud: F.col(...).isin() with zero args and create_map
        # with no pairs both raise opaque analyzer errors downstream
        raise ValueError(
            "token_budget_mix: budgets must be non-empty "
            "(a mix spec with no groups selects nothing)"
        )
    key = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    base = (
        docs.select(
            F.col(id_col),
            F.col(group_col).alias("__grp"),
            key.alias("mix_key"),
            F.expr(f"size({TOKENS.format(col=text_col)})")
            .cast("bigint")
            .alias("doc_tokens"),
        )
        .filter(F.col("__grp").isin(*budgets.keys()))
        .withColumn("__bucket", F.substring("mix_key", 1, bucket_chars))
    )
    w_in = (
        Window.partitionBy("__grp", "__bucket")
        .orderBy("mix_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("__grp", "__bucket").orderBy("mix_key", id_col)
    local = base.select(
        id_col,
        "__grp",
        "__bucket",
        "mix_key",
        "doc_tokens",
        F.row_number().over(w_rn).cast("bigint").alias("__local_pos"),
        (F.sum("doc_tokens").over(w_in) - F.col("doc_tokens")).alias(
            "__local_before"
        ),
    )
    totals = base.groupBy("__grp", "__bucket").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("doc_tokens").alias("__t")
    )
    w_b = (
        Window.partitionBy("__grp")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__grp",
        "__bucket",
        F.coalesce(F.sum("__n").over(w_b), F.lit(0)).alias("__n_before"),
        F.coalesce(F.sum("__t").over(w_b), F.lit(0)).alias("__t_before"),
    )
    budget = F.create_map(
        *[x for g, b in sorted(budgets.items()) for x in (F.lit(g), F.lit(b))]
    )
    tokens_before = F.col("__t_before") + F.col("__local_before")
    return (
        local.join(F.broadcast(offsets), ["__grp", "__bucket"])
        .withColumn("__before", tokens_before)
        .filter(F.col("__before") < budget[F.col("__grp")])
        .select(
            id_col,
            F.col("__grp").alias(group_col),
            "mix_key",
            (F.col("__n_before") + F.col("__local_pos")).alias("group_pos"),
            "doc_tokens",
            F.col("__before").alias("tokens_before"),
        )
    )
