"""Deterministic sampling & dataset-split operators.

Training pipelines need reproducible row-level decisions (train/val/
test assignment, per-stratum downsampling) that hold across reruns,
engines, and cluster sizes. Random() is none of those; hashing is all
of them: a row's fate is a pure function of (seed, id).

Portability trick (shared with operators/dedup.py): md5 hex strings
compare identically in every engine, so instead of converting the hash
to an integer (engine-specific), thresholds are precomputed IN PYTHON
as 8-hex-char lowercase strings and compared lexicographically. A
fixed-width lowercase hex comparison is exactly an unsigned integer
comparison, and both Spark and DuckDB emit md5 as fixed-width
lowercase hex.

Scale: both operators are pure per-row projections/filters -- no
shuffle, no state, embarrassingly parallel, and the predicate pushes
down to the scan when the id column is all they need. This is the
only split/sample design that stays correct when the table is
re-partitioned, re-ordered, or incrementally extended (new rows get
stable assignments; old rows never flip).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Width of the hash prefix used for bucketing decisions. 8 hex chars
#: = 32 bits: collision-free bucketing down to fractions of ~1e-9.
_PREFIX = 8
_SPACE = 16**_PREFIX


def _hex_threshold(fraction: float) -> str:
    """Largest 8-hex prefix p such that P(hash < p) == fraction.

    floor(fraction * 16^8) formatted as fixed-width lowercase hex --
    the exact same literal is spliced into the Spark plan and the
    DuckDB oracle, so both engines make identical decisions.
    """
    n = min(int(fraction * _SPACE), _SPACE)
    return format(n, f"0{_PREFIX}x") if n < _SPACE else "g" * _PREFIX  # 'g' > 'f'


def _bucket_hash(id_col: str, seed: int) -> Column:
    """md5('<seed>:' || id) prefix: the per-row decision variable."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, _PREFIX
    )


def bucket_hash_sql(id_col: str, seed: int) -> str:
    """DuckDB fragment computing the identical decision variable."""
    return f"substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, {_PREFIX})"


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Assign every row to a named split, deterministically by id hash.

    weights: ordered {split_name: fraction}; fractions must sum to 1.
    The split column is a CASE over cumulative hex thresholds, so each
    row hashes once. Assignment is independent of row order,
    partitioning, and corpus growth -- the properties that make
    hash-splits the standard for training-data pipelines (a new dump
    appended to the corpus cannot leak val rows into train).
    """
    weights = dict(weights or {"train": 0.8, "val": 0.1, "test": 0.1})
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _bucket_hash(id_col, seed)
    cum = 0.0
    expr: Column | None = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = h < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return df.withColumn("split", split)


def hash_split_case_sql(
    id_col: str, weights: Mapping[str, float], seed: int
) -> str:
    """The DuckDB CASE expression mirroring hash_split's assignment."""
    h = bucket_hash_sql(id_col, seed)
    cum = 0.0
    arms = []
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        arms.append(f"WHEN {h} < '{_hex_threshold(cum)}' THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 7,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows.

    Per-stratum rates are how pipelines rebalance skewed corpora
    (e.g. downsample the 90%-English web crawl, keep all low-resource
    languages). Each row is kept iff hash(seed, id) falls below its
    stratum's threshold: reproducible, order-independent, and a plain
    filter -- no sort, no shuffle, no count-first pass.

    Unlisted strata get default_fraction (0 -> dropped).
    """
    h = _bucket_hash(id_col, seed)
    expr: Column | None = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        thr = h < F.lit(_hex_threshold(frac))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    keep = (
        expr.otherwise(h < F.lit(_hex_threshold(default_fraction)))
        if expr is not None
        else h < F.lit(_hex_threshold(default_fraction))
    )
    return df.filter(keep)


def stratified_keep_sql(
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    seed: int,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB predicate mirroring stratified_sample's keep decision."""
    h = bucket_hash_sql(id_col, seed)
    arms = [
        f"WHEN {strata_col} = '{s}' THEN {h} < '{_hex_threshold(f)}'"
        for s, f in fractions.items()
    ]
    return (
        "CASE "
        + " ".join(arms)
        + f" ELSE {h} < '{_hex_threshold(default_fraction)}' END"
    )


def kfold_assign(
    df: DataFrame, id_col: str = "doc_id", k: int = 5, seed: int = 13
) -> DataFrame:
    """Assign a fold in [0, k) by equal-width hex ranges of the hash.

    Equal-width ranges on the 32-bit prefix (not modulo) so the same
    lexicographic-compare trick stays portable; each fold's width is
    floor-divided and the last fold absorbs the remainder (at most
    k-1 parts in 2^32 -- immeasurable).
    """
    h = _bucket_hash(id_col, seed)
    expr: Column | None = None
    for fold in range(k - 1):
        thr = _hex_threshold((fold + 1) / k)
        cond = h < F.lit(thr)
        expr = F.when(cond, fold) if expr is None else expr.when(cond, fold)
    fold_col = expr.otherwise(k - 1) if expr is not None else F.lit(0)
    return df.withColumn("fold", fold_col.cast("long"))


def kfold_case_sql(id_col: str, k: int, seed: int) -> str:
    h = bucket_hash_sql(id_col, seed)
    arms = [
        f"WHEN {h} < '{_hex_threshold((fold + 1) / k)}' THEN {fold}"
        for fold in range(k - 1)
    ]
    return "CAST(CASE " + " ".join(arms) + f" ELSE {k - 1} END AS BIGINT)"


def shuffle_shards(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 16, seed: int = 99
) -> DataFrame:
    """Deterministic global corpus shuffle for training export.

    Training runs need the corpus in pseudorandom order, but an actual
    ORDER BY random() is non-reproducible AND a full global sort. This
    is the standard distributed alternative: hash every row's id into
    a shuffle key, route it to one of ``n_shards`` output shards by
    equal-width key ranges, and order rows *within* each shard by the
    key. The concatenation of shards in shard order IS a uniform
    pseudorandom permutation of the corpus, yet no global sort ever
    runs: one hash-partition exchange on ``shard`` plus a per-shard
    local sort (each shard ~corpus/n_shards rows). At 100 TB this is
    ``df.repartition(n_shards, "shard").sortWithinPartitions(...)``
    writing one file per shard; the window form here expresses the
    same plan shape queryably (Catalyst plans it as exactly that
    exchange + per-partition sort).

    Adds ``shuffle_key`` (full md5 hex -- tie-free for distinct ids),
    ``shard`` (long) and ``pos`` (1-based long within shard).
    Assignment is independent of input order/partitioning, and stable
    under corpus growth: appending new docs never moves an old doc to
    a different shard (its key is fixed), only interleaves positions.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    prefix = F.substring(h, 1, _PREFIX)
    expr: Column | None = None
    for s in range(n_shards - 1):
        cond = prefix < F.lit(_hex_threshold((s + 1) / n_shards))
        expr = F.when(cond, s) if expr is None else expr.when(cond, s)
    shard = (expr.otherwise(n_shards - 1) if expr is not None else F.lit(0)).cast(
        "long"
    )
    out = df.withColumn("shuffle_key", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return out.withColumn("pos", F.row_number().over(w).cast("long"))


def shuffle_key_sql(id_col: str, seed: int) -> str:
    """DuckDB fragment computing the identical full shuffle key."""
    return f"md5('{seed}:' || CAST({id_col} AS VARCHAR))"


def group_sample_fixed(
    df: DataFrame,
    group_col: str,
    m: int,
    id_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Deterministic fixed-SIZE sample of m rows per group -- the
    distributed, reproducible equivalent of per-group reservoir
    sampling (stratified_sample fixes a RATE; this fixes a COUNT,
    e.g. "1000 eval docs per language" regardless of group skew).

    Rank rows within each group by their id hash and keep the first m:
    hash order is a uniform random order, so rank<=m is a uniform
    m-subset, yet fully reproducible and independent of input
    partitioning. One shuffle on the group key; groups process in
    parallel. Unlike classic reservoir sampling (sequential, seed- and
    order-dependent), re-running on re-partitioned or appended data
    keeps previously sampled rows stable except where new rows
    hash-rank into the top m.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), id_col
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= m)
        .drop("__rk")
    )


def rebalance_to_mix(
    df: DataFrame,
    strata_col: str,
    target_shares: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 29,
) -> DataFrame:
    """Materialize a corpus downsampled to a target stratum mix: the
    executing sibling of the source_mix_weights PLAN (queries_pipeline):
    weights are computed from the data (min(1, target_share /
    actual_share) -- downsample-only), then applied as a per-row
    deterministic hash-threshold filter.

    Scale: one partial-aggregated count per stratum (low-cardinality)
    + a scalar total, broadcast back as a tiny weight map; the corpus
    itself is never shuffled -- each row's fate is a pure function of
    (seed, id, its stratum's weight), so the pass is scan + filter.
    Unlike a rank-based exact-n sampler there is no per-stratum sort;
    kept counts are Binomial(n, w) tight around n*w, the standard
    trade at corpus scale.
    """
    per = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    # scalar total as an empty-partition window over the tiny stratum
    # aggregate: one corpus pass total (a separate agg()+crossJoin
    # re-scans the corpus for the same numbers). The single-partition
    # window holds |strata| rows -- driver-trivial at any scale.
    tot = F.sum("__n").over(Window.partitionBy())
    tgt: Column | None = None
    for s, sh in target_shares.items():
        cond = F.col(strata_col) == s
        lit = F.lit(float(sh))
        tgt = F.when(cond, lit) if tgt is None else tgt.when(cond, lit)
    tgt = F.lit(0.0) if tgt is None else tgt.otherwise(F.lit(0.0))
    weights = per.select(
        strata_col,
        F.least(
            F.lit(1.0),
            tgt * tot.cast("double") / F.col("__n").cast("double"),
        ).alias("__w"),
    )
    h_int = F.conv(_bucket_hash(id_col, seed), 16, 10).cast("long")
    return (
        df.join(F.broadcast(weights), strata_col)
        .filter(h_int < F.floor(F.col("__w") * F.lit(float(_SPACE))))
        .drop("__w")
    )


def rebalance_weight_sql(
    strata_col: str, target_shares: Mapping[str, float], table: str
) -> str:
    """DuckDB CTE body computing the identical per-stratum weight."""
    arms = " ".join(
        f"WHEN {strata_col} = '{s}' THEN {float(sh)!r}"
        for s, sh in target_shares.items()
    )
    case = f"CASE {arms} ELSE 0.0 END"
    return f"""
per AS (SELECT {strata_col}, COUNT(*) AS n FROM {table} GROUP BY {strata_col}),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM per),
w AS (SELECT {strata_col},
             LEAST(1.0, ({case}) * CAST(total AS DOUBLE) / CAST(n AS DOUBLE))
               AS w
      FROM per CROSS JOIN tot)
"""


def hash_int_sql(id_col: str, seed: int) -> str:
    """DuckDB fragment: the hash prefix as an unsigned integer."""
    return f"CAST('0x' || {bucket_hash_sql(id_col, seed)} AS BIGINT)"


def negative_samples(
    df: DataFrame,
    *,
    k: int = 4,
    id_col: str = "doc_id",
    seed: int = 17,
) -> DataFrame:
    """Deterministic negative sampling for contrastive pair building:
    k pseudo-random OTHER rows per anchor, a pure function of
    (seed, anchor id, slot) -- reproducible across engines, reruns,
    and cluster sizes, like every sampler in this module.

    Requires a dense id space 0..n-1 (the driver tables' layout; at
    scale a dense surrogate comes free from corpus_shuffle's shard
    ordinals). negative = (id + 1 + h % (n-1)) % n with h the md5
    prefix integer: the offset lives in [1, n-1], so a negative NEVER
    equals its anchor; slots sample with replacement (collisions
    across k are possible and standard).

    Output: (anchor id, neg_rank, neg_id). One scalar count broadcast;
    the k-fan-out is a zero-shuffle generator expression.
    """
    # scalar count as a 1-row broadcast (an empty-partition window
    # here would funnel the whole id column through one task)
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    counted = df.select(F.col(id_col)).crossJoin(F.broadcast(total))
    slots = counted.select(
        id_col,
        "__total",
        F.explode(F.expr(f"sequence(0, {k - 1})")).alias("neg_rank"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("neg_rank").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    neg = (
        F.col(id_col) + 1 + h % (F.col("__total") - 1)
    ) % F.col("__total")
    return slots.select(
        F.col(id_col),
        F.col("neg_rank").cast("long").alias("neg_rank"),
        neg.cast("long").alias("neg_id"),
    )


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 31,
) -> DataFrame:
    """Per-ROW probabilistic keep: row survives iff
    hash(seed:id) < floor(clamp(weight, 0, 1) * 2^32).

    The continuous generalization of rebalance_to_mix's per-stratum
    weights -- soft quality filtering (keep probability derived from a
    classifier score, the DCLM-style recipe) instead of a hard
    threshold. Pure scan + filter: each row's fate is a function of
    (seed, id, its own weight column); no shuffle, reproducible across
    engines, partitionings, and corpus growth. Weights outside [0, 1]
    are clamped (NULL weight drops the row: no weight, no lottery).
    """
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(weight_col)))
    h_int = F.conv(_bucket_hash(id_col, seed), 16, 10).cast("long")
    return df.filter(h_int < F.floor(w * F.lit(float(_SPACE))))


# -- DSIR: importance resampling for data selection ------------------------


def _hashed_features(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int, seed: int
) -> DataFrame:
    """(id, bucket): one row per unigram/bigram OCCURRENCE, hashed to
    its feature bucket. The md5-prefix integer is the same portable
    decision variable every sampler in this module uses."""
    from .text import TOKENS

    toks = df.select(
        F.col(id_col), F.expr(TOKENS.format(col=text_col)).alias("ws")
    )
    feats = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "concat(ws, CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(0, size(ws) - 2), "
                "i -> concat(ws[i], ' ', ws[i + 1])) "
                "ELSE array() END)"
            )
        ).alias("feat"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col("feat"))), 1, _PREFIX
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    return feats.select(F.col(id_col), bucket.alias("bucket"))


def dsir_target_index(
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 23,
) -> DataFrame:
    """The persistable half of DSIR: the target domain's hashed-feature
    bucket counts, (bucket, c_t), <= n_buckets rows.

    In deployment the target corpus is fixed while raw dumps keep
    arriving, so these counts are computed ONCE and written as a tiny
    standing table (same pattern as incremental_dedup's corpus
    signature index); every later dump scores against the stored index
    via ``dsir_logweights(raw, target_index=...)`` with zero repeat
    work on the target side. The (n_buckets, seed) pair is part of the
    index's identity -- score only with matching parameters.
    """
    tb = _hashed_features(target, id_col, text_col, n_buckets, seed)
    return tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame | None = None,
    *,
    target_index: DataFrame | None = None,
    target_pred: Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 23,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    every raw document by how much more likely its hashed-n-gram
    features are under the TARGET distribution than under the RAW one.

    log w(x) = sum over x's feature occurrences of
               ln p_target(bucket) - ln p_raw(bucket),
    with add-one-smoothed bucket probabilities
    p(b) = (c(b) + 1) / (total + n_buckets).

    Shape at scale: the raw feature stream is aggregated ONCE to
    per-(doc, bucket) occurrence counts -- the only corpus-sized
    shuffle, and a combine-heavy one (map-side partial aggregation
    collapses repeated features before the exchange). Everything
    downstream runs on that small relation: global bucket counts are
    a second tiny aggregation OF IT (not a second corpus pass), the
    <= n_buckets-row log-ratio table is BROADCAST back onto it, and
    the per-doc score is one aggregation of (count x log-ratio)
    products. The target side is its own (usually much smaller) pass.

    Determinism: every ln argument is a correctly-rounded double of an
    exact int/int ratio (identical in any engine); per-doc summation
    multiplies the DECIMAL(25,15)-cast log-ratio by the exact integer
    occurrence count (DECIMAL x DECIMAL, exact) and sums in decimal,
    so the result is exact and partition-order-independent, with one
    terminal 6dp round (the bigram_logprob recipe).

    Returns (id, n_feats, log_w). Raw documents whose text produces
    zero features are absent (no features, no evidence, no weight).

    The target side comes from EITHER ``target`` (a corpus, hashed and
    counted inline) or ``target_index`` (a precomputed
    dsir_target_index table -- the standing-index deployment path);
    exactly one must be given, and both yield identical weights
    (tests/test_sampling.py pins this).
    """
    if sum(x is not None for x in (target, target_index, target_pred)) != 1:
        raise ValueError(
            "pass exactly one of target / target_index / target_pred"
        )
    fb = _hashed_features(raw, id_col, text_col, n_buckets, seed)
    dbc = fb.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))
    # In-query materialization (r13; the semantic_dedup idiom): dbc
    # feeds BOTH the global bucket-count branch and the per-doc scoring
    # aggregation, and the bucket branch reaches dbc through a
    # broadcast build chain that plans its own copy of the subtree --
    # exchange reuse provably never fires there (r12 finding), so the
    # corpus-sized tokenize+md5 explode executed twice. A lazy
    # localCheckpoint evaluates it once per invocation, inside the
    # caller's action; blocks are freed by the ContextCleaner when the
    # result is dropped. Plan: Generate explodes 2 -> 1
    # (plans/r13/dsir_selection_{before,after}.txt); at corpus scale
    # this halves the dominant hashing pass. The checkpointed relation
    # is the per-(doc, bucket) count table -- far smaller than the
    # token stream it replaces recomputing. SERIALIZED storage, not
    # the deserialized default: at sf10 (~tens of millions of rows)
    # 32 tasks unrolling deserialized row objects OOMed a 12g heap;
    # serialized blocks store compactly and spill to disk under
    # pressure (measured: sf10 OOM -> completes, sf0.1 unchanged).
    from pyspark.storagelevel import StorageLevel

    dbc = dbc.localCheckpoint(
        eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    if target_pred is not None:
        # r12 (guide section 2.4): when the target corpus is a
        # PREDICATE-SELECTED subset of ``raw`` (q_dsir_selection's "the
        # en subcorpus stands in for the target"), hashing it
        # separately re-tokenizes and re-md5s the subset -- a second
        # corpus-sized pass. Its bucket counts are already a slice of
        # the raw pass: c_t(b) = sum of dbc.c over target docs, which
        # one broadcast of the tiny (id, flag) relation recovers
        # exactly (same hashing, same occurrence grain). Raw and
        # target counts come out of ONE aggregation over dbc -- and
        # that dbc branch needs the same (id, bucket, c) columns as
        # the per-doc scoring branch below, so the optimizer's column
        # pruning cannot differentiate the two subtrees and exchange
        # reuse collapses them to a single tokenize+hash pass at
        # runtime (the three-branch form was measured to re-run the
        # explode per branch; plan evidence in plans/r12). A full
        # join is unnecessary here: target is a subset of raw, so
        # target-only buckets cannot exist.
        #
        # The (id, flag) relation is corpus-CARDINALITY but only two
        # narrow columns; no broadcast hint (r12 ADVICE): at lake
        # scale a forced broadcast of one row per document would blow
        # the 8 GB broadcast cap, while the unhinted join lets the
        # planner broadcast when the runtime size allows (it does at
        # every committed SF -- plan evidence in plans/r13) and fall
        # back to a narrow-row shuffle join when it does not.
        # PRECONDITION: ``raw`` ids are unique (the corpus contract
        # everywhere in this module); a duplicated id would fan out
        # its dbc rows through this join and inflate both counts.
        flags = raw.select(F.col(id_col), target_pred.alias("__is_tgt"))
        joined = (
            dbc.join(flags, id_col, "left")
            .groupBy("bucket")
            .agg(
                F.sum("c").alias("c_r"),
                F.sum(F.when(F.col("__is_tgt"), F.col("c"))).alias("c_t"),
            )
        )
    else:
        raw_counts = dbc.groupBy("bucket").agg(F.sum("c").alias("c_r"))
        tgt_counts = (
            target_index
            if target_index is not None
            else dsir_target_index(
                target,
                id_col=id_col,
                text_col=text_col,
                n_buckets=n_buckets,
                seed=seed,
            )
        )
        # Totals as windows over the joined bucket table, NOT
        # scalar-agg crossJoins: a crossJoin per total would splice
        # the whole raw-count subtree (and its corpus scan) into the
        # plan once per scalar. The no-partition window funnels
        # through one task, but its input is bounded by n_buckets
        # rows BY CONSTRUCTION -- not by the corpus. FULL join so
        # target-only buckets still count into T.
        joined = raw_counts.join(tgt_counts, "bucket", "full")
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bt = joined.select(
        "bucket",
        "c_r",
        F.coalesce(F.col("c_t"), F.lit(0)).alias("c_t"),
        F.coalesce(F.sum("c_r").over(w), F.lit(0)).alias("R"),
        F.coalesce(F.sum("c_t").over(w), F.lit(0)).alias("T"),
    ).filter(F.col("c_r").isNotNull())
    b = F.lit(n_buckets)
    lr = F.log(
        (F.col("c_t") + 1).cast("double") / (F.col("T") + b).cast("double")
    ) - F.log(
        (F.col("c_r") + 1).cast("double") / (F.col("R") + b).cast("double")
    )
    # Integer-lattice form of the exact decimal weighted sum (the
    # numeric_profile / pricing two_level recipe, round 8): the 15dp
    # log-ratio becomes an exact e15 integer ON THE <= n_buckets-row
    # lookup -- decimal work on 10k broadcast rows is free -- hi/lo
    # split at 10^6 so the corpus-sized per-doc aggregation is pure
    # long multiply-add. Bounds: |lr| <= ~20 so |lr_hi| <= 2e10 and a
    # per-doc long sum |sum(c*lr_hi)| <= sum(c) * 2e10 wraps only past
    # ~4.6e8 feature occurrences in ONE document (ANSI raises rather
    # than wraps on any residual). The exact decimal reconstructed per
    # doc is the SAME value the decimal(25,15)*count sum produced, so
    # the terminal 6dp round and every output bit are unchanged
    # (oracle untouched, value-gated at sf0.001/sf0.01).
    lr_e15 = (lr.cast("decimal(25,15)") * F.lit(10**15)).cast("long")
    lookup = bt.select("bucket", lr_e15.alias("lr_e15")).select(
        "bucket",
        F.expr("lr_e15 div 1000000").alias("lr_hi"),
        F.expr("lr_e15 % 1000000").alias("lr_lo"),
    )
    scored = (
        dbc.join(F.broadcast(lookup), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr_hi")).alias("__shi"),
            F.sum(F.col("c") * F.col("lr_lo")).alias("__slo"),
        )
    )
    exact = (
        F.col("__shi").cast("decimal(38,0)") * 1000000
        + F.col("__slo").cast("decimal(38,0)")
    ).cast("decimal(38,15)") / F.lit(10**15)
    return scored.select(
        id_col,
        "n_feats",
        F.round(exact, 6).cast("double").alias("log_w"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame | None = None,
    *,
    target_pred: Column | None = None,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 23,
    gumbel_seed: int = 29,
) -> DataFrame:
    """Top-k DSIR selection: sample k raw documents without
    replacement with probability proportional to their importance
    weight, via the Gumbel-top-k trick -- rank by
    log w(x) + Gumbel noise and take the k largest. The "noise" is
    deterministic: u = (md5_prefix_int(id) + 0.5) / 2^32 (exactly
    representable, never 0 or 1), g = -ln(-ln(u)) -- so the selection
    is a pure function of (seeds, corpus), reproducible across
    engines, reruns, and partitionings like every sampler here.

    The final ordering is a global top-k, which Spark executes as
    per-partition local top-k + a k-row merge on the driver
    (TakeOrderedAndProject) -- no full sort, no single-task funnel.

    Returns (rank, id, n_feats, log_w, gumbel_key) with
    rank = 1..k by descending key, id-tiebroken.
    """
    dw = dsir_logweights(
        raw,
        target,
        target_pred=target_pred,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        seed=seed,
    )
    u = (
        F.conv(_bucket_hash(id_col, gumbel_seed), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_SPACE))
    key = F.col("log_w") + (-F.log(-F.log(u)))
    keyed = dw.select(
        id_col, "n_feats", "log_w", key.alias("__key")
    ).orderBy(F.col("__key").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("__key").desc(), F.col(id_col))
    return keyed.select(
        F.row_number().over(w).cast("long").alias("rank"),
        id_col,
        "n_feats",
        "log_w",
        F.round(F.col("__key"), 6).alias("gumbel_key"),
    )


def kcenter_coreset(
    emb: DataFrame,
    *,
    k: int = 8,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez farthest-first
    traversal) over an embedding column -- the diversity-sampling
    counterpart to the similarity family: pick k vectors such that
    every vector is close to some pick (2-approximation of the optimal
    k-center cover), the standard coreset/facility-location recipe for
    "train on a small but *spread-out* subset".

    Cross-engine determinism comes from integer geometry: components
    are quantized up front as floor(x * scale) (exact in IEEE doubles,
    identical in every engine), so all pairwise distances are exact
    BIGINT squared-Euclidean values, ties break on the id, and the
    whole greedy trace -- not just the set -- is value-comparable
    against a recursive-CTE oracle.

    Output: (sel_rank, <id_col>, dist2) where dist2 is the vector's
    exact squared distance to the previously-selected set at the
    moment it was picked (0 for the seed, which is MIN(id)). dist2 is
    non-increasing in sel_rank -- the coverage-radius curve; its last
    value bounds max-distance-to-coreset for the whole corpus within
    2x of optimal.

    Scale shape: k bounded driver iterations; each is one narrow
    column update against the SINGLE newest center (classic
    incremental min-dist: older centers are already folded into
    ``mind``) followed by a TakeOrdered(1) reduce -- no corpus
    shuffle anywhere, one 1-row collect per iteration (the same
    bounded-collect class as the k-means loop). With ``arrow=False``
    (default) the per-element distance fold is a HOF (interpreted) --
    the oracle-identity declared path; ``arrow=True`` swaps in a
    vectorized Arrow batch update (numpy int64 matrix op per batch).
    Selection identity is EXACTLY preserved either way because the
    quantized int64s, not floats, define the order -- asserted by
    ``test_kcenter_arrow_identical``.
    """
    from .similarity import floor_scale_quant

    q = emb.select(
        F.col(id_col), floor_scale_quant(vec_col, scale).alias("__q")
    )

    if arrow:
        import numpy as np
        import pandas as pd

        def dist2_to(center_vec: list[int]) -> Column:
            c = np.asarray(list(center_vec), dtype=np.int64)

            def d2(qs):
                if not len(qs):
                    return pd.Series([], dtype="int64")
                m = np.stack([np.asarray(v, dtype=np.int64) for v in qs])
                diff = m - c
                return pd.Series((diff * diff).sum(axis=1))

            # no type hints on purpose: the module's deferred
            # annotations (string hints to a locally-imported pd)
            # break pandas_udf's hint inference; SCALAR is the
            # default, and the PandasUDFType form is deprecated
            udf = F.pandas_udf(d2, "long")
            return udf(F.col("__q"))

    else:

        def dist2_to(center_vec: list[int]) -> Column:
            lit = "array(" + ",".join(f"{v}L" for v in center_vec) + ")"
            return F.expr(
                f"aggregate(zip_with(__q, {lit}, (x, y) -> (x - y) * (x - y)), "
                "0L, (acc, v) -> acc + v)"
            )

    first = q.orderBy(F.col(id_col)).limit(1).collect()
    if not first:
        # empty corpus: empty trace, mirroring the corpus<k break path
        return emb.sparkSession.createDataFrame(
            [], f"sel_rank long, {id_col} long, dist2 long"
        )
    seed = first[0]
    picks = [(1, seed[id_col], 0)]
    state = q.withColumn("__mind", dist2_to(seed["__q"]))
    for rank in range(2, k + 1):
        state = state.localCheckpoint(eager=False)
        far = (
            state.filter(~F.col(id_col).isin([p[1] for p in picks]))
            .orderBy(F.col("__mind").desc(), F.col(id_col))
            .limit(1)
            .collect()
        )
        if not far:
            break  # corpus smaller than k
        far = far[0]
        picks.append((rank, far[id_col], far["__mind"]))
        # the TakeOrdered row already carries __q: the new center's
        # vector rides back in the same 1-row collect
        state = state.withColumn(
            "__mind", F.least(F.col("__mind"), dist2_to(far["__q"]))
        )
    spark = emb.sparkSession
    return spark.createDataFrame(
        picks, f"sel_rank long, {id_col} long, dist2 long"
    )


def kcenter_assign(
    emb: DataFrame,
    coreset: DataFrame,
    *,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
) -> DataFrame:
    """The consumption half of k-center: assign every vector to its
    nearest coreset center (same integer geometry as
    :func:`kcenter_coreset`) and report per-cell coverage stats --
    member count, coverage radius (max dist2 in the cell), and exact
    integer inertia (sum of dist2). The radius column operationalizes
    the 2-approximation guarantee: its max over cells is the realized
    k-center objective.

    Tie rule: (dist2, center_id) lexicographic min -- deterministic in
    any engine, unlike bare min_by.

    Scale shape: the coreset is k rows -- broadcast -- so assignment
    is one map-side pass over the corpus (no shuffle) followed by a
    k-row aggregation. ``arrow=True`` (the production default in the
    registered query) replaces the per-(vector, center) interpreted
    HOF fold with one int64 numpy distance matrix per Arrow batch --
    measured 8x at sf3 (23s -> <3s), output bit-identical because the
    geometry is integer either way.
    """
    from .similarity import floor_scale_quant

    q = emb.select(
        F.col(id_col), floor_scale_quant(vec_col, scale).alias("__q")
    )
    if arrow:
        import numpy as np
        import pandas as pd

        rows = (
            q.join(
                coreset.select(F.col(id_col).alias("__cid")),
                F.col(id_col) == F.col("__cid"),
            )
            .select("__cid", "__q")
            .collect()
        )
        rows.sort(key=lambda r: r["__cid"])  # argmin tie -> smallest id
        cids = np.array([r["__cid"] for r in rows], dtype=np.int64)
        cmat = np.stack(
            [np.asarray(r["__q"], dtype=np.int64) for r in rows]
        )

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["__q"]]
                )
                # (batch, k) exact int64 squared distances
                d2 = (
                    (m * m).sum(axis=1, keepdims=True)
                    - 2 * m @ cmat.T
                    + (cmat * cmat).sum(axis=1)
                )
                j = d2.argmin(axis=1)  # first minimum = smallest cid
                yield pd.DataFrame(
                    {
                        "__id": pdf[
                            pdf.columns[0]
                        ].to_numpy(),
                        "__cid": cids[j],
                        "__d2": d2[np.arange(len(j)), j],
                    }
                )

        nearest = (
            q.select(id_col, "__q")
            .mapInPandas(assign, f"__id long, __cid long, __d2 long")
            .select(
                F.col("__id").alias(id_col),
                F.struct(
                    F.col("__d2"), F.col("__cid")
                ).alias("__best"),
            )
        )
    else:
        centers = F.broadcast(
            q.join(
                coreset.select(F.col(id_col).alias("__cid")),
                F.col(id_col) == F.col("__cid"),
            ).select(F.col("__cid"), F.col("__q").alias("__cq"))
        )
        scored = q.crossJoin(centers).select(
            F.col(id_col),
            F.col("__cid"),
            F.expr(
                "aggregate(zip_with(__q, __cq, (x, y) -> (x - y) * (x - y)), "
                "0L, (acc, v) -> acc + v)"
            ).alias("__d2"),
        )
        nearest = scored.groupBy(id_col).agg(
            F.min(F.struct(F.col("__d2"), F.col("__cid"))).alias("__best")
        )
    return (
        nearest.select(
            F.col("__best.__cid").alias("center_id"),
            F.col("__best.__d2").alias("d2"),
        )
        .groupBy("center_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("d2").alias("radius2"),
            F.sum("d2").alias("inertia"),
        )
    )


def sqrt_temperature_mix(
    df: DataFrame,
    strata_col: str,
    n_target: int,
    id_col: str = "doc_id",
    seed: int = 31,
) -> DataFrame:
    """Temperature-smoothed mixture sampling at alpha = 0.5: target
    stratum shares proportional to sqrt(n_s) instead of n_s -- the
    standard multilingual-corpus rebalance (upweight low-resource
    strata, damp the head) without hand-written target shares
    (rebalance_to_mix's job when you have them).

    keep_fraction(s) = min(1, n_target * share_s / n_s),
    share_s = sqrt(n_s) / sum_t sqrt(n_t).

    Exactness engineering: IEEE sqrt is CORRECTLY ROUNDED (unlike pow,
    which is why alpha is pinned to 0.5 on the declared path), so
    sqrt(n_s) is bit-identical in any engine; it is then snapped to
    integer micro-units floor(sqrt(n)*1e6 + 0.5) so the denominator is
    an exact integer SUM (float summation order would differ across
    engines/partitions), and the keep threshold is pure integer
    arithmetic in DECIMAL(38,0) -- floor(2^32 * n_target * s_s /
    (total * n_s)) -- compared against the portable md5-prefix integer
    every sampler in this module uses.

    Scale: one partial-aggregated stratum count + a tiny windowed
    total; weights broadcast back; the corpus is never shuffled --
    scan + filter, the same shape as rebalance_to_mix.
    """
    per = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    s_units = F.expr(
        "CAST(floor(sqrt(CAST(__n AS DOUBLE)) * 1000000 + 0.5) "
        "AS DECIMAL(38,0))"
    )
    sized = per.select(F.col(strata_col), F.col("__n"), s_units.alias("__s"))
    tot = F.sum("__s").over(Window.partitionBy())
    # integral DIV, not decimal '/': decimal-division result scales
    # (and their rounding) differ between engines; A DIV B on exact
    # integers is floor division everywhere (verified equal to
    # DuckDB's HUGEINT //)
    thr = F.least(
        F.lit(_SPACE),
        F.expr(
            f"CAST({_SPACE} AS DECIMAL(38,0)) * CAST({n_target} AS "
            "DECIMAL(38,0)) * __s DIV (CAST(__tot AS DECIMAL(38,0)) * "
            "CAST(__n AS DECIMAL(38,0)))"
        ),
    )
    weights = sized.withColumn("__tot", tot).select(
        strata_col, thr.cast("long").alias("__thr")
    )
    h_int = F.conv(_bucket_hash(id_col, seed), 16, 10).cast("long")
    return (
        df.join(F.broadcast(weights), strata_col)
        .filter(h_int < F.col("__thr"))
        .drop("__thr")
    )
