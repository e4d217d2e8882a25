"""Extension query registry: dedup, similarity search, text analysis,
multimodal plumbing -- the training-data-pipeline operators, each with
a DuckDB oracle (including MinHash-LSH and the stubbed multimodal
decoder, whose fake dimensions are re-derived in SQL from md5 bytes).

Determinism engineering mirrors queries.py; additionally every Spark
integer output is cast to BIGINT to match DuckDB's wider int types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    N_MINHASHES,
    SIMHASH_BITS,
    SIMHASH_CHUNKS,
    SIMHASH_HAMMING,
    _SETGRAIN_MAX_DISTINCT,
    _duplication_probe,
    containment_pairs,
    cross_corpus_minhash_dups,  # noqa: F401 -- general two-frame form, re-exported
    split_corpus_minhash_dups,
    dedup_clusters,
    dedup_clusters_best,
    exact_dedup,
    lsh_topk_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    prefix_filter_pairs,
    simhash_pairs,
    simhash_signatures,
)
from .operators.multimodal import (
    asset_metadata_stats,
    assets_from_documents,
    decode_assets,
    resize_assets,
    sample_frames,
)
from .operators.similarity import (
    IVF_SIGN_DIMS,
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_vectorized,
    ivf_topk,
)
from .operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    char_stats,
    lang_id,
    shingle_novelty,
    text_features,
    top_terms,
)
from .sources.batch import load_table

# Shared DuckDB fragments -------------------------------------------------

_TOKS_SQL = (
    "toks AS (SELECT doc_id, lang, "
    "string_split_regex(trim(text), '\\s+') AS ws FROM documents)"
)
_SHINGLES_SQL = (
    "sh AS (SELECT doc_id, list_distinct("
    "CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws) - 1), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) "
    "ELSE []::VARCHAR[] END) AS shingles FROM toks)"
)
_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


# Dedup -------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).withColumn(
        "total_bytes", F.col("total_bytes").cast("long")
    )


DEDUP_EXACT_SQL = f"""
SELECT md5({_NORM_SQL}) AS fingerprint,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents
GROUP BY 1
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.2)


def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs via prefix filtering
    (operators/dedup.py::prefix_filter_pairs): the exhaustive
    answer with full recall at sub-quadratic candidates -- the exact
    scale path between the inverted-index join and MinHash-LSH's
    probabilistic one. Registered at threshold 0.8, the near-dup
    regime the filter exists for (prefix length ~ (1-t)*n+1, so at
    0.2 it keeps 80% of postings and the machinery costs more than
    it prunes -- measured sf0.1: 8.75s at 0.2 vs 2.65s at 0.8).
    Oracle: the SAME exhaustive all-pairs SQL spec as
    dedup_ngram_jaccard, at 0.8 -- value equality IS the full-recall
    proof, re-checked by the driver every round (DuckDB pays ~575s
    for it at sf0.1; this plan answers exactly in ~2.7s)."""
    docs = load_table(spark, sf_dir, "documents")
    return prefix_filter_pairs(docs, threshold=0.8)


def _ngram_jaccard_sql(threshold: float) -> str:
    """Exhaustive all-pairs exact-Jaccard oracle at ``threshold`` --
    the semantic spec shared by dedup_ngram_jaccard (0.2) and
    dedup_prefix_filter (0.8; the high-threshold regime prefix
    filtering exists for)."""
    return f"""
WITH {_TOKS_SQL},
{_SHINGLES_SQL},
sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         len(list_intersect(a.shingles, b.shingles)) AS shared,
         a.n AS n1, b.n AS n2
  FROM sized a JOIN sized b ON a.doc_id < b.doc_id)
SELECT doc_id_1, doc_id_2,
       CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) AS jaccard
FROM pairs
WHERE CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) >= {threshold}
"""


DEDUP_NGRAM_JACCARD_SQL = _ngram_jaccard_sql(0.2)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.2)


def _mh_cols_sql() -> str:
    """MinHash column list for the oracle's sig CTE -- shared by the
    self-join and cross-corpus oracles so the hashing scheme cannot
    drift between them (or from operators/dedup.py's constants)."""
    return ",\n   ".join(
        f"MIN(substr(md5('{j}:' || shingle), 1, 16)) AS mh_{j}"
        for j in range(N_MINHASHES)
    )


def _band_selects_sql(extra_cols: str = "") -> str:
    """Band-key UNION for the oracle's bands CTE; `extra_cols` rides
    along (the cross-corpus oracle carries the side tag)."""
    return "\nUNION ALL\n".join(
        "SELECT doc_id{extra}, {b} AS band, {key} AS band_key FROM sig".format(
            extra=extra_cols,
            b=b,
            key=" || '|' || ".join(
                f"mh_{b * LSH_ROWS + r}" for r in range(LSH_ROWS)
            ),
        )
        for b in range(LSH_BANDS)
    )


def _minhash_lsh_oracle() -> str:
    mh_cols = _mh_cols_sql()
    band_selects = _band_selects_sql()
    return f"""
WITH {_TOKS_SQL},
{_SHINGLES_SQL},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE len(shingles) > 0),
sig AS (SELECT doc_id,
   {mh_cols}
 FROM ex GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
verified AS (
  SELECT c.doc_id_1, c.doc_id_2,
         len(list_intersect(s1.shingles, s2.shingles)) AS shared,
         s1.n AS n1, s2.n AS n2
  FROM cand c
  JOIN sized s1 ON c.doc_id_1 = s1.doc_id
  JOIN sized s2 ON c.doc_id_2 = s2.doc_id)
SELECT doc_id_1, doc_id_2,
       CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) AS jaccard
FROM verified
WHERE CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) >= 0.2
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> connected components -> canonical keeper per cluster
    (operators/dedup.py:connected_components). Iterative min-label
    propagation; the oracle computes the same fixpoint with a
    recursive CTE (transitive closure is fine at oracle scale; the
    engine path is the one that scales)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_clusters(docs, threshold=0.2)


def _dedup_clusters_oracle() -> str:
    # MATERIALIZED: edges is referenced twice (and recursively);
    # without it DuckDB re-inlines pairs0 -- and with it the all-pairs
    # ngram subquery -- once per reference (minutes-long at sf0.1).
    return f"""
WITH RECURSIVE pairs0 AS MATERIALIZED (
  SELECT doc_id_1, doc_id_2 FROM ({DEDUP_NGRAM_JACCARD_SQL.strip()})),
edges AS MATERIALIZED (
  SELECT doc_id_1 AS u, doc_id_2 AS v FROM pairs0
  UNION ALL
  SELECT doc_id_2 AS u, doc_id_1 AS v FROM pairs0),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
lbl AS (SELECT u AS doc_id, MIN(v) AS min_reach FROM reach GROUP BY u)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(l.min_reach, d.doc_id)) AS cluster_id,
       d.doc_id = LEAST(d.doc_id, COALESCE(l.min_reach, d.doc_id)) AS is_keeper
FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id
"""


def q_dedup_clusters_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster keeper (operators/dedup.py::
    dedup_clusters_best): per near-dup cluster, keep the
    HIGHEST-QUALITY member (n_chars DESC, id tie-break) instead of the
    min id -- the keep-best-of-cluster rule production dedup ships.
    One extra window over the already-shuffled cluster labels."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_clusters_best(docs, threshold=0.2)


def _dedup_clusters_best_oracle() -> str:
    return f"""
WITH RECURSIVE pairs0 AS MATERIALIZED (
  SELECT doc_id_1, doc_id_2 FROM ({DEDUP_NGRAM_JACCARD_SQL.strip()})),
edges AS MATERIALIZED (
  SELECT doc_id_1 AS u, doc_id_2 AS v FROM pairs0
  UNION ALL
  SELECT doc_id_2 AS u, doc_id_1 AS v FROM pairs0),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
lbl AS (SELECT u AS doc_id, MIN(v) AS min_reach FROM reach GROUP BY u),
clustered AS (
  SELECT d.doc_id, d.n_chars,
         LEAST(d.doc_id, COALESCE(l.min_reach, d.doc_id)) AS cluster_id
  FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id)
SELECT doc_id, cluster_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id
                               ORDER BY n_chars DESC, doc_id) AS BIGINT)
         AS quality_rank,
       (ROW_NUMBER() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) = 1) AS is_keeper
FROM clustered
"""


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_clusters solved with the large-star/small-star
    components algorithm instead of min-label propagation -- the
    O(log^2 n)-round solver for adversarial-diameter graphs
    (operators/dedup.py:_star_components_labels). Identical output by
    construction; the SAME recursive-CTE oracle value-gates it, so
    both solvers carry an independent end-to-end correctness proof on
    the real near-dup graph, not just the unit-test graphs."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_clusters(docs, threshold=0.2, algorithm="star")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs)


SIMHASH_SQL = f"""
WITH {_TOKS_SQL},
{_SHINGLES_SQL},
post AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
h AS (SELECT doc_id, substr(md5(shingle), 1, 15) AS h15 FROM post),
bits AS (
  SELECT doc_id, p.p AS p,
         (instr('0123456789abcdef', substr(h15, p.p // 4 + 1, 1)) - 1) AS hv
  FROM h CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS p) p),
sums AS (
  SELECT doc_id, p, SUM(((hv >> CAST(3 - p % 4 AS INTEGER)) & 1) * 2 - 1) AS sm
  FROM bits GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(CASE WHEN sm > 0
                     THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
                     ELSE 0 END) AS BIGINT) AS simhash
FROM sums GROUP BY doc_id
"""

def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs)


def _simhash_pairs_oracle() -> str:
    chunk_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {k} AS k, (simhash >> {k * 8}) & 255 AS chunk FROM sig"
        for k in range(SIMHASH_CHUNKS)
    )
    return f"""
WITH sig AS ({SIMHASH_SQL}),
chunks AS ({chunk_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM chunks a JOIN chunks b
    ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
SELECT doc_id_1, doc_id_2, hamming
FROM cand WHERE hamming <= {SIMHASH_HAMMING}
"""


# Similarity --------------------------------------------------------------


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, query_filter=F.col("vec_id") < 20, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


_DOT_TERM_SQL = "CAST(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE) AS DECIMAL(20,16))"

ANN_COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS qv
  FROM embeddings WHERE vec_id < 20),
c AS (
  SELECT vec_id AS c_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS cv
  FROM embeddings),
dots AS (
  SELECT q_id, c_id,
         CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='qv', b='cv')}), 12) AS DOUBLE) AS dot
  FROM q JOIN c USING (pos) GROUP BY 1, 2),
norms AS (
  SELECT vec_id,
         sqrt(CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='v', b='v')}), 12) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY 1),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (qn.nrm * cn.nrm), 6) AS cosine
  FROM dots
  JOIN norms qn ON q_id = qn.vec_id
  JOIN norms cn ON c_id = cn.vec_id
  WHERE q_id <> c_id)
SELECT q_id, c_id, cosine, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id) AS rank
      FROM scored)
WHERE rank <= 10
"""

def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style hard-negative mining (Karpukhin et al., EMNLP 2020):
    for each anchor, the top-k most-similar candidates that are NOT
    near-duplicates -- cosine below the corpus's near-dup threshold
    (0.4, the dedup_embedding_cosine boundary) but maximal under it.
    The standard contrastive-training negative sampler: random
    negatives are too easy, near-dups are false negatives; this band
    is where the training signal lives. Same Arrow+BLAS scoring path
    as ann_topk_vectorized with the exclusion applied to the rounded
    score before ranking, so every anchor still fills k."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_vectorized(
        emb,
        query_filter=F.col("vec_id") < 20,
        k=5,
        round_to=6,
        max_cosine=0.4,
    )


HARD_NEGATIVES_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS qv
  FROM embeddings WHERE vec_id < 20),
c AS (
  SELECT vec_id AS c_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS cv
  FROM embeddings),
dots AS (
  SELECT q_id, c_id,
         CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='qv', b='cv')}), 12) AS DOUBLE) AS dot
  FROM q JOIN c USING (pos) GROUP BY 1, 2),
norms AS (
  SELECT vec_id,
         sqrt(CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='v', b='v')}), 12) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY 1),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (qn.nrm * cn.nrm), 6) AS cosine
  FROM dots
  JOIN norms qn ON q_id = qn.vec_id
  JOIN norms cn ON c_id = cn.vec_id
  WHERE q_id <> c_id)
SELECT q_id, c_id, cosine, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id) AS rank
      FROM scored WHERE cosine < 0.4)
WHERE rank <= 5
"""


def q_ann_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production brute-force path: Arrow ``mapInPandas`` + BLAS matmul
    (operators/similarity.py:cosine_topk_vectorized). Ranks from
    6dp-rounded cosines so the decimal-exact oracle (same SQL family
    as ann_cosine_topk) compares value-exactly; agreement with the
    decimal path is additionally asserted by
    tests/test_skew_and_vectorized.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_vectorized(
        emb, query_filter=F.col("vec_id") < 20, k=10, round_to=6
    )


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(IVF_SIGN_DIMS)
)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, query_filter=F.col("vec_id") < 20, k=5)
    return out.withColumn("rank", F.col("rank").cast("long")).withColumn(
        "bucket", F.col("bucket").cast("long")
    )


ANN_IVF_TOPK_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding,
         CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM embeddings),
q AS (
  SELECT vec_id AS q_id, bucket, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS qv
  FROM b WHERE vec_id < 20),
c AS (
  SELECT vec_id AS c_id, bucket, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS cv
  FROM b),
dots AS (
  SELECT q.bucket, q_id, c_id,
         CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='qv', b='cv')}), 12) AS DOUBLE) AS dot
  FROM q JOIN c ON q.bucket = c.bucket AND q.pos = c.pos
  GROUP BY 1, 2, 3),
norms AS (
  SELECT vec_id,
         sqrt(CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='v', b='v')}), 12) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY 1),
scored AS (
  SELECT bucket, q_id, c_id, ROUND(dot / (qn.nrm * cn.nrm), 6) AS cosine
  FROM dots
  JOIN norms qn ON q_id = qn.vec_id
  JOIN norms cn ON c_id = cn.vec_id
  WHERE q_id <> c_id)
SELECT q_id, c_id, bucket, cosine, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id) AS rank
      FROM scored)
WHERE rank <= 5
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (sign-bucketed candidates)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_near_dup_pairs(emb, threshold=0.4)
    return out.withColumn("bucket", F.col("bucket").cast("long"))


DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS BIGINT) AS bucket
  FROM embeddings),
a AS (
  SELECT vec_id AS vec_id_1, bucket, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS v1
  FROM b),
c AS (
  SELECT vec_id AS vec_id_2, bucket, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS v2
  FROM b),
dots AS (
  SELECT a.bucket, vec_id_1, vec_id_2,
         CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='v1', b='v2')}), 12) AS DOUBLE) AS dot
  FROM a JOIN c ON a.bucket = c.bucket AND a.pos = c.pos
  WHERE vec_id_1 < vec_id_2
  GROUP BY 1, 2, 3),
norms AS (
  SELECT vec_id,
         sqrt(CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='v', b='v')}), 12) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY 1)
SELECT vec_id_1, vec_id_2, bucket,
       ROUND(dot / (n1.nrm * n2.nrm), 6) AS cosine
FROM dots
JOIN norms n1 ON vec_id_1 = n1.vec_id
JOIN norms n2 ON vec_id_2 = n2.vec_id
WHERE ROUND(dot / (n1.nrm * n2.nrm), 6) >= 0.4
"""


# Text analysis -----------------------------------------------------------


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = text_features(docs)
    for c in ("n_tokens", "n_bpe_tokens", "n_chars_nospace"):
        out = out.withColumn(c, F.col(c).cast("long"))
    return out


_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

#: The one SQL definition of the composite quality score (weights
#: 0.5/0.3/0.2 over length, non-stopword ratio, avg token length) --
#: consumed by TEXT_QUALITY_SQL here and CURATED_CORPUS_SQL in
#: queries_pipeline.py, so the weights cannot drift between the
#: standalone feature query and the composed curation chain. Operates
#: on a relation exposing n_tokens, n_stopwords, n_chars_nospace.
QUALITY_SCORE_SQL = """ROUND(0.5 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (1.0 - CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             + 0.2 * least((CAST(n_chars_nospace AS DOUBLE)
                            / CAST(n_tokens AS DOUBLE)) / 10.0, 1.0), 6)"""

TEXT_QUALITY_SQL = f"""
WITH {_TOKS_SQL},
feat AS (
  SELECT t.doc_id,
         CAST(len(ws) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(d.text, '\\w+|[^\\w\\s]')) AS BIGINT)
           AS n_bpe_tokens,
         CAST(length(regexp_replace(d.text, '\\s', '', 'g')) AS BIGINT)
           AS n_chars_nospace,
         CAST(len(list_filter(ws, x -> x IN ({_STOP_LIST}))) AS BIGINT)
           AS n_stopwords
  FROM toks t JOIN documents d ON t.doc_id = d.doc_id)
SELECT doc_id, n_tokens, n_bpe_tokens, n_chars_nospace,
       CAST(n_chars_nospace AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
       CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
       {QUALITY_SCORE_SQL}
         AS quality_score
FROM feat
"""


def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document novelty / boilerplate scoring
    (operators/text.py:shingle_novelty): per doc, the fraction of its
    3-word shingles that are corpus-unique (df=1) vs shared across
    >= 10 docs. The per-doc readout of the df distribution the
    exact-pairs selector probes; the curation complement of the
    within-doc repetition_quality entry."""
    docs = load_table(spark, sf_dir, "documents")
    return shingle_novelty(docs)


SHINGLE_NOVELTY_SQL = f"""
WITH {_TOKS_SQL},
{_SHINGLES_SQL},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
       WHERE len(shingles) > 0),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN d.df >= 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty,
       CAST(SUM(CASE WHEN d.df >= 10 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS boilerplate
FROM ex e JOIN dfreq d USING (shingle)
GROUP BY e.doc_id
"""


def q_char_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codepoint-distribution features incl. Shannon entropy
    (operators/text.py:char_stats) -- gibberish/noise signal."""
    docs = load_table(spark, sf_dir, "documents")
    return char_stats(docs)


CHAR_STATS_SQL = """
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS p FROM documents),
cps AS (
  SELECT doc_id, unicode(substr(text, CAST(p AS INTEGER), 1)) AS cp FROM pos),
per_cp AS (SELECT doc_id, cp, COUNT(*) AS c FROM cps GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_chars,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       CAST(SUM(cp * c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS mean_codepoint,
       ROUND(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(SUM(c) AS DOUBLE), 6) AS entropy
FROM per_cp GROUP BY doc_id
"""


def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of predicted vs labeled language. The label
    rides through lang_id's keep_cols, so the whole matrix is ONE
    documents scan + one tiny (lang, pred_lang) aggregation -- no
    self-join back on doc_id (which would re-scan and shuffle the
    corpus twice; measured 2x slower at sf1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        lang_id(docs, keep_cols=("lang",))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _lang_id_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = ",\n       ".join(
        "CAST(len(list_filter(ws, x -> x IN ({m}))) AS BIGINT) AS s_{lang}".format(
            m=", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang=lang
        )
        for lang in langs
    )
    branches = "\n            ".join(
        "WHEN {conds} THEN '{lang}'".format(
            conds=" AND ".join(
                f"s_{lang} >= s_{other}" for other in langs if other != lang
            ),
            lang=lang,
        )
        for lang in langs
    )
    return f"""
WITH {_TOKS_SQL},
scored AS (
  SELECT doc_id, lang,
       {score_cols}
  FROM toks),
pred AS (
  SELECT doc_id, lang,
         CASE {branches} END AS pred_lang
  FROM scored)
SELECT lang, pred_lang, COUNT(*) AS n_docs
FROM pred GROUP BY 1, 2
"""


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-10 terms per language (operators/text.py:top_terms):
    one explode pass feeding tf and df aggregations, term-keyed join,
    per-group rank."""
    docs = load_table(spark, sf_dir, "documents")
    return top_terms(docs, k=10)


TOP_TERMS_SQL = """
WITH tt AS (
  SELECT lang AS grp, doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents),
tf AS (SELECT grp, term, COUNT(*) AS tf FROM tt GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df
       FROM (SELECT DISTINCT doc_id, term FROM tt) GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.grp AS lang, tf.term,
         CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         ROUND(CAST(tf.tf AS DOUBLE)
               * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n)
SELECT lang, term, tf, df, tfidf, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored)
WHERE rank <= 10
"""


# Multimodal --------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = asset_metadata_stats(docs)
    return out.withColumn("total_bytes", F.col("total_bytes").cast("long")).withColumn(
        "max_bytes", F.col("max_bytes").cast("long")
    )


MULTIMODAL_META_SQL = """
SELECT source,
       COUNT(*) AS n_assets,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
       CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
GROUP BY source
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode over binary payloads (fake
    decoder -- deterministic dims from md5 bytes, re-derived in SQL by
    the oracle). Exercises the real distributed plumbing."""
    docs = load_table(spark, sf_dir, "documents")
    assets = assets_from_documents(docs)
    return decode_assets(assets, fake=True)


def _hexval(expr: str) -> str:
    return f"(instr('0123456789abcdef', {expr}) - 1)"


MULTIMODAL_DECODE_SQL = f"""
SELECT doc_id AS asset_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST(16 + ({_hexval("substr(md5(text), 1, 1)")} * 16
                  + {_hexval("substr(md5(text), 2, 1)")}) % 240 AS INTEGER) AS width,
       CAST(16 + ({_hexval("substr(md5(text), 3, 1)")} * 16
                  + {_hexval("substr(md5(text), 4, 1)")}) % 240 AS INTEGER) AS height
FROM documents
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline over binary payloads (decode dims -> aspect-
    preserving floor-scale to max side 64 -> re-encode). Stubbed pixel
    work, real scaling arithmetic + Arrow plumbing; the oracle
    re-derives everything from md5 bytes in SQL. The binary payload is
    surfaced as a string for the compare (BLOBs fetch as unhashable
    bytearray through the pandas bridge; the operator itself keeps
    binary)."""
    docs = load_table(spark, sf_dir, "documents")
    out = resize_assets(assets_from_documents(docs), max_side=64, fake=True)
    return out.withColumn("payload", F.col("payload").cast("string"))


def _resize_oracle() -> str:
    w = f"(16 + ({_hexval('substr(md5(text), 1, 1)')} * 16 + {_hexval('substr(md5(text), 2, 1)')}) % 240)"
    h = f"(16 + ({_hexval('substr(md5(text), 3, 1)')} * 16 + {_hexval('substr(md5(text), 4, 1)')}) % 240)"
    return f"""
WITH d AS (
  SELECT doc_id AS asset_id, 'text/plain' AS mime, md5(text) AS dg,
         {w} AS w, {h} AS h
  FROM documents),
r AS (
  SELECT asset_id, mime, dg,
         CAST(CASE WHEN greatest(w, h) > 64
                   THEN (w * 64) // greatest(w, h) ELSE w END AS INTEGER) AS width,
         CAST(CASE WHEN greatest(w, h) > 64
                   THEN (h * 64) // greatest(w, h) ELSE h END AS INTEGER) AS height
  FROM d)
SELECT asset_id, mime, width, height,
       dg || ':' || width || 'x' || height AS payload
FROM r
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: 1->N expanding mapInPandas (video explode
    analogue); one metadata row per sampled frame, payloads never fan
    out. Stub duration derived from the payload digest."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(assets_from_documents(docs), every_ms=1000, fake=True)


def _frames_oracle() -> str:
    hex4 = " + ".join(
        f"{_hexval(f'substr(md5(text), {i + 1}, 1)')} * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"""
WITH d AS (
  SELECT doc_id AS asset_id, md5(text) AS dg,
         1 + ({hex4}) % 30 AS n_frames
  FROM documents),
f AS (SELECT asset_id, dg, unnest(range(0, n_frames)) AS i FROM d)
SELECT asset_id,
       CAST(i AS INTEGER) AS frame_no,
       CAST(i * 1000 AS BIGINT) AS ts_ms,
       md5(dg || ':' || i) AS frame_digest
FROM f
"""


def q_dedup_verify_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification pass over the LSH candidate pairs:
    the final pipeline stage that confirms character-level similarity
    before a merge decision. Levenshtein is O(len^2) PER PAIR, so it
    must only ever run on the banded candidate set (tiny vs corpus),
    never all-pairs -- the join shape here: candidate ids shuffle-join
    back to texts, then the quadratic kernel on survivors only.
    edit_similarity = 1 - dist/max(len) (exact int/int double)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_lsh_pairs(docs, threshold=0.2).select(
        "doc_id_1", "doc_id_2"
    )
    d1 = docs.select(
        F.col("doc_id").alias("doc_id_1"), F.col("text").alias("t1")
    )
    d2 = docs.select(
        F.col("doc_id").alias("doc_id_2"), F.col("text").alias("t2")
    )
    dist = F.levenshtein("t1", "t2").cast("bigint")
    sim = F.lit(1.0) - dist.cast("double") / F.greatest(
        F.length("t1"), F.length("t2")
    ).cast("double")
    return (
        pairs.join(d1, "doc_id_1")
        .join(d2, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            dist.alias("edit_distance"),
            sim.alias("edit_similarity"),
        )
    )


#: pairs kept per left doc by the production-grain edit-distance
#: verify: bounds BOTH the O(len^2) levenshtein invocations and the
#: output at k rows per doc (linear in corpus size)
_EDITDIST_TOPK = 3


def q_dedup_verify_editdist_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-grain edit-distance verify (VERDICT r9 item 3): the
    pair-grain `dedup_verify_editdist` contract is QUADRATIC in
    duplicate-cluster sizes -- on the sf10 fixture's ~100x exact
    replication, 13.7M pairs IS the answer (adjudicated output-bound
    in .benchmarks/shuffle_audit_r9.json). A merge decision never
    needs every pair: it needs, per document, its strongest few
    candidates. This entry caps the verify at the top
    ``_EDITDIST_TOPK`` candidates PER LEFT DOC, ranked by exact
    shingle Jaccard (ties to the smaller right id -- deterministic in
    both engines), and runs the O(len^2) levenshtein kernel ONLY on
    the survivors: work and output are k*n (linear in corpus),
    whatever the duplication structure. The pair-grain entry stays as
    the semantic spec; this is the shape that ships at 100 TB.

    Execution rides `lsh_topk_pairs`' ADAPTIVE GRAIN: on
    duplicate-heavy corpora (measured duplication probe) the top-k is
    assembled from LEAD windows over identical-shingle-set groups
    plus rep-grain LSH for the group-boundary fill, never
    materializing the quadratic within-group pair set -- capping
    AFTER minhash_lsh_pairs still paid the candidate explosion
    (151s steady on the sf10 ~100x-replicated fixture). Both grains
    are output-identical
    (tests/test_dedup_quality.py::test_lsh_topk_grain_equivalence).

    The O(len^2) KERNEL is deduplicated the same way: levenshtein is
    a pure function of the text PAIR, so under the duplication probe
    it runs once per distinct (text-fingerprint, text-fingerprint)
    pair -- identical-text pairs short-circuit to distance 0 without
    touching the kernel at all -- and the per-pair answer joins back
    over the fingerprints. Round-10 measurement: the k*n capped pair
    set still meant 1.47M levenshtein calls on ~2KB texts (~6e12
    cell updates, 246s steady at sf10); at kernel grain the fixture
    runs hundreds of distinct-pair kernels instead.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    top = lsh_topk_pairs(docs, threshold=0.2, k=_EDITDIST_TOPK).select(
        "doc_id_1", "doc_id_2", "rank"
    )
    n, nd = _duplication_probe(docs, "text")
    if n == 0 or nd / n > _SETGRAIN_MAX_DISTINCT:
        d1 = docs.select(
            F.col("doc_id").alias("doc_id_1"), F.col("text").alias("t1")
        )
        d2 = docs.select(
            F.col("doc_id").alias("doc_id_2"), F.col("text").alias("t2")
        )
        dist = F.levenshtein("t1", "t2").cast("bigint")
        sim = F.lit(1.0) - dist.cast("double") / F.greatest(
            F.length("t1"), F.length("t2")
        ).cast("double")
        return (
            top.join(d1, "doc_id_1")
            .join(d2, "doc_id_2")
            .select(
                "doc_id_1",
                "doc_id_2",
                "rank",
                dist.alias("edit_distance"),
                sim.alias("edit_similarity"),
            )
        )

    fp = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("__fp")
    )
    pairs_fp = top.join(
        fp.select(
            F.col("doc_id").alias("doc_id_1"), F.col("__fp").alias("__fp1")
        ),
        "doc_id_1",
    ).join(
        fp.select(
            F.col("doc_id").alias("doc_id_2"), F.col("__fp").alias("__fp2")
        ),
        "doc_id_2",
    )
    # one representative text per fingerprint (all texts under one
    # sha2-256 fingerprint are identical)
    rep_text = docs.groupBy(F.sha2(F.col("text"), 256).alias("__fp")).agg(
        F.first("text").alias("__t")
    )
    kern_in = (
        pairs_fp.filter(F.col("__fp1") != F.col("__fp2"))
        .select("__fp1", "__fp2")
        .distinct()
        .join(
            rep_text.select(
                F.col("__fp").alias("__fp1"), F.col("__t").alias("t1")
            ),
            "__fp1",
        )
        .join(
            rep_text.select(
                F.col("__fp").alias("__fp2"), F.col("__t").alias("t2")
            ),
            "__fp2",
        )
    )
    kdist = F.levenshtein("t1", "t2").cast("bigint")
    kernel = kern_in.select(
        "__fp1",
        "__fp2",
        kdist.alias("__dist"),
        (
            F.lit(1.0)
            - kdist.cast("double")
            / F.greatest(F.length("t1"), F.length("t2")).cast("double")
        ).alias("__sim"),
    )
    return (
        pairs_fp.join(kernel, ["__fp1", "__fp2"], "left")
        .select(
            "doc_id_1",
            "doc_id_2",
            "rank",
            F.coalesce(F.col("__dist"), F.lit(0).cast("bigint")).alias(
                "edit_distance"
            ),
            F.coalesce(F.col("__sim"), F.lit(1.0)).alias(
                "edit_similarity"
            ),
        )
    )


def _editdist_topk_oracle() -> str:
    return f"""
WITH pairs AS MATERIALIZED ({_minhash_lsh_oracle()}),
ranked AS (
  SELECT doc_id_1, doc_id_2,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id_1
           ORDER BY jaccard DESC, doc_id_2 ASC) AS BIGINT) AS rank
  FROM pairs),
top AS (SELECT * FROM ranked WHERE rank <= {_EDITDIST_TOPK}),
d AS (SELECT doc_id, text FROM documents)
SELECT t.doc_id_1, t.doc_id_2, t.rank,
       CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS edit_distance,
       1.0 - CAST(levenshtein(d1.text, d2.text) AS DOUBLE)
             / CAST(GREATEST(LENGTH(d1.text), LENGTH(d2.text)) AS DOUBLE)
         AS edit_similarity
FROM top t
JOIN d d1 ON t.doc_id_1 = d1.doc_id
JOIN d d2 ON t.doc_id_2 = d2.doc_id
"""


def _editdist_oracle() -> str:
    return f"""
WITH pairs AS MATERIALIZED ({_minhash_lsh_oracle()}),
d AS (SELECT doc_id, text FROM documents)
SELECT p.doc_id_1, p.doc_id_2,
       CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS edit_distance,
       1.0 - CAST(levenshtein(d1.text, d2.text) AS DOUBLE)
             / CAST(GREATEST(LENGTH(d1.text), LENGTH(d2.text)) AS DOUBLE)
         AS edit_similarity
FROM pairs p
JOIN d d1 ON p.doc_id_1 = d1.doc_id
JOIN d d2 ON p.doc_id_2 = d2.doc_id
"""


def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: exact cosine top-5 restricted to
    candidates with label = 3 (cross-metadata retrieval).

    The predicate applies BEFORE scoring (pre-filtering) and pushes to
    the candidate parquet scan, so the scored set shrinks by the
    selectivity and every query still fills k -- post-filtering an
    unfiltered top-k would return < k whenever matches are sparse.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk(
        emb,
        query_filter=F.col("vec_id") < 20,
        k=5,
        candidate_filter=F.col("label") == 3,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


ANN_FILTERED_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS qv
  FROM embeddings WHERE vec_id < 20),
c AS (
  SELECT vec_id AS c_id, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS cv
  FROM embeddings WHERE label = 3),
dots AS (
  SELECT q_id, c_id,
         CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='qv', b='cv')}), 12) AS DOUBLE) AS dot
  FROM q JOIN c USING (pos) GROUP BY 1, 2),
norms AS (
  SELECT vec_id,
         sqrt(CAST(ROUND(SUM({_DOT_TERM_SQL.format(a='v', b='v')}), 12) AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY 1),
scored AS (
  SELECT q_id, c_id, ROUND(dot / (qn.nrm * cn.nrm), 6) AS cosine
  FROM dots
  JOIN norms qn ON q_id = qn.vec_id
  JOIN norms cn ON c_id = cn.vec_id
  WHERE q_id <> c_id)
SELECT q_id, c_id, cosine, rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, c_id) AS rank
      FROM scored)
WHERE rank <= 5
"""


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment >= 0.8 (operators/dedup.py::
    containment_pairs): the quote/subset detector -- one intersection
    computation per unordered pair, two directed scores exploded from
    it post-aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.8)


CONTAINMENT_PAIRS_SQL = f"""
WITH {_TOKS_SQL},
{_SHINGLES_SQL},
sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         len(list_intersect(a.shingles, b.shingles)) AS shared,
         a.n AS n1, b.n AS n2
  FROM sized a JOIN sized b ON a.doc_id < b.doc_id),
directed AS (
  SELECT doc_id_1 AS inner_id, doc_id_2 AS outer_id,
         CAST(shared AS DOUBLE) / CAST(n1 AS DOUBLE) AS containment
  FROM pairs
  UNION ALL
  SELECT doc_id_2 AS inner_id, doc_id_1 AS outer_id,
         CAST(shared AS DOUBLE) / CAST(n2 AS DOUBLE) AS containment
  FROM pairs)
SELECT inner_id, outer_id, containment
FROM directed
WHERE containment >= 0.8
"""



# -- incremental (cross-corpus) dedup ---------------------------------------

_SPLIT_PRED = "substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) < '8'"


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup (operators/dedup.py::
    split_corpus_minhash_dups): a deterministic ~half of documents
    plays the standing corpus, the rest today's ingest; each new doc
    reports its best corpus near-duplicate (exact-Jaccard-verified
    MinHash-LSH cross-join -- new docs are never compared to each
    other).

    Round 9 (shuffle audit): the split-tagged form computes the
    signature pipeline ONCE over the union and persists it as the
    standing signature index; the old two-filtered-frames form ran it
    twice (13 executed exchanges -> see plan_audit executed_audit_r9;
    operator docstring has the mechanism)."""
    docs = load_table(spark, sf_dir, "documents")
    split = (
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 1
        )
        < "8"
    )
    return split_corpus_minhash_dups(docs, split, threshold=0.2)


def _incremental_dedup_oracle() -> str:
    mh_cols = _mh_cols_sql()
    band_selects = _band_selects_sql(extra_cols=", side")
    return f"""
WITH {_TOKS_SQL},
{_SHINGLES_SQL},
sided AS (SELECT doc_id, shingles,
                 CASE WHEN {_SPLIT_PRED} THEN 'corpus' ELSE 'new' END AS side
          FROM sh),
ex AS (SELECT doc_id, side, unnest(shingles) AS shingle
       FROM sided WHERE len(shingles) > 0),
sig AS (SELECT doc_id, side,
   {mh_cols}
 FROM ex GROUP BY doc_id, side),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key
   AND a.side = 'new' AND b.side = 'corpus'),
sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sided),
verified AS (
  SELECT c.new_id, c.corpus_id,
         len(list_intersect(s1.shingles, s2.shingles)) AS shared,
         s1.n AS n1, s2.n AS n2
  FROM cand c
  JOIN sized s1 ON c.new_id = s1.doc_id
  JOIN sized s2 ON c.corpus_id = s2.doc_id),
scored AS (
  SELECT new_id, corpus_id,
         CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) AS jaccard
  FROM verified
  WHERE CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) >= 0.2),
best AS (
  SELECT new_id, corpus_id, jaccard,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY jaccard DESC, corpus_id ASC) AS r
  FROM scored)
SELECT new_id AS doc_id, corpus_id AS dup_of, jaccard
FROM best WHERE r = 1
"""


def q_knn_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-centrality prototype selection: fixed-point integer
    PageRank (operators/dedup.py::pagerank_fp) over the directed
    exact kNN graph (integer dot-product MIPS ranking) of an
    embedding stratum. In-degree concentration -- which vectors many
    others count among their nearest neighbors -- is what the rank
    amplifies; the top-ranked vectors are the stratum's prototypes.
    Every rank is an exact BIGINT, so 5 iterations of an iterative
    graph algorithm hash-match the oracle's unrolled CTE levels
    bit-for-bit (nothing rows-only here, unlike most iterative ops).

    The stratum (vec_id % 5 = 0) keeps the exact all-pairs edge
    construction at a size both engines handle at any test SF; at
    100 TB the ANN family's IVF/LSH buckets generate the candidate
    edges instead (same division of labor as cosine_topk vs its
    vectorized twin).

    Round 6 (VERDICT r5 #3): the edge list is a deterministic INDEX
    ARTIFACT (exact integer dots, exact tie-breaks), so it persists to
    the warehouse at first touch (fitstore.persisted_fit) and serving
    runs read it -- knn_graph_edges owns construction. This removed
    both the cost AND the 1.5x run-to-run variance the r5 verdict
    flagged: the per-run stratum collect + ~60MB matrix broadcast to
    every python worker was the unstable term
    (.benchmarks/knn_pagerank_sf10.json has the decomposition)."""
    from .fitstore import persisted_fit
    from .operators.dedup import pagerank_fp

    emb = load_table(spark, sf_dir, "embeddings")
    edges = persisted_fit(
        emb, sf_dir, "knnedges", (5, 3, 1000),
        lambda: _knn_stratum_edges(spark, sf_dir),
    )
    return pagerank_fp(
        edges, u_col="src", v_col="dst", directed=True, iters=5
    )


def _knn_stratum_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import knn_graph

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 5 == 0
    )
    return knn_graph(emb, k=3, arrow=True)


def q_knn_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction entry of the kNN-graph fit/serve split: builds the
    directed exact-kNN edge list (integer MIPS ranking, BLAS-exact
    matmul path) fresh -- this row owns the index-build cost that
    q_knn_graph_pagerank now serves from the warehouse."""
    return _knn_stratum_edges(spark, sf_dir).orderBy("src", "dst")


def _knn_edges_oracle(k: int = 3) -> str:
    """Same quantize/score/rank pipeline as _knn_pagerank_oracle, cut
    at the edge list (with the exact integer dot kept as a column)."""
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id % 5 = 0),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_sum(list_transform(generate_series(1, 64),
             i -> a.q[i] * b.q[i])) AS dot
  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id)
SELECT src, dst, CAST(dot AS BIGINT) AS dot FROM (
  SELECT src, dst, dot,
         ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY dot DESC, dst ASC) AS rn
  FROM scored)
WHERE rn <= {k}
"""


def _knn_pagerank_oracle(
    iters: int = 5, scale: int = 10**12, k: int = 3
) -> str:
    """Unrolled fixed-iteration CTE chain (no recursion needed for a
    fixed T): each level is one source join + destination group-by,
    mirroring the engine's Pregel step with identical integer
    arithmetic. Left join keeps in-degree-0 nodes at base rank."""
    levels = []
    prev = "pr0"
    for t in range(1, iters + 1):
        levels.append(
            f"""inc{t} AS (
  SELECT e.dst AS u, SUM(p.r // d.deg) AS s
  FROM {prev} p JOIN deg d ON p.u = d.u JOIN edges e ON e.src = p.u
  GROUP BY e.dst),
pr{t} AS (
  SELECT v.u,
         (SELECT ((100 - 85) * ({scale} // n)) // 100 FROM params)
         + (85 * COALESCE(i.s, 0)) // 100 AS r
  FROM verts v LEFT JOIN inc{t} i ON v.u = i.u)"""
        )
        prev = f"pr{t}"
    body = ",\n".join(levels)
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x * 1000) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id % 5 = 0),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_sum(list_transform(generate_series(1, 64),
             i -> a.q[i] * b.q[i])) AS dot
  FROM qv a JOIN qv b ON a.vec_id <> b.vec_id),
edges AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY dot DESC, dst ASC) AS rn
    FROM scored)
  WHERE rn <= {k}),
deg AS MATERIALIZED (SELECT src AS u, COUNT(*) AS deg FROM edges GROUP BY src),
verts AS MATERIALIZED (
  SELECT src AS u FROM edges UNION SELECT dst FROM edges),
params AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),
pr0 AS (SELECT u, (SELECT {scale} // n FROM params) AS r FROM verts),
{body}
SELECT u AS doc_id, CAST(r AS BIGINT) AS pagerank_fp FROM {prev}
"""


EXTENSION_QUERIES: dict[str, tuple] = {
    "knn_graph_pagerank": (q_knn_graph_pagerank, _knn_pagerank_oracle()),
    "knn_graph_edges": (q_knn_graph_edges, _knn_edges_oracle()),
    "ann_filtered_topk": (q_ann_filtered_topk, ANN_FILTERED_TOPK_SQL),
    "containment_pairs": (q_containment_pairs, CONTAINMENT_PAIRS_SQL),
    "dedup_exact": (q_dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL),
    "dedup_prefix_filter": (q_dedup_prefix_filter, _ngram_jaccard_sql(0.8)),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, _minhash_lsh_oracle()),
    "incremental_dedup": (q_incremental_dedup, _incremental_dedup_oracle()),
    "dedup_clusters": (q_dedup_clusters, _dedup_clusters_oracle()),
    "dedup_clusters_best": (q_dedup_clusters_best, _dedup_clusters_best_oracle()),
    "dedup_clusters_star": (q_dedup_clusters_star, _dedup_clusters_oracle()),
    "simhash_signatures": (q_simhash, SIMHASH_SQL),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, _simhash_pairs_oracle()),
    "dedup_embedding_cosine": (
        q_dedup_embedding_cosine,
        DEDUP_EMBEDDING_COSINE_SQL,
    ),
    "ann_cosine_topk": (q_ann_cosine_topk, ANN_COSINE_TOPK_SQL),
    "ann_topk_vectorized": (q_ann_topk_vectorized, ANN_COSINE_TOPK_SQL),
    "hard_negatives": (q_hard_negatives, HARD_NEGATIVES_SQL),
    "ann_ivf_topk": (q_ann_ivf_topk, ANN_IVF_TOPK_SQL),
    "text_quality": (q_text_quality, TEXT_QUALITY_SQL),
    "top_terms": (q_top_terms, TOP_TERMS_SQL),
    "char_stats": (q_char_stats, CHAR_STATS_SQL),
    "shingle_novelty": (q_shingle_novelty, SHINGLE_NOVELTY_SQL),
    "lang_id_confusion": (q_lang_id_confusion, _lang_id_oracle()),
    "multimodal_meta": (q_multimodal_meta, MULTIMODAL_META_SQL),
    "multimodal_decode": (q_multimodal_decode, MULTIMODAL_DECODE_SQL),
    "multimodal_resize": (q_multimodal_resize, _resize_oracle()),
    "multimodal_frames": (q_multimodal_frames, _frames_oracle()),
    "dedup_verify_editdist": (q_dedup_verify_editdist, _editdist_oracle()),
    "dedup_verify_editdist_topk": (
        q_dedup_verify_editdist_topk,
        _editdist_topk_oracle(),
    ),
}
