"""URL / domain-level curation operators.

Every real pretraining pipeline groups documents by domain before
anything else: canonicalize the URL, extract the registrable host,
cap documents per domain, and gate whole domains on an aggregate
reputation score (C4, Raffel et al. arXiv 1910.10683 §2.2 dedupes and
filters at URL grain; RefinedWeb, Penedo et al. arXiv 2306.01116 §3.1
runs URL-level filtering as the very first stage).

The reference repo has no web-curation surface (its 200 lines of
Flink SQL are ad analytics); this module is part of the LLM-pipeline
extension mandate. Everything here is pure codegen expressions --
zero UDFs, zero extra shuffles beyond the one domain-key aggregate --
so the canonicalizer runs scan-side at any corpus size and the
domain aggregates are single-exchange.

The driver fixture ``documents`` carries a ``source`` column but no
URL, so :func:`with_synth_url` derives a deterministic messy URL per
document (mixed-case schemes/hosts, www prefixes, default and
explicit ports, tracking params, fragments, trailing slashes) from
``(source, doc_id)`` alone. The synthesis is expressible in ANSI SQL,
which keeps every downstream operator value-exact against a DuckDB
oracle running the same synthesis: the canonicalizer is what is under
test, the synthesizer is the shared fixture transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Tracking-parameter predicate, shared verbatim between the Spark
# lambda and the DuckDB list_filter lambda (substr() semantics are
# identical; LIKE is avoided because '_' is a wildcard).
_KEEP_PARAM = (
    "substr(p, 1, 4) <> 'utm_' AND substr(p, 1, 4) <> 'ref=' "
    "AND substr(p, 1, 7) <> 'fbclid=' AND substr(p, 1, 6) <> 'gclid='"
)


def synth_url_expr(id_col: str = "doc_id", source_col: str = "source") -> str:
    """SQL expression (valid in both Spark SQL and DuckDB) building a
    deterministic messy URL from ``(source, doc_id)``.

    Variation axes, all keyed on ``doc_id`` residues so every
    canonicalization rule sees mixed outcomes on any fixture slice:
    scheme case + http/https (mod 4), www prefix and host case
    (mod 4), default/explicit/absent port (mod 5), trailing slash
    (mod 3), tracking params utm_*/ref vs clean (mod 2), fragment
    (mod 7).
    """
    i, s = id_col, source_col
    return (
        f"CASE {i} % 4 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://' "
        f"WHEN 2 THEN 'HTTPS://WWW.' ELSE 'https://www.' END "
        f"|| CASE WHEN {i} % 4 = 2 THEN upper({s}) ELSE {s} END "
        f"|| '.example.com' "
        f"|| CASE {i} % 5 WHEN 0 THEN ':443' WHEN 1 THEN ':8080' "
        f"WHEN 2 THEN ':80' ELSE '' END "
        f"|| '/Articles/' || CAST({i} AS STRING) "
        f"|| CASE WHEN {i} % 3 = 0 THEN '/' ELSE '' END "
        f"|| CASE WHEN {i} % 2 = 0 THEN "
        f"'?utm_source=feed&id=' || CAST({i} % 10 AS STRING) "
        f"|| '&utm_campaign=x' "
        f"ELSE '?id=' || CAST({i} % 10 AS STRING) || '&ref=rss' END "
        f"|| CASE WHEN {i} % 7 = 0 THEN '#section-2' ELSE '' END"
    )


def with_synth_url(
    docs: DataFrame, id_col: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Attach the deterministic fixture URL as ``raw_url``."""
    return docs.withColumn("raw_url", F.expr(synth_url_expr(id_col, source_col)))


def _canon_cols(url_col: str) -> dict[str, Column]:
    """The canonicalization pipeline as named Column expressions.

    Steps (standard URL canonicalization as run before URL-grain
    dedup in C4/RefinedWeb):

    1. strip the fragment;
    2. lowercase the scheme;
    3. lowercase the host, drop a scheme-default port (http:80 /
       https:443), keep any other explicit port;
    4. drop a leading ``www.`` for the registrable domain;
    5. strip trailing slashes from the path;
    6. drop tracking parameters (``utm_*``, ``ref``, ``fbclid``,
       ``gclid``) and sort the survivors for order-independence.

    All plain string/array built-ins -- whole-stage codegen, no UDFs.
    """
    defrag = F.regexp_replace(F.col(url_col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(defrag, "^[^:]+", 0))
    rest = F.expr(f"substr(regexp_replace({url_col}, '#.*$', ''), "
                  f"length(regexp_extract(regexp_replace({url_col}, '#.*$', ''), '^[^:]+', 0)) + 4)")
    hostport = F.regexp_extract(rest, "^[^/?]+", 0)
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.regexp_extract(hostport, ":[0-9]+$", 0)
    canon_port = (
        F.when((scheme == "http") & (port == ":80"), "")
        .when((scheme == "https") & (port == ":443"), "")
        .otherwise(port)
    )
    domain = F.regexp_replace(host, "^www\\.", "")
    pathq = F.expr(
        "substr(__rest, length(regexp_extract(__rest, '^[^/?]+', 0)) + 1)"
    )
    path = F.regexp_extract(F.col("__pathq"), "^[^?]*", 0)
    canon_path = F.regexp_replace(path, "/+$", "")
    query = F.expr("substr(__pathq, length(regexp_extract(__pathq, '^[^?]*', 0)) + 2)")
    kept_qs = F.expr(
        "array_join(array_sort(filter(split(__query, '&'), "
        f"p -> {_KEEP_PARAM})), '&')"
    )
    return {
        "__rest": rest,
        "__pathq": pathq,
        "__query": query,
        "scheme": scheme,
        "url_host": host,
        "url_domain": domain,
        "canon_port": canon_port,
        "url_path": canon_path,
        "kept_qs": kept_qs,
    }


def canonicalize_url(
    df: DataFrame, url_col: str = "raw_url"
) -> DataFrame:
    """Add ``canon_url``, ``url_host``, ``url_domain``, ``url_path``
    (and ``scheme``) derived from ``url_col``. One codegen
    projection, zero shuffle."""
    c = _canon_cols(url_col)
    staged = (
        df.withColumn("__rest", c["__rest"])
        .withColumn("__pathq", c["__pathq"])
        .withColumn("__query", c["__query"])
        .withColumn("scheme", c["scheme"])
        .withColumn("url_host", c["url_host"])
        .withColumn("url_domain", c["url_domain"])
        .withColumn("__port", c["canon_port"])
        .withColumn("url_path", c["url_path"])
        .withColumn("__qs", c["kept_qs"])
    )
    canon = F.concat(
        F.col("scheme"),
        F.lit("://"),
        F.col("url_domain"),
        F.col("__port"),
        F.col("url_path"),
        F.when(F.col("__qs") == "", "").otherwise(
            F.concat(F.lit("?"), F.col("__qs"))
        ),
    )
    return staged.withColumn("canon_url", canon).drop(
        "__rest", "__pathq", "__query", "__port", "__qs"
    )


def canonical_cte_sql(extra_cols: str = "", url_expr: str | None = None) -> str:
    """DuckDB CTE chain mirroring :func:`with_synth_url` +
    :func:`canonicalize_url` over the ``documents`` view, ending in a
    CTE named ``canon`` with columns ``doc_id, raw_url, canon_url,
    url_host, url_domain, url_path{extra_cols}``. Kept in one place so
    the registered oracles cannot drift from each other; the Spark
    twin is the Column pipeline in :func:`_canon_cols`."""
    return f"""
raw AS (SELECT doc_id{extra_cols},
               {url_expr or synth_url_expr()} AS raw_url FROM documents),
s1 AS (SELECT *, regexp_replace(raw_url, '#.*$', '') AS defrag FROM raw),
s2 AS (SELECT *, lower(regexp_extract(defrag, '^[^:]+')) AS scheme,
         substr(defrag,
                length(regexp_extract(defrag, '^[^:]+')) + 4) AS rest
       FROM s1),
s3 AS (SELECT *, regexp_extract(rest, '^[^/?]+') AS hostport,
         substr(rest,
                length(regexp_extract(rest, '^[^/?]+')) + 1) AS pathq
       FROM s2),
s4 AS (SELECT *,
         lower(regexp_replace(hostport, ':[0-9]+$', '')) AS url_host,
         regexp_extract(hostport, ':[0-9]+$') AS port,
         regexp_extract(pathq, '^[^?]*') AS path,
         substr(pathq,
                length(regexp_extract(pathq, '^[^?]*')) + 2) AS query
       FROM s3),
s5 AS (SELECT *,
         regexp_replace(url_host, '^www\\.', '') AS url_domain,
         CASE WHEN scheme = 'http'  AND port = ':80'  THEN ''
              WHEN scheme = 'https' AND port = ':443' THEN ''
              ELSE port END AS cport,
         regexp_replace(path, '/+$', '') AS url_path,
         COALESCE(array_to_string(list_sort(list_filter(
             string_split(query, '&'), p -> {_KEEP_PARAM})), '&'), '')
           AS qs
       FROM s4),
canon AS (SELECT doc_id{extra_cols}, raw_url,
         scheme || '://' || url_domain || cport || url_path
           || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url,
         url_host, url_domain, url_path
       FROM s5)"""


def domain_caps(
    docs: DataFrame,
    *,
    cap: int = 20,
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-domain document cap: rank each domain's documents by a
    deterministic quality key (``n_chars`` DESC, ``doc_id`` ASC) and
    keep the top ``cap``.

    C4-style per-host capping prevents any single domain from
    dominating the corpus. One shuffle on the domain key (the window
    partition); the rank is computed within partitions, no second
    exchange. At 100 TB the domain key is the natural partitioner --
    heavy-hitter domains are exactly what the cap trims, and a
    two-level pre-cap (cap per (domain, shard) first at ``cap`` each,
    then the global window over the ~cap*shards survivors) bounds
    skew if one domain were pathological; the fixture path registers
    the direct form.

    Input must already carry ``url_domain`` (see
    :func:`canonicalize_url`).
    """
    w = Window.partitionBy("url_domain").orderBy(
        F.col(chars_col).desc(), F.col(id_col).asc()
    )
    return docs.select(
        F.col(id_col),
        F.col("url_domain"),
        F.row_number().over(w).alias("domain_rank"),
    ).withColumn("kept", F.col("domain_rank") <= F.lit(cap))


def domain_reputation(
    docs: DataFrame,
    *,
    chars_col: str = "n_chars",
    min_docs: int = 5,
    quality_chars: int = 250,
    min_quality_pct: int = 30,
) -> DataFrame:
    """Domain-level reputation gate: aggregate per-domain quality
    signals, decide keep/drop for the whole domain, and report how
    many documents the gate admits.

    Signals (all exact-integer so the flag is bit-stable across
    engines and partitionings):
    - ``n_docs`` >= ``min_docs`` (tiny domains are unjudgeable);
    - at least ``min_quality_pct``% of the domain's documents have
      ``n_chars`` >= ``quality_chars`` (integer cross-multiply, no
      float ratio);
    - ``mean_chars`` reported as an exact int/int double for
      observability only.

    Plan shape: ONE shuffle (the domain groupBy). The result is one
    row per domain -- at any corpus size the reputation table is tiny
    relative to the corpus, so gating the documents themselves is a
    broadcast semi-join back onto the scan (zero additional
    exchange). RefinedWeb §3.1 runs exactly this shape at web scale.
    """
    per_domain = docs.groupBy("url_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col(chars_col) >= quality_chars, 1).otherwise(0)
        ).alias("n_quality_docs"),
        F.sum(F.col(chars_col)).alias("__sum_chars"),
    )
    rep = per_domain.select(
        "url_domain",
        "n_docs",
        "n_quality_docs",
        (F.col("__sum_chars").cast("double") / F.col("n_docs")).alias(
            "mean_chars"
        ),
        (
            (F.col("n_docs") >= F.lit(min_docs))
            & (
                F.col("n_quality_docs") * 100
                >= F.col("n_docs") * F.lit(min_quality_pct)
            )
        ).alias("rep_keep"),
    )
    return rep.withColumn(
        "n_docs_admitted",
        F.when(F.col("rep_keep"), F.col("n_docs")).otherwise(F.lit(0)),
    )


def synth_url_colliding_expr(
    id_col: str = "doc_id",
    source_col: str = "source",
    path_mod: int = 150,
) -> str:
    """Variant of :func:`synth_url_expr` whose PATH is keyed on
    ``doc_id % path_mod`` instead of the unique doc_id, so distinct
    raw URLs (different scheme case / www / ports / tracking params)
    COLLIDE after canonicalization whenever two docs share
    (source, doc_id mod path_mod) -- the substrate for URL-grain
    dedup, which is only correct post-canonicalization."""
    i, s = id_col, source_col
    return (
        f"CASE {i} % 4 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://' "
        f"WHEN 2 THEN 'HTTPS://WWW.' ELSE 'https://www.' END "
        f"|| CASE WHEN {i} % 4 = 2 THEN upper({s}) ELSE {s} END "
        f"|| '.example.com' "
        # default ports only, so the port never splits a canon group
        f"|| CASE WHEN {i} % 5 = 0 THEN ':443' ELSE '' END "
        f"|| '/Articles/' || CAST({i} % {path_mod} AS STRING) "
        f"|| CASE WHEN {i} % 3 = 0 THEN '/' ELSE '' END "
        f"|| CASE WHEN {i} % 2 = 0 THEN '?utm_source=feed' "
        f"ELSE '?ref=rss' END "
        f"|| CASE WHEN {i} % 7 = 0 THEN '#section-2' ELSE '' END"
    )


def url_dedup(
    docs_with_canon: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """URL-grain exact dedup (the first dedup stage of C4: one
    document per canonical URL): group on ``canon_url``, keep the
    min-id representative, report group size and how many RAW
    spellings the canonical form absorbed.

    One shuffle on the canonical-URL key (high-cardinality, unskewed)
    with map-side partial aggregation -- the optimal exact-dedup plan
    at any scale, same shape as content ``exact_dedup``.
    """
    return (
        docs_with_canon.groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("raw_url").alias("n_raw_variants"),
        )
    )


def domain_suffixes_expr(domain_col: str = "url_domain") -> str:
    """SQL expression (Spark dialect) producing the label-suffix set
    of a domain: 'a.b.example.com' -> ['a.b.example.com',
    'b.example.com', 'example.com', 'com']. A blocklist entry blocks a
    domain iff it appears in this set (suffix-match semantics)."""
    d = domain_col
    return (
        f"transform(sequence(1, size(split({d}, '\\\\.'))), "
        f"i -> array_join(slice(split({d}, '\\\\.'), i, "
        f"size(split({d}, '\\\\.')) - i + 1), '.'))"
    )


def domain_blocklist_filter(
    docs_with_domain: DataFrame,
    blocklist: DataFrame,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Suffix-matching domain blocklist gate: a document is blocked
    when ANY label-suffix of its ``url_domain`` appears in the
    blocklist (blocking 'example.com' blocks 'a.b.example.com').

    ``blocklist`` is a one-column DataFrame (``blocked_domain``).
    Plan: the domain explodes into its <= #labels suffixes (a handful
    per row) and EQUI-joins the broadcast blocklist -- no theta/regex
    join, so at 100 TB this is a plain broadcast hash semi-join on a
    short string key even with a multi-million-entry blocklist
    (at which point the broadcast flips to a shuffle semi-join on the
    same key, still never a cross product). Returns the input rows
    plus a ``blocked`` flag.
    """
    suffixes = F.expr(domain_suffixes_expr())
    exploded = docs_with_domain.select(
        F.col(id_col), F.explode(suffixes).alias("blocked_domain")
    )
    hits = (
        exploded.join(F.broadcast(blocklist), "blocked_domain", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return docs_with_domain.join(hits, id_col, "left").withColumn(
        "blocked", F.coalesce(F.col("blocked"), F.lit(False))
    )
