"""Flink-SQL dialect front end: run the reference's VERBATIM job
scripts (flink/flink_job.sql, flink/anomaly_job.sql) on Spark.

The reference user's artifact is Flink SQL submitted via
``sql-client.sh -f job.sql``. The shipped ``sql/*.sql`` scripts are
the Spark-dialect re-expressions; this module removes even that
porting step by translating the Flink dialect subset those jobs use:

* ``SET 'k' = 'v';``                    -> recorded, not executed
* ``CREATE TABLE name (schema...,
     computed AS expr,
     WATERMARK FOR c AS c - INTERVAL '<n>' SECOND)
   WITH ('connector' = ..., ...)``      -> a TableDef: schema,
  computed columns, watermark delay, connector options. Whether a
  table is a source or a sink is decided by USAGE (INSERT INTO
  targets are sinks, everything else must be bound to a DataFrame),
  exactly like Flink's planner -- not by schema shape. Execution
  binds source names to caller-provided DataFrames (batch) and
  returns each sink's INSERT result (the broker socket is the one
  thing this sandbox cannot host; `streaming/sources.py` owns the
  real Kafka wiring).
* ``TO_TIMESTAMP_LTZ(x, 3)``            -> ``timestamp_millis(x)``
  (exact under this engine's UTC session contract, session.py).
* ``GROUP BY TUMBLE(ts, INTERVAL '1' MINUTE), k``
                                        -> ``GROUP BY window(ts,
  '1 minute'), k``; ``TUMBLE_START(...)`` / ``TUMBLE_END(...)``
  projections -> ``window.start`` / ``window.end`` (valid because a
  query groups by a single TUMBLE whose interval matches every
  bound's -- both asserted during translation).
* ``CREATE VIEW v AS SELECT ...``       -> ``CREATE OR REPLACE
  TEMPORARY VIEW`` (LAG/OVER pass through untouched -- Spark SQL).
* ``BEGIN STATEMENT SET; ... END;``     -> the statement list between
  the markers (single materialization per INSERT here; the streaming
  multi-sink analogue is streaming/sinks.py::dual_sink).
* ``INSERT INTO sink SELECT ...``       -> the SELECT, translated,
  run against the registered views; results keyed by sink name.

Views and inserts execute in SCRIPT ORDER (a view may read an
earlier INSERT's sink). Statement splitting reuses
runner.split_statements (quote/comment aware). Everything else in
the reference scripts -- interval join BETWEEN predicates,
COUNT(DISTINCT), CASE, COALESCE, LAG OVER -- is already common SQL
and passes through verbatim.

tests/test_flink_dialect.py proves the reference's own two scripts
(read from /root/reference when present, skipped otherwise so the
repo stays standalone) translate and produce results value-equal to
the native operators on the reference-parity fixture.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .runner import split_statements


@dataclass
class TableDef:
    name: str
    columns: list[tuple[str, str]]          # (name, declared type)
    computed: list[tuple[str, str]]         # (name, spark expr)
    watermark: tuple[str, str] | None       # (column, "<n> <unit>")
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class TranslatedScript:
    settings: dict[str, str]
    tables: dict[str, TableDef]
    #: ("view" | "insert", target name, translated SELECT), script order
    statements: list[tuple[str, str, str]]

    @property
    def sink_names(self) -> set[str]:
        return {n for k, n, _ in self.statements if k == "insert"}

    @property
    def sources(self) -> dict[str, TableDef]:
        return {
            n: t for n, t in self.tables.items() if n not in self.sink_names
        }

    @property
    def sinks(self) -> dict[str, TableDef]:
        return {
            n: t for n, t in self.tables.items() if n in self.sink_names
        }

    @property
    def inserts(self) -> list[tuple[str, str]]:
        return [(n, sql) for k, n, sql in self.statements if k == "insert"]


_SET_RE = re.compile(r"^SET\s+'([^']+)'\s*=\s*'([^']*)'\s*$", re.I | re.S)
_CREATE_RE = re.compile(
    r"^CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*$", re.I | re.S
)
_VIEW_RE = re.compile(r"^CREATE\s+VIEW\s+(\w+)\s+AS\s+(.*)$", re.I | re.S)
_INSERT_RE = re.compile(r"^INSERT\s+INTO\s+(\w+)\s+(SELECT\b.*)$", re.I | re.S)
_WATERMARK_RE = re.compile(
    r"^WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*INTERVAL\s+'(\d+)'\s+(\w+)$",
    re.I,
)
_COMPUTED_RE = re.compile(r"^(\w+)\s+AS\s+(.+)$", re.I | re.S)
_COLUMN_RE = re.compile(r"^(\w+)\s+([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)$")
_TUMBLE_RE = re.compile(
    r"TUMBLE\s*\(\s*([^,()]+?)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)", re.I
)
_TUMBLE_BOUND_RE = re.compile(
    r"TUMBLE_(START|END)\s*\(\s*[^,()]+?\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)",
    re.I,
)
_TO_TS_LTZ_RE = re.compile(
    r"TO_TIMESTAMP_LTZ\s*\(\s*([^,()]+?)\s*,\s*3\s*\)", re.I
)


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas not nested in parentheses or quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        parts.append("".join(buf).strip())
    return parts


def _strip_line_comments(s: str) -> str:
    """Remove -- comments (the DDL bodies embed them mid-definition).

    Char-wise over the whole statement, tracking quote state ACROSS
    newlines and skipping backslash-escaped quotes -- the same
    conventions as runner.split_statements, so the pair cannot
    disagree about where a string literal ends.
    """
    out: list[str] = []
    q: str | None = None
    i = 0
    while i < len(s):
        ch = s[i]
        if q:
            out.append(ch)
            if ch == "\\" and i + 1 < len(s):
                out.append(s[i + 1])
                i += 2
                continue
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
            out.append(ch)
            i += 1
            continue
        if ch == "-" and s[i : i + 2] == "--":
            j = s.find("\n", i)
            i = len(s) if j < 0 else j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _translate_exprs(sql: str) -> str:
    """Rewrite the Flink-only expressions to Spark SQL."""
    sql = _TO_TS_LTZ_RE.sub(r"timestamp_millis(\1)", sql)
    # TUMBLE_START/END projections -> window struct fields. Valid only
    # when the statement groups by a single TUMBLE and every bound's
    # interval matches it (Flink itself rejects a mismatch); both are
    # checked here rather than silently rewritten. TUMBLE_START( does
    # not match _TUMBLE_RE (the underscore breaks `TUMBLE\s*\(`), so
    # inspection order is immaterial.
    bound_ivals = {
        (m.group(2), m.group(3).lower())
        for m in _TUMBLE_BOUND_RE.finditer(sql)
    }
    grouped = {
        (m.group(2), m.group(3).lower()) for m in _TUMBLE_RE.finditer(sql)
    }
    if len(grouped) > 1:
        raise ValueError(
            f"statement groups by {len(grouped)} distinct TUMBLEs; "
            "TUMBLE_START/END rewriting needs exactly one"
        )
    if bound_ivals and not grouped:
        raise ValueError("TUMBLE_START/END without a GROUP BY TUMBLE")
    if bound_ivals and bound_ivals != grouped:
        raise ValueError(
            f"TUMBLE_START/END interval {sorted(bound_ivals)} does not "
            f"match the GROUP BY TUMBLE interval {sorted(grouped)}"
        )
    sql = _TUMBLE_BOUND_RE.sub(
        lambda m: f"window.{m.group(1).lower()}", sql
    )
    sql = _TUMBLE_RE.sub(
        lambda m: (
            f"window({m.group(1).strip()}, "
            f"'{m.group(2)} {m.group(3).lower()}')"
        ),
        sql,
    )
    return sql


def _parse_with_options(body: str) -> dict[str, str]:
    opts = {}
    for part in _split_top_level_commas(body):
        m = re.match(r"^'([^']+)'\s*=\s*'([^']*)'$", part.strip())
        if m:
            opts[m.group(1)] = m.group(2)
    return opts


def translate_script(script: str) -> TranslatedScript:
    out = TranslatedScript({}, {}, [])
    in_statement_set = False
    for stmt in split_statements(script):
        s = _strip_line_comments(stmt).strip()
        if not s:
            continue
        if re.fullmatch(r"BEGIN\s+STATEMENT\s+SET", s, re.I):
            in_statement_set = True
            continue
        if re.fullmatch(r"END", s, re.I):
            in_statement_set = False
            continue
        m = _SET_RE.match(s)
        if m:
            out.settings[m.group(1)] = m.group(2)
            continue
        m = _CREATE_RE.match(s)
        if m:
            name, cols_body, with_body = m.groups()
            columns, computed, watermark = [], [], None
            for item in _split_top_level_commas(cols_body):
                item = re.sub(r"\s+", " ", item.strip())
                wm = _WATERMARK_RE.match(item)
                if wm:
                    watermark = (
                        wm.group(1),
                        f"{wm.group(2)} {wm.group(3).lower()}",
                    )
                    continue
                cm = _COLUMN_RE.match(item)
                if cm:
                    columns.append((cm.group(1), cm.group(2)))
                    continue
                xm = _COMPUTED_RE.match(item)
                if xm:
                    computed.append(
                        (xm.group(1), _translate_exprs(xm.group(2)))
                    )
                    continue
                raise ValueError(f"unparsed DDL item in {name}: {item!r}")
            out.tables[name] = TableDef(
                name, columns, computed, watermark,
                _parse_with_options(with_body),
            )
            continue
        m = _VIEW_RE.match(s)
        if m:
            out.statements.append(
                ("view", m.group(1), _translate_exprs(m.group(2)))
            )
            continue
        m = _INSERT_RE.match(s)
        if m:
            out.statements.append(
                ("insert", m.group(1), _translate_exprs(m.group(2)))
            )
            continue
        raise ValueError(f"unsupported statement: {s[:80]!r}")
    if in_statement_set:
        raise ValueError("BEGIN STATEMENT SET without END")
    for sink in out.sink_names:
        if sink not in out.tables:
            raise ValueError(f"INSERT INTO undeclared table {sink!r}")
    return out


def run_batch(
    spark: SparkSession,
    script: str,
    tables: dict[str, DataFrame],
) -> dict[str, DataFrame]:
    """Execute a translated Flink script in batch mode.

    ``tables`` binds each source table name (every CREATE TABLE that
    is NOT an INSERT target) to a DataFrame of its PHYSICAL columns
    (the Kafka payload relation -- in production the streaming twin
    binds `streaming/sources.py::kafka_json_stream` here instead).
    Every declared physical column must be present in the bound
    DataFrame (fail-fast on typos); computed columns from the DDL are
    applied on top; watermarks are no-ops in batch (late data cannot
    exist). A source fed by another SCRIPT's INSERT (the reference's
    two-stage topology) is bound to that earlier run's sink result.

    Views and INSERTs execute in SCRIPT ORDER against temporary views
    in the session catalog, so a view may read an earlier INSERT's
    sink within the same script. Returns {sink name: DataFrame}.
    """
    ts = translate_script(script)
    missing_binds = sorted(set(ts.sources) - set(tables))
    if missing_binds:
        raise KeyError(f"source tables not bound: {missing_binds}")
    for name, src in ts.sources.items():
        df = tables[name]
        declared = [c for c, _ in src.columns]
        missing_cols = sorted(set(declared) - set(df.columns))
        if missing_cols:
            raise ValueError(
                f"table {name!r}: declared columns missing from the "
                f"bound DataFrame: {missing_cols}"
            )
        df = df.selectExpr(
            *declared, *[f"{expr} AS {col}" for col, expr in src.computed]
        )
        df.createOrReplaceTempView(name)
    bound_sinks: dict[str, DataFrame] = {}
    for kind, name, select in ts.statements:
        if kind == "view":
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {select}"
            )
            continue
        result = spark.sql(select)
        expected = [c for c, _ in ts.tables[name].columns]
        if len(result.columns) != len(expected):
            raise ValueError(
                f"INSERT INTO {name}: SELECT produces "
                f"{len(result.columns)} columns, sink declares "
                f"{len(expected)}"
            )
        result = result.toDF(*expected)
        bound_sinks[name] = result
        # a later statement may read this sink as ITS source
        result.createOrReplaceTempView(name)
    return bound_sinks


# -- streaming execution ------------------------------------------------------
#
# The reference jobs run with 'execution.runtime-mode' = 'streaming'
# (flink_job.sql:2, anomaly_job.sql:4). Spark's streaming engine
# cannot execute their SELECTs as raw SQL -- COUNT(DISTINCT) and
# OVER windows are unsupported on streams -- so, exactly like Flink's
# planner, run_streaming RECOGNIZES the logical statement shapes and
# binds them to the engine's physical streaming operators (the twins
# in streaming/jobs.py and streaming/stateful.py, each proven
# value-equal to its batch form in tests/test_streaming.py). The
# dispatch is structural and fail-fast: a statement that matches no
# supported shape and cannot run as generic streaming SQL raises.

_S_FROMJOIN_RE = re.compile(
    r"FROM\s+(\w+)\s+(\w+)\s+LEFT\s+JOIN\s+(\w+)\s+(\w+)\s+ON\s+"
    r"(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s+AND\s+"
    r"(\w+)\.(\w+)\s+BETWEEN\s+(\w+)\.(\w+)\s+AND\s+(\w+)\.(\w+)\s*\+\s*"
    r"INTERVAL\s+'(\d+)'\s+(\w+)",
    re.I | re.S,
)
_S_GROUP_RE = re.compile(
    r"GROUP\s+BY\s+window\(\s*(\w+)\.(\w+)\s*,\s*'([^']+)'\s*\)\s*,\s*"
    r"(\w+)\.(\w+)",
    re.I | re.S,
)
_S_CDIST_RE = re.compile(
    r"COUNT\s*\(\s*DISTINCT\s+(\w+)\.(\w+)\s*\)\s+as\s+(\w+)", re.I
)
_S_COALESCE_RE = re.compile(
    r"COALESCE\s*\(\s*(\w+)\.(\w+)\s*,\s*'([^']+)'\s*\)\s+as\s+(\w+)", re.I
)
_S_LAG_RE = re.compile(
    r"LAG\s*\(\s*(\w+)\s*(?:,\s*1\s*)?\)\s+OVER\s*\(\s*PARTITION\s+BY\s+"
    r"(\w+)\s+ORDER\s+BY\s+(\w+)\s*\)",
    re.I,
)
_S_FROM_RE = re.compile(r"FROM\s+(\w+)", re.I)


def _interval_str(n: str, unit: str) -> str:
    return f"{n} {unit.lower()}"


def _match_windowed_join_agg(select: str) -> dict | None:
    """Structural match for the reference's CTR/engagement statement:
    event-time interval LEFT join + tumbling window + per-key
    COUNT(DISTINCT) aggregates (flink_job.sql:77-120)."""
    mj = _S_FROMJOIN_RE.search(select)
    mg = _S_GROUP_RE.search(select)
    if not (mj and mg):
        return None
    (lt, la, rt, ra,
     e1a, e1c, e2a, e2c,
     ba, bc, lo1a, lo1c, lo2a, lo2c, bn, bu) = mj.groups()
    wa, wc, wsize, ga, gc = mg.groups()
    # orientation + consistency checks (fail loud on unexpected shapes)
    if {e1a, e2a} != {la, ra} or e1c != e2c:
        raise ValueError(f"unsupported join key shape: {select[:120]!r}")
    if not (ba == ra and lo1a == la and lo2a == la and lo1c == lo2c):
        raise ValueError(
            f"unsupported interval-band shape: {select[:120]!r}"
        )
    if wa != la or ga != la:
        raise ValueError(
            "window/group key must come from the left (probe) stream"
        )
    if wc != lo1c:
        # the streaming plan windows on the join band's lower-bound
        # column; a GROUP BY window over a DIFFERENT time column would
        # be silently misbound -- reject instead
        raise ValueError(
            f"GROUP BY window time column {wc!r} differs from the "
            f"interval band's event-time column {lo1c!r}"
        )
    dists = {a: (c, out) for a, c, out in _S_CDIST_RE.findall(select)}
    if set(dists) != {la, ra}:
        return None
    co = _S_COALESCE_RE.search(select)
    coalesced = None
    if co and co.group(1) == la and co.group(2) == gc:
        coalesced = (co.group(3), co.group(4))
    _verify_join_agg_projections(
        select, la=la, ra=ra, gc=gc,
        imp_id=dists[la][0], click_id=dists[ra][0],
    )
    return {
        "imp_table": lt,
        "clk_table": rt,
        "key": e1c,
        "imp_time": lo1c,
        "clk_time": bc,
        "band": _interval_str(bn, bu),
        "window": wsize,
        "group_col": gc,
        "imp_id": dists[la][0],
        "click_id": dists[ra][0],
        "coalesced": coalesced,
    }


def _norm_tokens(s: str) -> str:
    """Lower-case token-stream normalization for SQL fragment
    comparison: squash whitespace runs, then drop spaces adjacent to
    punctuation ('(', ')', ',', '/', '>') so only token ORDER is
    compared. Used by the CTR-projection verifier to accept spacing
    variants of the canonical metric while still failing fast on any
    genuinely different expression."""
    flat = re.sub(r"\s+", " ", s.strip()).lower()
    return re.sub(r"\s*([(),/>])\s*", r"\1", flat)


def _verify_join_agg_projections(
    select: str, *, la: str, ra: str, gc: str, imp_id: str, click_id: str
) -> None:
    """Every SELECT item of a twin-bound statement must be one the twin
    actually computes; anything else raises (fail-fast contract).

    The structural matcher checks the FROM/JOIN/GROUP/COUNT(DISTINCT)
    skeleton, but before round 5 it never looked at the remaining
    projections -- a statement with the same skeleton and a DIFFERENT
    derived metric (ctr as a percentage, an extra computed column)
    would silently bind to streaming_ctr_windows' fixed ctr definition.
    Recognized items: window bounds, the (optionally COALESCEd) group
    column, the two COUNT(DISTINCT)s, and the ctr CASE with EXACTLY
    the twin's semantics (clicks/impressions when impressions > 0,
    else 0.0, aliased ctr).
    """
    m = re.search(r"SELECT\s+(.*?)\s+FROM\s", select, re.I | re.S)
    if not m:
        raise ValueError(f"unparseable SELECT list: {select[:120]!r}")
    # two accepted spellings of the SAME metric: the reference's form
    # (double numerator, implicit-promotion denominator) and the
    # denominator-cast form (what e.g. this repo's own batch oracle
    # SQL writes) -- value-identical; anything else raises.
    # _norm_tokens (not plain whitespace-squash) so spacing variants
    # around parentheses/operators ('COUNT( DISTINCT x )',
    # 'COUNT (DISTINCT ...)') match the same canonical token stream --
    # the standalone COUNT(DISTINCT) regexes already accepted those,
    # the CASE comparison must too
    canonical_ctrs = {
        _norm_tokens(
            f"CASE WHEN COUNT(DISTINCT {la}.{imp_id}) > 0 "
            f"THEN CAST(COUNT(DISTINCT {ra}.{click_id}) AS DOUBLE) "
            f"/ {den} ELSE 0.0 END as ctr"
        )
        for den in (
            f"COUNT(DISTINCT {la}.{imp_id})",
            f"CAST(COUNT(DISTINCT {la}.{imp_id}) AS DOUBLE)",
        )
    }
    allowed = [
        re.compile(r"^window\.(start|end)\s+as\s+\w+$", re.I),
        re.compile(rf"^{la}\.{gc}(\s+as\s+\w+)?$", re.I),
        re.compile(
            rf"^COALESCE\s*\(\s*{la}\.{gc}\s*,\s*'[^']*'\s*\)\s+as\s+\w+$",
            re.I,
        ),
        re.compile(
            rf"^COUNT\s*\(\s*DISTINCT\s+{la}\.{imp_id}\s*\)\s+as\s+\w+$", re.I
        ),
        re.compile(
            rf"^COUNT\s*\(\s*DISTINCT\s+{ra}\.{click_id}\s*\)\s+as\s+\w+$",
            re.I,
        ),
    ]
    for item in _split_top_level_commas(m.group(1)):
        flat = re.sub(r"\s+", " ", item.strip())
        if not flat:
            continue
        if any(p.match(flat) for p in allowed):
            continue
        if _norm_tokens(flat) in canonical_ctrs:
            continue
        raise ValueError(
            f"unsupported projection in windowed-join statement (the "
            f"streaming twin computes a fixed metric set): {flat!r}"
        )


def _match_lag_alerts(
    select: str, views: dict[str, str]
) -> dict | None:
    """Structural match for the anomaly statement: a view computing
    LAG(ctr) OVER (PARTITION BY key ORDER BY event-time) consumed by a
    CASE/WHERE alert projection (anomaly_job.sql:49-85)."""
    mf = _S_FROM_RE.search(select)
    if not mf or mf.group(1) not in views:
        return None
    view_sql = views[mf.group(1)]
    ml = _S_LAG_RE.search(view_sql)
    if not ml:
        return None
    lag_col, part_col, order_col = ml.groups()
    mv = _S_FROM_RE.search(view_sql)
    if not mv:
        return None
    src = mv.group(1)
    return {
        "source": src,
        "lag_col": lag_col,
        "part_col": part_col,
        "order_col": order_col,
    }


def run_streaming(
    spark: SparkSession,
    script: str,
    streams: dict[str, DataFrame],
) -> dict[str, DataFrame]:
    """Execute a translated Flink script in STREAMING mode.

    ``streams`` binds each source table name to a STREAMING DataFrame
    of its PHYSICAL columns (readStream; in production
    `streaming/sources.py::kafka_json_stream` -- the broker socket is
    the one thing this sandbox cannot host, so tests bind the file
    bus). Computed columns and the DDL's WATERMARK are applied from
    the verbatim table definitions -- the watermark delay the job
    declares is the one the stream runs with.

    Each INSERT is dispatched on its logical shape:

    * interval LEFT join + TUMBLE + COUNT(DISTINCT) (flink_job.sql's
      two statements) -> ``streaming_ctr_windows`` /
      ``streaming_engagement_windows`` (the dedup-decomposed plans,
      proven == batch countDistinct semantics);
    * LAG OVER per key through a view (anomaly_job.sql) ->
      ``streaming_anomaly_alerts`` (the buffered event-time-ordered
      stateful operator, proven == batch detect_anomalies);
    * anything else -> generic streaming SQL over the bound temp
      views, failing loudly if Spark's streaming engine rejects it.

    Returns {sink name: UNSTARTED streaming DataFrame} with exactly
    the sink's declared columns; the caller owns writeStream (sink
    choice, checkpointing, triggers -- streaming/sinks.py). Verbatim
    two-script chaining works like the reference's topic bus: write
    stage 1's sink to a bus, readStream it back as stage 2's source.
    """
    from ..streaming.jobs import (
        streaming_ctr_windows,
        streaming_engagement_windows,
    )
    from ..streaming.stateful import streaming_anomaly_alerts

    ts = translate_script(script)
    missing_binds = sorted(set(ts.sources) - set(streams))
    if missing_binds:
        raise KeyError(f"source tables not bound: {missing_binds}")
    bound: dict[str, DataFrame] = {}
    raw_bound: dict[str, DataFrame] = {}
    for name, src in ts.sources.items():
        df = streams[name]
        if not df.isStreaming:
            raise ValueError(f"table {name!r}: bound DataFrame is batch")
        declared = [c for c, _ in src.columns]
        missing_cols = sorted(set(declared) - set(df.columns))
        if missing_cols:
            raise ValueError(
                f"table {name!r}: declared columns missing from the "
                f"bound stream: {missing_cols}"
            )
        raw_bound[name] = df.selectExpr(*declared)
        out = df.selectExpr(
            *declared, *[f"{expr} AS {col}" for col, expr in src.computed]
        )
        if src.watermark is not None:
            wcol, delay = src.watermark
            out = out.withWatermark(wcol, delay)
        bound[name] = out

    views = {n: sql for k, n, sql in ts.statements if k == "view"}
    results: dict[str, DataFrame] = {}
    generic_registered = False
    for kind, name, select in ts.statements:
        if kind == "view":
            continue
        sink_cols = [c for c, _ in ts.tables[name].columns]
        agg = _match_windowed_join_agg(select)
        if agg is not None:
            imp, clk = bound[agg["imp_table"]], bound[agg["clk_table"]]
            kwargs = dict(
                key=agg["key"],
                imp_id=agg["imp_id"],
                click_id=agg["click_id"],
                imp_time=agg["imp_time"],
                click_time=agg["clk_time"],
                window=agg["window"],
                band=agg["band"],
            )
            if agg["coalesced"] is not None:
                default, out_name = agg["coalesced"]
                out = streaming_engagement_windows(
                    imp, clk,
                    segment_col=agg["group_col"], default=default, **kwargs,
                ).withColumnRenamed(agg["group_col"], out_name)
            else:
                out = streaming_ctr_windows(
                    imp, clk, group_key=agg["group_col"], **kwargs
                )
            missing_out = sorted(set(sink_cols) - set(out.columns))
            if missing_out:
                raise ValueError(
                    f"INSERT INTO {name}: streaming plan lacks declared "
                    f"sink columns {missing_out}"
                )
            results[name] = out.select(*sink_cols)
            continue
        lag = _match_lag_alerts(select, views)
        if lag is not None:
            if lag["source"] not in raw_bound:
                # view-over-view or an undeclared FROM: out of the
                # twin's shape -- fail with the dispatcher's
                # documented error, not a bare KeyError
                raise ValueError(
                    f"unsupported LAG shape: view reads FROM "
                    f"{lag['source']!r}, which is not a bound source "
                    "table"
                )
            src_def = ts.tables[lag["source"]]
            # the twin's contract: per-campaign LAG(ctr) ordered by the
            # window end (the view's event_time is computed AS
            # window_end -- identity); reject anything else rather than
            # silently running the wrong operator
            computed = dict(src_def.computed)
            order_src = computed.get(lag["order_col"], lag["order_col"])
            if (
                lag["part_col"] != "campaign_id"
                or lag["lag_col"] != "ctr"
                or order_src.strip() != "window_end"
            ):
                raise ValueError(
                    f"unsupported LAG shape: partition {lag['part_col']}, "
                    f"lag {lag['lag_col']}, order {order_src}"
                )
            delay = (
                src_def.watermark[1] if src_def.watermark else "10 seconds"
            )
            out = streaming_anomaly_alerts(
                raw_bound[lag["source"]], watermark=delay
            )
            results[name] = out.select(*sink_cols)
            continue
        wd = _match_windowed_distinct_agg(select)
        if wd is not None:
            if wd["table"] not in bound:
                # same guard as the LAG branch: a matching statement
                # reading FROM a script view is out of this twin's
                # shape -- fail with the dispatcher's documented error,
                # not a bare KeyError
                raise ValueError(
                    f"unsupported windowed COUNT(DISTINCT) shape: reads "
                    f"FROM {wd['table']!r}, which is not a bound source "
                    "table"
                )
            out = _build_windowed_distinct_agg(bound[wd["table"]], wd)
            missing_out = sorted(set(sink_cols) - set(out.columns))
            if missing_out:
                raise ValueError(
                    f"INSERT INTO {name}: streaming plan lacks declared "
                    f"sink columns {missing_out}"
                )
            results[name] = out.select(*sink_cols)
            continue
        # generic fallback: stateless projections/filters run as plain
        # streaming SQL over the bound views
        if not generic_registered:
            for n, df in bound.items():
                df.createOrReplaceTempView(n)
            for n, vsql in views.items():
                spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {n} AS {vsql}")
            generic_registered = True
        result = spark.sql(select)
        if len(result.columns) != len(sink_cols):
            raise ValueError(
                f"INSERT INTO {name}: SELECT produces "
                f"{len(result.columns)} columns, sink declares "
                f"{len(sink_cols)}"
            )
        results[name] = result.toDF(*sink_cols)
    return results


_S_GROUP_SINGLE_RE = re.compile(
    r"GROUP\s+BY\s+window\(\s*(?:(\w+)\.)?(\w+)\s*,\s*'([^']+)'\s*\)\s*"
    r"(?:,\s*(?:(\w+)\.)?(\w+))?\s*;?\s*$",
    re.I | re.S,
)
_S_FROM_SINGLE_RE = re.compile(
    r"FROM\s+(\w+)(?:\s+(?!GROUP\b)(\w+))?\s+GROUP\s+BY", re.I | re.S
)
_S_OTHER_AGG_RE = re.compile(
    r"\b(?:SUM|AVG|MIN|MAX)\s*\(|COUNT\s*\(\s*(?!DISTINCT)", re.I
)
_S_CDIST_OPT_RE = re.compile(
    r"COUNT\s*\(\s*DISTINCT\s+(?:(\w+)\.)?(\w+)\s*\)\s+as\s+(\w+)", re.I
)


def _match_windowed_distinct_agg(select: str) -> dict | None:
    """Structural match for a SINGLE-source tumbling aggregate whose
    aggregates are all COUNT(DISTINCT ...) -- the remaining Flink-SQL
    statement shape Spark streaming cannot run natively. Rewritten by
    dedup-decomposition (dropDuplicatesWithinWatermark per distinct
    column, then plain counts -- the proven streaming_ctr technique),
    exactly equal to the batch countDistinct semantics."""
    mf = _S_FROM_SINGLE_RE.search(select)
    mg = _S_GROUP_SINGLE_RE.search(select)
    if not (mf and mg):
        return None
    table, alias = mf.groups()
    wa, tcol, wiv, ka, kcol = mg.groups()
    names_ok = {alias, table, None}
    if wa not in names_ok or ka not in names_ok:
        return None
    if _S_OTHER_AGG_RE.search(select):
        return None  # mixed aggregates: out of this rewrite's scope
    dists = [
        (a, c, out)
        for a, c, out in _S_CDIST_OPT_RE.findall(select)
        if (a or None) in names_ok or a == ""
    ]
    if not dists:
        return None
    # projection list: everything between SELECT and FROM, each item
    # one of window.start/window.end/key/COUNT(DISTINCT ...) [as name]
    body = re.search(r"SELECT\s+(.*?)\s+FROM\s", select, re.I | re.S)
    projections: list[tuple[str, str]] = []  # (source, out name)
    for item in _split_top_level_commas(body.group(1)):
        item = item.strip()
        m = re.match(r"^(.*?)\s+as\s+(\w+)$", item, re.I | re.S)
        expr, out = (m.group(1), m.group(2)) if m else (item, None)
        expr = expr.strip()
        prefix = r"(?:\w+\.)?"
        if re.fullmatch(r"window\.start", expr, re.I):
            projections.append(("w.start", out or "start"))
        elif re.fullmatch(r"window\.end", expr, re.I):
            projections.append(("w.end", out or "end"))
        elif kcol and re.fullmatch(prefix + kcol, expr, re.I):
            projections.append((kcol, out or kcol))
        else:
            md = _S_CDIST_OPT_RE.fullmatch(item)
            if md and (md.group(1) or None) in {alias, table, None}:
                # legs are keyed by the OUTPUT alias, not the source
                # column: two COUNT(DISTINCT same_col) projections
                # must build two distinctly-named legs
                projections.append((f"__cd_{md.group(3)}", md.group(3)))
            else:
                return None  # unsupported projection -> not this shape
    return {
        "table": table,
        "tcol": tcol,
        "window": wiv,
        "key": kcol,
        "distincts": [(c, out) for _, c, out in dists],
        "projections": projections,
    }


def _build_windowed_distinct_agg(bound_df: DataFrame, m: dict) -> DataFrame:
    from pyspark.sql import functions as F

    keys = [m["key"]] if m["key"] else []
    agg = None
    for col, out in m["distincts"]:
        d = bound_df.select(
            F.window(F.col(m["tcol"]), m["window"]).alias("w"),
            *keys,
            F.col(col),
        ).dropDuplicatesWithinWatermark(["w", *keys, col])
        c = d.groupBy("w", *keys).agg(
            F.count(F.col(col)).alias(f"__cd_{out}")
        )
        # every (window, key) group that exists in one leg exists in
        # all legs (dedup keeps >= 1 row per group), so left join
        # loses nothing; coalesce is belt-and-braces for the
        # all-null-column case
        agg = c if agg is None else agg.join(c, ["w", *keys], "left")
    cols = []
    for src, out in m["projections"]:
        if src.startswith("__cd_"):
            cols.append(F.coalesce(F.col(src), F.lit(0)).alias(out))
        else:
            cols.append(F.col(src).alias(out))
    return agg.select(*cols)
