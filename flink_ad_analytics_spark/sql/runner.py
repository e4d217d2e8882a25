"""Multi-statement SQL script runner.

`spark.sql()` executes ONE statement; a file-submitted job script
(the reference's entry-point shape, README.md:81) holds several --
view definitions, then queries. This runner splits on statement-
terminating semicolons with a real lexer (semicolons inside string
literals, quoted identifiers, and comments are content, not
terminators -- a regex split corrupts any script containing `';'`),
executes each statement in order, and returns the result DataFrames
of the statements that produce rows (SELECT/VALUES/SHOW...), so a
two-query script maps naturally onto the reference's statement-set
(`flink_job.sql:74-120`): shared upstream views, several results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def split_statements(script: str) -> list[str]:
    """Split a SQL script into statements on top-level semicolons.

    Handles: single-quoted strings (with '' and backslash escapes),
    double-quoted identifiers, backtick identifiers, `--` line
    comments, `/* */` block comments (non-nested, per SQL spec).
    Empty/comment-only fragments are dropped.
    """
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    mode = None  # None | "'" | '"' | '`' | '--' | '/*'
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if mode is None:
            if ch == ";":
                stmt = "".join(buf).strip()
                if stmt and not _only_comments(stmt):
                    out.append(stmt)
                buf = []
                i += 1
                continue
            if ch == "-" and nxt == "-":
                mode = "--"
            elif ch == "/" and nxt == "*":
                mode = "/*"
            elif ch in ("'", '"', "`"):
                mode = ch
            buf.append(ch)
            i += 1
        elif mode == "--":
            buf.append(ch)
            if ch == "\n":
                mode = None
            i += 1
        elif mode == "/*":
            buf.append(ch)
            if ch == "*" and nxt == "/":
                buf.append(nxt)
                i += 2
                mode = None
                continue
            i += 1
        else:  # inside a quoted region
            buf.append(ch)
            if ch == "\\" and mode == "'" and nxt:
                buf.append(nxt)  # escaped char inside string
                i += 2
                continue
            if ch == mode:
                if nxt == mode:  # doubled-quote escape ('' "" ``)
                    buf.append(nxt)
                    i += 2
                    continue
                mode = None
            i += 1
    tail = "".join(buf).strip()
    if tail and not _only_comments(tail):
        out.append(tail)
    return out


def _only_comments(stmt: str) -> bool:
    """True when the fragment holds no SQL content -- only whitespace,
    `--` line comments, and `/* */` block comments. Such fragments
    (a trailing `/* end of job */`, a comment between semicolons) must
    be dropped, not handed to spark.sql(), which would ParseException
    on them."""
    i, n = 0, len(stmt)
    while i < n:
        ch = stmt[i]
        nxt = stmt[i + 1] if i + 1 < n else ""
        if ch in " \t\r\n":
            i += 1
        elif ch == "-" and nxt == "-":
            j = stmt.find("\n", i)
            i = n if j < 0 else j + 1
        elif ch == "/" and nxt == "*":
            j = stmt.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            return False
    return True


def run_script(
    spark: SparkSession, script: str, *, params: dict[str, str] | None = None
) -> list[DataFrame]:
    """Execute a SQL script (text or path to a `.sql` file) statement
    by statement; returns the DataFrames of row-producing statements,
    in order (commonly `results[-1]` is the job's output).

    `params` are `${name}` textual substitutions (paths, table names
    -- the sql-client.sh `-Dkey=value` analogue). Values are spliced
    verbatim, so only pass trusted configuration, not user input.

    Path-vs-text is NOT sniffed from content: the argument is read
    from disk only when it ends in `.sql` and that file exists (the
    `script_path()` contract); anything else is executed as SQL text.
    A statement that happens to start with an unlisted keyword can
    therefore never be misrouted to the filesystem.
    """
    if script.rstrip().endswith(".sql") and os.path.exists(script):
        with open(script) as f:
            script = f.read()
    for name, value in (params or {}).items():
        script = script.replace("${" + name + "}", value)
    results: list[DataFrame] = []
    for stmt in split_statements(script):
        df = spark.sql(stmt)
        if df.columns:  # row-producing statement (DDL yields no columns)
            results.append(df)
    return results


def script_path(name: str) -> str:
    """Absolute path of a shipped job script (e.g. 'ctr_job.sql')."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
