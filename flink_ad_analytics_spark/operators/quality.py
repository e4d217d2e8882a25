"""Declarative data-quality constraints (the Deequ/expectations shape).

Before a 100 TB corpus drop feeds anything downstream, a pipeline runs
a constraint suite over it: completeness (null rates), uniqueness,
value ranges, set membership, referential integrity. The
engine-design point is that ALL row-local rules compile into ONE
aggregation pass over the table -- a constraint suite must never cost
k scans for k rules. Uniqueness adds one groupBy on the key;
referential integrity adds one anti-join per foreign key; nothing
else touches the data twice.

Rules are plain dataclasses evaluated to exact integer violation
counts, so the report is oracle-checkable (`q_data_quality`); pass
them to `check()` and gate the pipeline on `n_violations == 0`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class NotNull:
    """Column must be non-null."""

    column: str

    @property
    def name(self) -> str:
        return f"not_null:{self.column}"

    def violation(self) -> F.Column:
        return F.col(self.column).isNull()


@dataclass(frozen=True)
class InRange:
    """min <= value <= max (nulls are NotNull's business, not counted)."""

    column: str
    lo: float | int | str
    hi: float | int | str

    @property
    def name(self) -> str:
        return f"in_range:{self.column}"

    def violation(self) -> F.Column:
        c = F.col(self.column)
        return c.isNotNull() & ~c.between(F.lit(self.lo), F.lit(self.hi))


@dataclass(frozen=True)
class InSet:
    """Value must be one of the allowed literals (nulls not counted)."""

    column: str
    allowed: tuple

    @property
    def name(self) -> str:
        return f"in_set:{self.column}"

    def violation(self) -> F.Column:
        c = F.col(self.column)
        return c.isNotNull() & ~c.isin(list(self.allowed))


@dataclass(frozen=True)
class Matches:
    """String must match the (Java/RE2-common-subset) regex."""

    column: str
    pattern: str

    @property
    def name(self) -> str:
        return f"matches:{self.column}"

    def violation(self) -> F.Column:
        c = F.col(self.column)
        return c.isNotNull() & ~c.rlike(self.pattern)


@dataclass(frozen=True)
class Predicate:
    """Arbitrary row predicate that must HOLD (violations = NOT pred).
    `expr` is a SQL boolean expression over the row's columns."""

    label: str
    expr: str

    @property
    def name(self) -> str:
        return f"predicate:{self.label}"

    def violation(self) -> F.Column:
        return ~F.expr(self.expr)


@dataclass(frozen=True)
class Unique:
    """Key (possibly composite) must identify at most one row.
    Violations = rows carrying a duplicated key value (all of them --
    2 rows sharing a key count as 2, matching 'rows you cannot trust')."""

    columns: tuple

    @property
    def name(self) -> str:
        return "unique:" + ",".join(self.columns)


@dataclass(frozen=True)
class ReferencedIn:
    """Foreign key: every non-null value must exist in ref[ref_column].

    ``broadcast=True`` ships the distinct ref keys to every task
    (right for dimension-sized refs); set False for fact-sized refs so
    Catalyst picks a shuffle join -- the hint is honored
    unconditionally, and a forced multi-GB broadcast fails the suite."""

    column: str
    ref_name: str  # for the report only
    ref_column: str
    broadcast: bool = True

    @property
    def name(self) -> str:
        return f"referenced_in:{self.column}->{self.ref_name}.{self.ref_column}"


def check(
    df: DataFrame,
    rules: list,
    *,
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate a rule suite; returns (rule, n_rows, n_violations).

    Row-local rules (NotNull/InRange/InSet/Matches/Predicate) share a
    single aggregation over one scan. Each Unique rule is one groupBy
    on its key columns; each ReferencedIn one outer join against
    `refs[ref_name]` -- every report computes its own n_rows in the
    same pass, so a k-rule suite never rescans the table for
    bookkeeping. n_rows rides on every output row so a consumer can
    compute violation rates without a second query.

    Unknown rule objects raise: a gate that silently skips a
    mis-constructed rule would pass while the constraint was never
    evaluated.
    """
    refs = refs or {}
    row_local = [r for r in rules if hasattr(r, "violation")]
    uniques = [r for r in rules if isinstance(r, Unique)]
    fks = [r for r in rules if isinstance(r, ReferencedIn)]
    unknown = [
        r for r in rules
        if not hasattr(r, "violation") and not isinstance(r, (Unique, ReferencedIn))
    ]
    if unknown:
        raise ValueError(
            f"check(): unsupported rule object(s) {unknown!r} -- row-local "
            "rules must expose .violation(); otherwise use Unique/ReferencedIn"
        )

    # Rule names become stack() string literals, backtick identifiers,
    # and agg aliases below: a quote/backtick would break (or inject
    # into) the generated SQL, and duplicates would collide on the
    # aliases -- reject both up front with a readable error.
    names = [r.name for r in rules]
    bad = [n for n in names if any(c in n for c in "'\"`\\\n")]
    if bad:
        raise ValueError(
            f"check(): rule name(s) {bad!r} contain quote/backtick/backslash "
            "characters, which are not representable in the report's "
            "generated SQL -- rename the rule(s)"
        )
    dups = sorted({n for n in names if names.count(n) > 1})
    if dups:
        raise ValueError(
            f"check(): duplicate rule name(s) {dups!r} -- report rows and "
            "agg aliases are keyed by name, so names must be unique"
        )

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for r in row_local:
        # coalesce: SUM over an empty table is NULL, and an empty drop
        # must report 0 violations, not a null that breaks the gate
        aggs.append(
            F.coalesce(F.sum(r.violation().cast("long")), F.lit(0)).alias(r.name)
        )
    wide = df.agg(*aggs)

    spark = df.sparkSession
    stack_terms = ", ".join(f"'{r.name}', `{r.name}`" for r in row_local)
    reports = []
    if row_local:
        reports.append(
            wide.select(
                F.expr(
                    f"stack({len(row_local)}, {stack_terms}) AS "
                    "(rule, n_violations)"
                ),
                F.col("__n_rows").alias("n_rows"),
            ).select("rule", "n_rows", "n_violations")
        )

    for r in uniques:
        # self-contained: n_rows = SUM of the per-key counts, so the
        # Unique report needs no second pass over the table
        dup_rows = (
            df.groupBy(*r.columns)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                ).alias("n_violations"),
            )
        )
        reports.append(
            dup_rows.select(F.lit(r.name).alias("rule"), "n_rows", "n_violations")
        )

    for r in fks:
        if r.ref_name not in refs:
            raise ValueError(f"ReferencedIn rule {r.name}: refs[{r.ref_name!r}] missing")
        ref_keys = (
            refs[r.ref_name]
            .select(F.col(r.ref_column).alias(r.column))
            .filter(F.col(r.column).isNotNull())
            .distinct()
            .withColumn("__hit", F.lit(True))
        )
        if r.broadcast:
            ref_keys = F.broadcast(ref_keys)
        # LEFT join (not anti) so one pass yields BOTH counts: n_rows
        # over all rows, orphans = non-null keys with no ref hit.
        joined = df.select(r.column).join(ref_keys, r.column, "left")
        fk_report = joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(
                    (
                        F.col(r.column).isNotNull() & F.col("__hit").isNull()
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("n_violations"),
        )
        reports.append(
            fk_report.select(F.lit(r.name).alias("rule"), "n_rows", "n_violations")
        )

    if not reports:
        return spark.createDataFrame([], "rule string, n_rows long, n_violations long")
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out
