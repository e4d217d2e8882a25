"""As-of (temporal "latest value at-or-before") join.

The reference's interval join (`/root/reference/flink/flink_job.sql:77-98`)
attributes ALL clicks inside a band; ad pipelines equally need the
inverse direction -- "which impression most recently preceded this
click" (last-touch attribution). Flink spells that TEMPORAL JOIN /
`FOR SYSTEM_TIME AS OF`; Spark has no native as-of join, so this
module implements it as a composition of built-in operators.

Design (union + ordered carry-forward), chosen over the obvious
equi-join + per-left-row max:

* equi-join on the key then `max(right_time) <= left_time` fans out
  |L_k| x |R_k| rows per key before aggregating them back down -- at
  100 TB a hot key with 1e5 events on each side materializes 1e10
  join rows. Dead on arrival.
* This plan instead UNIONs the two inputs (right rows carry a payload
  struct, left rows a NULL payload), then takes
  `last(payload, ignorenulls=true)` over a window partitioned by key
  and ordered by (time, side). One Exchange + one sort over |L|+|R|
  rows total -- linear in input, no fan-out, skew bounded by the
  per-key event count (same bound Flink's temporal-join state holds).
  Ties (right_time == left_time) sort the right row first, giving the
  inclusive `left_time >= right_time` match DuckDB's ASOF JOIN uses.

Determinism contract: callers must make the right side unique per
(key, right_time) -- with duplicates, "the" latest row is arbitrary
in any engine (DuckDB ASOF picks one unspecified row). The query
builders pre-aggregate with max(id) to pin it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    tolerance: str | None = None,
) -> DataFrame:
    """LEFT as-of join: every `left` row gains the columns of the
    latest `right` row with the same `on` keys and
    `right_time <= left_time` (inclusive), or NULLs if none exists.

    `tolerance` (e.g. ``"10 minutes"``): matches older than
    `left_time - tolerance` are nulled out (row is kept -- LEFT
    semantics, like pandas ``merge_asof(tolerance=...)``).

    Output: all `left` columns, then `right`'s non-key columns
    (including `right_time`). The two sides' non-key column names must
    be disjoint -- a shared name would emit two identically-named
    output columns (unusable downstream), so it raises here instead.
    """
    payload_cols = [c for c in right.columns if c not in on]
    clash = set(payload_cols) & {c for c in left.columns if c not in on}
    if clash:
        raise ValueError(
            f"asof_join: column name(s) {sorted(clash)} exist on both "
            "sides; rename one side (e.g. right.withColumnRenamed) first"
        )
    payload = F.struct(*[F.col(c) for c in payload_cols])

    left_cols = [c for c in left.columns if c not in on]
    # Union frame: keys | ordering time | side tag | right payload |
    # left columns (NULL on right rows). side=0 sorts right rows first
    # at equal times -> inclusive match.
    r_side = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l_side = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_side.schema["__payload"].dataType).alias("__payload"),
        *left_cols,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r_side.unionByName(l_side)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        in_band = F.col(f"__match.{right_time}") >= F.col("__t") - F.expr(
            f"INTERVAL {tolerance}"
        )
        carried = carried.withColumn(
            "__match", F.when(in_band, F.col("__match"))
        )
    return carried.select(
        *on,
        *left_cols,
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )
