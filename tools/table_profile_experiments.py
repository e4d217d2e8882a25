#!/usr/bin/env python3
"""Round-9 terminal experiment for the three-round table_profile
thread (VERDICT r8 item 1). Shapes:

  current      shipped r8 plan: per-column groupBy(col).agg(cnt)
               subplans; the exchange carries (value, cnt) pairs --
               15M of them for each of the two near-unique columns
  split_pay    route-(a) shape: ONE cheap wide agg provides n_rows +
               all null counts (plain sums, no Expand, no distinct);
               per-column subplans then exchange ONLY the distinct
               values (no cnt payload) for distinct/min/max -- halves
               the bytes through the two dominant exchanges
  percol_only  the per-column distinct subplans alone (no wide agg),
               to isolate the wide agg's cost

Each timed 1-cold + 2-steady (query_floor protocol) at
$SPARK_GRAFT_SF_DIR; the candidate outputs are value-compared against
TABLE_PROFILE_SQL at sf0.01 by tests (not here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import materialize  # noqa: E402
from flink_ad_analytics_spark.queries import (  # noqa: E402
    _PROFILE_COLS,
    _profile_repr_spark,
    q_table_profile,
)
from flink_ad_analytics_spark.session import build_session  # noqa: E402
from flink_ad_analytics_spark.sources.batch import load_table  # noqa: E402


def cand_current(spark, sf_dir):
    return q_table_profile(spark, sf_dir)


def _split_payload(spark, sf_dir, with_wide=True):
    o = load_table(spark, sf_dir, "orders")
    wide = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(
                F.when(F.col(c).isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"{c}__nulls")
            for c, _ in _PROFILE_COLS
        ],
    ) if with_wide else None
    out = wide
    for col, kind in _PROFILE_COLS:
        d = o.select(col).distinct()
        prof = d.agg(
            F.count(F.col(col)).alias(f"{col}__distinct"),
            _profile_repr_spark(F.min(F.col(col)), kind).alias(
                f"{col}__min"
            ),
            _profile_repr_spark(F.max(F.col(col)), kind).alias(
                f"{col}__max"
            ),
        )
        out = prof if out is None else out.crossJoin(prof)
    if not with_wide:
        return out
    stack = ", ".join(
        f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col, _ in _PROFILE_COLS
    )
    return out.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            "(col_name, n_nulls, n_distinct, min_repr, max_repr)"
        ),
    ).orderBy("col_name")


def cand_split_pay(spark, sf_dir):
    return _split_payload(spark, sf_dir, with_wide=True)


def cand_percol_only(spark, sf_dir):
    return _split_payload(spark, sf_dir, with_wide=False)


CANDIDATES = {
    "current": cand_current,
    "split_pay": cand_split_pay,
    "percol_only": cand_percol_only,
}


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/repo/.scale_data/sf10"
    )
    names = sys.argv[1:] or list(CANDIDATES)
    spark = build_session(
        app_name="table-profile-exp",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    out = {}
    for name in names:
        fn = CANDIDATES[name]
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        first = time.perf_counter() - t0
        steady = []
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            steady.append(time.perf_counter() - t0)
        out[name] = {"first": round(first, 2),
                     "steady": round(min(steady), 2)}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
