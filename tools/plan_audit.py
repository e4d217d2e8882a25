#!/usr/bin/env python3
"""Physical-plan audit: one digest row per declared query.

For every query in ``__spark_entry__.queries()`` this records, from
the pre-execution physical plan at $SPARK_GRAFT_SF_DIR (default
sf0.01):

* shuffles   -- Exchange nodes minus BroadcastExchange (each one is a
                full repartition of its input at scale);
* broadcasts -- BroadcastExchange nodes (small sides shipped, not
                shuffled);
* scans      -- FileScan nodes (re-scans of the same table show up
                here);
* sorts      -- Sort nodes;
* py_stages  -- Python/Arrow evaluation boundaries (MapInPandas,
                FlatMapGroupsInPandas, ArrowEvalPython,
                BatchEvalPython): the deliberate non-codegen islands.
                Anything unexpected appearing here is a hot-path
                regression;
* pushed     -- whether the deepest scan carries PushedFilters.

Writes .benchmarks/plan_audit.json and prints a markdown table.
The committed artifact makes plan regressions diffable: a new shuffle
in a query's digest shows up in version control like a failing test.

Counts are STATIC upper bounds: AQE deduplicates identical exchange
subtrees at runtime (ReusedExchange / stage reuse), so a composed
query whose branches share an aggregate (e.g. dedup_minhash_lsh's
band sides, key_part_concentration's total) executes fewer shuffles
than its static digest. Executed-plan reuse is gated separately in
tests/test_plan_quality.py.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_ad_analytics_spark.session import build_session  # noqa: E402

_PY_NODES = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
)


def digest(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    broadcasts = plan.count("BroadcastExchange")
    return {
        "shuffles": len(re.findall(r"Exchange (hash|range|single|SinglePartition)", plan, re.I)),
        "broadcasts": broadcasts,
        "scans": plan.count("FileScan"),
        "sorts": plan.count("Sort ["),
        "py_stages": sum(plan.count(n) for n in _PY_NODES),
        # True iff at least one scan carries a NON-EMPTY PushedFilters
        # list. (The previous form only tested that a parquet scan
        # existed -- a filterless scan-only query read as "pushed",
        # and a lost pushdown could never flip the digest.) False for
        # queries with no scan-reachable predicate is correct and
        # expected, not a defect. The list is matched to end-of-line,
        # not to the first ']', so a filter containing a nested
        # bracket (e.g. In(a, [1,2])) doesn't truncate the capture.
        "pushed_filters": any(
            s.strip()
            for s in re.findall(r"PushedFilters: \[(.*?)\]\s*(?:$|,)", plan, re.M)
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = build_session(
        app_name="plan-audit", cpus=cpus, shuffle_partitions=cpus
    )
    import __spark_entry__ as entrymod

    out: dict[str, dict] = {}
    skipped: list[str] = []
    for name, fn in entrymod.queries().items():
        try:
            out[name] = digest(fn(spark, sf_dir))
        except Exception as exc:  # iterative fits etc. still plan fine;
            skipped.append(f"{name}: {exc}")  # record anything that doesn't
    os.makedirs(".benchmarks", exist_ok=True)
    with open(".benchmarks/plan_audit.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": out, "skipped": skipped}, f, indent=1, sort_keys=True)

    print("| query | shuffles | broadcasts | scans | sorts | py | pushed |")
    print("|---|---|---|---|---|---|---|")
    for name in sorted(out):
        d = out[name]
        print(
            f"| {name} | {d['shuffles']} | {d['broadcasts']} | {d['scans']} "
            f"| {d['sorts']} | {d['py_stages']} | {'y' if d['pushed_filters'] else ''} |"
        )
    if skipped:
        print(f"\nskipped: {len(skipped)}", file=sys.stderr)
        for s in skipped:
            print(f"  {s}", file=sys.stderr)


if __name__ == "__main__":
    main()
