"""Committed-artifact sync gate: the measurement artifacts in
.benchmarks/ must cover the declared query surface, so a new query
cannot ship without its DuckDB baseline and plan digest (the round-1
'4 queries silently absent from the bench' class of drift, enforced
for the artifacts the bench itself cannot check)."""

from __future__ import annotations

import json

import __spark_entry__ as entrymod

BENCH_DIR = "/root/repo/.benchmarks"


def _load(name):
    with open(f"{BENCH_DIR}/{name}") as f:
        return json.load(f)


def test_duckdb_baseline_covers_every_oracle_query():
    base = _load("duckdb_sf0.1.json")
    timed = set(base.get("queries", base))
    missing = sorted(set(entrymod.oracle_sql()) - timed)
    assert not missing, (
        f"oracle queries without a DuckDB baseline: {missing} -- run "
        "SPARK_GRAFT_QUERIES=<names> python3 bench_duckdb.py"
    )


def test_plan_audit_covers_every_query():
    audit = _load("plan_audit.json")
    digests = audit.get("queries", audit)
    missing = sorted(set(entrymod.queries()) - set(digests))
    assert not missing, (
        f"queries without a committed plan digest: {missing} -- run "
        "python3 tools/plan_audit.py"
    )


def test_core_artifacts_present_and_shaped():
    curve = _load("scale_curve.json")
    assert len(curve["points"]) >= 4
    assert all("semantic_dedup" in p["ops"] for p in curve["points"])
    floor = _load("rowgroup_floor.json")
    assert floor["stock"]["max_task_row_share"] == 1.0
    health = _load("streaming_health.json")
    assert all(
        s["total_input_rows"] > 0 for s in health["queries"].values()
    )
    meth = health["methodology"]
    assert meth["repeats"] >= 3 and len(meth["runs"]) == meth["repeats"]
    assert all("load_avg_1m_before" in r for r in meth["runs"])


def test_coverage_headline_matches_committed_bench():
    """VERDICT r8 nit #1: COVERAGE.md once narrated a different
    session's headline (151.8s/0.050) than the committed
    bench_sf0.1.json (144.4s/0.048). This gate re-derives the bolded
    headline sentence from the artifact and requires COVERAGE.md to
    contain it verbatim -- narrative and artifact can no longer
    diverge; updating the artifact without the prose (or vice versa)
    fails here with the expected string in the message."""
    bench = _load("bench_sf0.1.json")
    headline = (
        f"**{bench['value']:.1f}s / {bench['n_queries']} queries, "
        f"ratio {bench['ratio_vs_duckdb']:.3f}"
    )
    with open("/root/repo/COVERAGE.md") as f:
        text = " ".join(f.read().split())  # collapse prose line wraps
    assert headline in text, (
        f"COVERAGE.md headline drifted from .benchmarks/bench_sf0.1.json; "
        f"expected the sentence to contain {headline!r}"
    )
