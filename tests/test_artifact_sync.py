"""Committed-artifact sync gate: the measurement artifacts in
.benchmarks/ must cover the declared query surface, so a new query
cannot ship without its DuckDB baseline and plan digest (the round-1
'4 queries silently absent from the bench' class of drift, enforced
for the artifacts the bench itself cannot check)."""

from __future__ import annotations

import json

import pytest

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


def _load_committed_bench(repo: str = "/root/repo"):
    """The GIT-COMMITTED bench artifact, not the working-tree file.

    VERDICT r9 finding #1: bench.py used to rewrite the committed
    artifact in place, so the driver's own bench pass (which runs
    before pytest) left this gate red until a manual `git checkout`.
    Two fixes landed together: bench.py now writes a gitignored
    scratch path unless explicitly `--pin`ned, and this gate compares
    prose against `git show HEAD:...` so a mutated working-tree copy
    can never fail (or vacuously pass) the sync check."""
    import subprocess

    raw = subprocess.run(
        ["git", "show", "HEAD:.benchmarks/bench_sf0.1.json"],
        cwd=repo,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(raw)


def _headline_of(bench: dict) -> str:
    return (
        f"**{bench['value']:.1f}s / {bench['n_queries']} queries, "
        f"ratio {bench['ratio_vs_duckdb']:.3f}"
    )


def _check_headline(repo: str = "/root/repo") -> None:
    headline = _headline_of(_load_committed_bench(repo))
    with open(f"{repo}/COVERAGE.md") as f:
        text = " ".join(f.read().split())  # collapse prose line wraps
    assert headline in text, (
        f"COVERAGE.md headline drifted from the git-committed "
        f".benchmarks/bench_sf0.1.json; expected the sentence to "
        f"contain {headline!r}"
    )


def test_coverage_headline_matches_committed_bench():
    """VERDICT r8 nit #1: COVERAGE.md once narrated a different
    session's headline (151.8s/0.050) than the committed
    bench_sf0.1.json (144.4s/0.048). This gate re-derives the bolded
    headline sentence from the artifact and requires COVERAGE.md to
    contain it verbatim -- narrative and artifact can no longer
    diverge; updating the artifact without the prose (or vice versa)
    fails here with the expected string in the message."""
    _check_headline()


def test_headline_gate_survives_dirty_working_tree_artifact(tmp_path):
    """Simulates the exact driver sequence that broke round 9: a
    bench pass mutates the working-tree bench_sf0.1.json, then pytest
    runs. The gate must still read the committed version -- so the
    derived headline is unchanged even when the working-tree file is
    garbage.

    ADVICE r10: runs against a SCRATCH git repo built in tmp_path
    instead of mutating the real tracked artifact in place -- a hard
    kill mid-test can no longer leave the repo dirty, and parallel
    tests reading the working-tree file cannot race the mutation."""
    import subprocess

    repo = tmp_path / "repo"
    bench_dir = repo / ".benchmarks"
    bench_dir.mkdir(parents=True)
    good = {
        "value": 123.4,
        "n_queries": 7,
        "ratio_vs_duckdb": 0.042,
    }
    (bench_dir / "bench_sf0.1.json").write_text(json.dumps(good))
    (repo / "COVERAGE.md").write_text(
        f"Headline: {_headline_of(good)} blah.\n"
    )

    def git(*args):
        subprocess.run(
            ["git", "-c", "user.email=t@t", "-c", "user.name=t", *args],
            cwd=repo,
            check=True,
            capture_output=True,
        )

    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "good artifact")

    # the r9 sequence: bench mutates the WORKING-TREE artifact...
    dirty = dict(good, value=99999.9, ratio_vs_duckdb=9.999)
    (bench_dir / "bench_sf0.1.json").write_text(json.dumps(dirty))
    # ...and the gate must still read the committed version
    assert _load_committed_bench(str(repo))["value"] == 123.4
    _check_headline(str(repo))

    # non-vacuous: once the garbage IS committed, the gate goes red
    git("commit", "-aqm", "garbage artifact")
    with pytest.raises(AssertionError, match="drifted"):
        _check_headline(str(repo))
