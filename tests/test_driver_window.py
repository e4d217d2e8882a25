"""Driver correctness-window ordering (r11 verdict item 1 + ADVICE r11).

The grading driver oracles the FIRST 50 keys of ``queries()``.  Round 12
replaced the artifact-glob-derived rotation with an explicit committed
constant (``_DRIVER_VERIFIED``): never-driver-verified queries order
first, so each round's window is maximally first-time until the whole
surface has a driver row.  These tests pin that contract.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _committed_verified() -> set:
    seen: set = set()
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(f) as fh:
            seen.update(json.load(fh))
    return seen


def test_r12_window_is_all_first_time():
    """The r12 window must carry >=45 first-time driver rows (verdict
    item 1 'done' bar); the seen-last ordering achieves 50/50."""
    window = list(entrymod.queries())[:WINDOW]
    assert len(set(window)) == WINDOW
    first_time = [k for k in window if k not in entrymod._DRIVER_VERIFIED]
    assert len(first_time) >= 45, (
        f"only {len(first_time)} first-time entries in the driver window"
    )
    # and in fact every slot is first-time under the seen-last ordering
    assert len(first_time) == WINDOW


def test_r12_window_disjoint_from_r11_window():
    """Disjointness from the r11 window specifically (the verdict's
    literal ask): zero overlap, not merely modulo-family-wrap."""
    r11 = os.path.join(REPO, "CORRECTNESS_r11.json")
    with open(r11) as fh:
        w11 = set(json.load(fh))
    w12 = set(list(entrymod.queries())[:WINDOW])
    assert not (w11 & w12), sorted(w11 & w12)


def test_verified_constant_matches_committed_artifacts():
    """_DRIVER_VERIFIED is bumped by hand each round; this gate catches
    a missed or mistyped bump: the constant must equal the union of the
    committed CORRECTNESS_r*.json key sets (ADVICE r11 -- the constant,
    not artifact globbing, drives ordering; globbing here only VERIFIES
    the constant, and runs identically on a fresh clone because the
    artifacts are committed)."""
    committed = _committed_verified()
    # every committed key the surface still declares must be marked seen
    declared = set(entrymod.queries())
    assert committed & declared <= entrymod._DRIVER_VERIFIED
    # and nothing is marked seen that no artifact ever recorded
    assert entrymod._DRIVER_VERIFIED <= committed


def test_ordering_is_pure_source():
    """The ordering must not depend on files on disk: recomputing the
    interleave from the family dicts alone reproduces queries()."""
    from flink_ad_analytics_spark.queries import RELATIONAL_QUERIES
    from flink_ad_analytics_spark.queries_ext import EXTENSION_QUERIES
    from flink_ad_analytics_spark.queries_pipeline import PIPELINE_QUERIES

    again = entrymod._interleave(
        EXTENSION_QUERIES, PIPELINE_QUERIES, RELATIONAL_QUERIES
    )
    assert list(again) == list(entrymod.queries())


def test_window_queries_all_have_oracles():
    """Every r12 window slot should get the STRONG (value-hash) check:
    none of the 3 by-design rows-only queries may occupy a window slot
    while first-time oracle-backed queries remain outside it."""
    window = list(entrymod.queries())[:WINDOW]
    oracles = entrymod.oracle_sql()
    assert all(k in oracles for k in window)
