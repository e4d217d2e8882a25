"""Constraint suite (operators/quality.py): known violation counts on
synthetic rows, all-dup-rows Unique semantics, one-scan plan for
row-local rules, error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_ad_analytics_spark.operators.quality import (
    InRange,
    InSet,
    Matches,
    NotNull,
    Predicate,
    ReferencedIn,
    Unique,
    check,
)


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        # id, status, score, code
        (1, "ok", 5.0, "A-1"),
        (1, "ok", 50.0, "B-2"),      # dup id; score out of range
        (2, None, 5.0, "bad"),       # null status; code mismatch
        (3, "weird", -1.0, "C-3"),   # status not in set; score below range
        (4, "ok", None, None),       # nulls not counted by range/match
    ]
    return spark.createDataFrame(rows, ["id", "status", "score", "code"])


def test_known_violation_counts(spark, table):
    rules = [
        NotNull("status"),
        InRange("score", 0, 10),
        InSet("status", ("ok", "weird")),
        Matches("code", r"^[A-Z]-\d$"),
        Predicate("id_positive", "id > 0"),
        Unique(("id",)),
    ]
    got = {r.rule: (r.n_rows, r.n_violations) for r in check(table, rules).collect()}
    assert got == {
        "not_null:status": (5, 1),
        "in_range:score": (5, 2),
        "in_set:status": (5, 0),      # nulls skipped; 'weird' allowed
        "matches:code": (5, 1),
        "predicate:id_positive": (5, 0),
        "unique:id": (5, 2),          # BOTH rows of the duplicated key
    }


def test_referential_integrity(spark, table):
    ref = spark.createDataFrame([(1,), (2,), (3,)], ["ref_id"])
    rules = [ReferencedIn("id", "dim", "ref_id")]
    got = check(table, rules, refs={"dim": ref}).collect()
    assert [(r.rule, r.n_violations) for r in got] == [
        ("referenced_in:id->dim.ref_id", 1)  # id=4 is an orphan
    ]
    with pytest.raises(ValueError, match="missing"):
        check(table, rules)


def test_row_local_rules_share_one_scan(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rules = [
        NotNull("o_custkey"),
        InRange("o_totalprice", 0, 150000),
        InSet("o_orderstatus", ("F", "O")),
        Matches("o_orderpriority", "^[1-3]-"),
        Predicate("p", "o_orderkey >= 0"),
    ]
    plan = check(orders, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan


def test_empty_suite(spark, table):
    assert check(table, []).count() == 0


def test_unknown_rule_object_raises(spark, table):
    class Bogus:
        pass

    with pytest.raises(ValueError, match="unsupported rule"):
        check(table, [NotNull("status"), Bogus()])


def test_referenced_in_without_broadcast_hint(spark, table):
    """broadcast=False must not force the hint (fact-sized refs)."""
    ref = spark.createDataFrame([(1,), (2,), (3,)], ["ref_id"])
    rule = ReferencedIn("id", "dim", "ref_id", broadcast=False)
    out = check(table, [rule], refs={"dim": ref})
    assert [(r.n_rows, r.n_violations) for r in out.collect()] == [(5, 1)]


def test_counts_on_empty_table(spark):
    empty = spark.createDataFrame([], "id long, status string")
    ref = spark.createDataFrame([(1,)], ["ref_id"])
    out = {
        r.rule: (r.n_rows, r.n_violations)
        for r in check(
            empty,
            [NotNull("status"), Unique(("id",)), ReferencedIn("id", "dim", "ref_id")],
            refs={"dim": ref},
        ).collect()
    }
    assert all(v == (0, 0) for v in out.values()), out


def test_randomized_suites_match_pandas_reference(spark):
    """Five seeded random frames: every rule's violation count must
    equal an independent pandas computation."""
    import random

    import pandas as pd

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(5, 60)
        ids = [rng.randint(0, 15) for _ in range(n)]
        statuses = [
            rng.choice(["ok", "weird", "bad", None]) for _ in range(n)
        ]
        scores = [
            rng.choice([None, rng.uniform(-5, 15)]) for _ in range(n)
        ]
        pdf = pd.DataFrame({"id": ids, "status": statuses, "score": scores})
        df = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None),
                                   "id long, status string, score double")
        rules = [
            NotNull("status"),
            InRange("score", 0, 10),
            InSet("status", ("ok", "weird")),
            Unique(("id",)),
        ]
        got = {
            r.rule: r.n_violations for r in check(df, rules).collect()
        }
        exp_null = sum(1 for s in statuses if s is None)
        exp_range = sum(
            1 for v in scores if v is not None and not (0 <= v <= 10)
        )
        exp_set = sum(
            1 for s in statuses if s is not None and s not in ("ok", "weird")
        )
        counts = pd.Series(ids).value_counts()
        exp_uni = int(counts[counts > 1].sum())
        assert got == {
            "not_null:status": exp_null,
            "in_range:score": exp_range,
            "in_set:status": exp_set,
            "unique:id": exp_uni,
        }, (seed, got)
