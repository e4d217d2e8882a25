"""Every declared query must hash-match its DuckDB oracle at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT
from tests.oracle import compare, duckdb_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_CORRECT)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_CORRECT)
    if name in ORACLES:
        compare(df, con, ORACLES[name], name=name)
    else:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 6


def test_table_profile_approx_accuracy(spark):
    """The HLL profile's accuracy contract vs the exact profile: every
    non-distinct stat byte-identical, every approximate distinct count
    within 2% relative error (rsd=0.01 gives ~1% standard error; 2%
    is > 2 sigma and deterministic for a fixed dataset)."""
    exact = {
        r["col_name"]: r
        for r in QUERIES["table_profile"](spark, SF_CORRECT).collect()
    }
    approx = {
        r["col_name"]: r
        for r in QUERIES["table_profile_approx"](spark, SF_CORRECT).collect()
    }
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        for field in ("n_rows", "n_nulls", "min_repr", "max_repr"):
            assert a[field] == e[field], f"{col}.{field}: {a[field]} != {e[field]}"
        rel = abs(a["n_distinct"] - e["n_distinct"]) / max(1, e["n_distinct"])
        assert rel <= 0.02, (
            f"{col}: approx distinct {a['n_distinct']} vs exact "
            f"{e['n_distinct']} (rel err {rel:.4f} > 2%)"
        )


def test_table_profile_approx_plan_has_no_expand(spark):
    """The whole point of the approx variant: the exact profile's
    Expand (|cols|+1x row replication for multi-countDistinct) must
    NOT appear -- the plan is scan -> partial agg -> final agg."""
    df = QUERIES["table_profile_approx"](spark, SF_CORRECT)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Expand" not in plan, plan
    exact_plan = QUERIES["table_profile"](spark, SF_CORRECT)
    ep = exact_plan._sc._jvm.PythonSQLUtils.explainString(
        exact_plan._jdf.queryExecution(), "simple"
    )
    assert "Expand" in ep  # the contrast that motivates the variant
