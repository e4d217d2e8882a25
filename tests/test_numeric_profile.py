"""numeric_profile accuracy: the exact-decimal one-pass moments must
reproduce numpy's two-pass centered covariance/correlation to within
the output rounding (the oracle-parity gate proves cross-engine
equality; this proves both engines compute the RIGHT number)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_ad_analytics_spark.queries import _NUMPROF_COLS, q_numeric_profile
from flink_ad_analytics_spark.sources.batch import load_table
from tests.conftest import SF_SMOKE


def test_numeric_profile_matches_numpy(spark):
    rows = q_numeric_profile(spark, SF_SMOKE).collect()
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(*_NUMPROF_COLS)
        .toPandas()
    )
    n = len(li)
    by_pair = {(r["col_x"], r["col_y"]): r for r in rows}
    assert len(by_pair) == 10  # 4 cols -> 10 unordered pairs incl. self
    for (x, y), r in by_pair.items():
        assert r["n_rows"] == n
        xv, yv = li[x].to_numpy(), li[y].to_numpy()
        assert r["mean_x"] == pytest.approx(xv.mean(), abs=1e-6)
        # population (ddof=0) covariance, matching E[xy] - E[x]E[y]
        cov = float(np.cov(xv, yv, ddof=0)[0, 1])
        corr = float(np.corrcoef(xv, yv)[0, 1])
        assert r["cov"] == pytest.approx(cov, abs=1e-4)
        assert r["corr"] == pytest.approx(corr, abs=1e-6)
        if x == y:
            assert r["corr"] == pytest.approx(1.0, abs=1e-6)


def test_numeric_profile_empty_input_counts_zero(spark, tmp_path):
    """ADVICE r8: the two-level plan's merge agg sees ZERO partial
    rows on an empty lineitem, so an uncoalesced SUM(pn) would emit
    n=NULL where the old single-level COUNT(*) -- and the oracle --
    return 0. Pin the restored semantics: 10 pair rows, n_rows=0."""
    d = str(tmp_path / "sf_empty")
    import os

    os.makedirs(d, exist_ok=True)
    load_table(spark, SF_SMOKE, "lineitem").limit(0).write.parquet(
        f"{d}/lineitem.parquet"
    )
    rows = q_numeric_profile(spark, d).collect()
    assert len(rows) == 10
    assert all(r["n_rows"] == 0 for r in rows)
