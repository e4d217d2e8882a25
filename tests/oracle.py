"""Local mirror of the driver's correctness gate: run a Spark query and
its DuckDB oracle SQL on the same parquet tables, compare row count,
column names, and order-insensitive values.

The comparison is EXACT (no tolerances): queries are engineered for
cross-engine determinism (see flink_ad_analytics_spark/queries.py
docstring), and this harness is what proves that engineering holds.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from flink_ad_analytics_spark.schemas import DRIVER_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in DRIVER_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[col] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[col] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"):
    actual = normalize(spark_df.toPandas())
    expected = normalize(con.execute(sql).fetchdf())
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: columns {list(actual.columns)} != oracle {list(expected.columns)}"
    )
    # The driver's hash gate is dtype-sensitive (a DuckDB HUGEINT fetched
    # as float64 hashes differently from Spark's int64 even when every
    # value matches -- the round-1 order_priority_pivot miss). Mirror that
    # strictness: normalized dtypes must agree exactly.
    assert list(actual.dtypes) == list(expected.dtypes), (
        f"{name}: dtypes {dict(actual.dtypes)} != oracle {dict(expected.dtypes)}"
    )
    pd.testing.assert_frame_equal(actual, expected, check_dtype=False, check_exact=True,
                                  obj=name)
