"""Guards the data-precision contract the exact-decimal queries rely on.

queries.py casts money columns to DECIMAL(12,2)/(4,2) (see `_rev`):
value-exact ONLY if the underlying doubles carry at most 2 decimal
places. The driver regenerates /root/testdata between rounds, so this
asserts the contract against the real files -- if a regeneration ever
ships finer-grained values, this fails loudly instead of the oracle
gate failing quietly in the 6th decimal.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

#: (table, column, decimal places the engine casts assume)
CONTRACT = [
    ("lineitem", "l_extendedprice", 2),
    ("lineitem", "l_discount", 2),
    ("lineitem", "l_tax", 2),
    ("lineitem", "l_quantity", 2),
    ("orders", "o_totalprice", 2),
    ("events", "value", 6),  # _dsum casts to DECIMAL(18,6)
]


#: column -> pyarrow type string the engine's loaders/queries assume.
#: events.ts is deliberately absent: load_events adapts to both int64
#: nanos and timestamp[us] (both have shipped).
EXPECTED_TYPES = {
    ("lineitem", "l_shipdate"): "timestamp[us]",
    ("orders", "o_orderdate"): "timestamp[us]",
    ("documents", "text"): "string",
    ("documents", "n_chars"): "int64",
    ("embeddings", "embedding"): "list<element: float>",
    ("customer", "c_nationkey"): "int32",
    ("events", "props"): "string",
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_schema_contract(sf_dir: str) -> None:
    """Early warning for driver testdata regenerations: if a load-
    bearing column changes physical type, fail HERE with a clear
    message instead of deep inside some query's analysis error."""
    import pyarrow.parquet as pq

    for (table, col), want in EXPECTED_TYPES.items():
        schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
        got = str(schema.field(col).type)
        assert got == want, (
            f"{table}.{col} in {sf_dir} is now {got} (engine assumes {want}); "
            f"audit queries touching this column (cf. the events.ts "
            f"regeneration adaptation in sources/batch.py::load_events)"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_money_columns_are_fixed_point(sf_dir: str) -> None:
    con = duckdb.connect()
    for table, col, places in CONTRACT:
        scale = 10**places
        # A double that IS a p-dp fixed-point value differs from its
        # rounded self only by float representation error (<1e-9 here,
        # vs 10^-p/2 for genuinely finer-grained data).
        (err,) = con.execute(
            f"SELECT MAX(ABS({col} * {scale} - ROUND({col} * {scale})))"
            f" FROM '{sf_dir}/{table}.parquet'"
        ).fetchone()
        assert err is not None and err < 1e-6, (
            f"{table}.{col} in {sf_dir} is not {places}dp fixed-point "
            f"(max scaled error {err}); the DECIMAL casts in queries.py "
            f"are no longer value-exact"
        )


def test_schema_evolution_merge_and_defaults(spark, tmp_path):
    """A lake table grows a column mid-life: mergeSchema reads v1+v2
    files as one table, v1 rows get NULL->default for the new column,
    v2 rows keep real values, and column pruning still works."""
    from pyspark.sql import functions as F

    from flink_ad_analytics_spark.sources.batch import load_evolving_table

    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    ).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(
        [(3, "c", "en"), (4, "d", "fr")],
        "id long, payload string, lang string",
    ).coalesce(1).write.mode("append").parquet(d)

    df = load_evolving_table(spark, d, defaults={"lang": "unknown"})
    rows = {r.id: r.lang for r in df.collect()}
    assert rows == {1: "unknown", 2: "unknown", 3: "en", 4: "fr"}
    # pruned single-column read still resolves across versions
    assert df.select("id").count() == 4


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_event_id_unique(sf_dir: str) -> None:
    """The warehouse invariant family_imp_pre_from's spend exactness
    rests on (ADVICE r8): event_id -- hence impression_id -- is unique
    in the batch events table, so summing cost over ALL rows equals
    summing over impression_id-deduped rows (the streaming twin's
    form). If a regeneration ever ships duplicate event ids, the two
    family builds would silently diverge on spend; fail here instead."""
    dup = duckdb.sql(
        f"SELECT COUNT(*) - COUNT(DISTINCT event_id) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    assert dup == 0, (
        f"{sf_dir}/events.parquet carries {dup} duplicate event_id rows; "
        f"family_imp_pre_from must dedup before summing spend"
    )
