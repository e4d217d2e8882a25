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
