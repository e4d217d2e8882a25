"""Skew-mitigating join: salting for hot keys.

AQE's skew-join splitting (enabled engine-wide) handles most skew at
runtime by splitting oversized partitions; salting is the explicit
fallback when a single KEY (not partition) is hot -- e.g. a null-ish
default campaign receiving half the events. The large side scatters
each hot key across ``n_salts`` sub-keys; the small side is replicated
``n_salts`` times; the join key becomes (key, salt). Results are
identical to the unsalted join (asserted by tests).

Use for large-x-small joins where broadcast is impossible (small side
too big) and one key dominates. For large-x-large skew, prefer AQE or
isolate the hot keys into a broadcast side-channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the large side salted across ``n_salts`` sub-keys.

    ``how`` may be inner or left (left preserves large-side rows).
    The salt is uniform-random per large-side row (seeded -- stable
    within a run); the small side is exploded once per salt value, so
    every (key, salt) combination finds its match.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_large = large.withColumn(
        SALT_COL, F.floor(F.rand(seed) * n_salts).cast("int")
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(replicated_small, [on, SALT_COL], how)
    return out.drop(SALT_COL)
