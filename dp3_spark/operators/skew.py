"""Skew-aware join helpers for the 100 TB path.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime for sort-merge joins.  These helpers cover the cases AQE can't:

- `salted_join`: explicit key salting for aggregations/joins where one key
  dominates (e.g. a boilerplate document fingerprint owning 30% of rows, a
  hot producer).  The small side replicates `salt_factor` times, the big
  side scatters uniformly — every partition sees ~1/salt of the hot key.
- `top_keys`: cheap hot-key detector (sampled) to decide whether salting
  is worth the replication cost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys(
    df: DataFrame, keys: Sequence[str], *, fraction: float = 0.05, limit: int = 10
) -> list[tuple]:
    """Sampled hot-key report: [(key..., approx_count)]."""
    sampled = df.sample(fraction=fraction, seed=42)
    rows = (
        sampled.groupBy(*keys)
        .agg((F.count("*") / fraction).cast("long").alias("approx_count"))
        .orderBy(F.col("approx_count").desc())
        .limit(limit)
        .collect()
    )
    return [tuple(r) for r in rows]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: big side gets a uniform salt in
    [0, salt_factor), small side is replicated across all salts.  The
    shuffle key becomes (join keys, salt), splitting a hot key across
    salt_factor reducers.

    Uses a deterministic per-row salt (hash of all big-side columns, not
    rand()) so retried tasks place rows identically.

    Only inner/left joins are supported: the small side is replicated
    salt_factor times, so a right/full outer join would emit every
    unmatched small-side row once per salt (duplicate rows)."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner' or 'left', got {how!r}: "
            "the replicated small side would duplicate unmatched rows in "
            "right/full outer joins"
        )
    on = list(on)
    salt = (F.abs(F.hash(*[F.col(c) for c in big.columns])) % salt_factor).alias("__salt__")
    big_s = big.withColumn("__salt__", salt)
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_factor).select(F.col("id").cast("int").alias("__salt__"))
        )
    )
    out = big_s.join(small_s, on + ["__salt__"], how)
    return out.drop("__salt__")
