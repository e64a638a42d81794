"""Deterministic sampling / splitting for training-data pipelines.

Everything keys off a cryptographic-quality stable hash of the row id
(md5 — identical hex in Spark and DuckDB), never RNG: reruns, retries,
and incremental refreshes of a 100 TB corpus must assign every document
to the same split forever, which `rand()` cannot do.  md5 rather than the
polynomial fingerprint hash because short keys (small integer ids) leave
the polynomial's low range badly non-uniform — a split would swallow
every low id.  All expressions are per-row map-side arithmetic — no
shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_exprs(id_col: str, salt: str, buckets: int) -> tuple[str, str]:
    """(spark_sql, duckdb_sql) for a stable uniform bucket in [0, buckets):
    the first 8 md5 hex digits of `id || salt`, parsed as an int.  Both
    engines render md5 as lowercase hex, so the buckets agree exactly."""
    key_s = f"concat(cast({id_col} as string), '{salt}')"
    key_d = f"concat(cast({id_col} as varchar), '{salt}')"
    h_s = f"cast(conv(substring(md5({key_s}), 1, 8), 16, 10) as bigint)"
    h_d = f"cast(concat('0x', substr(md5({key_d}), 1, 8)) as bigint)"
    return f"({h_s}) % {buckets}", f"({h_d}) % {buckets}"


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    test_pct: int = 10,
    val_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Adds a `split` column: 'test' / 'val' / 'train' by stable id-hash
    bucket.  Salt changes the assignment wholesale (a new experiment) while
    staying deterministic."""
    if test_pct + val_pct >= 100:
        raise ValueError("test_pct + val_pct must leave room for train")
    b_s, _ = _bucket_exprs(id_col, salt, 100)
    bucket = F.expr(b_s)
    return df.withColumn(
        "split",
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def hash_split_oracle_case(id_col: str, *, test_pct: int = 10, val_pct: int = 0, salt: str = "") -> str:
    """The DuckDB expression mirroring hash_split's `split` column."""
    _, b_d = _bucket_exprs(id_col, salt, 100)
    return (
        f"case when ({b_d}) < {test_pct} then 'test' "
        f"when ({b_d}) < {test_pct + val_pct} then 'val' "
        f"else 'train' end"
    )


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    *,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Stable fraction-sample: keeps rows whose id-hash bucket (of 1e6)
    falls below fraction * 1e6.  Same rows on every run."""
    b_s, _ = _bucket_exprs(id_col, salt, 1_000_000)
    return df.filter(F.expr(b_s) < int(fraction * 1_000_000))


def deterministic_sample_oracle_pred(id_col: str, *, fraction: float, salt: str = "") -> str:
    _, b_d = _bucket_exprs(id_col, salt, 1_000_000)
    return f"({b_d}) < {int(fraction * 1_000_000)}"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sample (e.g. downweight boilerplate
    languages, keep all rare ones).  fractions: stratum value -> keep rate."""
    b_s, _ = _bucket_exprs(id_col, salt, 1_000_000)
    bucket = F.expr(b_s)
    thresh = F.lit(int(default_fraction * 1_000_000))
    for val, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == val, F.lit(int(frac * 1_000_000))).otherwise(thresh)
    return df.filter(bucket < thresh)
