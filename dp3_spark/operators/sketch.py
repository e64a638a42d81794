"""Mergeable quantile sketch columns — the DDSketch subsystem rebuilt on
DataFrame primitives (nodestore/statistics.go:129-155, 198-229: DDSketch
with relative accuracy 0.01, merged associatively on tree merge).

Design: a log-binned histogram ("DDSketch-style").  For relative accuracy
a, gamma = (1+a)/(1-a); positive values map to bin ceil(log_gamma(x)), with
a dedicated zero bin and mirrored negative bins.  A sketch is a
map<int, long> column — storable in a summary table, mergeable by summing
bin counts, quantile-extractable with rank-accuracy-free relative error
<= a.  Everything is built-in expressions + one explode/groupBy per
operation: no UDAF object state, so partial aggregation and AQE behave
normally at any scale.

Bin arithmetic uses double log(); bins are engine-deterministic but NOT
oracle-compared bit-for-bit (libm may differ across engines) — accuracy
and associativity are pinned by unit tests instead.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ACCURACY = 0.01  # reference: nodestore/statistics.go:130

ZERO_BIN = 0  # exact zeros; positive bins > 0, negative bins < 0
_OFFSET = 1_000_000  # keeps sub-1 magnitudes (negative log bins) positive


def _gamma(accuracy: float) -> float:
    return (1 + accuracy) / (1 - accuracy)


def bin_expr(col: str, accuracy: float = DEFAULT_ACCURACY) -> Column:
    """Value -> sketch bin (int).  |x| maps to e = ceil(log_gamma(|x|)) (so
    |x| in (gamma^(e-1), gamma^e]); bin = sign(x) * (e + OFFSET); zero -> 0.
    Bin order == value order.  NaN/Inf excluded upstream."""
    lg = math.log(_gamma(accuracy))
    c = F.col(col).cast("double")
    e = F.ceil(F.log(F.abs(c)) / F.lit(lg)).cast("long")
    return (
        F.when(c == 0.0, F.lit(ZERO_BIN).cast("long"))
        .when(c > 0.0, e + F.lit(_OFFSET))
        .otherwise(-(e + F.lit(_OFFSET)))
    )


def bin_value(accuracy: float = DEFAULT_ACCURACY) -> Column:
    """Representative value of a bin column named `bin`: the geometric mean
    gamma^(e - 0.5) of the bin interval — relative error <= accuracy."""
    lg = math.log(_gamma(accuracy))
    b = F.col("bin")
    mag = F.exp((F.abs(b) - F.lit(_OFFSET)).cast("double") * F.lit(lg) - F.lit(0.5 * lg))
    return F.when(b == ZERO_BIN, F.lit(0.0)).when(b > 0, mag).otherwise(-mag)


def sketch_summarize(
    df: DataFrame,
    *,
    keys: Sequence[str],
    field: str,
    accuracy: float = DEFAULT_ACCURACY,
) -> DataFrame:
    """Per-key sketch: map<int,long> of bin -> count.  One shuffle on
    (keys, bin) with map-side combine, then one on keys — both narrow."""
    c = F.col(field).cast("double")
    clean = df.filter(
        c.isNotNull() & ~(F.isnan(c) | c.isin(float("inf"), float("-inf")))
    )
    binned = clean.withColumn("bin", bin_expr(field, accuracy))
    counts = binned.groupBy(*keys, "bin").agg(F.count("*").alias("cnt"))
    return counts.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("bin", "cnt"))).alias("sketch"),
        F.sum("cnt").alias("sketch_n"),
    )


def sketch_merge(df: DataFrame, *, keys: Sequence[str]) -> DataFrame:
    """Associative merge of sketch rows to coarser keys: explode bins,
    re-sum — exactly the reference's Merge (statistics.go:400-433)."""
    exploded = df.select(*keys, F.explode("sketch").alias("bin", "cnt"))
    counts = exploded.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))
    return counts.groupBy(*keys).agg(
        F.map_from_entries(F.collect_list(F.struct("bin", "cnt"))).alias("sketch"),
        F.sum("cnt").alias("sketch_n"),
    )


def sketch_quantiles(
    df: DataFrame,
    *,
    keys: Sequence[str],
    quantiles: Sequence[float],
    accuracy: float = DEFAULT_ACCURACY,
    values: bool = True,
) -> DataFrame:
    """Extract quantiles from sketch rows: per key, walk bins in order and
    take the first bin whose cumulative count covers q * n (the DDSketch
    GetValueAtQuantile walk, relative error <= accuracy).

    Output: keys + p{N} columns (value of the covering bin), or the raw
    covering bin indices as p{N}_bin longs when values=False.  Bin
    INDICES are bit-exact across engines (ceil(ln/ln) agreed on every
    fixture value Spark-vs-DuckDB), while the representative value's
    exp() differs in the last ulp between JVM Math.exp and libm — so
    cross-engine comparisons (the registry oracle) use bins, and callers
    wanting floats apply bin_value to them."""
    exploded = df.select(*keys, "sketch_n", F.explode("sketch").alias("bin", "cnt"))
    w = Window.partitionBy(*keys).orderBy("bin")
    cum = exploded.withColumn("cum", F.sum("cnt").over(w))
    out = None
    for q in quantiles:
        rank = (F.lit(q) * F.col("sketch_n")).cast("double")
        col = (
            bin_value(accuracy).alias(f"p{int(q * 100)}")
            if values
            else F.col("bin").alias(f"p{int(q * 100)}_bin")
        )
        hit = (
            cum.filter(F.col("cum") >= rank)
            .withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .select(*keys, col)
        )
        out = hit if out is None else out.join(hit, list(keys))
    assert out is not None
    return out
