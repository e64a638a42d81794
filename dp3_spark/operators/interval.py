"""Interval x interval overlap join — grid-bucketed equi-join.

The reference engine's as-of join aligns POINTS to their governing rows
(server/executor/asof_node.go); overlap of two interval sets is the
beyond-reference generalization an events/training-data pipeline needs
(session x incident attribution, span x maintenance-window joins).  The
naive Spark expression `a.join(b, a.s < b.e & b.s < a.e)` has no equi
key, so Catalyst plans BroadcastNestedLoopJoin (small side) or a
cartesian product — a scale killer the moment both sides are large.

This implements the standard grid-partitioned interval join (the plan
DuckDB/Trino build natively for range joins, re-expressed as DataFrame
ops): each interval explodes to the fixed-width grid cells it spans,
the join becomes an equi-join on the cell id (hash-partitionable,
AQE-skew-splittable), and each truly-overlapping pair is emitted
EXACTLY ONCE by keeping it only in the FIRST SHARED cell — the cell
containing max(a_start, b_start).  If the intervals overlap, that cell
is provably within both cell ranges, so no post-join `distinct` (and
its second shuffle) is needed.

Intervals are half-open [start, end) over int64 values (ns/us — any
unit, as long as `cell` is the same unit).  Zero-length intervals are
treated as the single cell of their start point; the overlap predicate
`a.s < b.e AND b.s < a.e` is what both the engine and any SQL oracle
must share.

Scale shape: shuffle volume is (rows x cells-per-interval), linear in
data for bounded interval length; pick `cell` near the median interval
length so the explode factor stays small while per-cell density stays
joinable.  No driver-side state, no UDFs — explode/sequence/join are
all codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_cell(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
) -> int:
    """Pick a grid width: the larger of the two sides' median interval
    lengths (approx_percentile — one narrow aggregate per side, no
    shuffle of the data columns).  Bounds the typical explode factor to
    ~2 cells on the longer-typical side and 1-2 on the shorter.  The
    JOIN RESULT is invariant to the choice (any positive cell emits the
    same pairs — see the exactly-once note below); only replication
    volume vs per-cell density moves, so an approximate median is fine."""
    meds = []
    for df, s, e in ((a, a_start, a_end), (b, b_start, b_end)):
        m = df.select(
            F.expr(f"approx_percentile({e} - {s}, 0.5, 1000)").alias("m")
        ).first()["m"]
        if m is not None:
            meds.append(int(m))
    return max(1, *meds) if meds else 1


def overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    *,
    cell: int | str = "auto",
) -> DataFrame:
    """Emit one row per (a, b) pair whose half-open intervals overlap:
    a.start < b.end AND b.start < a.end.  Column names of `a` and `b`
    must be disjoint (the caller aliases); output carries all columns of
    both sides.

    cell: grid width in the same int64 unit as the bounds; every
    interval is replicated to ceil(len / cell) (+1) cells, so choose it
    near the typical interval length — or pass 'auto' (the default) to
    derive it from the median interval length (auto_cell)."""
    if cell == "auto":
        cell = auto_cell(a, b, a_start, a_end, b_start, b_end)
    if not isinstance(cell, int) or cell <= 0:
        raise ValueError("cell width must be a positive int or 'auto'")
    shared = set(a.columns) & set(b.columns)
    if shared:
        raise ValueError(f"a and b must have disjoint columns; shared: {sorted(shared)}")
    reserved = {"_cell", "_lo_n", "_hi_n", "_fs_n"} & (set(a.columns) | set(b.columns))
    if reserved:
        raise ValueError(f"column names reserved by overlap_join: {sorted(reserved)}")

    # exact int64 floor division: Column `/` is DOUBLE division — ns
    # epochs (~2^60) exceed the 53-bit mantissa, so floor(x / c) drifts
    # off the true grid near cell boundaries.  Pair emission would
    # actually survive that (the exactly-once argument only needs a
    # MONOTONE consistent pseudo-floor), but cell ids must be the exact
    # grid so partitioning/stats and any persisted cell column are
    # deterministic.  (x - pmod(x, c)) is an exact multiple of c, so
    # SQL's truncating `div` on it IS floor division, negative bounds too.
    def fdiv_expr(tmp: str) -> "F.Column":
        return F.expr(f"{tmp} div {cell}")

    def exact_multiple(col) -> "F.Column":
        return col - F.pmod(col, F.lit(cell))

    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        # half-open: the last covered point is end-1; a zero-length
        # interval degrades to the single cell of its start
        hi = F.greatest(F.col(e) - F.lit(1), F.col(s))
        return (
            df.withColumn("_lo_n", exact_multiple(F.col(s)))
            .withColumn("_hi_n", exact_multiple(hi))
            .withColumn(
                "_cell", F.explode(F.sequence(fdiv_expr("_lo_n"), fdiv_expr("_hi_n")))
            )
            .drop("_lo_n", "_hi_n")
        )

    pred = (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    return (
        cells(a, a_start, a_end)
        .join(cells(b, b_start, b_end), "_cell")
        # dedup-free exactly-once: a pair that overlaps shares the cell
        # of max(starts) — max(start-cells) <= min(end-cells) whenever
        # the overlap predicate holds (floor is monotone, starts < ends)
        .withColumn(
            "_fs_n", exact_multiple(F.greatest(F.col(a_start), F.col(b_start)))
        )
        .filter(pred & (F.col("_cell") == fdiv_expr("_fs_n")))
        .drop("_cell", "_fs_n")
    )
