"""As-of join with dp3 semantics, expressed as pure DataFrame operations.

Reference semantics (executor/asof_node.go:64-133; SURVEY.md §2.2): both
inputs are merged in (log_time, side) order with the left side winning ties.
Each right tuple matches the *most recent* left tuple iff
``left.log_time + t > right.log_time`` (or ``t == 0`` = unbounded).  On the
first match of a left tuple both the left and right tuples are emitted; later
rights matching the same left are emitted too unless ``immediate``.  Lefts
with no matching right are dropped (inner semantics).  ``succeeds`` swaps the
inputs (executor/executor.go:201-205); ``neighbors`` parses but is
unimplemented in the reference — we keep that parity.

Spark realization: tag sides, `unionByName`, one window pass computes the
as-of left for every row ("last left at or before me in merged order"), a
predicate marks matched rights, a second window (same partitioning+ordering,
so Catalyst reuses the sort) ranks rights per left for `immediate` and marks
lefts that have ≥1 matched right.  No join, no driver loop.

Scale: all windows partition by the producer columns — dp3 compiles one asof
plan per producer (plan/plan.go:401-443), so matching never crosses
producers and Spark parallelizes across them.  Within one producer the
window is a single sorted run, which matches the reference's inherently
sequential single-node merge; for a pathological single-producer 100 TB
stream the upgrade path is range-partitioning by time with one-left-row
overlap per boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side__"
_RN = "__rn__"
_LEFT_RN = "__left_rn__"
_LEFT_TIME = "__left_time__"
_MATCHED = "__matched__"


def dp3_asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    immediate: bool = False,
    threshold_ns: int = 0,
    time_col: str = "log_time",
    seq_col: str = "sequence",
    partition_cols: Sequence[str] = ("producer",),
    child_col: str = "__child__",
) -> DataFrame:
    """dp3 `precedes` join.  For `succeeds`, call with the inputs swapped.

    Inputs must be union-compatible (the canonical log row shape); a
    `child_col` tie-break column is threaded through if present.  Output
    contains the emitted left and right rows with `child_col` rewritten to
    (side, original child) ordering so a final sort on
    (time, child, seq) reproduces the reference's emission order.
    """
    has_child = child_col in left.columns or child_col in right.columns
    lhs = left if child_col in left.columns else left.withColumn(child_col, F.lit(0))
    rhs = right if child_col in right.columns else right.withColumn(child_col, F.lit(0))
    lhs = lhs.withColumn(_SIDE, F.lit(0))
    rhs = rhs.withColumn(_SIDE, F.lit(1))

    u = lhs.unionByName(rhs, allowMissingColumns=True)

    parts = [F.col(c) for c in partition_cols]
    order = [F.col(time_col), F.col(_SIDE), F.col(child_col), F.col(seq_col)]
    w_ord = Window.partitionBy(*parts).orderBy(*order)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    is_left = F.col(_SIDE) == 0
    u = (
        u.withColumn(_RN, F.row_number().over(w_ord))
        .withColumn(_LEFT_RN, F.last(F.when(is_left, F.col(_RN)), ignorenulls=True).over(w_run))
        .withColumn(
            _LEFT_TIME, F.last(F.when(is_left, F.col(time_col)), ignorenulls=True).over(w_run)
        )
    )

    in_threshold: Column = (
        F.lit(True)
        if threshold_ns == 0
        else (F.col(_LEFT_TIME) + F.lit(threshold_ns)) > F.col(time_col)
    )
    u = u.withColumn(
        _MATCHED, (~is_left) & F.col(_LEFT_RN).isNotNull() & in_threshold
    )

    # Per left-group window: ranks matched rights (for `immediate`) and tells
    # lefts whether any right matched them.  Same partitioning prefix + order
    # as w_ord → single sort in the physical plan.
    w_group = Window.partitionBy(*parts, F.col(_LEFT_RN)).orderBy(*order)
    u = u.withColumn(
        "__match_rank__",
        F.sum(F.col(_MATCHED).cast("int")).over(
            w_group.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn(
        "__group_matches__",
        F.max(F.col(_MATCHED).cast("int")).over(
            w_group.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )

    keep_left = is_left & (F.col("__group_matches__") == 1)
    keep_right = F.col(_MATCHED) & (
        F.lit(True) if not immediate else (F.col("__match_rank__") == 1)
    )
    out = u.filter(keep_left | keep_right)

    # Rewrite the tie-break column so output order is (time, side, sub-child):
    # the asof node's emission order ties left-before-right (asof_node.go:126-131).
    # 2^32 shift: child indices are scan ordinals (or the composite of a
    # nested asof, which stays < 2^62 for any sane nesting depth); a 1e6
    # shift would collide once a level's child exceeds 1e6.
    width = F.lit(1 << 32)
    out = out.withColumn(child_col, F.col(_SIDE) * width + F.col(child_col))
    drop = [_SIDE, _RN, _LEFT_RN, _LEFT_TIME, _MATCHED, "__match_rank__", "__group_matches__"]
    if not has_child:
        drop.append(child_col)
    return out.drop(*drop)
