"""Ordered merge ("merge join", the comma operator in dp3 QL).

The reference implements this as a heap-based n-ary streaming union ordered
by (log_time, child index) (executor/merge_node.go:31-110).  The paper calls
it "the same way a conventional RDBMS may implement an ordered union" — so
the Spark-native expression is exactly that: `unionByName` (schema-aligning,
missing columns null for heterogeneous topics) followed by an `orderBy`.

There is no shuffle beyond the final sort, and the sort is a range-partitioned
distributed sort — at 100 TB this is the plan you want (each scan is pruned
by partition/row-group stats, the union is free, the sort is the only wide
stage, and it's the output contract).

Tie-break parity: equal log_time rows order by child listing index
(merge_node.go:46-53), then sequence.  Callers thread a `__child__` column
through each input (the compiler assigns scan listing indices).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

ORDER_COLS = ("log_time", "__child__", "sequence")


def ordered_merge(children: Sequence[DataFrame]) -> DataFrame:
    """n-ary ordered union.  Inputs must carry a `__child__` tie-break column;
    output is NOT sorted — the compiler applies one final sort so nested
    merges don't sort repeatedly (the reference's pullUpMergeJoins flattening,
    plan/plan.go:574-591, falls out for free)."""
    if not children:
        raise ValueError("ordered_merge needs at least one child")
    out = children[0]
    for c in children[1:]:
        out = out.unionByName(c, allowMissingColumns=True)
    return out
