"""Per-operator runtime statistics — parity with the reference's NodeStats
wrapper (executor/nodestats.go:13-35), which records tuplesOut / bytesOut /
elapsed-to-first/last-tuple around every executor node and reports them in
`explain` output after pulling the full result (executor/executor.go:62-86).

Spark already meters every physical operator with SQLMetrics (output rows,
data size, per-pipeline duration); they are populated once the plan has
actually executed.  So the Spark-native analog is: materialize the
DataFrame through the no-op sink (full execution, no driver collect), then
walk the *executed* plan — descending through AQE wrappers and
materialized query stages — and harvest each operator's metric map.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

# wrapper nodes that exist for execution plumbing, not query semantics
_WRAPPERS = {"InputAdapter", "WholeStageCodegen"}


def executed_node_stats(df: DataFrame, *, materialize: bool = True) -> list[dict[str, Any]]:
    """Execute `df` fully and return one dict per physical operator:
    {node_id, depth, operator, rows, metrics} where `rows` is the operator's
    `number of output rows` (None for metadata-only nodes) and `metrics` is
    the full SQLMetric name->value map.

    Depth is the operator's position in the executed tree (root = 0), with
    AQE/stage wrappers transparently unwrapped so the shape matches the
    logical pipeline the user wrote.
    """
    qe = df._jdf.queryExecution()  # noqa: SLF001
    result_rows = None
    if materialize:
        # execute THIS DataFrame's own physical plan: a noop DataFrameWriter
        # would build a separate QueryExecution and the metrics would land
        # on that instance, not this one.  toRdd().count() runs the full
        # plan in executors and ships only per-partition counts back.
        result_rows = qe.toRdd().count()
    jplan = qe.executedPlan()
    out: list[dict[str, Any]] = []
    if result_rows is not None:
        # synthetic root: Spark only meters numOutputRows on some operators
        # (Filter/Scan/Exchange); the query's total output count — the
        # reference root's tuplesOut — comes from the count action itself
        out.append(
            {"node_id": 0, "depth": 0, "operator": "Result", "rows": result_rows, "metrics": {}}
        )

    def metrics_of(jnode) -> dict[str, int]:
        m: dict[str, int] = {}
        it = jnode.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            m[kv._1()] = kv._2().value()
        return m

    def walk(jnode, depth: int) -> None:
        cls = jnode.getClass().getSimpleName()
        # AQE root: the real tree is the final materialized plan
        if cls == "AdaptiveSparkPlanExec":
            walk(jnode.executedPlan(), depth)
            return
        # materialized stage boundaries are leaf wrappers around their plan
        if cls.endswith("QueryStageExec"):
            walk(jnode.plan(), depth)
            return
        name = jnode.nodeName()
        if not any(name.startswith(w) for w in _WRAPPERS):
            metrics = metrics_of(jnode)
            out.append(
                {
                    "node_id": len(out),
                    "depth": depth,
                    "operator": name,
                    "rows": metrics.get("numOutputRows"),
                    "metrics": metrics,
                }
            )
            depth += 1
        children = jnode.children()
        for i in range(children.size()):
            walk(children.apply(i), depth)

    walk(jplan, 1 if result_rows is not None else 0)
    return out


def render_node_stats(stats: list[dict[str, Any]]) -> list[str]:
    """Text rendering for explain output: one line per operator with its
    row count and the non-zero metrics, indented by tree depth."""
    lines = ["", "== Node Stats (executed) =="]
    for s in stats:
        extras = ", ".join(
            f"{k}={v}"
            for k, v in sorted(s["metrics"].items())
            if k != "numOutputRows" and v
        )
        rows = "" if s["rows"] is None else f" rows={s['rows']}"
        lines.append(f"{'  ' * s['depth']}{s['operator']}:{rows}" + (f" [{extras}]" if extras else ""))
    return lines
