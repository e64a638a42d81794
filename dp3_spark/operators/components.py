"""Connected components over a near-duplicate pair graph — the step that
turns pairwise dedup output (operators/dedup.py, operators/similarity.py)
into actionable clusters: one representative per component, the rest
dropped.  This is the standard shape of large-scale training-data dedup
(pairs are evidence; the keep/drop decision is per-cluster).

Spark-first design: iterative min-label propagation as a driver loop of
DataFrame joins — each round is `join + groupBy min` (two shuffles), all
JVM-side.  Rounds needed = graph diameter, and near-dup clusters are
dense (diameter 2-4), so the loop converges in a handful of rounds; a
convergence count() per round is the only driver action.  At 100 TB:
labels and edges hash-partition on id so each round reuses the same
partitioning; the label frame is (id, long) — tiny relative to the
corpus — and each round's cache replaces the previous (no lineage
blow-up, no growing plan).

There is no closed-form SQL for reachability, but the DuckDB oracle
re-derives the same answer independently via a recursive CTE (see
queries.py _components_oracle), so the registry query is fully
hash-checked despite the iterative engine path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    nodes: one row per node (singletons keep their own id as component).
    edges: undirected pairs (each row connects src_col <-> dst_col).
    Output: (id, component).  Deterministic; raises if max_iter rounds
    don't converge (pathological chain longer than max_iter)."""
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .cache()
    )
    labels = nodes.select(F.col(id_col).alias("id")).distinct().withColumn(
        "component", F.col("id")
    ).cache()
    labels.count()
    for _ in range(max_iter):
        # neighbor minimum: for each node d, the smallest component label
        # among its neighbors s
        nbr_min = (
            sym.join(labels, sym["s"] == labels["id"])
            .groupBy("d")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["d"], "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    sym.unpersist()
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Cluster assignment + keep/drop decision from a near-dup pair graph.

    Output per document: (doc_id, component, cluster_size, is_representative)
    — representative = the smallest doc_id in its component (deterministic),
    which is the row a dedup pipeline keeps."""
    comp = connected_components(
        docs.select(F.col(id_col).alias("id")),
        pairs,
        id_col="id",
        src_col=src_col,
        dst_col=dst_col,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("component")
    return (
        comp.withColumn("cluster_size", F.count("*").over(w).cast("long"))
        .withColumn("is_representative", F.col("id") == F.col("component"))
        .select(
            F.col("id").alias(id_col),
            "component",
            "cluster_size",
            "is_representative",
        )
    )
