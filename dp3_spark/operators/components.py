"""Connected components over a near-duplicate pair graph — the step that
turns pairwise dedup output (operators/dedup.py, operators/similarity.py)
into actionable clusters: one representative per component, the rest
dropped.  This is the standard shape of large-scale training-data dedup
(pairs are evidence; the keep/drop decision is per-cluster).

Spark-first design, two regimes by EDGE-LIST size (the verified pair
graph is orders of magnitude smaller than the corpus): edge lists that
fit the driver run exact union-find there and rejoin via one broadcast
join — the node frame never leaves the cluster; huge edge lists run
iterative min-label propagation + pointer jumping
(path compression) as a driver loop of DataFrame joins — each round is
neighbor-min (`join + groupBy min`) followed by one self-join that
replaces every label with its label's label, all JVM-side.  Compression
halves the distance the min id still has to travel, so rounds needed is
O(log(longest chain)) instead of O(diameter) — a 9-hop dup chain
converges in ~4 rounds.  Each round ends in `localCheckpoint(eager)`:
caching alone does NOT truncate the logical plan, and an iterative loop
whose round N plan embeds round N-1 twice (neighbor join + convergence
check) makes Catalyst's optimization time grow exponentially — measured
1.9s -> 94.7s by round 5 at sf0.1 before truncation.  At 100 TB: the
label frame is (id, long) — tiny relative to the corpus — each round
shuffles only labels + edges on id, and the checkpoint bounds both plan
size and lineage-recovery depth; swap localCheckpoint for reliable
`checkpoint()` (with setCheckpointDir) when executor loss matters.

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
    driver_edge_threshold: int = 2_000_000,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    nodes: one row per node (singletons keep their own id as component).
    edges: undirected pairs (each row connects src_col <-> dst_col).
    Output: (id, component).  Deterministic; raises if max_iter rounds
    don't converge (pathological chain longer than max_iter).

    Graph-size dispatch: the dedup pair graph after exact verification is
    orders of magnitude smaller than the corpus (edges only exist between
    near-duplicates), so when the EDGE LIST fits the driver
    (driver_edge_threshold rows ≈ 32 MB at the default) the components
    come from a driver-side union-find in O(E α) — collapsing the
    multi-round distributed loop, whose per-round fixed cost (two label
    shuffles + a checkpoint) dwarfs microscopic graphs, into one
    broadcast join against the node frame.  The node frame itself never
    leaves the cluster: only edge-touched nodes ride through the driver;
    untouched nodes keep their own id via coalesce.  Larger edge sets
    take the iterative min-label-propagation path below.  Both paths
    produce the identical labeling (min reachable id; parity pinned in
    tests).

    Edge hygiene: edges with a null endpoint, or an endpoint outside the
    node set, are IGNORED on both paths.  The distributed loop gets this
    for free (labels exist only for node ids, so the neighbor join drops
    foreign endpoints); the driver union-find must filter explicitly or
    the two paths diverge — e.g. nodes={1,3}, edges={(1,2),(2,3)} must
    yield {1:1, 3:3}, not merge 1 and 3 through the phantom node 2, and
    a component label must always be a member of the node set (callers
    key is_representative on id == component)."""
    node_ids = (
        nodes.select(F.col(id_col).alias("id")).distinct().localCheckpoint(eager=True)
    )
    # materialize the (possibly expensive) edge frame ONCE before anything
    # references it twice — otherwise e.g. a minhash pair pipeline
    # upstream executes twice inside the sym materialization.  Both
    # semi-joins key on the same ids the rest of the algorithm shuffles
    # on; the edge list is the small side throughout, and AQE picks the
    # physical strategy (broadcast under threshold, shuffle-hash above).
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .where(F.col("s").isNotNull() & F.col("d").isNotNull())
        .join(node_ids.select(F.col("id").alias("s")), "s", "leftsemi")
        .join(node_ids.select(F.col("id").alias("d")), "d", "leftsemi")
        .select("s", "d")
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()  # free: counts the checkpointed blocks
    if n_edges <= driver_edge_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        pdf = e.toPandas()  # Arrow transfer: ~16 B/edge, not row-at-a-time
        for a, b in zip(pdf["s"].tolist(), pdf["d"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # always hang the larger root under the smaller so the
                # final root IS the component minimum
                parent[max(ra, rb)] = min(ra, rb)
        import pandas as pd

        spark = nodes.sparkSession
        mapping = pd.DataFrame(
            {"id": list(parent), "component": [find(n) for n in parent]},
            dtype="int64",
        )
        # Arrow upload; sentinel keeps createDataFrame happy on empty input
        mdf = spark.createDataFrame(
            mapping if len(mapping) else pd.DataFrame({"id": [-1], "component": [-1]}),
            "id long, component long",
        )
        if not len(mapping):
            mdf = mdf.filter(F.lit(False))
        return node_ids.join(
            F.broadcast(mdf.withColumnRenamed("component", "c")), "id", "left"
        ).select("id", F.coalesce("c", F.col("id")).alias("component"))
    sym = (
        e.union(e.select(F.col("d"), F.col("s")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = node_ids.withColumn("component", F.col("id"))
    for _ in range(max_iter):
        # neighbor minimum: for each node d, the smallest component label
        # among its neighbors s
        nbr_min = (
            sym.join(labels, sym["s"] == labels["id"])
            .groupBy("d")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(nbr_min, labels["id"] == nbr_min["d"], "left").select(
            "id",
            F.col("component").alias("old_component"),
            F.least("component", F.coalesce("nbr_component", "component")).alias(
                "component"
            ),
        )
        # pointer jumping: component := label(component).  Labels only ever
        # decrease toward the component minimum and label(x) <= x, so the
        # invariant (label is a node id within the same component) holds;
        # compression halves remaining chain length each round.
        jump = stepped.select(
            F.col("id").alias("j_id"), F.col("component").alias("j_component")
        )
        new_labels = (
            stepped.join(jump, stepped["component"] == jump["j_id"], "left")
            .select(
                "id",
                "old_component",
                F.coalesce("j_component", "component").alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate lineage: see module docstring
        )
        changed = new_labels.filter(
            F.col("component") != F.col("old_component")
        ).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
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


def pagerank_int(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iters: int = 3,
    scale: int = 10**6,
) -> DataFrame:
    """PageRank centrality over an undirected pair graph (damping 0.85,
    `iters` fixed iterations) in EXACT int64 micro-unit arithmetic — the
    curation signal "how centrally duplicated is this doc" over the
    near-dup graph, and the repo's iterative-graph-computation shape
    beyond connected components.

    Determinism contract (the millicosine discipline): float PageRank
    sums are order-dependent across engines, so the whole recurrence is
    integer: init = scale div N; per-edge contribution = pr(u) div
    deg(u); next = ((scale div N) * 3) div 20 + (17 * sum(contrib)) div
    20 (i.e. damping 17/20, teleport 3/20 — dangling mass is dropped
    identically on both engines).  Every op is int64 and every sum is
    order-independent, so a SQL oracle reproduces the values bit for
    bit.

    Scale shape: per iteration one hash join of edges x pr (both keyed
    by node) and one map-combinable sum — the standard distributed
    PageRank step; `iters` is small and fixed, so no checkpointing is
    needed."""
    nodes = docs.select(F.col(id_col).alias("id"))
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_int needs a non-empty docs frame")
    base = ((scale // n) * 3) // 20
    edges = pairs.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).unionByName(
        pairs.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "u")
    pr = nodes.withColumn("pr", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(pr, ed["u"] == pr["id"])
            .select(F.col("v").alias("id"), F.expr("pr div deg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").cast("long").alias("csum"))
        )
        pr = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr("(17 * coalesce(csum, 0)) div 20")
                ).cast("long").alias("pr"),
            )
        )
    return pr.select(F.col("id").alias(id_col), F.col("pr").alias("pr_micro"))


def keep_best(
    clusters: DataFrame,
    docs: DataFrame,
    score_col: str,
    *,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Canonical selection by QUALITY: per near-dup cluster keep the
    best-scoring document, not the smallest id.  Real curation pipelines
    keep the longest / highest-quality duplicate (the CCNet/RefinedWeb
    rule); `dedup_clusters`' min-id representative is only the graph
    anchor.  Ties break on ascending id, so the choice is deterministic.

    clusters: dedup_clusters output (id_col, component, cluster_size, ...).
    docs: source frame carrying (id_col, score_col).

    Scale shape: one hash-join on the doc id plus a window PARTITIONED by
    component — per-cluster work only, no global sort; cluster sizes are
    bounded by the dedup candidate caps upstream."""
    from pyspark.sql import Window

    order = F.col(score_col).desc() if descending else F.col(score_col).asc()
    w = Window.partitionBy("component").orderBy(order, F.col(id_col).asc())
    return (
        clusters.join(docs.select(id_col, score_col), id_col)
        .withColumn("keep", F.row_number().over(w) == 1)
    )
