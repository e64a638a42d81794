"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.  The
  dot product is a zip_with/aggregate fold (JVM-side, codegen); queries are
  broadcast (small side), so the plan is one broadcast-nested-loop over the
  corpus with a per-query top-k — no shuffle of the corpus itself.
- `lsh_topk`: random-hyperplane LSH bucketed search — the 100 TB path.
  Deterministic pseudo-hyperplanes derived from the polynomial-hash LCG, so
  recall tests are reproducible.  Buckets bound the candidate set; the
  fallback to exact rerank happens only within matching buckets.
- `embedding_dup_pairs`: all-pairs near-duplicate detection by cosine
  threshold via the same broadcast pattern (or bucketed at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dp3_spark.functions import vectors as VEC

# 31-bit LCG: all intermediates < 2^61, safe under ANSI overflow checking
_LCG31_MUL = 1_103_515_245
_LCG31_ADD = 12_345
_LCG31_MOD = 2_147_483_648


def _with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    n_s, _ = VEC.norm(vec_col)
    return df.withColumn("__norm__", F.expr(n_s))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, excluding
    self-matches.  Ties break by neighbor_id ascending (deterministic)."""
    dot_s, _ = VEC.dot("q_vec", "c_vec")
    c = _with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("__norm__").alias("c_norm"),
    )
    q = _with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("__norm__").alias("q_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(dot_s) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_lsh_signature(df: DataFrame, vec_col: str, *, planes: int = 16) -> DataFrame:
    """Sign-bit signature under `planes` deterministic pseudo-hyperplanes.

    Plane p's component for dimension i is derived from an LCG of (p, i),
    mapped to [-1, 1) — computed inline with built-ins, no UDF: the plane
    never materializes, only sum_i v[i] * w(p, i)."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        # w(p,i) = (lcg31(p * 65537 + i) % 2001 - 1000) / 1000.0
        proj = F.expr(
            "aggregate(zip_with({v}, sequence(0, size({v}) - 1), (x, i) -> "
            "cast(x as double) * (cast(({mul}L * (({p}L * 65537 + i) % {mod}L) + {add}L) % {mod}L "
            "% 2001 - 1000 as double) / 1000.0)), "
            "cast(0.0 as double), (a, b) -> a + b)".format(
                v=vec_col, p=p, mul=_LCG31_MUL, add=_LCG31_ADD, mod=_LCG31_MOD
            )
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("lsh_sig", sig)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing at least one
    LSH band with the query, exact cosine rerank within candidates.

    At 100 TB the banded join replaces the full-corpus broadcast loop: corpus
    signatures are computed once (and can be persisted), the join is
    hash-partitioned on (band, key)."""
    rows = planes // bands
    mask = (1 << rows) - 1

    def banded(df: DataFrame, role: str) -> DataFrame:
        parts = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    ((F.col("lsh_sig") / F.lit(1 << (b * rows))).cast("long") % F.lit(mask + 1)).alias("key"),
                )
                for b in range(bands)
            ]
        )
        return (
            df.select(
                F.col(id_col).alias(f"{role}_id"),
                F.col(vec_col).alias(f"{role}_vec"),
                F.explode(parts).alias("bk"),
            )
            .select(f"{role}_id", f"{role}_vec", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        )

    c = banded(hyperplane_lsh_signature(corpus, vec_col, planes=planes), "c")
    q = banded(hyperplane_lsh_signature(queries, vec_col, planes=planes), "q")
    cand = (
        c.join(q, ["band", "key"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", "q_vec", "c_vec")
        .distinct()
    )
    dot_s, _ = VEC.dot("q_vec", "c_vec")
    nq_s, _ = VEC.norm("q_vec")
    nc_s, _ = VEC.norm("c_vec")
    scored = cand.withColumn("cosine", F.expr(dot_s) / (F.expr(nq_s) * F.expr(nc_s)))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"), "cosine", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold.  Broadcast self-join at
    test scale; swap in the LSH banding above for the 100 TB path."""
    dot_s, _ = VEC.dot("vec_a", "vec_b")
    base = _with_norm(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), F.col("__norm__").alias("nrm")
    )
    a = base.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.expr(dot_s) / (F.col("nrm_a") * F.col("nrm_b")))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )
