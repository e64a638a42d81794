"""Physical layout: bucketed + sorted tables for shuffle-free co-located
joins and aggregations.

The reference co-locates all data for one (producer, topic) pair in one
storage tree (treemgr/treemgr.go:29-33), so merges and as-of joins between
topics of the same producer never move data between trees.  The Spark-
native analog at rest is hash-bucketing: writing the log table bucketed by
producer (and sorted by (producer, log_time) within buckets) pre-satisfies
the hash-partitioning every producer-keyed join/agg would otherwise
shuffle for — Catalyst's EnsureRequirements sees the bucketed scan's
output partitioning and elides the Exchange on every co-bucketed side.

At 100 TB this is the difference between an as-of join that shuffles the
full fact table per query and one that only sorts within already-correct
partitions: bucket once at ingest, join shuffle-free forever after.
Bucket count is the fixed degree-of-parallelism knob (pick ~2-4x the
executor count; resize = rewrite, so size for the table's target scale).

Catalog note: bucketing metadata lives in the session catalog
(saveAsTable).  On a cluster that is HMS/Glue; in tests the in-memory
session catalog serves the same plans.  Plain `.parquet(path)` writes
cannot carry bucket metadata — this is the one layout feature that needs
the table catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    *,
    buckets: int,
    bucket_cols: tuple[str, ...],
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write `df` as a bucketed (optionally bucket-sorted) parquet table
    and return the re-read table (whose scan carries the bucketing)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"drop table if exists {name}")
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return spark.table(name)


def cobucket_log_tables(
    spark: SparkSession,
    frames: dict[str, DataFrame],
    *,
    buckets: int,
    key: str = "producer",
    sort_cols: tuple[str, ...] = ("producer", "log_time"),
    base_path: str | None = None,
) -> dict[str, DataFrame]:
    """Materialize several canonical log frames co-bucketed on the same key
    with the same bucket count — the precondition for Exchange-free joins
    between any two of them."""
    out = {}
    for name, df in frames.items():
        out[name] = write_bucketed(
            df,
            name,
            buckets=buckets,
            bucket_cols=(key,),
            sort_cols=sort_cols,
            path=None if base_path is None else f"{base_path}/{name}",
        )
    return out
