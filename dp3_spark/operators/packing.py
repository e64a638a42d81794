"""Sequence packing for LLM pretraining pipelines: lay documents out into
fixed-size token windows ("bins") ahead of tokenized-batch serialization.

Two industry-standard layouts:

- `pack_split` (concat-and-cut, the GPT-style pretraining default): all
  documents are concatenated in a deterministic order and the stream is cut
  every `budget` tokens; a document may straddle bins, so the output is one
  row per (document, bin) overlap with the token sub-range each bin takes.
  Pure window arithmetic — cumulative sum + a sequence explode — fully
  SQL-expressible, so the registry query is hash-checked against DuckDB.

- `pack_greedy` (first-fit contiguous, no splitting): walk documents in
  order, open a new bin whenever the next document would overflow the
  budget.  Inherently sequential (bin boundaries depend on the running
  remainder), so it runs as an applyInPandas fold per shard; the DuckDB
  oracle re-derives it with a linear recursive CTE over row_number.

Scale design (100 TB): a single global ordering would funnel the corpus
through one sort partition, so both functions take `shard_col` — packing
is per-shard (shards are independent bins), which is exactly how a real
pretraining pipeline shards its corpus.  The default (no shard) keeps the
whole input as one shard for small/oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-cut packing.  Output one row per (doc, bin) overlap:
    (shard, doc_id, bin, tok_start, tok_end) — [tok_start, tok_end) is the
    sub-range of the DOCUMENT's tokens that lands in `bin`.  Documents are
    concatenated in ascending id order within each shard."""
    shard = F.col(shard_col) if shard_col else F.lit(0).alias("__shard__")
    d = df.select(
        shard.alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = (
        d.withColumn("end", F.sum("n_tok").over(w))
        .withColumn("start", F.col("end") - F.col("n_tok"))
        # integer `div`, not double `/`+cast: a cumulative token offset
        # past 2^53 would round in double and misplace the bin (the same
        # int64-exceeds-double-mantissa hazard output.nanos_decimal fixed)
        .withColumn("first_bin", F.expr(f"start div {budget}"))
        .withColumn("last_bin", F.expr(f"(end - 1) div {budget}"))
    )
    return (
        d.select(
            "shard",
            "doc_id",
            "start",
            "end",
            F.explode(F.sequence("first_bin", "last_bin")).alias("bin"),
        )
        .select(
            "shard",
            "doc_id",
            "bin",
            (F.greatest(F.col("start"), F.col("bin") * budget) - F.col("start")).alias(
                "tok_start"
            ),
            (F.least(F.col("end"), (F.col("bin") + 1) * budget) - F.col("start")).alias(
                "tok_end"
            ),
        )
    )


def pack_greedy(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
    shard_col: str | None = None,
) -> DataFrame:
    """First-fit contiguous packing, no document splitting.  Output:
    (shard, doc_id, bin, bin_fill) — bin_fill is the bin's running token
    count AFTER this document.  A document alone larger than the budget
    still gets its own bin (callers truncate downstream).  Deterministic:
    ascending id order within each shard."""
    import pandas as pd

    shard = F.col(shard_col) if shard_col else F.lit(0)
    d = df.select(
        shard.alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    shard_dt = d.schema["shard"].dataType.simpleString()

    b = budget

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bins, fills = [], []
        cur_bin, fill = 0, 0
        first = True
        for t in pdf["n_tok"].values:
            if not first and fill + t > b:
                cur_bin += 1
                fill = 0
            first = False
            fill += int(t)
            bins.append(cur_bin)
            fills.append(fill)
        out = pdf[["shard", "doc_id"]].copy()
        out["bin"] = pd.array(bins, dtype="int64")
        out["bin_fill"] = pd.array(fills, dtype="int64")
        return out

    return d.groupBy("shard").applyInPandas(
        fold, f"shard {shard_dt}, doc_id long, bin long, bin_fill long"
    )
