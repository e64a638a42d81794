"""Z-order (Morton) clustering for multi-dimensional row-group skipping.

The versioned-table layout (streaming/lifecycle.py) clusters each
partition by (producer, log_time) — a 1D nested sort: producer-keyed
probes skip aggressively (bloom + runs), but a TIME-ONLY predicate
inside a bucket reads every row group whose producer run overlaps the
range, i.e. most of them.  Z-ordering interleaves the bits of several
quantized dimensions into one sort key, so row-group min/max envelopes
become small hyper-rectangles: a range predicate on ANY subset of the
z dimensions skips most row groups (the Delta/Iceberg OPTIMIZE ZORDER
story, built here from plain DataFrame ops).

How it stays exact and overflow-free on int64 ns epochs:
- each dimension is quantized to [0, 2^bits) by `(x - min) div w` with
  cell width w = (range div 2^bits) + 1 — integer `div` on an exact
  int64, never a double division (see operators/interval.py for why),
  never an (x-min)*2^bits product that would overflow;
- the z-value interleaves the quantized bits with shift/or — pure
  codegen, no UDF;
- the write is repartitionByRange(_z) + sortWithinPartitions(_z): range
  partitioning gives disjoint z spans per file, the within-file sort
  tightens per-row-group envelopes.

Reading needs nothing special: ordinary predicate pushdown against
parquet row-group statistics does the skipping (PushedFilters), exactly
like any other scan — the layout just makes the statistics selective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue_frame(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    stats: dict[str, tuple[int, int]] | None = None,
    out_col: str = "_z",
) -> DataFrame:
    """Append the interleaved z-value of integer columns `cols` as
    `out_col` (int64).  stats maps col -> (min, max); when omitted it is
    computed with one tiny aggregate (two int64s per dimension).
    Quantization is least-significant-bits-first interleave: bit j of
    dimension i lands at z bit j*k + i.

    Rows with a NULL in any z dimension get a NULL z-value and cluster
    into one (unordered) group at the range boundary — same behavior as
    Delta's OPTIMIZE ZORDER; an all-NULL dimension or an empty frame is
    rejected outright (no usable min/max)."""
    k = len(cols)
    if not 1 <= k <= 4:
        raise ValueError("zorder takes 1-4 dimensions")
    if bits * k > 62:
        raise ValueError(f"bits*dims must be <= 62, got {bits}*{k}")
    reserved = {out_col, *(f"_zq{i}" for i in range(k))} & set(df.columns)
    if reserved:
        raise ValueError(f"column names reserved by zorder: {sorted(reserved)}")
    if stats is None:
        row = df.agg(
            *[F.min(c).alias(f"mn{i}") for i, c in enumerate(cols)],
            *[F.max(c).alias(f"mx{i}") for i, c in enumerate(cols)],
        ).first()
        for i, c in enumerate(cols):
            if row[f"mn{i}"] is None or row[f"mx{i}"] is None:
                raise ValueError(
                    f"cannot z-order on {c!r}: no non-NULL values (empty "
                    "frame or all-NULL dimension)"
                )
        stats = {
            c: (int(row[f"mn{i}"]), int(row[f"mx{i}"])) for i, c in enumerate(cols)
        }
    out = df
    qcols = []
    for i, c in enumerate(cols):
        mn, mx = stats[c]
        w = ((mx - mn) // (1 << bits)) + 1
        qcols.append(f"_zq{i}")
        # exact: (c - mn) >= 0, so truncating div == floor; q < 2^bits
        out = out.withColumn(f"_zq{i}", F.expr(f"(({c}) - ({mn})) div {w}"))
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i in range(k):
            bit = F.shiftright(F.col(f"_zq{i}"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return out.withColumn(out_col, z).drop(*qcols)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write `df` to parquet clustered by the z-order of `cols`:
    repartitionByRange on the z-value (disjoint z spans per file) +
    sortWithinPartitions (tight per-row-group envelopes), z column
    dropped from the stored schema.  One extra narrow aggregate (the
    per-dimension min/max) and one range shuffle — the same cost shape
    as any sorted compaction."""
    zed = zvalue_frame(df, cols, bits=bits)
    (
        zed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
