"""Trigram-signature string pruning — the Spark analog of the reference's
statfilter trigram index (server/util/trigram/trigram.go:34-75 builds a
murmur3-hashed trigram bitset per text field; server/executor/
statfilter.go:102-127 skips a tree child on a string-equality probe when
the child's signature is missing any of the needle's bits, then applies
the min/max range check).

Here the reference's "tree child" is a parquet FILE, and the signature
store is a sidecar parquet index next to the table.  Everything is
pure-JVM Catalyst expressions — no Python touches row data:

  * per-value trigrams via ``transform(sequence(...), i -> substring)``
    over the reference's padded form ``'  ' + s + ' '``
    (trigram.go:62-75 ComputeTrigrams);
  * each trigram hashed with the built-in ``xxhash64`` into a 128-bit
    signature held as two longs (the reference uses murmur3 into a
    96-bit bitset — hash choice is an implementation detail, the
    containment algebra is identical);
  * one ``bit_or`` aggregation per (file, column) plus min/max string
    bounds — a map-side-combinable pass that runs at ingest/compaction
    time, not per query.

Query path: the needle's bits are computed driver-side (it is a literal;
no table data is touched), surviving files come from one filter over the
broadcast-sized index — signature containment AND the min/max range
check, exactly statfilter.go:125's ``Contains`` + bounds order — and the
scan is constructed over only those files.  Pruning is correctness
neutral: the surviving set is a superset of the files that can contain
the needle, and the full predicate is still applied to what's read.

Probe modes:
  * ``eq``  — string equality; uses the padded trigram set (identical
    to how values were indexed) plus the min/max range check.
  * ``contains`` — substring probe (the QL ``~`` operator with a plain
    literal): uses the UNPADDED trigram windows of the needle, which
    are necessarily a subset of the padded windows of any value
    containing it; no range check (substring position is unknown).
    Needles shorter than 3 chars produce no bits and prune nothing —
    same pass-through the reference applies when no stats exist
    (statfilter.go:118-122).

Scale: the index is O(files x indexed columns) rows — megabytes per
100 TB table — so the probe-side filter is a driver-local operation on
a broadcast-sized frame, and the explicit-file-list scan is the same
manifest-driven pattern table formats (Iceberg/Delta) use for their
pruned reads.  At cluster scale the index would live in the catalog and
be maintained incrementally per ingested file (lifecycle.append writes
one file per batch; compact() rewrites — both are single extra
aggregations over data already in memory).

Non-goals mirrored from the reference: multi-byte characters hash per
*character* here vs per *byte* in Go — both sides of the containment
check use the same windowing, so pruning stays correct either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NBITS = 128  # two longs; reference uses 96 bits (12 bytes), trigram.go:34


def _signature_sql(col_sql: str, *, padded: bool) -> tuple[str, str]:
    """(lo, hi) SQL expressions for the 128-bit trigram signature of one
    string expression, as two longs.  Null / empty / sub-trigram-length
    inputs yield 0 (no bits) — ComputeTrigrams returns [] for "" and the
    unpadded mode has no complete window under 3 chars."""
    src = f"concat('  ', {col_sql}, ' ')" if padded else f"({col_sql})"
    tg = (
        f"if(length({src}) < 3, array(), "
        f"transform(sequence(1, length({src}) - 2), i -> substring({src}, i, 3)))"
    )
    bits = f"transform({tg}, t -> pmod(xxhash64(t), {NBITS}))"
    lo = (
        f"aggregate(filter({bits}, b -> b < 64), 0L, "
        f"(acc, b) -> acc | shiftleft(1L, cast(b as int)))"
    )
    hi = (
        f"aggregate(filter({bits}, b -> b >= 64), 0L, "
        f"(acc, b) -> acc | shiftleft(1L, cast(b - 64 as int)))"
    )
    guard = f"case when {col_sql} is null then 0L else %s end"
    return guard % lo, guard % hi


def build_trigram_index(
    spark: SparkSession,
    table_path: str | list[str],
    columns: list[str],
    index_path: str,
    *,
    write_mode: str = "overwrite",
) -> None:
    """One aggregation pass over the table -> sidecar index parquet with
    one row per (file, column): (file, column, sig_lo, sig_hi, min_val,
    max_val).  The bit_or partial-aggregates map-side, so the shuffle
    carries one 4-long row per (file, column) regardless of table size.

    table_path may be a list of specific parquet files — the incremental
    maintenance path (VersionedLogTable.append indexes only the files a
    batch just wrote, with write_mode='append')."""
    paths = [table_path] if isinstance(table_path, str) else list(table_path)
    df = spark.read.parquet(*paths)
    sel = [F.input_file_name().alias("__file")]
    aggs = []
    for c in columns:
        lo, hi = _signature_sql(c, padded=True)
        sel += [F.expr(lo).alias(f"{c}__lo"), F.expr(hi).alias(f"{c}__hi"), F.col(c)]
        aggs += [
            F.bit_or(f"{c}__lo").alias(f"{c}__slo"),
            F.bit_or(f"{c}__hi").alias(f"{c}__shi"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    wide = df.select(*sel).groupBy("__file").agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__slo, {c}__shi, {c}__min, {c}__max" for c in columns
    )
    long = wide.selectExpr(
        "__file as file",
        f"stack({len(columns)}, {stack}) as (column, sig_lo, sig_hi, min_val, max_val)",
    )
    long.coalesce(1).write.mode(write_mode).parquet(index_path)


def probe_signature(
    spark: SparkSession, needle: str, *, mode: str = "eq"
) -> tuple[int, int]:
    """Needle bits, computed by the SAME Spark expressions that built the
    index (one row through codegen — guarantees hash parity with the
    indexed values by construction, no reimplementation to drift)."""
    lo, hi = _signature_sql("s", padded=(mode == "eq"))
    row = (
        spark.range(1)
        .select(F.lit(needle).alias("s"))
        .selectExpr(f"{lo} as lo", f"{hi} as hi")
        .collect()[0]
    )
    return row["lo"], row["hi"]


def _decode_file_uri(uri: str) -> str:
    """input_file_name() returns PERCENT-ENCODED URIs ('a b' ->
    'a%20b', a literal '%2F' partition dir -> '%252F'); one unquote
    recovers the actual path spelling that spark.read and os-path
    comparisons need.  (urllib.unquote leaves '+' alone, unlike
    url_decode's form-encoding rules.)"""
    from urllib.parse import unquote

    return unquote(uri)


def probe_index(
    spark: SparkSession,
    index_path: str,
    column: str,
    needle: str,
    *,
    mode: str = "eq",
) -> tuple[set[str], set[str]]:
    """(surviving files, all indexed files) for a probe, from ONE pass
    over the sidecar (one Spark job, one collect — the probe hot path
    should not scan the index twice).  Signature containment: every
    needle bit present in the file's signature (bitset.Contains parity);
    eq mode adds the min/max bounds check (statfilter.go:125).
    Duplicate (file, column) index rows — possible after a crash-repair
    re-append — collapse here; file names come back percent-DECODED."""
    lo, hi = probe_signature(spark, needle, mode=mode)
    cond = (F.col("sig_lo").bitwiseAND(F.lit(lo)) == F.lit(lo)) & (
        F.col("sig_hi").bitwiseAND(F.lit(hi)) == F.lit(hi)
    )
    if mode == "eq":
        # all-null files have null bounds: they cannot contain the needle
        cond = cond & (F.lit(needle) >= F.col("min_val")) & (
            F.lit(needle) <= F.col("max_val")
        )
    rows = (
        spark.read.parquet(index_path)
        .filter(F.col("column") == column)
        .select("file", cond.alias("survives"))
        .collect()
    )
    covered = {_decode_file_uri(r["file"]) for r in rows}
    survivors = {_decode_file_uri(r["file"]) for r in rows if r["survives"]}
    return survivors, covered


def pruned_files(
    spark: SparkSession,
    index_path: str,
    column: str,
    needle: str,
    *,
    mode: str = "eq",
) -> list[str]:
    """Distinct surviving files for a probe (percent-decoded paths)."""
    survivors, _ = probe_index(spark, index_path, column, needle, mode=mode)
    return sorted(survivors)


def indexed_files(spark: SparkSession, index_path: str, column: str) -> set[str]:
    """Distinct (percent-decoded) file set the sidecar covers for one
    column (staleness repair / test inspection)."""
    idx = spark.read.parquet(index_path).filter(F.col("column") == column)
    return {
        _decode_file_uri(r["file"])
        for r in idx.select("file").distinct().collect()
    }


def pruned_read(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    column: str,
    needle: str,
    *,
    mode: str = "eq",
) -> DataFrame:
    """The full pruned string-probe scan: select surviving files from the
    sidecar index, scan only those, and apply the exact predicate.
    Result is identical to filtering the whole table; IO is proportional
    to the files that can match.  An all-miss probe reads zero data
    files (schema comes from the table footer only).  basePath keeps
    hive partition columns populated on the file-list scan."""
    files = pruned_files(spark, index_path, column, needle, mode=mode)
    base = spark.read.parquet(table_path)
    if not files:
        return base.limit(0).filter(F.lit(False))
    pred = (
        (F.col(column) == needle) if mode == "eq" else F.col(column).contains(needle)
    )
    return (
        spark.read.option("basePath", table_path)
        .schema(base.schema)
        .parquet(*files)
        .filter(pred)
    )
