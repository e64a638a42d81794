"""Z-order clustering (operators/zorder.py): interleave correctness vs a
python reference, write round-trip, and the actual row-group-skipping
payoff measured via scan metrics (the bloom-test construction)."""

import pytest
from pyspark.sql import functions as F

from dp3_spark.operators import zorder as Z


def _z_ref(vals, mins, maxs, bits):
    """Pure-python reference: quantize each dim, interleave LSB-first."""
    z = 0
    k = len(vals)
    for i, (v, mn, mx) in enumerate(zip(vals, mins, maxs)):
        w = ((mx - mn) // (1 << bits)) + 1
        q = (v - mn) // w
        for j in range(bits):
            z |= ((q >> j) & 1) << (j * k + i)
    return z


def test_zvalue_matches_python_reference(spark):
    import random

    rng = random.Random(3)
    big = 1_705_000_000_000_000_000
    rows = [
        (rng.randrange(0, 150), big + rng.randrange(0, 2_600_000_000_000_000))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "a long, t long")
    got = Z.zvalue_frame(df, ["a", "t"], bits=8).collect()
    mins = (min(r[0] for r in rows), min(r[1] for r in rows))
    maxs = (max(r[0] for r in rows), max(r[1] for r in rows))
    for r in got:
        assert r["_z"] == _z_ref((r["a"], r["t"]), mins, maxs, 8)


def test_zvalue_validations(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        Z.zvalue_frame(df, [], bits=8)
    with pytest.raises(ValueError):
        Z.zvalue_frame(df, ["a", "b"], bits=32)  # 64 > 62


def test_zorder_write_roundtrip_loses_nothing(spark, tmp_path):
    df = spark.range(5_000).select(
        (F.col("id") % 71).alias("a"), (F.col("id") * 37 % 997).alias("b"),
        F.col("id"),
    )
    p = str(tmp_path / "z")
    Z.zorder_write(df, p, ["a", "b"], bits=8, num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 5_000
    assert set(back.columns) == {"a", "b", "id"}
    assert back.agg(F.sum("id")).first()[0] == df.agg(F.sum("id")).first()[0]


def _scan_rows(spark, path, pred):
    d = spark.read.parquet(path).filter(pred)
    d.collect()
    leaf = d._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    return leaf.metrics().apply("numOutputRows").value()


def test_zorder_skips_row_groups_on_either_dimension(spark, tmp_path):
    """The payoff: on a z-ordered table a narrow range predicate on
    EITHER dimension skips most row groups, where the linear (a, t)
    sort only skips for the leading column.  Measured via the scan's
    numOutputRows (row-group stats pruning), one row group per file."""
    n = 200_000
    df = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1_000_000)).alias("t"),
    )
    linear, zed = str(tmp_path / "linear"), str(tmp_path / "zed")
    df.repartitionByRange(64, "a", "t").sortWithinPartitions("a", "t").write.parquet(
        linear
    )
    Z.zorder_write(df, zed, ["a", "t"], bits=10, num_files=64)

    pred_t = (F.col("t") >= 500_000) & (F.col("t") < 510_000)  # 1% of t
    pred_a = (F.col("a") >= 500) & (F.col("a") < 510)  # 1% of a

    lin_t = _scan_rows(spark, linear, pred_t)
    z_t = _scan_rows(spark, zed, pred_t)
    # linear layout: t is the trailing sort key -> every file overlaps the
    # t range -> reads ~everything.  z layout: skips most row groups.
    assert lin_t >= n * 0.9
    assert z_t <= n * 0.35

    # and the leading-dimension predicate still skips on the z layout
    lin_a = _scan_rows(spark, linear, pred_a)
    z_a = _scan_rows(spark, zed, pred_a)
    assert lin_a <= n * 0.15  # linear is optimal for its leading column
    assert z_a <= n * 0.35  # z pays a bounded factor, never full scan
