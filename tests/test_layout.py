"""Bucketed-layout plan guards (dp3_spark/layout.py): co-bucketed tables
must join and aggregate WITHOUT a shuffle — the at-rest analog of the
reference's per-(producer, topic) tree co-location (treemgr.go:29-33).
These are plan-string assertions: the win is the absent Exchange."""

import pytest
from pyspark.sql import functions as F

from dp3_spark import layout


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def log_frames(spark):
    rows1 = [(f"p{i % 4}", "imu", 1000 + i, i, float(i)) for i in range(64)]
    rows2 = [(f"p{i % 4}", "gps", 1000 + i, i, float(i * 2)) for i in range(64)]
    ddl = "producer string, topic string, log_time long, sequence long, value double"
    return (
        spark.createDataFrame(rows1, ddl),
        spark.createDataFrame(rows2, ddl),
    )


def test_cobucketed_join_has_no_exchange(spark, tmp_path, log_frames):
    left, right = log_frames
    tabs = layout.cobucket_log_tables(
        spark,
        {"bkt_imu": left, "bkt_gps": right},
        buckets=4,
        base_path=str(tmp_path),
    )
    joined = (
        tabs["bkt_imu"].alias("l")
        .hint("merge")  # force SMJ so the assertion is about partitioning
        .join(tabs["bkt_gps"].alias("r"), "producer")
        .select("producer", F.col("l.value"), F.col("r.value"))
    )
    plan = plan_of(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # same data as a plain (unbucketed) join DOES shuffle — the layout is
    # what removed it
    plain = left.hint("merge").join(right, "producer")
    assert "Exchange" in plan_of(plain)
    for t in ("bkt_imu", "bkt_gps"):
        spark.sql(f"drop table if exists {t}")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path, log_frames):
    left, _ = log_frames
    tab = layout.write_bucketed(
        left,
        "bkt_agg",
        buckets=4,
        bucket_cols=("producer",),
        sort_cols=("producer", "log_time"),
        path=str(tmp_path / "bkt_agg"),
    )
    agg = tab.groupBy("producer").agg(F.count("*").alias("n"), F.max("log_time").alias("mx"))
    plan = plan_of(agg)
    assert "Exchange" not in plan, plan
    assert [r["n"] for r in agg.orderBy("producer").collect()] == [16, 16, 16, 16]
    spark.sql("drop table if exists bkt_agg")


def test_bucketed_asof_join_no_fact_exchange(spark, tmp_path, log_frames):
    """The producer-bucketed layout pre-satisfies dp3_asof_join's window
    partitioning: the union of two co-bucketed topic scans feeds the asof
    window chain with at most one lightweight repartition of the union —
    crucially there is no per-side shuffle."""
    from dp3_spark.operators.asof import dp3_asof_join

    left, right = log_frames
    tabs = layout.cobucket_log_tables(
        spark,
        {"bkt_l": left, "bkt_r": right},
        buckets=4,
        base_path=str(tmp_path),
    )
    out = dp3_asof_join(tabs["bkt_l"], tabs["bkt_r"], threshold_ns=10**12)
    assert out.count() > 0
    for t in ("bkt_l", "bkt_r"):
        spark.sql(f"drop table if exists {t}")
