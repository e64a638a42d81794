"""Structured Streaming ingest pipeline test: file stream -> canonical rows
-> watermark dedup -> partitioned parquet sink, then read back and verify
idempotent-ingest semantics (duplicate (producer, topic, log_time, sequence)
resolved to one copy, treemgr_test.go:590-663)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dp3_spark.streaming import ingest


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dp3_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_ingest_dedup(spark, tmpdir):
    src = f"{tmpdir}/src"
    sink = f"{tmpdir}/sink"
    ckpt = f"{tmpdir}/ckpt"

    # realistic epoch times: epoch-0 would sit exactly at the initial
    # watermark and be dropped as late
    base = 1704067200 * 10**9
    rows = [("dev1", "/imu", base + i * 10**9, i, float(i)) for i in range(50)]
    dup_rows = rows + rows[:10]  # 10 duplicate (log_time, sequence) pairs
    batch = spark.createDataFrame(
        dup_rows, "producer string, topic string, log_time long, sequence long, v double"
    )
    batch.write.parquet(src)

    raw = spark.readStream.schema(batch.schema).parquet(src)
    canon = ingest.canonical_stream(
        raw, producer_col="producer", topic_col="topic",
        time_col="log_time", sequence_col="sequence",
    )
    deduped = ingest.deduped_stream(canon)
    q = (
        ingest.ingest_writer(deduped, path=sink, checkpoint=ckpt, trigger_seconds=1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    assert out.count() == 50  # duplicates dropped
    assert out.select("producer", "topic", "log_time", "sequence").distinct().count() == 50
    assert "hour_bucket" in out.columns
    # partition layout: producer + hour bucket directories
    got = out.filter(F.col("sequence") == 7).collect()
    assert len(got) == 1 and got[0]["hour_bucket"] == 1704067200 * 10**9


def test_summary_maintainer_foreachbatch(spark, tmpdir):
    """Micro-batch summary maintenance: partial aggregates per batch merge
    associatively to the direct summary (the ingest-time statistics path,
    treemgr/writer.go:184-203)."""
    from dp3_spark.operators.stats import rollup_summary

    base = 1704067200 * 10**9
    rows = [("dev1", "/imu", base + i * 10**9, i, float(i)) for i in range(100)]
    full = spark.createDataFrame(
        rows, "producer string, topic string, log_time long, sequence long, v double"
    )
    update = ingest.summary_maintainer(full, granularity_ns=60 * 10**9, numeric_fields=["v"])

    # simulate two micro-batches, merge their partials
    b1 = update(full.filter(F.col("sequence") < 50), 0)
    b2 = update(full.filter(F.col("sequence") >= 50), 1)
    merged = rollup_summary(
        b1.unionByName(b2), from_granularity_ns=60 * 10**9,
        to_granularity_ns=60 * 10**9, numeric_fields=["v"],
    )
    direct = update(full, 2)
    m = {(r["producer"], r["topic"], r["bucket_start"]): (r["message_count"], r["v_sum"])
         for r in merged.collect()}
    d = {(r["producer"], r["topic"], r["bucket_start"]): (r["message_count"], r["v_sum"])
         for r in direct.collect()}
    assert m == d and len(m) == 2  # 100 s span -> two 60 s buckets
