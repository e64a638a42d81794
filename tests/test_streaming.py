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
