"""MCAP log-file source: the reference's native ingest format
(routes/import.go:16-59; treemgr/treemgr.go:204-264).

Spark-first design: a file-list DataFrame fans out over executors; each
task opens its files with the Python `mcap` reader inside `mapInPandas`
(Arrow-batched) and emits canonical log rows
(producer, topic, log_time ns, sequence, schema_name, schema_hash, data).

The `mcap` package is not installed in this container, so the reader is
gated behind an import-try; the plumbing (schema, fan-out, batch shape,
dedup) is real and tested via `decode_records` with a fake decoder.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

ROW_SCHEMA = (
    "producer string, topic string, log_time long, sequence long, "
    "schema_name string, schema_hash string, data binary"
)

try:  # pragma: no cover - exercised only where the mcap lib exists
    from mcap.reader import make_reader  # type: ignore

    HAVE_MCAP = True
except ImportError:
    make_reader = None
    HAVE_MCAP = False


def schema_hash(schema_data: bytes) -> str:
    """Content-hashed schema key, like the reference schema store
    (treemgr/treemgr.go:308-321 util.CryptographicHash)."""
    return hashlib.sha256(schema_data).hexdigest()


def _decode_mcap_file(path: str, producer: str) -> Iterator[dict]:
    """Decode one MCAP file.  Prefers the `mcap` package (handles chunked/
    compressed files); falls back to the pure-python unchunked codec
    (sources/mcap_codec.py) which needs no third-party libs."""
    if HAVE_MCAP:  # pragma: no cover - mcap lib absent in this container
        with open(path, "rb") as f:
            reader = make_reader(f)
            for schema, channel, message in reader.iter_messages():
                yield {
                    "producer": producer,
                    "topic": channel.topic,
                    "log_time": message.log_time,
                    "sequence": message.sequence,
                    "schema_name": schema.name if schema else "",
                    "schema_hash": schema_hash(schema.data) if schema else "",
                    "data": message.data,
                }
        return
    from dp3_spark.sources.mcap_codec import iter_mcap

    with open(path, "rb") as f:
        for schema, channel, message in iter_mcap(f):
            yield {
                "producer": producer,
                "topic": channel.topic,
                "log_time": message.log_time,
                "sequence": message.sequence,
                "schema_name": schema.name if schema else "",
                "schema_hash": schema_hash(schema.data) if schema else "",
                "data": message.data,
            }


def read_mcap(
    spark: SparkSession,
    files: list[tuple[str, str]],
    decoder: Callable[[str, str], Iterator[dict]] | None = None,
) -> DataFrame:
    """files: [(path, producer)].  Decodes in parallel across executors —
    one task per file list partition, Arrow-batched output.

    `decoder(path, producer) -> iter[dict]` defaults to the real MCAP
    reader; inject a fake for tests / unavailable codecs."""
    decode = decoder or _decode_mcap_file
    file_df = spark.createDataFrame(files, "path string, producer string").repartition(
        max(1, min(len(files), spark.sparkContext.defaultParallelism))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, producer in zip(pdf["path"], pdf["producer"]):
                rows.extend(decode(path, producer))
            if rows:
                yield pd.DataFrame(rows)

    return file_df.mapInPandas(run, ROW_SCHEMA)


def ingest_dedup(df: DataFrame) -> DataFrame:
    """Idempotent-ingest dedup on (producer, topic, log_time, sequence) —
    the filter-merge iterator semantics (mcap/filter_merge_iterator.go:14-37)."""
    return df.dropDuplicates(["producer", "topic", "log_time", "sequence"])
