"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched `mapInPandas`.

The real decode step (image/audio/video libraries) is STUBBED — the
container has no codec libs — but everything Spark-side is real and tested:
the binary column schema, the mapInPandas batch shape, partition-preserving
metadata extraction, and deterministic pseudo-decoding so downstream
operators (resize plans, frame sampling, feature join) have stable inputs.

At 100 TB: binary payloads stay columnar in Parquet (no row-group
explosion: keep `spark.sql.files.maxPartitionBytes` moderate since rows are
fat); decode runs in mapInPandas over Arrow record batches so bytes cross
the JVM->Python boundary exactly once, vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
POLY_BASE = 31

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, content_hash long, fake_width int, fake_height int"
)


def poly_hash_bytes(data: bytes) -> int:
    """Same polynomial fold as functions.text.poly_hash, over bytes."""
    h = 0
    for b in data:
        h = (h * POLY_BASE + b) % POLY_MOD
    return h


def decode_image_stub(data: bytes) -> tuple[int, int, int]:
    """STUB for image decoding (no codec libs in this container).

    Returns (content_hash, width, height) deterministically derived from
    the payload so tests and oracles are stable.  A real deployment swaps
    this for PIL/libvips inside the same mapInPandas batch loop.
    """
    h = poly_hash_bytes(data)
    return h, 1 + h % 1024, 1 + (h // 1024) % 1024


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat utf-8 bytes of a text column as the opaque
    binary payload (the driver fixtures have no true binary column)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata batch out.

    Note ASCII payloads make poly_hash_bytes equal functions.text.poly_hash
    of the text — which is what the DuckDB oracle computes.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_image_stub(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "content_hash": [m[0] for m in meta],
                    "fake_width": [m[1] for m in meta],
                    "fake_height": [m[2] for m in meta],
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing demo: positions to sample from each payload
    (as if keyframes every `every_n_bytes`).  Pure built-ins — the heavy
    decode would consume this plan inside mapInPandas."""
    return df.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, greatest(0, cast(octet_length(payload) as int) - 1), "
            f"{every_n_bytes}), i -> i)"
        ).alias("sample_offsets"),
    )
