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
    "doc_id long, n_bytes long, content_hash long, format string, "
    "width int, height int"
)


def poly_hash_bytes(data: bytes) -> int:
    """Same polynomial fold as functions.text.poly_hash, over bytes."""
    h = 0
    for b in data:
        h = (h * POLY_BASE + b) % POLY_MOD
    return h


def parse_image_dims(data: bytes) -> tuple[str, int, int] | None:
    """REAL image dimensions from container headers, pure Python — no codec
    libraries: PNG IHDR (spec: the first chunk, width/height big-endian
    uint32 at offsets 16/20), JPEG SOFn segment walk (height/width
    big-endian uint16 at marker payload offsets 3/5), GIF logical screen
    descriptor (width/height little-endian uint16 at offset 6).  Returns
    (format, width, height), or None for anything unrecognized."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return "png", w, h
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return "gif", w, h
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers: no length field
                continue
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(data):
                    return None
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return "jpeg", w, h
            i += 2 + seg_len
    return None


def parse_wav_meta(data: bytes) -> tuple[int, int, int, int] | None:
    """REAL WAV (RIFF) metadata from the container header, pure Python:
    (sample_rate, channels, bits_per_sample, n_frames).  Chunk walk per the
    RIFF spec — 'fmt ' carries channels u16 / sample_rate u32 / block_align
    u16 / bits u16; 'data' size / block_align = frame count.  Returns None
    for anything that is not a well-formed WAV."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    rate = channels = bits = block_align = None
    n_frames = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        csize = int.from_bytes(data[i + 4 : i + 8], "little")
        body = data[i + 8 : i + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data" and block_align:
            n_frames = csize // block_align
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if rate and channels and bits and n_frames is not None:
        return rate, channels, bits, n_frames
    return None


def parse_mp4_meta(data: bytes) -> tuple[int, int] | None:
    """REAL MP4/ISO-BMFF metadata from the box structure, pure Python:
    (timescale, duration) out of moov/mvhd — duration/timescale is the
    presentation length in seconds.  A proper box walk (size+fourcc at
    each level, descend into 'moov' only), not a byte scan, so a stray
    'mvhd' in media data cannot fool it."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int, depth: int = 0):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(data[i : i + 4], "big")
            four = data[i + 8 - 4 : i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > hi:
                    return None
                size = int.from_bytes(data[i + 8 : i + 16], "big")
                body = i + 16
            else:
                body = i + 8
            if size < 8 or i + size > hi:
                return None
            if four == b"moov" and depth == 0:
                r = walk(body, i + size, 1)
                if r is not None:
                    return r
            if four == b"mvhd" and depth == 1:
                if body >= hi:  # empty-body box: malformed, not a crash
                    return None
                ver = data[body]
                if ver == 1 and body + 32 <= hi:
                    ts = int.from_bytes(data[body + 20 : body + 24], "big")
                    dur = int.from_bytes(data[body + 24 : body + 32], "big")
                elif ver == 0 and body + 20 <= hi:
                    ts = int.from_bytes(data[body + 12 : body + 16], "big")
                    dur = int.from_bytes(data[body + 16 : body + 20], "big")
                else:
                    return None
                return ts, dur
            i += size
        return None

    return walk(0, len(data))


AUDIO_SCHEMA = (
    "doc_id long, format string, sample_rate int, channels int, "
    "bits int, n_frames long, duration_s double"
)


def decode_audio_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas audio-metadata decode: WAV payloads get REAL
    header-parsed (sample_rate, channels, bits, n_frames, duration);
    unrecognized payloads fall back to deterministic pseudo-metadata with
    format='raw' (the same stub discipline as decode_metadata — a real
    deployment swaps the fallback for soundfile/ffprobe in the same batch
    loop, the Spark plumbing is unchanged)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, rates, chans, bits_l, frames, durs = [], [], [], [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                meta = parse_wav_meta(b)
                if meta is not None:
                    rate, ch, bits, nf = meta
                    fmts.append("wav")
                else:
                    hv = poly_hash_bytes(b)
                    rate, ch, bits, nf = (
                        8000 + hv % 40000, 1 + hv % 2, 16, len(b)
                    )
                    fmts.append("raw")
                rates.append(rate); chans.append(ch); bits_l.append(bits)
                frames.append(nf)
                durs.append(nf / rate if rate else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": fmts,
                    "sample_rate": rates,
                    "channels": chans,
                    "bits": bits_l,
                    "n_frames": frames,
                    "duration_s": durs,
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, AUDIO_SCHEMA)


def decode_image_stub(data: bytes) -> tuple[int, int, int]:
    """Fallback pseudo-decode for payloads with no parseable image header
    (e.g. the fixture's text-as-binary payloads): (content_hash, width,
    height) deterministically derived from the bytes so tests and oracles
    are stable.  A real deployment swaps this for PIL/libvips inside the
    same mapInPandas batch loop; real PNG/JPEG/GIF headers never reach it
    (parse_image_dims handles those)."""
    h = poly_hash_bytes(data)
    return h, 1 + h % 1024, 1 + (h // 1024) % 1024


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat utf-8 bytes of a text column as the opaque
    binary payload (the driver fixtures have no true binary column)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def decode_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata batch out.
    PNG/JPEG/GIF payloads get REAL header-parsed dimensions
    (parse_image_dims); unrecognized payloads fall back to the
    deterministic pseudo-decode with format='raw'.

    Note ASCII payloads make poly_hash_bytes equal functions.text.poly_hash
    of the text — which is what the DuckDB oracle computes.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights, hashes, sizes = [], [], [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                hv = poly_hash_bytes(b)
                sizes.append(len(b))
                hashes.append(hv)
                parsed = parse_image_dims(b)
                if parsed is None:
                    fmts.append("raw")
                    w, h = 1 + hv % 1024, 1 + (hv // 1024) % 1024
                else:
                    fmt, w, h = parsed
                    fmts.append(fmt)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": sizes,
                    "content_hash": hashes,
                    "format": fmts,
                    "width": widths,
                    "height": heights,
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
            f"sequence(cast(0 as bigint), "
            f"greatest(cast(0 as bigint), octet_length(payload) - 1), "
            f"cast({every_n_bytes} as bigint))"
        ).alias("sample_offsets"),
    )


RESIZED_SCHEMA = (
    "doc_id long, out_width int, out_height int, thumb binary, thumb_bytes long"
)


def resize_stub(df: DataFrame, *, width: int = 64, height: int = 64,
                id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing: mapInPandas batch in -> fixed-dimension thumbnail
    payloads out.  The pixel resample is STUBBED (no codec libs): the
    'thumbnail' is the payload tiled/truncated to width*height//64 bytes,
    deterministic so downstream stages have stable inputs.  A real
    deployment swaps the inner loop for PIL/libvips `thumbnail()` on the
    same Arrow batches — the schema, batch shape, and partitioning are
    what this exercises."""
    n_out = max(1, width * height // 64)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                b = bytes(p) or b"\x00"
                reps = -(-n_out // len(b))  # ceil
                thumbs.append((b * reps)[:n_out])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "out_width": width,
                    "out_height": height,
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                }
            )

    return df.select(id_col, "payload").mapInPandas(resize, RESIZED_SCHEMA)


def extract_features(df: DataFrame, *, dim: int = 16,
                     id_col: str = "doc_id") -> DataFrame:
    """Feature extraction plumbing: payload bytes -> L2-normalized float
    vector (byte histogram folded to `dim` buckets), fully vectorized
    numpy inside mapInPandas.  STUB for a real vision/audio encoder, but
    the output is a genuine `array<float>` embedding column that composes
    with the similarity operators (cosine_topk / LSH / IVF) — the
    multimodal -> embedding -> dedup pipeline end to end."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                norm = float(np.sqrt((hist * hist).sum()))
                out.append((hist / norm if norm else hist).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": out}
            )

    return df.select(id_col, "payload").mapInPandas(
        feats, "doc_id long, features array<float>"
    )
