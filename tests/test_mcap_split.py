"""Chunk-granularity parallel MCAP reading: the split plan
(plan_mcap_units / scan_layout) lets ONE large capture file decode across
many Spark tasks — the scale behavior the reference gets from its
summary-section chunk index (mcap/lazy_indexed_iterator.go:10-48), where a
file-granularity reader would pin a 100 GB capture to a single task."""

import io
import json

import pytest

from dp3_spark.sources import mcap as MCAP
from dp3_spark.sources.mcap import (
    _UNIT_TOPLEVEL,
    _UNIT_WHOLE_FILE,
    _decode_unit,
    plan_mcap_units,
)
from dp3_spark.sources.mcap_codec import (
    MAGIC,
    OP_DATA_END,
    OP_FOOTER,
    OP_HEADER,
    McapChannel,
    McapFormatError,
    McapMessage,
    McapSchema,
    _channel_record,
    _chunk_record,
    _message_record,
    _record,
    _s,
    _schema_record,
    iter_chunk_messages,
    iter_mcap,
    iter_toplevel_messages,
    scan_layout,
    write_mcap,
)
from tests.test_mcap_codec import fix_mcap_bytes

import struct


def _msgs(n, start=0):
    return [
        McapMessage(1, i, 10**18 + i, 10**18 + i, json.dumps({"i": i}).encode())
        for i in range(start, start + n)
    ]


SCHEMA = McapSchema(1, "test/Msg", "jsonschema", b"{}")
CHANNEL = McapChannel(1, 1, "/t", "json")


def test_layout_counts_chunks_without_decompressing():
    raw = fix_mcap_bytes(200, chunked=True, compression="zstd", chunk_size=512)
    lay = scan_layout(io.BytesIO(raw))
    assert len(lay.chunk_offsets) > 3
    assert 1 in lay.channels and 1 in lay.schemas
    assert not lay.has_toplevel_messages


def test_plan_one_unit_per_chunk():
    raw = fix_mcap_bytes(200, chunked=True, compression="zstd", chunk_size=512)
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".mcap", delete=False) as f:
        f.write(raw)
        path = f.name
    try:
        units = plan_mcap_units([(path, "bot")])
        lay = scan_layout(io.BytesIO(raw))
        assert [u[2] for u in units] == list(lay.chunk_offsets)
        # decoding the units reproduces the sequential stream exactly
        got = sorted(
            (r["sequence"], r["log_time"])
            for r in _decode_unit(path, "bot", [u[2] for u in units])
        )
        want = sorted(
            (m.sequence, m.log_time) for _, _, m in iter_mcap(io.BytesIO(raw))
        )
        assert got == want and len(got) == 200
    finally:
        os.unlink(path)


def test_plan_unchunked_file_is_single_toplevel_unit(tmp_path):
    p = tmp_path / "plain.mcap"
    p.write_bytes(fix_mcap_bytes(10))
    units = plan_mcap_units([(str(p), "bot")])
    assert units == [(str(p), "bot", _UNIT_TOPLEVEL)]
    rows = list(_decode_unit(str(p), "bot", [_UNIT_TOPLEVEL]))
    assert len(rows) == 10


def _mixed_file() -> bytes:
    """Hand-built spec-legal file: defs top-level, one chunk, plus two
    top-level messages after it (writers may mix freely)."""
    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(_record(OP_HEADER, _s("") + _s("test")))
    buf.write(_schema_record(SCHEMA))
    buf.write(_channel_record(CHANNEL))
    buf.write(_chunk_record(_msgs(5), "zstd"))
    for m in _msgs(2, start=100):
        buf.write(_message_record(m))
    buf.write(_record(OP_DATA_END, struct.pack("<I", 0)))
    buf.write(_record(OP_FOOTER, struct.pack("<QQI", 0, 0, 0)))
    buf.write(MAGIC)
    return buf.getvalue()


def _chunk_only_defs_file() -> bytes:
    """Definitions ONLY inside the chunk (rosbag2-style without a summary
    section): not splittable — must fall back to sequential read."""
    records = (
        _schema_record(SCHEMA)
        + _channel_record(CHANNEL)
        + b"".join(_message_record(m) for m in _msgs(5))
    )
    import zlib

    crc = zlib.crc32(records)
    payload = (
        struct.pack("<QQQI", 10**18, 10**18 + 4, len(records), crc)
        + _s("")
        + struct.pack("<Q", len(records))
        + records
    )
    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(_record(OP_HEADER, _s("") + _s("test")))
    buf.write(_record(0x06, payload))
    buf.write(_record(OP_DATA_END, struct.pack("<I", 0)))
    buf.write(_record(OP_FOOTER, struct.pack("<QQI", 0, 0, 0)))
    buf.write(MAGIC)
    return buf.getvalue()


def test_mixed_toplevel_and_chunk_messages(tmp_path):
    raw = _mixed_file()
    p = tmp_path / "mixed.mcap"
    p.write_bytes(raw)
    lay = scan_layout(io.BytesIO(raw))
    assert lay.has_toplevel_messages and len(lay.chunk_offsets) == 1

    units = plan_mcap_units([(str(p), "bot")])
    assert [u[2] for u in units] == [lay.chunk_offsets[0], _UNIT_TOPLEVEL]

    top = [m.sequence for _, _, m in iter_toplevel_messages(io.BytesIO(raw), lay)]
    assert top == [100, 101]
    chunked = [
        m.sequence
        for _, _, m in iter_chunk_messages(io.BytesIO(raw), lay.chunk_offsets[0], lay)
    ]
    assert chunked == [0, 1, 2, 3, 4]
    # split read total == sequential read total
    seqs = sorted(r["sequence"] for r in _decode_unit(str(p), "bot", [u[2] for u in units]))
    assert seqs == [0, 1, 2, 3, 4, 100, 101]


def test_chunk_only_defs_falls_back_to_sequential(tmp_path):
    raw = _chunk_only_defs_file()
    p = tmp_path / "nodefs.mcap"
    p.write_bytes(raw)
    lay = scan_layout(io.BytesIO(raw))
    assert lay.chunk_offsets and not lay.channels
    units = plan_mcap_units([(str(p), "bot")])
    assert units == [(str(p), "bot", _UNIT_WHOLE_FILE)]
    rows = list(_decode_unit(str(p), "bot", [_UNIT_WHOLE_FILE]))
    assert sorted(r["sequence"] for r in rows) == [0, 1, 2, 3, 4]
    # definitions inside the chunk still resolve on the chunk-split path
    inside = list(iter_chunk_messages(io.BytesIO(raw), lay.chunk_offsets[0], lay))
    assert [m.sequence for _, _, m in inside] == [0, 1, 2, 3, 4]


def test_iter_chunk_messages_rejects_non_chunk_offset():
    raw = fix_mcap_bytes(50, chunked=True, compression="zstd", chunk_size=512)
    lay = scan_layout(io.BytesIO(raw))
    with pytest.raises(McapFormatError, match="no chunk record"):
        list(iter_chunk_messages(io.BytesIO(raw), 8, lay))


def test_read_mcap_splits_one_file_across_tasks(spark, tmp_path):
    """The Spark entry point: one chunked file -> multiple input units ->
    identical rows to a sequential decode."""
    raw = fix_mcap_bytes(120, chunked=True, compression="lz4", chunk_size=512)
    p = tmp_path / "big.mcap"
    p.write_bytes(raw)
    assert len(plan_mcap_units([(str(p), "bot")])) > 1
    df = MCAP.read_mcap(spark, [(str(p), "bot")])
    rows = df.orderBy("sequence").collect()
    assert len(rows) == 120
    assert [r["sequence"] for r in rows] == list(range(120))
    assert rows[0]["producer"] == "bot" and rows[0]["topic"] == "/fix"
    assert rows[0]["schema_hash"] != ""


def test_read_mcap_split_matches_schema_hash(spark, tmp_path):
    """schema_hash from the split path equals the sequential path's."""
    raw_chunked = fix_mcap_bytes(30, chunked=True, compression="zstd", chunk_size=256)
    raw_plain = fix_mcap_bytes(30)
    pc, pp = tmp_path / "c.mcap", tmp_path / "p.mcap"
    pc.write_bytes(raw_chunked)
    pp.write_bytes(raw_plain)
    hc = (
        MCAP.read_mcap(spark, [(str(pc), "bot")])
        .select("schema_hash")
        .distinct()
        .collect()
    )
    hp = (
        MCAP.read_mcap(spark, [(str(pp), "bot")])
        .select("schema_hash")
        .distinct()
        .collect()
    )
    assert hc == hp and len(hc) == 1
