"""Minimal pure-Python MCAP codec (public spec: https://mcap.dev/spec).

Implements MCAP v0 reading and writing: magic, Header(0x01), Schema(0x03),
Channel(0x04), Message(0x05), Chunk(0x06) with zstd / lz4 / zlib-less
"" (none) compression via the pyarrow codecs, DataEnd(0x0F), Footer(0x02),
closing magic.  Index/summary records (MessageIndex, ChunkIndex,
Statistics, Attachment*, Metadata*, SummaryOffset) are skipped on read —
they are optimizations, not data — so real-world chunked+compressed
captures import correctly (the reference reads them through the foxglove
library, e.g. mcap/lazy_indexed_iterator.go:10-48).

This makes the dp3-style import path (routes/import.go; SURVEY.md §2.5)
real end-to-end without the `mcap` pip package: write_mcap produces files
any conformant reader accepts, iter_mcap streams (schema, channel, message)
triples the way the reference's TreeManager.Receive consumes them
(treemgr/treemgr.go:204-264).

All integers little-endian; strings length-prefixed uint32; records are
(opcode u8, length u64, payload).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import BinaryIO, Iterator

MAGIC = b"\x89MCAP0\r\n"

OP_HEADER = 0x01
OP_FOOTER = 0x02
OP_SCHEMA = 0x03
OP_CHANNEL = 0x04
OP_MESSAGE = 0x05
OP_CHUNK = 0x06
OP_MESSAGE_INDEX = 0x07
OP_CHUNK_INDEX = 0x08
OP_DATA_END = 0x0F


@dataclass(frozen=True)
class McapSchema:
    id: int
    name: str
    encoding: str
    data: bytes


@dataclass(frozen=True)
class McapChannel:
    id: int
    schema_id: int
    topic: str
    message_encoding: str


@dataclass(frozen=True)
class McapMessage:
    channel_id: int
    sequence: int
    log_time: int
    publish_time: int
    data: bytes


def _s(text: str) -> bytes:
    b = text.encode("utf-8")
    return struct.pack("<I", len(b)) + b


def _record(op: int, payload: bytes) -> bytes:
    return struct.pack("<BQ", op, len(payload)) + payload


def _codec(compression: str):
    """MCAP chunk codecs via pyarrow (no third-party bindings needed):
    'zstd' -> zstd frame, 'lz4' -> LZ4 frame, '' -> none."""
    import pyarrow as pa

    name = {"zstd": "zstd", "lz4": "lz4_frame"}.get(compression)
    if name is None or not pa.Codec.is_available(name):
        raise McapFormatError(f"unsupported chunk compression: {compression!r}")
    return pa.Codec(name)


def _schema_record(sc: McapSchema) -> bytes:
    return _record(
        OP_SCHEMA,
        struct.pack("<H", sc.id)
        + _s(sc.name)
        + _s(sc.encoding)
        + struct.pack("<I", len(sc.data))
        + sc.data,
    )


def _channel_record(ch: McapChannel) -> bytes:
    return _record(
        OP_CHANNEL,
        struct.pack("<HH", ch.id, ch.schema_id)
        + _s(ch.topic)
        + _s(ch.message_encoding)
        + struct.pack("<I", 0),  # empty metadata map
    )


def _message_record(m: McapMessage) -> bytes:
    return _record(
        OP_MESSAGE,
        struct.pack("<HIQQ", m.channel_id, m.sequence, m.log_time, m.publish_time)
        + m.data,
    )


def _chunk_record(messages: list[McapMessage], compression: str) -> bytes:
    records = b"".join(_message_record(m) for m in messages)
    start = min(m.log_time for m in messages)
    end = max(m.log_time for m in messages)
    crc = zlib.crc32(records)
    if compression:
        body = bytes(_codec(compression).compress(records))
    else:
        body = records
    payload = (
        struct.pack("<QQQI", start, end, len(records), crc)
        + _s(compression)
        + struct.pack("<Q", len(body))
        + body
    )
    return _record(OP_CHUNK, payload)


class McapStreamWriter:
    """Incremental MCAP writer: records stream to `f` as they are added,
    so peak memory is ONE chunk batch (chunk_size, default 1 MiB), never
    the full message list.  Schema/Channel records are emitted into the
    data section when first added — spec-legal anywhere in the data
    section as long as they precede the first reference, which holds by
    construction: a definition is written the moment it is first seen,
    physically before the chunk (or message record) that first uses it.
    The repo's own reader (iter_mcap) and standard MCAP tooling resolve
    definitions as they appear.

    Usage: add_schema/add_channel on first sight, write_message per row,
    close() to write DataEnd + footer + closing magic."""

    def __init__(
        self,
        f: BinaryIO,
        *,
        profile: str = "",
        library: str = "dp3_spark",
        chunked: bool = False,
        compression: str = "zstd",
        chunk_size: int = 1 << 20,
    ) -> None:
        self.f = f
        self.chunked = chunked
        self.compression = compression
        self.chunk_size = chunk_size
        self._batch: list[McapMessage] = []
        self._size = 0
        f.write(MAGIC)
        f.write(_record(OP_HEADER, _s(profile) + _s(library)))

    def add_schema(self, sc: McapSchema) -> None:
        self.f.write(_schema_record(sc))

    def add_channel(self, ch: McapChannel) -> None:
        self.f.write(_channel_record(ch))

    def write_message(self, m: McapMessage) -> None:
        if not self.chunked:
            self.f.write(_message_record(m))
            return
        self._batch.append(m)
        self._size += len(m.data) + 31
        if self._size >= self.chunk_size:
            self._flush()

    def _flush(self) -> None:
        if self._batch:
            self.f.write(_chunk_record(self._batch, self.compression))
            self._batch, self._size = [], 0

    def close(self) -> None:
        self._flush()
        self.f.write(_record(OP_DATA_END, struct.pack("<I", 0)))
        # footer: no summary section (all zero offsets is spec-legal)
        self.f.write(_record(OP_FOOTER, struct.pack("<QQI", 0, 0, 0)))
        self.f.write(MAGIC)


def write_mcap(
    f: BinaryIO,
    schemas: list[McapSchema],
    channels: list[McapChannel],
    messages: list[McapMessage],
    *,
    profile: str = "",
    library: str = "dp3_spark",
    chunked: bool = False,
    compression: str = "zstd",
    chunk_size: int = 1 << 20,
) -> None:
    """Whole-list convenience wrapper over McapStreamWriter (byte-identical
    layout: header, all schemas, all channels, then messages/chunks).
    chunked=False writes the plain unchunked profile; chunked=True groups
    messages into Chunk records (compression: 'zstd' | 'lz4' | '').
    Schemas/channels are written outside chunks (spec-legal) so readers can
    resolve them without decompressing."""
    w = McapStreamWriter(
        f,
        profile=profile,
        library=library,
        chunked=chunked,
        compression=compression,
        chunk_size=chunk_size,
    )
    for sc in schemas:
        w.add_schema(sc)
    for ch in channels:
        w.add_channel(ch)
    for m in messages:
        w.write_message(m)
    w.close()


class McapFormatError(ValueError):
    pass


def _read_exact(f: BinaryIO, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise McapFormatError(f"truncated read: wanted {n}, got {len(b)}")
    return b


def _parse_s(buf: bytes, off: int) -> tuple[str, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    return buf[off : off + n].decode("utf-8"), off + n


def _unchunk(payload: bytes, *, verify_crc: bool = True) -> bytes:
    """Chunk record -> its decompressed inner record stream."""
    start, end, usize, crc = struct.unpack_from("<QQQI", payload, 0)
    compression, off = _parse_s(payload, 28)
    (blen,) = struct.unpack_from("<Q", payload, off)
    body = payload[off + 8 : off + 8 + blen]
    if compression == "":
        records = body
    else:
        records = bytes(_codec(compression).decompress(body, usize))
    if len(records) != usize:
        raise McapFormatError(
            f"chunk decompressed to {len(records)} bytes, expected {usize}"
        )
    if verify_crc and crc != 0 and zlib.crc32(records) != crc:
        raise McapFormatError("chunk crc mismatch")
    return records


def _iter_buffer_records(buf: bytes) -> Iterator[tuple[int, bytes]]:
    off = 0
    n = len(buf)
    while off + 9 <= n:
        op, length = struct.unpack_from("<BQ", buf, off)
        off += 9
        yield op, buf[off : off + length]
        off += length


def _iter_records(
    f: BinaryIO, *, skip_message_payloads: bool = False
) -> Iterator[tuple[int, bytes]]:
    """Top-level record stream, recursing into Chunk records so callers see
    a flat (op, payload) sequence whether or not the file is chunked.
    skip_message_payloads seeks past top-level Message records (cheap
    schema scans); chunked content still decompresses."""
    if _read_exact(f, 8) != MAGIC:
        raise McapFormatError("bad magic")
    while True:
        head = f.read(9)
        if len(head) < 9:
            raise McapFormatError("missing footer")
        op, length = struct.unpack("<BQ", head)
        if op == OP_DATA_END:
            break
        if op == OP_CHUNK:
            yield from _iter_buffer_records(_unchunk(_read_exact(f, length)))
        elif skip_message_payloads and op == OP_MESSAGE:
            f.seek(length, 1)
        else:
            yield op, _read_exact(f, length)
    # footer + closing magic follow DataEnd; not needed for streaming reads


def _parse_schema(payload: bytes) -> McapSchema:
    (sid,) = struct.unpack_from("<H", payload, 0)
    name, off = _parse_s(payload, 2)
    enc, off = _parse_s(payload, off)
    (dlen,) = struct.unpack_from("<I", payload, off)
    return McapSchema(sid, name, enc, payload[off + 4 : off + 4 + dlen])


def iter_mcap(f: BinaryIO) -> Iterator[tuple[McapSchema | None, McapChannel, McapMessage]]:
    """Stream (schema, channel, message) for every message record —
    chunked (zstd/lz4/none) or unchunked — resolving schema/channel
    references as they appear (the shape the reference's import consumes;
    schema may be None for schema_id 0)."""
    schemas: dict[int, McapSchema] = {}
    channels: dict[int, McapChannel] = {}
    for op, payload in _iter_records(f):
        if op == OP_SCHEMA:
            sc = _parse_schema(payload)
            schemas[sc.id] = sc
        elif op == OP_CHANNEL:
            cid, sid = struct.unpack_from("<HH", payload, 0)
            topic, off = _parse_s(payload, 4)
            enc, off = _parse_s(payload, off)
            channels[cid] = McapChannel(cid, sid, topic, enc)
        elif op == OP_MESSAGE:
            cid, seq, log_time, pub_time = struct.unpack_from("<HIQQ", payload, 0)
            msg = McapMessage(cid, seq, log_time, pub_time, payload[22:])
            if cid not in channels:
                raise McapFormatError(f"message references unknown channel {cid}")
            ch = channels[cid]
            yield schemas.get(ch.schema_id), ch, msg
        # index/summary/attachment/metadata records: skipped


def scan_schemas(f: BinaryIO) -> list[McapSchema]:
    """Light pass collecting only Schema records — skips top-level message
    payloads, so it is cheap even on large files.  Used to build the schema
    registry before the distributed message decode."""
    out: list[McapSchema] = []
    for op, payload in _iter_records(f, skip_message_payloads=True):
        if op == OP_SCHEMA:
            out.append(_parse_schema(payload))
    return out


# ----------------------------------------------- split (parallel) reading


@dataclass(frozen=True)
class McapLayout:
    """Metadata-only view of a file: definition records plus the offsets of
    Chunk records, gathered WITHOUT decompressing any chunk — the split
    plan for parallel reads (the pure-python analog of what the reference
    gets from the summary-section chunk index,
    mcap/lazy_indexed_iterator.go:10-48)."""

    schemas: dict[int, McapSchema]
    channels: dict[int, McapChannel]
    chunk_offsets: tuple[int, ...]
    has_toplevel_messages: bool


def _parse_channel(payload: bytes) -> McapChannel:
    cid, sid = struct.unpack_from("<HH", payload, 0)
    topic, off = _parse_s(payload, 4)
    enc, off = _parse_s(payload, off)
    return McapChannel(cid, sid, topic, enc)


def scan_layout(f: BinaryIO) -> McapLayout:
    """One seek-heavy header walk over top-level records: O(#records) tiny
    reads, no chunk decompression, no message payload reads.  Continues
    past DataEnd through the summary section (rosbag2-style files define
    schemas/channels only inside chunks, repeating them in the summary —
    this pass picks those up without touching chunk bytes)."""
    if _read_exact(f, 8) != MAGIC:
        raise McapFormatError("bad magic")
    schemas: dict[int, McapSchema] = {}
    channels: dict[int, McapChannel] = {}
    chunks: list[int] = []
    topmsg = False
    while True:
        pos = f.tell()
        head = f.read(9)
        if len(head) < 9:
            raise McapFormatError("missing footer")
        op, length = struct.unpack("<BQ", head)
        if op == OP_FOOTER:
            break
        if op == OP_CHUNK:
            chunks.append(pos)
            f.seek(length, 1)
        elif op == OP_SCHEMA:
            sc = _parse_schema(_read_exact(f, length))
            schemas[sc.id] = sc
        elif op == OP_CHANNEL:
            ch = _parse_channel(_read_exact(f, length))
            channels[ch.id] = ch
        elif op == OP_MESSAGE:
            topmsg = True
            f.seek(length, 1)
        else:  # DataEnd, indexes, attachments, metadata, summary offsets
            f.seek(length, 1)
    return McapLayout(schemas, channels, tuple(chunks), topmsg)


def _resolve_messages(
    records: Iterator[tuple[int, bytes]],
    schemas: dict[int, McapSchema],
    channels: dict[int, McapChannel],
) -> Iterator[tuple[McapSchema | None, McapChannel, McapMessage]]:
    for op, payload in records:
        if op == OP_SCHEMA:
            sc = _parse_schema(payload)
            schemas[sc.id] = sc
        elif op == OP_CHANNEL:
            ch = _parse_channel(payload)
            channels[ch.id] = ch
        elif op == OP_MESSAGE:
            cid, seq, log_time, pub_time = struct.unpack_from("<HIQQ", payload, 0)
            if cid not in channels:
                raise McapFormatError(
                    f"message references unknown channel {cid} (definition "
                    "not visible to this split — read the file sequentially)"
                )
            ch = channels[cid]
            yield schemas.get(ch.schema_id), ch, McapMessage(
                cid, seq, log_time, pub_time, payload[22:]
            )


def iter_chunk_messages(
    f: BinaryIO, offset: int, layout: McapLayout
) -> Iterator[tuple[McapSchema | None, McapChannel, McapMessage]]:
    """Decode exactly one Chunk record at `offset` (from a prior
    scan_layout), resolving definitions from the layout plus any records
    inside the chunk itself.  Independent of every other chunk — the unit
    of parallel reading."""
    f.seek(offset)
    op, length = struct.unpack("<BQ", _read_exact(f, 9))
    if op != OP_CHUNK:
        raise McapFormatError(f"no chunk record at offset {offset}")
    records = _iter_buffer_records(_unchunk(_read_exact(f, length)))
    yield from _resolve_messages(
        records, dict(layout.schemas), dict(layout.channels)
    )


def iter_toplevel_messages(
    f: BinaryIO, layout: McapLayout
) -> Iterator[tuple[McapSchema | None, McapChannel, McapMessage]]:
    """Decode only the messages OUTSIDE chunks (files may mix both); chunk
    payloads are seeked past without decompression."""
    if _read_exact(f, 8) != MAGIC:
        raise McapFormatError("bad magic")

    def records() -> Iterator[tuple[int, bytes]]:
        while True:
            head = f.read(9)
            if len(head) < 9:
                raise McapFormatError("missing footer")
            op, length = struct.unpack("<BQ", head)
            if op == OP_DATA_END:
                return
            if op == OP_MESSAGE:
                yield op, _read_exact(f, length)
            else:
                f.seek(length, 1)

    yield from _resolve_messages(
        records(), dict(layout.schemas), dict(layout.channels)
    )
