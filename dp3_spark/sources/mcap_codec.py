"""Minimal pure-Python MCAP codec (public spec: https://mcap.dev/spec).

Implements the UNCHUNKED profile of MCAP v0: magic, Header(0x01),
Schema(0x03), Channel(0x04), Message(0x05), DataEnd(0x0F), Footer(0x02),
closing magic.  Unchunked files are valid MCAP (chunking/indexing are
optional); compression is therefore not required, which matters here since
this container has no zstd/lz4 python bindings.

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
from dataclasses import dataclass
from typing import BinaryIO, Iterator

MAGIC = b"\x89MCAP0\r\n"

OP_HEADER = 0x01
OP_FOOTER = 0x02
OP_SCHEMA = 0x03
OP_CHANNEL = 0x04
OP_MESSAGE = 0x05
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


def write_mcap(
    f: BinaryIO,
    schemas: list[McapSchema],
    channels: list[McapChannel],
    messages: list[McapMessage],
    *,
    profile: str = "",
    library: str = "dp3_spark",
) -> None:
    f.write(MAGIC)
    f.write(_record(OP_HEADER, _s(profile) + _s(library)))
    for sc in schemas:
        payload = (
            struct.pack("<H", sc.id)
            + _s(sc.name)
            + _s(sc.encoding)
            + struct.pack("<I", len(sc.data))
            + sc.data
        )
        f.write(_record(OP_SCHEMA, payload))
    for ch in channels:
        payload = (
            struct.pack("<HH", ch.id, ch.schema_id)
            + _s(ch.topic)
            + _s(ch.message_encoding)
            + struct.pack("<I", 0)  # empty metadata map
        )
        f.write(_record(OP_CHANNEL, payload))
    for m in messages:
        payload = (
            struct.pack("<HIQQ", m.channel_id, m.sequence, m.log_time, m.publish_time)
            + m.data
        )
        f.write(_record(OP_MESSAGE, payload))
    f.write(_record(OP_DATA_END, struct.pack("<I", 0)))
    # footer: no summary section (all zero offsets is spec-legal)
    f.write(_record(OP_FOOTER, struct.pack("<QQI", 0, 0, 0)))
    f.write(MAGIC)


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


def iter_mcap(f: BinaryIO) -> Iterator[tuple[McapSchema | None, McapChannel, McapMessage]]:
    """Stream (schema, channel, message) for every message record, resolving
    schema/channel references as they appear (the shape the reference's
    import consumes; schema may be None for schema_id 0)."""
    if _read_exact(f, 8) != MAGIC:
        raise McapFormatError("bad magic")
    schemas: dict[int, McapSchema] = {}
    channels: dict[int, McapChannel] = {}
    while True:
        head = f.read(9)
        if len(head) < 9:
            raise McapFormatError("missing footer")
        op, length = struct.unpack("<BQ", head)
        payload = _read_exact(f, length)
        if op == OP_SCHEMA:
            (sid,) = struct.unpack_from("<H", payload, 0)
            name, off = _parse_s(payload, 2)
            enc, off = _parse_s(payload, off)
            (dlen,) = struct.unpack_from("<I", payload, off)
            data = payload[off + 4 : off + 4 + dlen]
            schemas[sid] = McapSchema(sid, name, enc, data)
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
        elif op == OP_DATA_END:
            break
        # other record types (chunks, indexes, attachments, metadata) are
        # skipped — a chunked file would need the chunk records decoded;
        # raise loudly instead of silently dropping data:
        elif op in (0x06, 0x07, 0x08):  # Chunk, MessageIndex, ChunkIndex
            raise McapFormatError(
                "chunked MCAP not supported by the pure-python codec "
                "(install the mcap package for chunked/compressed files)"
            )
    # footer + closing magic follow DataEnd; not needed for streaming reads


def scan_schemas(f: BinaryIO) -> list[McapSchema]:
    """Light pass collecting only Schema records — skips message payloads,
    so it is cheap even on large files.  Used to build the schema registry
    before the distributed message decode."""
    if _read_exact(f, 8) != MAGIC:
        raise McapFormatError("bad magic")
    out: list[McapSchema] = []
    while True:
        head = f.read(9)
        if len(head) < 9:
            break
        op, length = struct.unpack("<BQ", head)
        if op == OP_SCHEMA:
            payload = _read_exact(f, length)
            (sid,) = struct.unpack_from("<H", payload, 0)
            name, off = _parse_s(payload, 2)
            enc, off = _parse_s(payload, off)
            (dlen,) = struct.unpack_from("<I", payload, off)
            out.append(McapSchema(sid, name, enc, payload[off + 4 : off + 4 + dlen]))
        elif op == OP_DATA_END:
            break
        else:
            f.seek(length, 1)
    return out
