"""MCAP output sink: query results -> one multiplexed MCAP stream.

The reference's default query output is a single merged MCAP stream whose
schema/channel IDs are remapped as distinct (schema, channel) pairs are
first encountered, deduplicating schemas by content hash
(mcap/merge_coordinator.go:17-99; executor/executor.go:62-108).  Skeleton
mode writes empty payloads (StampsOnly, routes/query.go:43).

Spark-first split:

- `query_to_mcap(df, out)` — the reference-parity single-stream sink: the
  result DataFrame is globally ordered (its sort is the QL plan's merge
  order) and streamed through `toLocalIterator()` — partition at a time,
  never a full collect — into one MCAP file.  A single multiplexed stream
  is inherently a one-writer operation; this is the HTTP-response analog
  and is meant for query-sized results.
- `export_mcap_partitions(df, out_dir)` — the bulk-export scale path: each
  partition writes its own MCAP shard in parallel via `foreachPartition`
  (time-ordered within shard when the caller repartitions by time range).

Payload modes:
- a `MsgSchema` -> rows re-encode as ros1msg binary (round-trips through
  sources.rosdecode.decode_ros1);
- no schema -> payloads encode as JSON lines per message (encoding
  "jsonschema"/"json"), readable by standard MCAP tooling;
- a raw imported frame that still has its `data` column -> bytes pass
  through unchanged (pure re-multiplex), with schemas supplied by the
  caller's registry rows.
"""

from __future__ import annotations

import json
from typing import BinaryIO

from pyspark.sql import DataFrame

from dp3_spark.sources.mcap_codec import (
    McapChannel,
    McapMessage,
    McapSchema,
    McapStreamWriter,
)
from dp3_spark.sources.msgdef import MsgSchema
from dp3_spark.sources.rosdecode import ros1_encode

META_COLS = ("producer", "topic", "log_time", "sequence")


class _Coordinator:
    """Schema/channel ID remapping in first-seen order, schemas deduped by
    content (merge_coordinator.go:17-68)."""

    def __init__(self) -> None:
        self.schemas: list[McapSchema] = []
        self.channels: list[McapChannel] = []
        self._schema_ids: dict[tuple, int] = {}
        self._channel_ids: dict[tuple, int] = {}

    def schema_id(self, name: str, encoding: str, data: bytes) -> int:
        key = (name, encoding, data)
        sid = self._schema_ids.get(key)
        if sid is None:
            sid = len(self.schemas) + 1
            self._schema_ids[key] = sid
            self.schemas.append(McapSchema(sid, name, encoding, data))
        return sid

    def channel_id(self, schema_id: int, topic: str, message_encoding: str) -> int:
        key = (schema_id, topic, message_encoding)
        cid = self._channel_ids.get(key)
        if cid is None:
            cid = len(self.channels) + 1
            self._channel_ids[key] = cid
            self.channels.append(McapChannel(cid, schema_id, topic, message_encoding))
        return cid


def _json_default(v):
    if isinstance(v, (bytes, bytearray)):
        import base64

        return base64.b64encode(bytes(v)).decode("ascii")
    raise TypeError(f"not JSON serializable: {type(v)}")


def _row_stream_to_mcap(
    rows,
    payload_cols: list[str],
    out: BinaryIO,
    *,
    schema: MsgSchema | None,
    skeleton: bool,
    chunked: bool,
    compression: str,
) -> int:
    """Write an iterator of canonical Rows as one MCAP stream.  Returns the
    message count.

    TRUE streaming: each row goes straight into the McapStreamWriter (one
    chunk batch of memory, default 1 MiB), with Schema/Channel records
    emitted the moment the coordinator first sees them — an arbitrarily
    large export never materializes in this process, matching the
    service layer's collect-free chunked-response discipline end to end
    (the reference pipes its merge coordinator the same way,
    mcap/merge_coordinator.go)."""
    coord = _Coordinator()
    writer = McapStreamWriter(out, chunked=chunked, compression=compression)
    if schema is not None:
        schema_args = (schema.name, "ros1msg", _msgdef_text(schema).encode())
        message_encoding = "ros1"
    else:
        schema_args = (
            "dp3/QueryResult",
            "jsonschema",
            json.dumps({"type": "object"}).encode(),
        )
        message_encoding = "json"
    if skeleton:  # skeleton empties schema data too (merge_coordinator.go:30)
        schema_args = (schema_args[0], schema_args[1], b"")
    n = 0
    for r in rows:
        if skeleton:
            data = b""
        elif schema is not None:
            d = r.asDict(recursive=True)
            data = ros1_encode(schema, {f.name: d[f.name] for f in schema.fields})
        elif payload_cols == ["data"]:
            data = bytes(r["data"])
        else:
            d = r.asDict(recursive=True)
            data = json.dumps(
                {c: d[c] for c in payload_cols}, default=_json_default
            ).encode()
        n_sc, n_ch = len(coord.schemas), len(coord.channels)
        sid = coord.schema_id(*schema_args)
        cid = coord.channel_id(sid, r["topic"], message_encoding)
        if len(coord.schemas) > n_sc:  # first sight: definition precedes use
            writer.add_schema(coord.schemas[-1])
        if len(coord.channels) > n_ch:
            writer.add_channel(coord.channels[-1])
        writer.write_message(
            McapMessage(cid, int(r["sequence"]) & 0xFFFFFFFF, r["log_time"], r["log_time"], data)
        )
        n += 1
    writer.close()
    return n


def _msgdef_text(schema: MsgSchema) -> str:
    """Regenerate a ros1msg definition text for a MsgSchema (inverse of
    parse_ros1msg; named subtypes are emitted as anonymous inline packages
    dp3/SubN)."""
    subs: list[str] = []

    def type_name(t) -> str:
        if t.is_primitive:
            return t.primitive
        if t.array:
            n = f"{t.fixed_size}" if t.fixed_size else ""
            return f"{type_name(t.items)}[{n}]"
        # record: emit a subdefinition
        idx = len(subs) + 1
        name = f"dp3/Sub{idx}"
        subs.append("")  # reserve slot to keep idx stable during recursion
        body = "\n".join(f"{type_name(f.type)} {f.name}" for f in t.fields)
        subs[idx - 1] = f"MSG: {name}\n{body}"
        return name

    top = "\n".join(f"{type_name(f.type)} {f.name}" for f in schema.fields)
    sep = "\n" + "=" * 80 + "\n"
    return top + ("" if not subs else sep + sep.join(subs)) + "\n"


def query_to_mcap(
    df: DataFrame,
    out: BinaryIO | str,
    *,
    schema: MsgSchema | None = None,
    skeleton: bool = False,
    chunked: bool = True,
    compression: str = "zstd",
) -> int:
    """Stream a query result DataFrame as ONE multiplexed MCAP stream in
    (log_time, producer, topic, sequence) order — the reference's merged
    query response.  Returns the message count."""
    payload_cols = [c for c in df.columns if c not in META_COLS and not c.startswith("__")]
    ordered = df.orderBy("log_time", "producer", "topic", "sequence")
    rows = ordered.toLocalIterator()
    if isinstance(out, str):
        with open(out, "wb") as f:
            return _row_stream_to_mcap(
                rows,
                payload_cols,
                f,
                schema=schema,
                skeleton=skeleton,
                chunked=chunked,
                compression=compression,
            )
    return _row_stream_to_mcap(
        rows,
        payload_cols,
        out,
        schema=schema,
        skeleton=skeleton,
        chunked=chunked,
        compression=compression,
    )


def export_mcap_partitions(
    df: DataFrame,
    out_dir: str,
    *,
    schema: MsgSchema | None = None,
    chunked: bool = True,
    compression: str = "zstd",
) -> None:
    """Bulk export: every partition writes its own MCAP shard in parallel
    (shard-NNNN.mcap).  At scale, repartition by range on log_time first so
    each shard covers a contiguous time slice; shards land on whatever
    storage `out_dir` points to."""
    import os

    payload_cols = [c for c in df.columns if c not in META_COLS and not c.startswith("__")]
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(idx_rows):
        idx, rows = idx_rows
        rows = list(rows)
        if not rows:
            return []
        path = os.path.join(out_dir, f"shard-{idx:04d}.mcap")
        with open(path, "wb") as f:
            n = _row_stream_to_mcap(
                rows,
                payload_cols,
                f,
                schema=schema,
                skeleton=False,
                chunked=chunked,
                compression=compression,
            )
        return [(idx, n)]

    (
        df.rdd.mapPartitionsWithIndex(lambda i, it: write_partition((i, it)))
        .collect()
    )
