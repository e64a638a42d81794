"""`spark.read.format("mcap")` — the MCAP log source as a Spark 4 Python
DataSource (pyspark.sql.datasource), layered over the same pure-Python
codec and chunk-split planner the mapInPandas reader
(sources/mcap.read_mcap) uses.

Why both paths exist: read_mcap() predates this and stays the
programmatic API (it accepts per-file producer mappings and decoder
injection); the DataSource makes the source a first-class format —
usable from SQL (`CREATE TABLE ... USING mcap`), from any language
binding, and composable with `.schema()`/`.option()` conventions.

Scale shape mirrors the reference's chunk-indexed reads
(mcap/lazy_indexed_iterator.go:10-48): `partitions()` runs the
metadata-only `plan_mcap_units` walk (record headers, no chunk
decompression) on the driver and emits ONE InputPartition PER CHUNK, so
a single large capture file decodes across the cluster; executors each
open the file and decode only their chunk offsets.  Arrow-batches the
rows back (DataSourceReader yields tuples; Spark batches the transfer).

Options:
  path      — file, directory (all *.mcap inside), or comma-list
  producer  — producer name stamped on every row (default "")
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MCAP_SCHEMA = (
    "producer string, topic string, log_time long, sequence long, "
    "schema_name string, schema_hash string, data binary"
)
_FIELDS = (
    "producer",
    "topic",
    "log_time",
    "sequence",
    "schema_name",
    "schema_hash",
    "data",
)


def _expand_paths(path_opt: str) -> list[str]:
    out: list[str] = []
    for p in path_opt.split(","):
        p = p.strip()
        if not p:
            continue
        if os.path.isdir(p):
            out += sorted(
                os.path.join(p, fn)
                for fn in os.listdir(p)
                if fn.endswith(".mcap")
            )
        else:
            out.append(p)
    return out


class McapUnit(InputPartition):
    """One decode unit: (path, producer, chunk offsets for this task)."""

    def __init__(self, path: str, producer: str, offsets: list[int]):
        self.path = path
        self.producer = producer
        self.offsets = offsets


class McapReader(DataSourceReader):
    def __init__(self, options, fields=_FIELDS):
        path = options.get("path")
        if not path:
            raise ValueError("mcap source requires a path (load(path))")
        self.files = _expand_paths(path)
        self.producer = options.get("producer", "")
        # honor a user-supplied .schema(): read() emits tuples in the
        # requested field order (subset/reorder allowed; unknown names
        # and wrong types rejected DRIVER-side) — positional mapping
        # would silently misassign columns, and a type mismatch would
        # otherwise surface as an opaque executor-side Arrow error
        # simpleString spellings of MCAP_SCHEMA (long == bigint)
        expected = {
            "producer": "string",
            "topic": "string",
            "log_time": "bigint",
            "sequence": "bigint",
            "schema_name": "string",
            "schema_hash": "string",
            "data": "binary",
        }
        if isinstance(fields, dict):
            names, types = list(fields), fields
        else:
            names, types = list(fields), {}
        unknown = [f for f in names if f not in expected]
        if unknown:
            raise ValueError(
                f"mcap source has no column(s) {unknown}; available: {list(_FIELDS)}"
            )
        bad = {n: t for n, t in types.items() if t != expected[n]}
        if bad:
            raise ValueError(
                f"mcap source column type mismatch {bad}; expected "
                f"{ {n: expected[n] for n in bad} }"
            )
        self.fields = tuple(names)

    def partitions(self):
        from dp3_spark.sources.mcap import plan_mcap_units

        units = plan_mcap_units([(p, self.producer) for p in self.files])
        return [McapUnit(path, prod, [off]) for path, prod, off in units]

    def read(self, partition: McapUnit):
        from dp3_spark.sources.mcap import _decode_unit

        for row in _decode_unit(
            partition.path, partition.producer, partition.offsets
        ):
            yield tuple(row[f] for f in self.fields)


class McapDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mcap"

    def schema(self) -> str:
        return MCAP_SCHEMA

    def reader(self, schema) -> McapReader:
        if schema is None:
            return McapReader(self.options)
        fields = {f.name: f.dataType.simpleString() for f in schema.fields}
        return McapReader(self.options, fields)


def register(spark) -> None:
    """Idempotent `spark.dataSource.register` of the mcap format."""
    spark.dataSource.register(McapDataSource)
