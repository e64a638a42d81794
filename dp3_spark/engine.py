"""DP3Engine: the top-level API a dp3 user would switch to.

Binds the QL front end (parser + compiler) to a readable LogStore and an
optional writable VersionedLogTable so BOTH statement types execute:

    engine.execute("from * click precedes purchase by less than 1 minutes;")
        -> DataFrame
    engine.execute("truncate my-robot /fix now;")
        -> None (applies a lifecycle truncate, visible to subsequent reads)

This is the `POST /databases/{db}/query` surface (routes/query.go) without
the HTTP layer: parse -> compile -> Catalyst, JSON shaping via
dp3_spark.output.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from dp3_spark.catalog import LogStore
from dp3_spark.output import to_json_lines, to_json_shape
from dp3_spark.plans import Compiler
from dp3_spark.ql import parse
from dp3_spark.streaming.lifecycle import VersionedLogTable


class DP3Engine:
    def __init__(
        self,
        spark: SparkSession,
        store: LogStore | None = None,
        table: VersionedLogTable | None = None,
    ):
        """store: read surface.  table: writable store; when provided and no
        explicit `store` is given, reads go through the table (so deletes/
        truncates are visible)."""
        if store is None and table is None:
            raise ValueError("need a LogStore or a VersionedLogTable")
        self.spark = spark
        self.table = table
        self._explicit_store = store

    def _store(self) -> LogStore:
        if self._explicit_store is not None:
            return self._explicit_store
        df = self.table.read()
        payload = tuple(
            c for c in df.columns
            if c not in ("producer", "topic", "log_time", "sequence", "version")
        )
        return LogStore(
            df=df.drop("version"),
            producer_col="producer",
            topic_col="topic",
            time_col="log_time",
            sequence_col="sequence",
            payload_cols=payload,
        )

    def execute(self, statement: str) -> Optional[DataFrame]:
        """Run one QL statement.  Queries return a DataFrame; truncate
        applies to the writable table and returns None."""
        stmt = parse(statement)
        if stmt.truncate is not None:
            if self.table is None:
                raise ValueError("truncate requires a writable VersionedLogTable")
            t = stmt.truncate
            self.table.truncate(t.producer, t.topic, t.timestamp_ns)
            return None
        return Compiler(self._store()).compile_query(stmt.query)

    def query_json(self, statement: str, *, skeleton: bool = False):
        """JSON-lines result (Accept: application/json, routes/query.go:92-135)."""
        df = self.execute(statement)
        if df is None:
            return None
        return to_json_lines(df, skeleton=skeleton)

    def query_shaped(self, statement: str, *, skeleton: bool = False) -> DataFrame:
        df = self.execute(statement)
        assert df is not None
        return to_json_shape(df, skeleton=skeleton)

    def query_mcap(self, statement: str, out, *, skeleton: bool = False, **opts) -> int:
        """Default dp3 query output: ONE multiplexed MCAP stream with
        remapped schema/channel IDs (mcap/merge_coordinator.go;
        executor/executor.go:62-108).  Returns the message count."""
        from dp3_spark.sinks import query_to_mcap

        df = self.execute(statement)
        assert df is not None
        return query_to_mcap(df, out, skeleton=skeleton, **opts)
