"""Native Structured Streaming stream-stream interval join.

The fourth stateful-streaming shape in this repo, and the only one that
is a BUILT-IN Spark operator rather than a custom kernel: sessionize
uses applyInPandasWithState, stats maintenance and corpus dedup use
foreachBatch — this one hands the state machine to Spark itself.
Two watermarked streams joined on an equality key plus an EVENT-TIME
RANGE condition (point-in-window): Spark buffers each side in join
state and, in production, evicts rows once the watermark passes the
range bound — the canonical "attribute activity to the incident window
that preceded it" join (reference parity note: the reference engine's
as-of join, executor/asof_node.go, is the batch cousin; streams are
SURVEY §2.7 territory where the reference has no operator).

Determinism contract (the gate rule): a row is dropped by a
stream-stream join only if it arrives LATER than the watermark, and the
watermark is derived from the previous batch's max event time minus the
delay.  With a delay >= the fixture's full time span, no row is ever
late no matter how the file source batches, so the drained result is
exactly the batch join — hash-comparable against a DuckDB oracle.
Real deployments shrink the delay to bound state; that trades
completeness on late data for memory, not correctness of on-time rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    incidents: DataFrame,
    actions: DataFrame,
    *,
    delay: str = "31 days",
) -> DataFrame:
    """Join two STREAMING frames: `incidents` (inc_user, inc_s, inc_e —
    timestamp bounds, half-open) x `actions` (act_user, act_ts, ...) on
    same-user point-in-window.  Both sides get event-time watermarks
    (`delay`), which is what lets Spark plan the stateful stream-stream
    join and (with tight delays) evict state."""
    wi = incidents.withWatermark("inc_s", delay)
    wa = actions.withWatermark("act_ts", delay)
    return wi.join(
        wa,
        (F.col("inc_user") == F.col("act_user"))
        & (F.col("act_ts") >= F.col("inc_s"))
        & (F.col("act_ts") < F.col("inc_e")),
    )
