"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState.

This is the task brief's "applyInPandasWithState for custom stateful
operators" exercised for real: the same session semantics as the batch
`events_sessionize` gate query (a session closes when the next event for
the key is more than `gap_ns` away), computed incrementally over a stream
with bounded per-key state.

State per key is four scalars (open-session start, last event time, event
count, value sum) — constant memory per key regardless of stream length,
which is what makes this run at 100 TB: keys hash-partition across
executors, each micro-batch touches only the keys present in it, and idle
sessions are evicted by processing-time timeout.

Emission contract (append mode):
- a session row is emitted when a later event for the same key arrives
  more than gap_ns after it ended (closed_by='gap'), or
- when the key sees no batch activity for `idle_timeout_ms` of processing
  time (closed_by='timeout'); the state is removed either way.
The still-open tail session stays in state, not in the output — exactly a
streaming watermark semantics for "the session may still grow".
"""

from __future__ import annotations

OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, "
    "n_events long, total_value double, closed_by string"
)
STATE_SCHEMA = "session_start long, last_ts long, n_events long, total_value double"
COLUMNS = ["user_id", "session_start", "session_end", "n_events", "total_value", "closed_by"]


def make_sessionizer(gap_ns: int, idle_timeout_ms: int | None = 30_000):
    """Build the applyInPandasWithState function (importable for unit
    tests: it is pure Python over pandas batches + a GroupState).

    idle_timeout_ms=None disables the processing-time timeout entirely —
    the bounded-drain mode: with a timeout registered, an availableNow
    drain never terminates, because the runtime keeps scheduling empty
    'cleaning up state' batches to service future timeouts while any
    state exists."""
    import pandas as pd

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            ss, lt, n, tv = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, ss, lt, n, tv, "timeout")], columns=COLUMNS
            )
            return
        batch = pd.concat(list(pdfs)).sort_values("ts", kind="stable")
        if state.exists:
            ss, lt, n, tv = state.get
        else:
            ss = lt = None
            n, tv = 0, 0.0
        out = []
        for ts, val in zip(batch["ts"].values, batch["value"].values):
            ts, val = int(ts), float(val)
            if ss is None:
                ss, lt, n, tv = ts, ts, 1, val
            elif ts - lt > gap_ns:
                out.append((user_id, ss, lt, n, tv, "gap"))
                ss, lt, n, tv = ts, ts, 1, val
            else:
                lt, n, tv = ts, n + 1, tv + val
        state.update((ss, lt, n, tv))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if out:
            yield pd.DataFrame(out, columns=COLUMNS)

    return fn


def sessionize_stream(events, *, gap_ns: int, idle_timeout_ms: int | None = 30_000):
    """events: streaming DataFrame with (user_id long, ts long ns,
    value double).  Returns the append-mode session stream.
    idle_timeout_ms=None -> NoTimeout (the deterministic bounded-drain
    mode; see make_sessionizer)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_ns, idle_timeout_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )
