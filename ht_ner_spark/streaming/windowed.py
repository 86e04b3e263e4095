"""Event-time windowed aggregation and stateful sessionization.

The reference is pure batch (SURVEY §1.4); these are the Spark-idiomatic
stream analogs of the engine's event-table operators (contract
q_events_sessionize), built on the three Structured-Streaming primitives a
100 TB pipeline needs for late data:

* `windowed_event_counts` — tumbling event-time windows + watermark.
  Append mode: a window's row is emitted exactly once, when the watermark
  passes its end; events later than the watermark by more than the delay
  are dropped (bounded state — at 100 TB the state store holds only the
  open-window tail, never the history).
* `session_event_counts` — native `F.session_window` (gap-merged sessions).
  The SAME code runs batch and streaming; batch mode is oracle-checked
  against a DuckDB gaps-and-islands rewrite (contract `session_windows`).
* `stateful_sessionize` — `applyInPandasWithState` custom stateful operator
  (the engine's demo of arbitrary per-key streaming state): one open
  session per user in the state store, closed sessions emitted eagerly on
  an observed gap, the open tail flushed by event-time timeout when the
  watermark passes last_ts + gap.

All three are drained in tests with `Trigger.AvailableNow` over a file
source — the same batch-incremental operating mode as
streaming/incremental.py, and the sandbox stand-in for a live Kafka source
(swapping `readStream.parquet` for `readStream.format("kafka")` changes no
operator code).
"""

from __future__ import annotations

import datetime
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)

DEFAULT_GAP_S = 1800  # contract.SESSION_GAP_S — one constant, two code paths


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "10 minutes",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """Per-(key, tumbling window) event counts with late-data handling.

    Works on a streaming OR batch frame (watermark is a no-op in batch).
    Streaming append mode emits each window once, finalized; state for a
    window is dropped once the watermark passes its end, so memory is
    O(open windows), not O(stream length).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_event_counts(events: DataFrame, gap_s: int = DEFAULT_GAP_S,
                         ts_col: str = "ts",
                         key_col: str = "user_id",
                         watermark: str | None = None) -> DataFrame:
    """Gap-merged sessions via native ``F.session_window``: events of one
    key closer than ``gap_s`` merge into one session spanning
    [min(ts), max(ts) + gap). Batch and streaming share this exact plan;
    pass ``watermark`` when ``events`` is a stream (required for the state
    store to evict closed sessions)."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    win = F.session_window(F.col(ts_col), f"{gap_s} seconds")
    return (
        src.groupBy(win.alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("session_start", LongType()),   # epoch seconds
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
])


def _sessionize_fn(gap_s: int):
    """Build the applyInPandasWithState function for ``gap_s``.

    State per user: the single OPEN session (start, last_ts, n_events).
    Sessions CLOSED by an observed gap inside arriving data are emitted
    immediately; the open tail is emitted when the event-time timeout
    fires (watermark > last_ts + gap) or can be left open forever if the
    stream ends first — exactly a session's streaming semantics."""

    def fn(key: Tuple[Any, ...],
           pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="s")],
                "session_end": [pd.Timestamp(last + gap_s, unit="s")],
                "n_events": [n],
            })
            return

        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        secs = (ts.astype("int64") // 1_000_000_000).to_numpy()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = int(secs[0]), int(secs[0]) - 1, 0

        closed: list[tuple[int, int, int]] = []
        for s in secs:
            s = int(s)
            if n and s - last > gap_s:
                closed.append((start, last, n))
                start, n = s, 0
            last = s
            n += 1
        state.update((start, last, n))
        # event-time timeout: flush the open tail once the watermark passes
        # last_ts + gap (timestamp in ms)
        state.setTimeoutTimestamp((last + gap_s) * 1000)
        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(a, unit="s") for a, _, _ in closed],
                "session_end": [pd.Timestamp(b + gap_s, unit="s") for _, b, _ in closed],
                "n_events": [c for _, _, c in closed],
            })

    return fn


def stateful_sessionize(events: DataFrame, gap_s: int = DEFAULT_GAP_S,
                        watermark: str = "0 seconds") -> DataFrame:
    """Custom stateful streaming sessionization via applyInPandasWithState.

    Semantically equivalent to ``session_event_counts`` (and to the batch
    gaps-and-islands sessionizer, contract q_events_sessionize) but holds
    ARBITRARY per-key state — the extension point for session logic the
    built-in session_window cannot express (e.g. per-session feature
    accumulators, cross-field session keys, cap-and-rotate).

    State per user is O(1) — one open-session triple — so the state store
    at 100 TB holds |active users| rows, independent of event volume.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "10 minutes",
                 ts_col: str = "ts") -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    `dropDuplicatesWithinWatermark` keeps a key's fingerprint only until the
    watermark passes its first-seen event time, then frees it — the
    streaming twin of dedup.exact_duplicate_groups for an always-on
    ingestion path (at 100 TB/day the unbounded `dropDuplicates` state store
    is the classic OOM; the watermark bound is what makes streaming dedup
    deployable). A duplicate arriving within the watermark of its first
    occurrence is dropped even if its own event time differs; re-occurrences
    after state expiry pass through (at-least-once dedup, the documented
    Spark semantics — exactly-once needs the downstream idempotent sink the
    pipeline's exactly-once test already demonstrates).

    Works on a streaming frame; on a batch frame Spark rejects
    dropDuplicatesWithinWatermark, so batch callers use the exact operator."""
    keys = keys or ["event_type", "user_id"]
    return events.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(keys)
