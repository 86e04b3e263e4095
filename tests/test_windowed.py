"""Streaming windowed aggregation + stateful sessionization
(streaming/windowed.py).

Each test drains a file source with Trigger.AvailableNow several times over
one checkpoint directory: the watermark persists in the checkpoint, so each
drain N+1 operates under the watermark established by drain N — which makes
late-data acceptance, too-late drops, append-mode emission, and event-time
timeouts all DETERMINISTIC (no sleeps, no processing-time races)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from ht_ner_spark.streaming.windowed import (
    session_event_counts, stateful_sessionize, windowed_event_counts,
)

T = lambda m, s=0: datetime(2026, 1, 1, 0, m, s)  # noqa: E731
H = lambda h, m=0: datetime(2026, 1, 1, h, m)     # noqa: E731

EV_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("ts", TimestampType()),
])
US_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
])


def _drop(spark, schema, src_dir, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append").parquet(src_dir)


def _drain(spark, schema, src_dir, op, out_dir, ckpt, mode="append"):
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        op(stream).writeStream.outputMode(mode)
        .format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()


def _read_out(spark, out_dir, schema):
    try:
        return spark.read.schema(schema).parquet(out_dir).collect()
    except Exception:  # noqa: BLE001 - no emission yet -> no files
        return []


def test_windowed_counts_late_data(spark, tmp_path):
    """Append-mode tumbling windows: a window emits once (finalized) when
    the watermark passes its end; a late-but-within-watermark event is
    counted; a too-late event is dropped."""
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    windowedop = lambda s: windowed_event_counts(  # noqa: E731
        s, window="10 minutes", watermark="10 minutes")

    # drain 1: W1=[00:00,00:10) has 2 'a'; W2=[00:10,00:20) has 2 'a';
    # max ts 00:13 -> watermark after drain = 00:03 -> nothing emitted yet
    _drop(spark, EV_SCHEMA, src,
          [("a", T(1)), ("a", T(5)), ("a", T(11)), ("a", T(13))])
    _drain(spark, EV_SCHEMA, src, windowedop, out, ck)

    # drain 2 (operating watermark 00:03): late event 00:04 >= watermark ->
    # COUNTED into still-open W1; 00:41 advances watermark to 00:31
    _drop(spark, EV_SCHEMA, src, [("a", T(4)), ("a", T(41))])
    _drain(spark, EV_SCHEMA, src, windowedop, out, ck)

    # drain 3 (operating watermark 00:31 > W1/W2 ends): W1 and W2 emit,
    # finalized; the 00:02 event is TOO LATE (ts < watermark) -> dropped;
    # 00:55's window stays open (unemitted)
    _drop(spark, EV_SCHEMA, src, [("a", T(2)), ("a", T(55))])
    _drain(spark, EV_SCHEMA, src, windowedop, out, ck)

    out_schema = StructType([
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
    ])
    got = {(r.window_start, r.window_end, r.event_type, r.n_events)
           for r in _read_out(spark, out, out_schema)}
    assert got == {
        (T(0), T(10), "a", 3),   # 2 on time + 1 late-within-watermark
        (T(10), T(20), "a", 2),
    }


def test_session_window_batch_matches_islands(spark):
    """F.session_window batch semantics == gaps-and-islands: session spans
    [min(ts), max(ts)+gap), events merge when consecutive gap <= gap_s.
    (The sf-corpus version is oracle-checked in the driver contract.)"""
    rows = [(1, T(0)), (1, T(0, 30)), (1, T(2)),   # gap 90s > 60 -> 2 sessions
            (2, T(5))]
    df = spark.createDataFrame(rows, US_SCHEMA)
    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in session_event_counts(df, gap_s=60).collect()}
    assert got == {
        (1, T(0), T(1, 30), 2),   # 00:00..00:00:30, end = 00:00:30+60s
        (1, T(2), T(3), 1),
        (2, T(5), T(6), 1),
    }


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: gap-closed sessions emit
    eagerly with arriving data; open tails flush via event-time timeout
    when the watermark passes last_ts + gap; still-open sessions are not
    emitted."""
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    op = lambda s: stateful_sessionize(s, gap_s=60)  # noqa: E731

    # drain 1: user1 session A (00:00, 00:30), user2 single event 00:10;
    # watermark after drain = 00:30 (delay 0)
    _drop(spark, US_SCHEMA, src, [(1, T(0)), (1, T(0, 30)), (2, T(0, 10))])
    _drain(spark, US_SCHEMA, src, op, out, ck)

    # drain 2 (wm 00:30): user1 event 02:00 -> gap 90s closes A (eager emit);
    # user2 timeout fires (00:10+60 < 00:30? no — 00:01:10 < 00:30 yes) ->
    # user2's session flushes; sentinel user99 10:00 -> wm 10:00
    _drop(spark, US_SCHEMA, src, [(1, T(2)), (99, H(10))])
    _drain(spark, US_SCHEMA, src, op, out, ck)

    # drain 3 (wm 10:00): user1's open B (timeout 02:01) flushes; user99
    # gets a within-gap event (merges, stays open, not emitted)
    _drop(spark, US_SCHEMA, src, [(99, H(10, 0).replace(second=30))])
    _drain(spark, US_SCHEMA, src, op, out, ck)

    from ht_ner_spark.streaming.windowed import SESSION_SCHEMA
    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in _read_out(spark, out, SESSION_SCHEMA)}
    assert got == {
        (1, T(0), T(1, 30), 2),    # A: closed eagerly by the 02:00 gap
        (2, T(0, 10), T(1, 10), 1),  # flushed by timeout in drain 2
        (1, T(2), T(3), 1),        # B: flushed by timeout in drain 3
    }
    # user99's session is still open -> correctly absent


def test_stateful_matches_session_window_batch(spark, tmp_path):
    """Cross-operator parity: for fully-flushed users, the custom stateful
    sessionizer emits exactly the sessions the native session_window
    computes in batch over the same events."""
    rows = [(u, T(m, s)) for u, m, s in [
        (1, 0, 0), (1, 0, 45), (1, 3, 0), (1, 3, 20),
        (2, 1, 0), (2, 5, 0), (3, 2, 2),
    ]]
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    op = lambda s: stateful_sessionize(s, gap_s=60)  # noqa: E731
    _drop(spark, US_SCHEMA, src, rows)
    _drain(spark, US_SCHEMA, src, op, out, ck)
    # sentinel far in the future: advances the watermark so every real
    # user's open tail times out on the second drain
    _drop(spark, US_SCHEMA, src, [(99, H(23))])
    _drain(spark, US_SCHEMA, src, op, out, ck)
    _drop(spark, US_SCHEMA, src, [(99, H(23, 1))])
    _drain(spark, US_SCHEMA, src, op, out, ck)

    from ht_ner_spark.streaming.windowed import SESSION_SCHEMA
    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in _read_out(spark, out, SESSION_SCHEMA)
           if r.user_id != 99}
    batch = spark.createDataFrame(rows, US_SCHEMA)
    want = {(r.user_id, r.session_start, r.session_end, r.n_events)
            for r in session_event_counts(batch, gap_s=60).collect()}
    assert got == want


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate key arriving while its
    first occurrence is still inside the watermark is dropped; once the
    watermark passes (state expired), the key passes through again."""
    from ht_ner_spark.streaming.windowed import stream_dedup

    src, out, ck = (str(tmp_path / d) for d in ("dsrc", "dout", "dck"))
    op = lambda s: stream_dedup(  # noqa: E731
        s, keys=["event_type"], watermark="10 minutes")

    # drain 1: 'a' twice (dup within drain -> one survives), 'b' once;
    # max ts 00:05 -> watermark 0 (never negative): state for both live
    _drop(spark, EV_SCHEMA, src, [("a", T(1)), ("a", T(3)), ("b", T(5))])
    _drain(spark, EV_SCHEMA, src, op, out, ck)

    # drain 2 (watermark from drain 1): 'a' again within watermark ->
    # dropped; 'c' new -> kept; 00:50 advances the watermark to 00:40,
    # expiring 'a'/'b'/'c' state
    _drop(spark, EV_SCHEMA, src, [("a", T(7)), ("c", T(9)), ("c", T(50))])
    _drain(spark, EV_SCHEMA, src, op, out, ck)

    # drain 3 (watermark 00:40): 'a' reappears AFTER expiry -> emitted again
    _drop(spark, EV_SCHEMA, src, [("a", T(45))])
    _drain(spark, EV_SCHEMA, src, op, out, ck)

    got = sorted((r.event_type, r.ts) for r in _read_out(spark, out, EV_SCHEMA))
    emitted_a = [ts for et, ts in got if et == "a"]
    assert len(emitted_a) == 2                  # first + post-expiry
    assert emitted_a[0] == T(1) and emitted_a[1] == T(45)
    assert ("b", T(5)) in got
    # 'c' at 00:09 kept; its 00:50 twin arrived in the SAME drain while the
    # 00:09 state was live -> deduped
    assert len([1 for et, _ in got if et == "c"]) == 1
