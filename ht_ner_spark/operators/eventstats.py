"""Event-stream analytics (batch twins of the streaming surface):
per-window trending event types and semi-structured (JSON props) profiling.

The trending shape — tumbling window counts + within-window rank + lag
against the previous window — is exactly the plan the Structured Streaming
path produces with `F.window` + watermarked aggregation (streaming/windowed
.py); implementing it batch-side keeps one set of semantics for both and
gives the contract oracle something DuckDB can replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trending_event_types(df: DataFrame, window: str = "1 hour",
                         k: int = 3, ts_col: str = "ts",
                         type_col: str = "event_type") -> DataFrame:
    """(win_us, event_type, cnt, delta, rnk): top-``k`` event types per
    tumbling window with the count delta vs that type's previous ACTIVE
    window (lag over windows with activity — a zero-filled calendar would
    shuffle empty rows for every (window, type) pair at web scale). Window
    start is emitted as epoch micros (the session_windows convention:
    timestamps cross engines as integers, not serialized datetimes).

    100 TB shape: one (window, type) partial-agg shuffle over the raw
    events — everything after operates on the window-count frame, which is
    |windows| x |types| (tiny). The lag Window partitions by type, the
    rank Window by window-start; both run on the reduced frame. The rank
    filter compiles to WindowGroupLimit (bounded sort state)."""
    win = F.window(F.col(ts_col).cast("timestamp"), window)
    wc = (
        df.groupBy(win["start"].alias("win"), F.col(type_col).alias("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_lag = Window.partitionBy("event_type").orderBy("win")
    w_rnk = Window.partitionBy("win").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        wc.withColumn("prev_cnt", F.lag("cnt").over(w_lag))
        .withColumn("rnk", F.row_number().over(w_rnk))
        .where(F.col("rnk") <= k)
        .select(
            F.unix_micros("win").alias("win_us"),
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cnt") - F.coalesce("prev_cnt", F.lit(0)))
            .cast("long").alias("delta"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def props_profile(df: DataFrame, key: str = "k",
                  type_col: str = "event_type", props_col: str = "props",
                  value_col: str = "value") -> DataFrame:
    """(event_type, n_events, n_with_key, sum_key, avg_value): profile of
    the semi-structured ``props`` JSON column per event type — presence
    rate and sum of an integer key, plus the mean of the numeric value
    column. The JSON path runs JVM-side (`get_json_object`, no Python);
    a malformed or key-less payload contributes NULL and is counted out.

    100 TB shape: narrow JSON extraction fused into the scan, one
    type-keyed agg (|types| rows out). avg lands on the 1e-6 grid via a
    long sum over grid-rounded values (order-proof, the repo's float
    discipline)."""
    kv = F.get_json_object(F.col(props_col), f"$.{key}").cast("long")
    v6 = F.round(F.col(value_col) * 1e6).cast("long")
    return (
        df.select(F.col(type_col).alias("event_type"),
                  kv.alias("kv"), v6.alias("v6"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("kv").alias("n_with_key"),
            F.coalesce(F.sum("kv"), F.lit(0)).alias("sum_key"),
            F.sum("v6").alias("sv6"),
            F.count("v6").alias("nv"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_with_key").cast("long").alias("n_with_key"),
            F.col("sum_key").cast("long").alias("sum_key"),
            F.round(F.col("sv6") / (F.col("nv") * F.lit(1e6)), 4)
            .alias("avg_value"),
        )
    )
