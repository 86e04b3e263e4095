"""As-of join: attach to each left row the most recent right row at or
before its timestamp, per key (event attribution, slowly-changing lookups).

Spark has no native ASOF JOIN; the scalable re-expression is the
union-sort trick: tag both sides, union, and carry the last right-side
value forward with a running `last(..., ignorenulls)` window — ONE shuffle
on the key, a per-key sort, ZERO join fan-out. A range-join formulation
(l.ts >= r.ts band) explodes to O(|L|·|R|) per key before dedup; this stays
O(|L|+|R|) rows end-to-end, the same plan shape as sessionization
(contract.q_events_sessionize), so it survives the 100 TB event stream.

Equal-timestamp semantics match DuckDB's ``ASOF JOIN ON l.ts >= r.ts``
(a right row AT the left timestamp is eligible): the sort key is
(ts, side DESC) so right rows order before left rows on ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str = "user_id",
              ts: str = "ts", value_cols: list[str] | None = None,
              suffix: str = "_r", tolerance_us: int | None = None) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` and the
    timestamp of the latest ``right`` row with the same ``key`` and
    ``right.ts <= left.ts`` (nulls when no such row). ``tolerance_us``
    nulls out matches older than the given microsecond gap (the match is
    dropped, the left row kept — LEFT semantics throughout)."""
    value_cols = list(value_cols if value_cols is not None
                      else [c for c in right.columns if c not in (key, ts)])
    rcols = [c + suffix for c in value_cols]
    r = right.select(
        F.col(key),
        F.col(ts).alias(ts + suffix),
        *[F.col(c).alias(c + suffix) for c in value_cols],
    ).withColumn("_side", F.lit(1))
    l = left.withColumn("_side", F.lit(0))
    tagged = l.unionByName(r, allowMissingColumns=True)
    order_ts = F.coalesce(F.col(ts), F.col(ts + suffix))
    w = (
        Window.partitionBy(key)
        .orderBy(order_ts.asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged
    for c in [ts + suffix, *rcols]:
        carried = carried.withColumn(
            c, F.last(F.when(F.col("_side") == 1, F.col(c)), ignorenulls=True).over(w)
        )
    out = carried.where(F.col("_side") == 0).drop("_side")
    if tolerance_us is not None:
        # session tz is UTC (session.py), so NTZ -> TIMESTAMP is epoch-identity
        gap = (F.unix_micros(F.col(ts).cast("timestamp"))
               - F.unix_micros(F.col(ts + suffix).cast("timestamp")))
        keep = gap <= F.lit(tolerance_us)
        for c in [ts + suffix, *rcols]:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out


def click_attribution(events: DataFrame, left_type: str = "click",
                      right_type: str = "view") -> DataFrame:
    """(click_id, user_id, click_us, view_id, view_us, gap_us): each
    ``left_type`` event attributed to the user's most recent ``right_type``
    event at or before it. Timestamps surface as exact integer microseconds
    (the session_windows convention — no double-epoch rounding)."""
    clicks = events.where(F.col("event_type") == left_type)
    views = events.where(F.col("event_type") == right_type)
    j = asof_join(clicks, views, key="user_id", ts="ts",
                  value_cols=["event_id"])
    # parquet event timestamps are TIMESTAMP_NTZ; session tz is UTC
    # (session.py), so the cast is epoch-identity and unix_micros matches
    # DuckDB's epoch_us exactly (the session_windows convention)
    click_us = F.unix_micros(F.col("ts").cast("timestamp"))
    view_us = F.unix_micros(F.col("ts_r").cast("timestamp"))
    return j.select(
        F.col("event_id").cast("long").alias("click_id"),
        F.col("user_id").cast("long").alias("user_id"),
        click_us.cast("long").alias("click_us"),
        F.col("event_id_r").cast("long").alias("view_id"),
        view_us.cast("long").alias("view_us"),
        (click_us - view_us).cast("long").alias("gap_us"),
    )
