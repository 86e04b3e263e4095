"""Event-stream analytics (batch twins of the streaming surface):
per-window trending event types and semi-structured (JSON props) profiling.

The trending shape — tumbling window counts + within-window rank + lag
against the previous window — is exactly the plan the Structured Streaming
path produces with `F.window` + watermarked aggregation (streaming/windowed
.py); implementing it batch-side keeps one set of semantics for both and
gives the contract oracle something DuckDB can replay.

No reference analog: HT-NER has no event/telemetry surface (its only
run-time accounting is the OpenAI token counter,
/root/reference/src/openai_infer.py:113); these are the consumer-side
analytics a production deployment of the KG pipeline is asked for next.
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


def cohort_retention(df: DataFrame, max_offset: int = 7,
                     ts_col: str = "ts", user_col: str = "user_id"
                     ) -> DataFrame:
    """(cohort_day, day_offset, cohort_size, n_active, retention): classic
    cohort-retention table — users grouped by first-seen day, activity
    counted at day offsets 0..``max_offset``. Days cross engines as epoch
    days (integers), the session_windows convention.

    100 TB shape: one user-keyed min-agg for cohorts (user-dimension
    sized), one broadcastable join back onto the distinct (user, day)
    activity frame, one (cohort, offset) agg. Nothing is corpus-scale
    after the first distinct."""
    day = F.unix_date(F.to_date(F.col(ts_col).cast("timestamp")))
    ud = df.select(F.col(user_col).alias("user_id"),
                   day.alias("d")).distinct()
    cohorts = ud.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    act = (
        ud.join(cohorts, "user_id")
        .select("cohort_day", (F.col("d") - F.col("cohort_day")).alias("off"))
        .where((F.col("off") >= 0) & (F.col("off") <= max_offset))
        .groupBy("cohort_day", "off")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        act.join(F.broadcast(sizes), "cohort_day")
        .select(
            F.col("cohort_day").cast("int").alias("cohort_day"),
            F.col("off").cast("int").alias("day_offset"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("n_active") / F.col("cohort_size"), 4)
            .alias("retention"),
        )
    )


FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def funnel(df: DataFrame, steps: list[str] | None = None,
           ts_col: str = "ts", user_col: str = "user_id",
           type_col: str = "event_type") -> DataFrame:
    """(step, name, n_users, conv_rate): strict-order funnel — a user
    reaches step i when their earliest step-i event STRICTLY AFTER their
    step-(i-1) completion time exists. conv_rate is vs step 1.

    100 TB shape: ONE corpus scan — funnel-relevant events are grouped per
    user into a time-sorted array and a single higher-order-function fold
    (whole-stage-codegen, no Python) walks it greedily: at level k with
    completion time t, the first steps[k] event with us > t advances the
    level. The greedy walk is equivalent to the iterative earliest-next-
    event-after-completion definition (the first qualifying event in time
    order IS the min). One user-keyed shuffle, then a <=|steps|+1-row
    level histogram is collected — the round-3 shape (one .count() action
    per step over an uncached growing join lineage) rescanned the event
    stream ~|steps| times (ADVICE r3). Per-user array size is bounded by
    that user's funnel-event count; a pathological hot user is a salting
    candidate, not a planner problem. Timestamps compare as epoch micros."""
    steps = steps or FUNNEL_STEPS
    n = len(steps)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    steps_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        df.select(F.col(user_col).alias("user_id"),
                  F.col(type_col).alias("et"), us.alias("us"))
        # NULL-timestamp events must not advance the fold: at k==0 the time
        # check is bypassed, so a NULL-us step-1 event would pin t=NULL and
        # block every later comparison (us > NULL is NULL). The SQL oracle's
        # min(us)/us > t form ignores NULLs implicitly; filtering here keeps
        # the two engines identical on unparseable timestamps.
        .where(F.col("et").isin(*steps) & F.col("us").isNotNull())
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("us", "et"))).alias("seq"))
    )
    init = F.struct(F.lit(0).cast("int").alias("k"),
                    F.lit(0).cast("long").alias("t"))

    def _advance(acc, e):
        adv = (
            (acc["k"] < F.lit(n))
            & (e["et"] == F.get(steps_arr, acc["k"]))
            & ((acc["k"] == F.lit(0)) | (e["us"] > acc["t"]))
        )
        return F.when(adv, F.struct((acc["k"] + 1).cast("int").alias("k"),
                                    e["us"].alias("t"))).otherwise(acc)

    lev = per_user.select(
        F.aggregate("seq", init, _advance, lambda acc: acc["k"]).alias("k"))
    by_k = {r["k"]: r["c"] for r in
            lev.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    counts = [sum(c for kk, c in by_k.items() if kk >= i + 1)
              for i in range(n)]
    spark = df.sparkSession
    # integer half-up ratio: Python round() is banker's, SQL round is
    # half-away — this form is identical everywhere
    rows = [(i + 1, steps[i], counts[i],
             ((counts[i] * 20000 + counts[0]) // (2 * counts[0])) / 1e4
             if counts[0] else 0.0)
            for i in range(len(steps))]
    return spark.createDataFrame(
        rows, "step int, name string, n_users long, conv_rate double")


def scd2_intervals(df: DataFrame,
                   entity_cols: tuple[str, ...] = ("user_id", "event_type"),
                   ts_col: str = "ts", value_col: str = "value",
                   tiebreak_col: str = "event_id") -> DataFrame:
    """Slowly-changing-dimension (type 2) fact versioning: each event sets
    a new version of its entity's value; emit one row per version with its
    validity interval — (entity..., value, valid_from, valid_to, version,
    is_current), valid_to NULL on the open current version.

    This is the KG-lifecycle op for temporal facts: the same triple key
    observed at successive crawl timestamps becomes an interval history
    instead of a last-write-wins scalar, and a point-in-time query is a
    plain BETWEEN on (valid_from, valid_to).

    Shape at scale: ONE window partitioned by the entity key, ordered by
    (ts, tiebreak) — partition sizes are bounded by per-entity version
    counts (never corpus-sized), the lead() and row_number() share the
    single sort, and there is no join at all. The deterministic tiebreak
    makes same-timestamp writes reproducible across engines.  NULL-ts
    events are excluded (no observation time -> no validity interval),
    matching snapshot_at so the two ops stay reconcilable."""
    df = df.where(F.col(ts_col).isNotNull())
    w = Window.partitionBy(*entity_cols).orderBy(ts_col, tiebreak_col)
    return df.select(
        *entity_cols, value_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def snapshot_at(df, at: str,
                entity_cols: tuple[str, ...] = ("user_id", "event_type"),
                ts_col: str = "ts", value_col: str = "value",
                tiebreak_col: str = "event_id") -> DataFrame:
    """Point-in-time reconstruction: each entity's live version as of
    timestamp ``at`` — (entity..., value, valid_from, version), i.e. the
    row scd2_intervals would select with valid_from <= at < valid_to.
    This is the time-travel query of the temporal KG: 'what did the graph
    assert at epoch T' without materializing the full interval history.

    Shape at scale: deliberately NOT a window — one filter (pushed into
    the scan as a ts predicate, so partition pruning on a ts-partitioned
    table skips later epochs entirely) + one entity-keyed aggregate whose
    max(struct(ts, tiebreak, value)) picks the latest version with
    map-side partial combine; version = the event count, matching
    scd2_intervals' counter (NULL-ts events are excluded there too, so
    the containing-interval equivalence holds).  No join, no sort."""
    cutoff = F.to_timestamp(F.lit(at))
    last = F.max(F.struct(
        F.col(ts_col), F.col(tiebreak_col), F.col(value_col))).alias("last")
    return (
        df.where(F.col(ts_col) <= cutoff)
        .groupBy(*entity_cols)
        .agg(last, F.count("*").alias("version"))
        .select(*entity_cols,
                F.col(f"last.{value_col}").alias(value_col),
                F.col(f"last.{ts_col}").alias("valid_from"),
                "version")
    )
