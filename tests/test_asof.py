"""As-of join semantics: latest right row at-or-before each left row per
key, equal-ts eligibility, no-match nulls, tolerance, and the O(L+R)
union-sort plan shape (no join node at all)."""

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from ht_ner_spark.operators.asof import asof_join, click_attribution


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T00:00:10")),  # after v2 -> v2
            (101, 1, _ts("2024-01-01T00:00:02")),  # between v1 and v2 -> v1
            (102, 1, _ts("2024-01-01T00:00:05")),  # ties v2 exactly -> v2
            (103, 2, _ts("2024-01-01T00:00:01")),  # user 2 has no views
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:00:01")),
            (2, 1, _ts("2024-01-01T00:00:05")),
        ],
        ["event_id", "user_id", "ts"],
    )
    return left, right


def test_asof_matches_latest_at_or_before(frames):
    left, right = frames
    out = {r.event_id: r for r in
           asof_join(left, right, value_cols=["event_id"]).collect()}
    assert out[100].event_id_r == 2
    assert out[101].event_id_r == 1
    assert out[102].event_id_r == 2  # equal ts IS eligible (DuckDB >= semantics)
    assert out[103].event_id_r is None and out[103].ts_r is None
    assert len(out) == 4  # LEFT join: every left row survives


def test_asof_tolerance_nulls_stale_matches(frames):
    left, right = frames
    out = {r.event_id: r for r in
           asof_join(left, right, value_cols=["event_id"],
                     tolerance_us=2_000_000).collect()}
    # click 101 is 1s after v1 (within 2s), click 100 is 5s after v2 (stale)
    assert out[101].event_id_r == 1
    assert out[100].event_id_r is None and out[100].ts_r is None
    assert out[102].event_id_r == 2  # 0s gap
    assert len(out) == 4


def test_asof_plan_has_no_join(frames):
    left, right = frames
    plan = (asof_join(left, right, value_cols=["event_id"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan  # union-sort trick: one window, zero join nodes
    assert "Window" in plan


def test_click_attribution_gap(spark):
    ev = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01T00:00:01"), "view"),
            (2, 7, _ts("2024-01-01T00:00:04"), "click"),
            (3, 7, _ts("2024-01-01T00:00:06"), "click"),
            (4, 8, _ts("2024-01-01T00:00:02"), "click"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    out = {r.click_id: r for r in click_attribution(ev).collect()}
    assert out[2].view_id == 1 and out[2].gap_us == 3_000_000
    assert out[3].view_id == 1 and out[3].gap_us == 5_000_000
    assert out[4].view_id is None and out[4].gap_us is None
    assert out[2].click_us - out[2].view_us == out[2].gap_us
