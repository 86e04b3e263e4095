"""Column profiler: hand-computed stats (nulls, exact distincts, decimal-
exact mean, interpolated quantiles), the approx variant's schema contract,
and the single-scan plan shape."""

import pytest

from ht_ner_spark.operators.profile import profile_numeric


@pytest.fixture(scope="module")
def frame(spark):
    rows = [(1.0, 10.0), (2.0, None), (3.0, 30.0), (4.0, 30.0), (100.0, None)]
    return spark.createDataFrame(rows, ["a", "b"])


def test_profile_values(frame):
    out = {r.col: r for r in profile_numeric(frame, ["a", "b"]).collect()}
    a, b = out["a"], out["b"]
    assert (a.n_rows, a.n_non_null, a.n_distinct) == (5, 5, 5)
    assert (a.min_v, a.max_v) == (1.0, 100.0)
    assert a.mean_v == 22.0
    assert a.q_50 == 3.0  # exact median of 5 values
    # p95 of [1,2,3,4,100]: rank 0.95*(5-1)=3.8 -> 4 + 0.8*(100-4)
    assert a.q_95 == pytest.approx(80.8)
    assert (b.n_rows, b.n_non_null, b.n_distinct) == (5, 3, 2)
    assert b.mean_v == pytest.approx(round(70.0 / 3, 4))
    assert b.q_50 == 30.0


def test_profile_approx_same_schema(frame):
    exact = profile_numeric(frame, ["a"])
    approx = profile_numeric(frame, ["a"], approx=True)
    assert exact.columns == approx.columns
    r = approx.collect()[0]
    assert r.n_distinct >= 4  # HLL estimate, not compared exactly


def test_profile_single_scan(frame):
    plan = (profile_numeric(frame, ["a", "b"])
            ._jdf.queryExecution().executedPlan().toString())
    # one aggregation pass over one scan: the melt must not re-execute it
    assert plan.count("Scan ExistingRDD") == 1
