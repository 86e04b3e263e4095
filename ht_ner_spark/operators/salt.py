"""Explicit skew handling: salted joins and two-level (salted) aggregations.

North-rule requirement (BASELINE.json): "canonicalizes aliases with iterative
connected-components ... with salted keys for skewed hub entities" and
"skew-join salting" at spark-submit time. AQE's skew-join splitting
(spark.sql.adaptive.skewJoin, enabled in session.py) handles sort-merge join
skew at runtime, but (a) it does not split skewed AGGREGATION keys and
(b) it does not apply inside iterative self-joins whose per-round frames are
localCheckpointed (AQE re-plans per query, not per cached RDD). These
operators make the skew handling explicit and deterministic:

* ``salted_min_agg`` — two-level aggregation: groupBy(key, salt) partial min
  then groupBy(key) final min. A hub key whose rows land in one reducer
  becomes K partial groups that combine in a second, tiny shuffle. Used by
  connected-components' neighbor-min (hub entities: a canonical surface
  aliased by thousands of mentions).
* ``salted_join`` — replicate the SMALL side K times (one copy per salt
  value), add a deterministic salt to the large side (pmod(xxhash64(...))),
  join on (key, salt). Result is row-identical to the unsalted join
  (property-tested). Deterministic salt (hash of the row's other columns,
  NOT rand()) keeps retries/resume idempotent.

Salting is free of information loss — both operators are algebraic rewrites —
so they are applied unconditionally where hub keys are expected; K is small
(default 16) to bound replication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _det_salt(cols: list[str], k: int) -> Column:
    """Deterministic salt in [0, k): hash of the row's columns — stable
    across retries (rand() would break resume idempotence)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(k)).cast("int")


def salted_min_agg(df: DataFrame, key: str, value: str, k: int = 16,
                   salt_by: list[str] | None = None) -> DataFrame:
    """groupBy(key).min(value) as a two-level salted aggregation.

    Level 1 shuffles on (key, salt) — a hub key spreads over k reducers;
    level 2 combines the k partials (tiny: |distinct keys| x k rows max)."""
    salt = _det_salt(salt_by or [value], k)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.min(value).alias(value))
    )
    return partial.groupBy(key).agg(F.min(value).alias(value))


def salted_join(large: DataFrame, small: DataFrame, key: str, k: int = 16,
                how: str = "inner") -> DataFrame:
    """large ⋈ small on ``key`` with the small side replicated k× and the
    large side salted deterministically. Output columns = the unsalted
    join's columns; row-set identical to ``large.join(small, key, how)``
    for inner/left joins ONLY — right/full outer would emit each unmatched
    small-side row k times (it is replicated before the join), so those join
    types are rejected."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "the replicated small side would duplicate unmatched rows under "
            "right/full outer semantics"
        )
    other_cols = [c for c in large.columns if c != key]
    salted_large = large.withColumn(
        "_salt", _det_salt(other_cols or [key], k)
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1)).cast("array<int>"))
    )
    return salted_large.join(replicated, [key, "_salt"], how).drop("_salt")
