"""Column profiler: per-column data-quality statistics in ONE aggregation
pass (the ingest-gate profile a training-data pipeline runs before and
after every transform — row counts, null rates, exact distincts, range,
mean, exact interpolated quantiles).

100 TB shape: all statistics for all columns ride a SINGLE df.agg — one
scan, one reduce; the per-column melt happens by exploding an array of
structs built from the 1-row aggregate, so Catalyst never duplicates the
scan (a union-of-selects over the same agg would re-execute it per
column). Exact count_distinct is the one shuffle amplifier (Expand with
one group per distinct-agg); `approx=True` swaps in HLL
approx_count_distinct for the cluster-scale profile — same schema, only
the distinct column's accuracy contract changes (and it leaves the
oracle-compared contract query, which pins the exact path).

The mean is computed as an EXACT decimal(38,6) sum cast to double at the
end: a distributed double sum is partition-order dependent, which would
make round(mean, 4) flap at rounding boundaries between engines/runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str],
                    quantiles: tuple[float, ...] = (0.5, 0.95),
                    approx: bool = False) -> DataFrame:
    """(col, n_rows, n_non_null, n_distinct, min_v, max_v, mean_v, q_50,
    q_95, ...): one output row per profiled numeric column."""
    qnames = [f"q_{int(q * 100)}" for q in quantiles]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        d = F.col(c).cast("double")
        nd = (F.approx_count_distinct(F.col(c)) if approx
              else F.count_distinct(F.col(c)))
        aggs += [
            F.count(d).alias(f"{c}__n"),
            nd.alias(f"{c}__nd"),
            F.round(F.min(d), 4).alias(f"{c}__min"),
            F.round(F.max(d), 4).alias(f"{c}__max"),
            F.round(
                F.sum(F.col(c).cast("decimal(38,6)")).cast("double")
                / F.count(d), 4
            ).alias(f"{c}__mean"),
            *[F.round(F.percentile(d, F.lit(q)), 4).alias(f"{c}__q{i}")
              for i, q in enumerate(quantiles)],
        ]
    row = df.agg(*aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("col"),
            F.col("__rows").cast("long").alias("n_rows"),
            F.col(f"{c}__n").cast("long").alias("n_non_null"),
            F.col(f"{c}__nd").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            F.col(f"{c}__mean").alias("mean_v"),
            *[F.col(f"{c}__q{i}").alias(n) for i, n in enumerate(qnames)],
        )
        for c in cols
    ])
    return row.select(F.explode(structs).alias("s")).select("s.*")
