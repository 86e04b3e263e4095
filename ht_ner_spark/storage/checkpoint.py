"""Checkpoint / metrics table + keyed resume (SURVEY.md §2.1 S7, §2.10).

The reference resumes by *positional* pickle-list length
(/root/reference/src/openai_infer.py:169-186) — nondeterministic under any
reordering. Our resume is keyed and idempotent:

* every completed stage appends per-partition checkpoint rows
  ``(run_id, stage, partition_id, rows_in, rows_out, counters, sha_ok, ts)``;
* a restarted run anti-joins / short-circuits on completed stages and reuses
  the stage's table (stage writes are atomic overwrite-by-dir);
* per-partition metrics come from ``df.observe``/counters gathered during the
  stage pass — no extra corpus scan.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CHECKPOINT

CHECKPOINT_TABLE = "_checkpoint"


def _ckpt_dir(warehouse: str) -> str:
    return os.path.join(warehouse, CHECKPOINT_TABLE)


def stage_done(spark: SparkSession, warehouse: str, run_id: str, stage: str) -> bool:
    path = _ckpt_dir(warehouse)
    if not os.path.isdir(path):
        return False
    df = spark.read.parquet(path)
    return (
        df.where((F.col("run_id") == run_id) & (F.col("stage") == stage)).limit(1).count()
        > 0
    )


def completed_stages(spark: SparkSession, warehouse: str, run_id: str) -> set[str]:
    """All completed stages for a run in ONE read — resume does a single
    checkpoint-table scan instead of one per stage."""
    path = _ckpt_dir(warehouse)
    if not os.path.isdir(path):
        return set()
    df = spark.read.parquet(path)
    return {
        r["stage"]
        for r in df.where(F.col("run_id") == run_id).select("stage").distinct().collect()
    }


def record_stage(
    spark: SparkSession,
    warehouse: str,
    run_id: str,
    stage: str,
    partition_stats: DataFrame | None = None,
    rows_in: int = 0,
    rows_out: int = 0,
    counters: dict[str, int] | None = None,
    sha_ok: bool = True,
) -> None:
    """Append checkpoint rows. ``partition_stats`` (partition_id, rows_out)
    gives per-partition lineage; otherwise a single stage-level row is written."""
    ts = _dt.datetime.now(_dt.timezone.utc).isoformat()
    if partition_stats is not None:
        rows = [
            (run_id, stage, int(r["partition_id"]), int(rows_in), int(r["rows_out"]),
             counters or {}, bool(sha_ok), ts)
            for r in partition_stats.collect()
        ]
        if not rows:
            rows = [(run_id, stage, -1, int(rows_in), 0, counters or {}, bool(sha_ok), ts)]
    else:
        rows = [(run_id, stage, -1, int(rows_in), int(rows_out), counters or {},
                 bool(sha_ok), ts)]
    spark.createDataFrame(rows, CHECKPOINT).write.mode("append").parquet(
        _ckpt_dir(warehouse)
    )


def partition_stats(df: DataFrame) -> DataFrame:
    """(partition_id, rows_out) of the df's current partitioning — one small
    agg, reused as the per-partition lineage record."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("rows_out"))
    )


def read_checkpoints(spark: SparkSession, warehouse: str) -> DataFrame:
    return spark.read.parquet(_ckpt_dir(warehouse))
