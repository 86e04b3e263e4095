"""Incremental stage-1 ingestion via Structured Streaming.

The reference is pure batch (SURVEY §1.4) and the north rule demands batch
resumability (checkpoint table + keyed skip, storage/checkpoint.py) — this
module adds the Spark-idiomatic INCREMENTAL path on top: new corpus files
landing in a directory are labeled exactly once, with Structured Streaming's
own offset log tracking which source files were already processed.

Design:

* `readStream` over the corpus directory (explicit CORPUS schema — streaming
  sources cannot infer), sha256 attached at scan (the per-row invariant).
* `foreachBatch`: each micro-batch runs the SAME fused stage-1 labeler as
  the batch pipeline (operators/fused.py — one code path, two drivers) and
  writes the warehouse mentions/votes tables, recording a checkpoint row
  per batch (stage "s1-stream", partition_id = batch_id).
* **Exactly-once data, at-least-once metrics**: foreachBatch alone is
  at-least-once (a crash between the data write and the offset commit
  re-runs the batch). The data writes are made idempotent by keying every
  row with its ``batch_id`` and writing via dynamic partition overwrite —
  a re-run of batch N replaces partition ``batch_id=N`` instead of
  appending a duplicate copy. Checkpoint METRIC rows remain at-least-once
  (duplicates carry the same batch_id counter and are distinguishable).
* `Trigger.AvailableNow`: drains everything new, then stops — the
  batch-incremental operating mode (cron-style re-runs process only new
  files; a long-running `trigger(processingTime=...)` works unchanged).

Corpus-global frequency antirules are inherently batch (a stream has no
final vocabulary); streaming stage-1 therefore runs with a FROZEN common-word
ranking computed by a prior batch pass (passed in via ``common_ranks``), or
with frequency LFs disabled — the same adaptive broadcast contract as
pipeline._frequency_inputs. Documented deviation, not a silent one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CORPUS
from ..storage import catalog as cat
from ..storage import checkpoint as ck


def read_corpus_stream(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Streaming scan of the Iceberg-shaped corpus directory (parquet files),
    sha256 attached at scan time (input_hint invariant)."""
    base = [f for f in CORPUS.fields if f.name != "content_sha256"]
    from pyspark.sql.types import StructType

    stream = (
        spark.readStream.schema(StructType(base))
        .option("maxFilesPerTrigger", 16)
        .parquet(corpus_dir)
    )
    return stream.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def stream_stage1(spark: SparkSession, corpus_dir: str, warehouse: str,
                  gazetteer: dict[str, float],
                  common_ranks: dict[str, int] | None = None,
                  freq_cutoffs: list[tuple[str, int]] | None = None,
                  run_id: str = "stream") -> None:
    """Drain all new corpus files through fused stage 1, writing the
    warehouse mentions/votes tables. Exactly-once per source file: the
    stream's offset checkpoint prevents re-reads across restarts, and each
    micro-batch lands in its own ``batch_id`` partition via dynamic
    partition overwrite, so a crash-and-retry of one batch replaces its
    partition instead of duplicating rows. Returns when the backlog is
    drained (Trigger.AvailableNow)."""
    from ..operators.fused import fused_stage1, split_mentions, split_votes

    os.makedirs(warehouse, exist_ok=True)
    stream = read_corpus_stream(spark, corpus_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        combined = fused_stage1(
            batch_df, gazetteer,
            common_ranks=common_ranks, freq_cutoffs=freq_cutoffs or [],
        ).localCheckpoint()  # materialize once; the two writes below reuse it
        mentions = split_mentions(combined).withColumn("batch_id", F.lit(int(batch_id)))
        votes = split_votes(combined).withColumn("batch_id", F.lit(int(batch_id)))
        cat.write_table(mentions, warehouse, "mentions", mode="overwrite",
                        partition_by=["batch_id"], dynamic_overwrite=True)
        cat.write_table(votes, warehouse, "votes", mode="overwrite",
                        partition_by=["batch_id"], dynamic_overwrite=True)
        ck.record_stage(
            spark, warehouse, run_id, "s1-stream",
            rows_out=combined.count(),
            counters={"batch_id": int(batch_id), **ck.LINEAGE_SOURCE_BATCH},
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(warehouse, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_triples(spark: SparkSession, corpus_dir: str, warehouse: str,
                   gazetteer: dict[str, float],
                   common_ranks: dict[str, int] | None = None,
                   freq_cutoffs: list[tuple[str, int]] | None = None,
                   run_id: str = "stream") -> None:
    """Streaming KG maintenance, merge-on-read: each micro-batch runs fused
    stage 1 and lands its mention-level facts as an APPEND-ONLY delta
    partition ``batch_id=N`` (dynamic partition overwrite, so a
    crash-and-retry of batch N replaces its own partition — idempotent,
    exactly-once per source file); ``merged_triples`` folds the deltas at
    read time.  The delta facts use only associative-commutative merges
    (sum of witnesses, max of conf), so merge-on-read over any batch
    decomposition equals the full batch recompute — the invariant the
    tests pin.

    Entity linking / canonicalization (stages 2-3) stay batch: they are
    corpus-global (components over ALL mentions), so the streaming path
    emits surface-level facts and a periodic batch pass re-canonicalizes —
    the standard streaming-extract / batch-consolidate split, documented
    rather than silently approximated."""
    from ..operators.fused import fused_stage1, split_mentions

    os.makedirs(warehouse, exist_ok=True)
    stream = read_corpus_stream(spark, corpus_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        combined = fused_stage1(
            batch_df, gazetteer,
            common_ranks=common_ranks, freq_cutoffs=freq_cutoffs or [],
        )
        facts = (
            split_mentions(combined)
            .where(F.col("label") == "PERSON_NAME")
            .join(batch_df.select("row_id", "repo"), "row_id")
            .groupBy(F.col("repo").alias("subj"),
                     F.lit("mentions_name").alias("pred"),
                     F.lower(F.col("surface")).alias("obj"))
            .agg(F.countDistinct("row_id").alias("n_witnesses"),
                 F.max("confidence").alias("conf"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        # one materialization per batch: without the persist the counter's
        # count() below re-runs the whole fused-stage-1 DAG a second time
        facts = facts.persist()
        try:
            cat.write_table(facts, warehouse, "triple_deltas", mode="overwrite",
                            partition_by=["batch_id"], dynamic_overwrite=True)
            ck.record_stage(
                spark, warehouse, run_id, "s4-stream",
                rows_out=facts.count(),
                counters={"batch_id": int(batch_id), **ck.LINEAGE_SOURCE_BATCH},
            )
        finally:
            facts.unpersist()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation",
                os.path.join(warehouse, "_stream_triples_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merged_triples(spark: SparkSession, warehouse: str) -> DataFrame:
    """Merge-on-read view of the streamed triple deltas: one row per
    (subj, pred, obj) with summed witnesses and max confidence.  A
    compaction pass (storage/catalog.compact_table) can fold the delta
    partitions into fewer files without changing this reader."""
    d = cat.read_table(spark, warehouse, "triple_deltas")
    return d.groupBy("subj", "pred", "obj").agg(
        F.sum("n_witnesses").alias("n_witnesses"),
        F.max("conf").alias("conf"))
