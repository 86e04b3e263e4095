"""Incremental stage-1 (streaming/incremental.py): each corpus file is
labeled exactly once across restarts; output matches the batch fused path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ht_ner_spark.corpus import DEFAULT_GAZETTEER, synthetic_corpus
from ht_ner_spark.operators.fused import fused_stage1, split_mentions
from ht_ner_spark.storage import catalog as cat
from ht_ner_spark.streaming.incremental import stream_stage1


def _drop_files(spark, corpus_dir, lo, hi, seed=42):
    df = synthetic_corpus(spark, hi, seed=seed).where(
        (F.col("row_id") >= lo) & (F.col("row_id") < hi)
    ).drop("content_sha256")
    df.coalesce(1).write.mode("append").parquet(corpus_dir)


def test_streaming_incremental_exactly_once(spark, tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    wh = str(tmp_path / "wh")

    _drop_files(spark, corpus_dir, 0, 30)
    stream_stage1(spark, corpus_dir, wh, DEFAULT_GAZETTEER)
    n1 = cat.read_table(spark, wh, "mentions").count()
    assert n1 > 0

    # no new files -> drain again -> nothing appended
    stream_stage1(spark, corpus_dir, wh, DEFAULT_GAZETTEER)
    assert cat.read_table(spark, wh, "mentions").count() == n1

    # second drop -> only the new rows are appended
    _drop_files(spark, corpus_dir, 30, 50)
    stream_stage1(spark, corpus_dir, wh, DEFAULT_GAZETTEER)
    got = cat.read_table(spark, wh, "mentions")
    assert got.count() > n1

    # result set == the batch fused path over the full corpus (no freq LFs)
    batch = split_mentions(
        fused_stage1(
            synthetic_corpus(spark, 50).where(F.col("row_id") < 50),
            DEFAULT_GAZETTEER,
        )
    )
    cols = ["row_id", "lf_name", "begin", "end", "surface"]
    assert {tuple(r[c] for c in cols) for r in got.collect()} == \
           {tuple(r[c] for c in cols) for r in batch.collect()}


def test_stream_triples_merge_on_read_equals_batch(spark, tmp_path):
    from ht_ner_spark.streaming.incremental import merged_triples, stream_triples

    corpus_dir = str(tmp_path / "corpus")
    wh = str(tmp_path / "wh")

    def batch_expected(hi):
        corpus = synthetic_corpus(spark, hi, seed=42)
        combined = fused_stage1(corpus, DEFAULT_GAZETTEER)
        return {
            (r["subj"], r["pred"], r["obj"]): (r["n_witnesses"], r["conf"])
            for r in (
                split_mentions(combined)
                .where(F.col("label") == "PERSON_NAME")
                .join(corpus.select("row_id", "repo"), "row_id")
                .groupBy(F.col("repo").alias("subj"),
                         F.lit("mentions_name").alias("pred"),
                         F.lower(F.col("surface")).alias("obj"))
                .agg(F.countDistinct("row_id").alias("n_witnesses"),
                     F.max("confidence").alias("conf"))
            ).collect()
        }

    def merged():
        return {(r["subj"], r["pred"], r["obj"]): (r["n_witnesses"], r["conf"])
                for r in merged_triples(spark, wh).collect()}

    _drop_files(spark, corpus_dir, 0, 30)
    stream_triples(spark, corpus_dir, wh, DEFAULT_GAZETTEER)
    assert merged() == batch_expected(30)

    # no new files -> drain is a no-op
    stream_triples(spark, corpus_dir, wh, DEFAULT_GAZETTEER)
    assert merged() == batch_expected(30)

    # more files -> merge-on-read over deltas == full batch recompute
    _drop_files(spark, corpus_dir, 30, 50)
    stream_triples(spark, corpus_dir, wh, DEFAULT_GAZETTEER)
    assert merged() == batch_expected(50)
