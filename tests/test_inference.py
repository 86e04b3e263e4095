"""M1 token-classification inference plumbing (operators/inference.py):
the within-row W2 merge must agree with the relational Window merge
(operators/merge.py), P7 must drop non-name labels, T9 must strip markers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ht_ner_spark.corpus import synthetic_corpus
from ht_ner_spark.operators.inference import (
    FakeTokenClassifier,
    NAME_SET,
    token_classification_mentions,
)
from ht_ner_spark.operators.merge import merge_adjacent

N_ROWS = 60


def test_fake_classifier_contract():
    preds = FakeTokenClassifier().predict_batch(["ping Alice about Bob now"])[0]
    assert all({"entity_group", "score", "word", "start", "end"} <= set(p) for p in preds)
    # fragments are char-adjacent pairs
    assert preds[0]["end"] == preds[1]["start"]


def test_udf_merge_equals_relational_merge(spark):
    c = synthetic_corpus(spark, N_ROWS).cache()
    got = token_classification_mentions(c)
    g = {(r["row_id"], r["surface"], r["begin_char"], r["end_char"], round(r["score"], 9))
         for r in got.collect()}

    # relational path: raw fragments -> P7 filter -> T9 strip -> Window merge
    clf = FakeTokenClassifier()
    rows = []
    for row in c.select("row_id", "content").collect():
        for p in clf.predict_batch([row["content"]])[0]:
            rows.append((row["row_id"], p["entity_group"], p["score"],
                         p["word"], p["start"], p["end"]))
    frags = spark.createDataFrame(
        rows, "row_id long, entity_group string, score double, word string, start int, end int"
    )
    filtered = frags.where(F.col("entity_group").isin(list(NAME_SET))).withColumn(
        "word", F.regexp_replace("word", "^[Ġ▁]+", "")
    )
    merged = merge_adjacent(filtered)
    w = {(r["row_id"], r["word"], r["start"], r["end"], round(r["score"], 9))
         for r in merged.collect()}
    assert g == w
    assert len(g) > 0


def test_p7_filter_drops_decoys(spark):
    c = synthetic_corpus(spark, N_ROWS)
    clf = FakeTokenClassifier()
    texts = [r["content"] for r in c.select("content").collect()]
    raw_labels = {p["entity_group"] for t in texts for p in clf.predict_batch([t])[0]}
    assert "LOC" in raw_labels  # the decoy exists pre-filter
    got = token_classification_mentions(c)
    # all surviving mentions have >= 1 fragment and stripped markers
    assert got.where(F.col("surface").rlike("^[Ġ▁]")).count() == 0
