"""Scale-edge regression guards from VERDICT r2.

1. first_seen tie-break must survive documents with > 2^20 tokens and
   xxhash64-sized row_ids (the old ``row_id * 2^20 + pos`` encoding
   overflowed a long — an ANSI-mode error on real corpora, silent
   Counter-order drift otherwise).
2. the multimodal feature UDF must not run a per-byte Python loop
   (vectorized histogram == the old loop's output, exercised on MB payloads).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_first_seen_survives_huge_positions_and_rowids(spark):
    from ht_ner_spark.operators.antirules import word_frequency

    huge_row = (1 << 62) - 7   # xxhash64-scale row id
    rows = [
        (huge_row, 5_000_000, "zebra"),   # pos far past 2^20
        (1, 3, "zebra"),
        (1, 1, "apple"),
        (2, 0, "apple"),
        (0, 2_000_000, "mango"),
    ]
    tv = spark.createDataFrame(rows, "row_id long, pos long, tok string")
    got = [(r["tok"], r["rank"], (r["first_seen"]["r"], r["first_seen"]["p"]))
           for r in word_frequency(tv).orderBy("rank").collect()]
    # apple and zebra tie on cnt=2; apple first-occurs at (1,1) < zebra (1,3)
    assert got == [
        ("apple", 1, (1, 1)),
        ("zebra", 2, (1, 3)),
        ("mango", 3, (0, 2_000_000)),
    ]


def test_media_features_vectorized_histogram_matches_reference(spark):
    from ht_ner_spark.operators.multimodal import MEDIA, extract_features

    payload = bytes(hashlib.sha256(b"big").digest()) * 40_000  # ~1.3 MB
    media = spark.createDataFrame(
        [(0, "image", "image/png", bytearray(payload), 8, 8, None)], MEDIA
    )
    row = extract_features(media).collect()[0]
    # independent per-byte reference on the driver
    hist = [0.0] * 16
    for b in payload:
        hist[b >> 4] += 1.0
    expected = [h / len(payload) for h in hist]
    assert row["n_bytes"] == len(payload)
    assert row["content_sha256"] == hashlib.sha256(payload).hexdigest()
    assert np.allclose(row["features"], expected)


def test_sha_audit_broadcast_plan_equals_shuffle_plan(spark):
    """The size-gated broadcast anti-join audit must return the identical
    violation SET as the default shuffle plan — on clean data (empty) and
    with a planted foreign sha (exactly that sha) — while actually planning
    a broadcast join."""
    from ht_ner_spark.operators.triples import sha_invariant_audit

    corpus = spark.createDataFrame(
        [(i, f"sha{i:02d}") for i in range(20)], "row_id long, content_sha256 string"
    )

    def triples_with(shas):
        return spark.createDataFrame(
            [(f"s{i}", "mentions", "o", 1.0, (sha,))
             for i, sha in enumerate(shas)],
            "subj string, pred string, obj string, conf double, "
            "lineage struct<content_sha256:string>",
        )

    clean = triples_with([f"sha{i % 20:02d}" for i in range(60)])
    assert sha_invariant_audit(corpus, clean, broadcast_src=False).count() == 0
    assert sha_invariant_audit(corpus, clean, broadcast_src=True).count() == 0

    dirty = triples_with(["sha01", "BAD", "sha02", "BAD"])
    shuffle_rows = sorted(
        r["sha"] for r in sha_invariant_audit(corpus, dirty).collect())
    bcast_rows = sorted(
        r["sha"] for r in
        sha_invariant_audit(corpus, dirty, broadcast_src=True).collect())
    assert shuffle_rows == bcast_rows == ["BAD"]

    plan = sha_invariant_audit(corpus, dirty, broadcast_src=True)._jdf \
        .queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"))
    assert "Broadcast" in plan


def test_pipeline_corpus_rows_hint_same_triples(spark, tmp_path):
    """corpus_rows_hint only changes the audit's join strategy — the triples
    a pipeline run emits must be bit-identical with and without it."""
    from ht_ner_spark.corpus import synthetic_corpus
    from ht_ner_spark.pipeline import PipelineConfig, run

    c = synthetic_corpus(spark, 300).cache()
    c.count()
    base = run(spark, c, PipelineConfig(warehouse=str(tmp_path / "nohint"),
                                        run_id="a"))
    hinted = run(spark, c, PipelineConfig(warehouse=str(tmp_path / "hint"),
                                          run_id="b", corpus_rows_hint=300))
    cols = ["subj", "pred", "obj", "conf"]
    assert sorted(map(tuple, base.select(*cols).collect())) == \
        sorted(map(tuple, hinted.select(*cols).collect()))
    c.unpersist()
