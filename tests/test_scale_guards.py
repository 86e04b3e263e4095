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
