"""Recall / reporting guarantees of the dedup + similarity family.

* simhash blocking must be EXACT for its configured radius: the pigeonhole
  segmentation uses max_hamming+1 segments, so every pair within the radius
  shares at least one segment (the round-1 2-segment version silently missed
  pairs differing by one bit in each half — this test is the ground-truth
  check that would have caught it).
* skew-guard drops are REPORTED, never silent: minhash_dupe_pairs and
  embedding_near_dupes return dropped-block frames, and the counts thread
  into checkpoint counters (visible via read_checkpoints).
* the bucketed ANN's candidates must recall most of the exact brute-force
  top-k (the SQL oracle pins its exact output; this pins its QUALITY).
* the Arrow scorer path must agree bit-for-bit with the relational
  HashScorer expression, including the A10 replace-with--2 penalty branch.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from ht_ner_spark.operators.dedup import (
    doc_minhash,
    minhash_dupe_pairs,
    simhash_near_dupes,
)
from ht_ner_spark.operators.scorer import PENALTY, HashScorer, score_mentions
from ht_ner_spark.operators.similarity import (
    brute_force_topk,
    bucketed_ann_topk,
    embedding_near_dupes,
)
from ht_ner_spark.storage import checkpoint as ck

BITS = 16


def _bits_from_md5(i: int) -> list[int]:
    h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    return [(h >> j) & 1 for j in range(BITS)]


def _fp(bits: list[int]) -> str:
    return "".join(str(b) for b in bits)


def _flip(bits: list[int], *idx: int) -> list[int]:
    out = list(bits)
    for i in idx:
        out[i] = 1 - out[i]
    return out


def test_simhash_blocking_matches_allpairs_ground_truth(spark):
    """Every pair at Hamming distance <= max_hamming (=2) must be found —
    including pairs with one differing bit in EACH half of the fingerprint,
    which a 2-segment blocking misses."""
    rows = []
    for i in range(100):
        base = _bits_from_md5(i)
        rows.append((i, _fp(base)))
        if i < 40:
            # distance-1 neighbor
            rows.append((1000 + i, _fp(_flip(base, i % BITS))))
            # distance-2 neighbor straddling both 8-bit halves
            rows.append((2000 + i, _fp(_flip(base, i % 8, 8 + (i % 8)))))
    fps = spark.createDataFrame(rows, "doc_id long, simhash string")

    got = {
        (r["src"], r["dst"], r["hamming"])
        for r in simhash_near_dupes(fps, max_hamming=2, bits=BITS).collect()
    }

    def ham(a: str, b: str) -> int:
        return sum(x != y for x, y in zip(a, b))

    truth = set()
    for i, (ida, fa) in enumerate(rows):
        for idb, fb in rows[i + 1:]:
            d = ham(fa, fb)
            if d <= 2:
                lo, hi = min(ida, idb), max(ida, idb)
                truth.add((lo, hi, d))
    # the planted cross-half pairs must be present in the ground truth at all
    assert any(a < 2000 <= b for a, b, _d in truth)
    assert got == truth


def test_minhash_dropped_blocks_reported_in_checkpoints(spark, tmp_path):
    """Hub shingles overflow max_block -> excluded AND reported; the count
    lands in checkpoint counters (no silent caps)."""
    docs = [(i, "common shingle everywhere " + f"unique{i} tail{i} end{i}")
            for i in range(12)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = doc_minhash(d, k=3, num_bands=4)
    pairs, dropped = minhash_dupe_pairs(sigs, min_shared_bands=1, max_block=4)
    n_dropped = dropped.count()
    assert n_dropped > 0  # the 12-doc hub bucket exceeds max_block=4

    wh = str(tmp_path / "wh")
    ck.record_stage(spark, wh, "r", "dedup", rows_out=pairs.count(),
                    counters={"dropped_blocks": n_dropped})
    rec = ck.read_checkpoints(spark, wh).collect()
    assert any(r["counters"]["dropped_blocks"] == n_dropped for r in rec
               if r["stage"] == "dedup")


def test_embedding_near_dupes_reports_dropped(spark):
    # 5 identical-sign vectors in one bucket, max_block=3 -> all dropped
    vecs = spark.createDataFrame(
        [(i, [1.0 + i * 0.01] * 8) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    pairs, dropped = embedding_near_dupes(vecs, min_cosine=0.0, bits=6,
                                          max_block=3)
    assert pairs.count() == 0
    d = dropped.collect()
    assert len(d) == 1 and d[0]["block_size"] == 5


def test_bucketed_ann_recall_vs_brute_force(spark):
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = vecs.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(vecs, queries, k=5)
    approx = bucketed_ann_topk(vecs, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # round-5 defaults (10 tables x 6 sign bits, radius-1 multiprobe — the
    # >=0.9-recall sweep point from ANN_SWEEP_r04.json), 500 vectors whose
    # mean top-5 cosine is only 0.32 (adversarially unclustered synthetic
    # data — the hardest case for LSH): measured 0.94 recall here; 0.85 is
    # the regression floor
    assert recall >= 0.85, recall


def test_bucketed_ann_radius_monotone(spark):
    # hamming-radius multiprobe (r4): each radius level's probe set is a
    # superset of the previous one's, so the candidate union — and hence
    # recall vs exact — must be monotone in radius; on the sf0.001 fixture
    # radius 2's ~0.72 candidate fraction reaches near-exact recall
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = vecs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    e = {(r["query_id"], r["neighbor_id"])
         for r in brute_force_topk(vecs, queries, k=5).collect()}
    recalls = []
    for radius in (0, 1, 2):
        a = {(r["query_id"], r["neighbor_id"])
             for r in bucketed_ann_topk(vecs, queries, k=5,
                                        radius=radius).collect()}
        recalls.append(len(e & a) / len(e))
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[2] >= 0.9, recalls


class _ArrowHash:
    """HashScorer math behind a non-HashScorer type -> forces the Arrow
    mapInPandas path in score_mentions."""

    def score_batch(self, surfaces: pd.Series, contexts: pd.Series) -> pd.Series:
        return HashScorer().score_batch(surfaces, contexts)


def test_hash_scorer_arrow_matches_relational(spark):
    # 'key' and 'scan' trip the deterministic A10 penalty bucket (p%7==0);
    # 'missing' never occurs in the content (J6 -> score 0)
    corpus = spark.createDataFrame(
        [(0, "the key opens the scan table fast"),
         (1, "value row key merge")],
        "row_id long, content string",
    )
    mentions = spark.createDataFrame(
        [(0, "key", 1, 0.9), (0, "scan", 4, 0.8), (0, "missing", 2, 0.7),
         (1, "key", 2, 0.6)],
        "row_id long, surface string, begin int, base_conf double",
    )
    rel = score_mentions(mentions, corpus)  # default -> relational expr
    arr = score_mentions(mentions, corpus, scorer=_ArrowHash())
    cols = ["row_id", "surface", "begin", "fill_mask_conf", "confidence"]
    r = {tuple(x[c] for c in cols) for x in rel.collect()}
    a = {tuple(x[c] for c in cols) for x in arr.collect()}
    assert r == a
    # the replace-semantics penalty must actually fire: score == -2 exactly
    by_surface = {x["surface"]: x["fill_mask_conf"] for x in rel.collect()}
    assert by_surface["key"] == PENALTY
    assert by_surface["scan"] == PENALTY
    assert by_surface["missing"] == 0.0
