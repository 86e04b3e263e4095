#!/usr/bin/env python
"""Offline ANN parameter sweep (VERDICT r3 next-#4).

Replicates the engine's two ANN index constructions EXACTLY in numpy —
sign-bucket multi-table LSH over disjoint coordinate slices with hamming
multiprobe (operators/similarity.py:bucketed_ann_topk) and IVF with the
deterministic seed-medoid quantizer (ivf_topk + seed_centroids) — and
measures recall@k against exact cosine top-k on the real testdata
embeddings, across a (tables, bits, probe radius) x (cells, nprobe) grid.

Cost proxy: mean candidate fraction (distinct candidates scored per query
/ corpus size) — the quantity that drives both the bucket-join width and
the re-rank cost at any scale. The committed output picks the defaults:
the cheapest config with recall >= 0.8 at <= 2x the round-3 default cost.

Pure numpy on one core (no Spark): the sweep explores the parameter grid;
bench.py's ann_tradeoff then measures the CHOSEN config end-to-end in
Spark, and the oracle-paired `ann_recall` contract query hash-gates it.

Usage: python scripts/ann_sweep.py [sf_dir] > ANN_SWEEP_r04.json
"""
from __future__ import annotations

import itertools
import json
import sys
import time

import numpy as np
import pyarrow.parquet as pq


def load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    # embeddings come as list<float>; stack to (n, d) float64 (the engine
    # casts to array<double> before any arithmetic)
    emb = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    order = np.argsort(ids)
    return ids[order], emb[order]


def exact_topk(emb: np.ndarray, qidx: np.ndarray, k: int) -> list[set]:
    normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = normed[qidx] @ normed.T
    out = []
    for row, qi in zip(sims, qidx):
        row = row.copy()
        row[qi] = -np.inf  # exclude self, like neighbor_id != query_id
        # ties broken by neighbor_id asc: argsort on (-sim, id)
        idx = np.lexsort((np.arange(len(row)), -row))[:k]
        out.append(set(idx.tolist()))
    return out


def sign_bits(emb: np.ndarray, nbits: int) -> np.ndarray:
    return (emb[:, :nbits] >= 0)


def lsh_recall(emb, qidx, exact, k, tables, bits, radius) -> dict:
    nbits = tables * bits
    if nbits > emb.shape[1]:
        return {"skip": f"needs dim >= {nbits}"}
    sb = sign_bits(emb, nbits)
    n = emb.shape[0]
    # bucket key per table: pack the slice's bits into an int
    weights = 1 << np.arange(bits)
    keys = np.stack([sb[:, t * bits:(t + 1) * bits] @ weights
                     for t in range(tables)], axis=1)  # (n, tables)
    # probe masks: XOR patterns of hamming weight <= radius
    masks = [0]
    if radius >= 1:
        masks += [1 << i for i in range(bits)]
    if radius >= 2:
        masks += [(1 << i) | (1 << j)
                  for i, j in itertools.combinations(range(bits), 2)]
    # invert: per (table, key) -> vector ids
    buckets: list[dict] = []
    for t in range(tables):
        d: dict = {}
        for vid, kk in enumerate(keys[:, t]):
            d.setdefault(int(kk), []).append(vid)
        buckets.append(d)
    normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    recalls, fracs = [], []
    t0 = time.monotonic()
    for qi, ex in zip(qidx, exact):
        cand: set = set()
        for t in range(tables):
            qk = int(keys[qi, t])
            for m in masks:
                cand.update(buckets[t].get(qk ^ m, ()))
        cand.discard(int(qi))
        fracs.append(len(cand) / n)
        if not cand:
            recalls.append(0.0)
            continue
        cl = np.fromiter(cand, dtype=np.int64)
        sims = normed[cl] @ normed[qi]
        top = cl[np.lexsort((cl, -sims))[:k]]
        recalls.append(len(set(top.tolist()) & ex) / len(ex))
    return {"tables": tables, "bits": bits, "radius": radius,
            "probes_per_query": tables * len(masks),
            "recall_at_k": round(float(np.mean(recalls)), 3),
            "cand_frac": round(float(np.mean(fracs)), 4),
            "sweep_sec": round(time.monotonic() - t0, 2)}


def kmeans_numpy(emb: np.ndarray, cells: int, seed: int = 42,
                 max_iter: int = 20) -> np.ndarray:
    """Deterministic Lloyd's (random-subset init) — the sweep's stand-in
    for pyspark.ml KMeans; same objective, so recall tracks the engine's
    kmeans_centroids path closely (0.638 numpy vs 0.614 Spark at 64/12 —
    init differs, k-means|| in MLlib vs random subset here)."""
    rng = np.random.RandomState(seed)
    cents = emb[rng.choice(emb.shape[0], cells, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((emb[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(cells):
            m = emb[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def ivf_recall(emb, qidx, exact, k, cells, nprobe,
               quantizer: str = "seed") -> dict:
    """quantizer: 'seed' = the lowest-id medoids (the contract twin — NOTE
    these OVERLAP qidx, so recall is inflated by self-centered probing);
    'medoid_disjoint' = medoids drawn past the query ids (honest medoid
    baseline); 'kmeans' = Lloyd's (the production path's stand-in)."""
    n = emb.shape[0]
    normed = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    if quantizer == "seed":
        cents = emb[:cells]  # seed_centroids: lowest-id vectors, id order
    elif quantizer == "medoid_disjoint":
        lo = int(qidx.max()) + 1 + 50
        cents = emb[lo:lo + cells]
    elif quantizer == "kmeans":
        cents = kmeans_numpy(emb, cells)
    else:
        raise ValueError(quantizer)
    cnormed = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = normed @ cnormed.T          # (n, cells) cosine
    assign = np.argmax(sims, axis=1)   # first max = lowest cell id (ties)
    cell_members = [np.where(assign == c)[0] for c in range(cells)]
    recalls, fracs = [], []
    t0 = time.monotonic()
    for qi, ex in zip(qidx, exact):
        order = np.lexsort((np.arange(cells), -sims[qi]))[:nprobe]
        cand = np.concatenate([cell_members[c] for c in order])
        cand = cand[cand != qi]
        fracs.append(len(cand) / n)
        s = normed[cand] @ normed[qi]
        top = cand[np.lexsort((cand, -s))[:k]]
        recalls.append(len(set(top.tolist()) & ex) / len(ex))
    return {"cells": cells, "nprobe": nprobe, "quantizer": quantizer,
            "recall_at_k": round(float(np.mean(recalls)), 3),
            "cand_frac": round(float(np.mean(fracs)), 4),
            "sweep_sec": round(time.monotonic() - t0, 2)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries, k = 50, 10
    ids, emb = load(sf_dir)
    qidx = np.arange(n_queries)  # vec_id < n_queries, ids are 0..n-1 sorted
    exact = exact_topk(emb, qidx, k)
    out = {"sf_dir": sf_dir, "n_vectors": int(emb.shape[0]),
           "dim": int(emb.shape[1]), "n_queries": n_queries, "k": k,
           "lsh": [], "ivf": []}
    for tables, bits, radius in [
        (8, 8, 1),   # round-3 default (anchor)
        (8, 8, 2),
        (8, 6, 1), (8, 6, 2),
        (10, 6, 1), (10, 6, 2),
        (16, 4, 0), (16, 4, 1),
        (8, 4, 1), (8, 4, 2),
    ]:
        out["lsh"].append(lsh_recall(emb, qidx, exact, k, tables, bits, radius))
    for cells, nprobe in [(16, 4),   # round-3 default (anchor)
                          (16, 6), (16, 8),
                          (32, 8), (32, 12), (64, 12), (64, 16)]:
        out["ivf"].append(ivf_recall(emb, qidx, exact, k, cells, nprobe))
    # honest quantizer comparison (round-5 diagnosis): the 'seed' rows
    # above carry queries-are-centroids inflation (qidx subset of the
    # lowest-id medoids); these rows evaluate quantizers a deployment
    # could actually ship, on the same query set
    out["ivf_honest"] = []
    for cells, nprobe in [(64, 12), (64, 16), (64, 20), (64, 24),
                          (64, 28), (64, 32)]:
        for quant in ("medoid_disjoint", "kmeans"):
            out["ivf_honest"].append(
                ivf_recall(emb, qidx, exact, k, cells, nprobe, quant))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
