#!/usr/bin/env python
"""Regenerate the committed golden parquets for the two non-SQL-expressible
queries (VERDICT r2 Missing #1): the DuckDB oracle for these is a plain
``read_parquet`` of the pinned expected output, which upgrades both from a
rows-only driver check to a full rows+schema+hash gate.

- hmm_entities: iterative Baum-Welch EM — per-SF golden (the documents table
  differs per SF; sf0.001 and sf0.01 both have 500 docs, so the oracle SQL
  discriminates by sum(n_chars) of doc_id < 200).
- media_features: deterministic pure function of the synthetic media bytes —
  SF-independent.

Determinism evidence: q_hmm_entities collected at cores=4 and cores=16 is
hash-identical at both SFs (2026-08-17, round 3); tests/test_hmm.py
separately validates the EM against a local-numpy oracle.

Usage: python scripts/make_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDEN = os.path.join(REPO, "tests", "golden")


def main() -> None:
    from ht_ner_spark import contract
    from ht_ner_spark.session import get_spark

    os.makedirs(GOLDEN, exist_ok=True)
    spark = get_spark("make-golden", cores=8, shuffle_partitions=16)

    for sf, tag in (("0.001", "sf0_001"), ("0.01", "sf0_01")):
        df = contract.q_hmm_entities(spark, f"/root/testdata/sf{sf}")
        rows = sorted((r["doc_id"], r["entities"]) for r in df.collect())
        t = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "entities": pa.array([r[1] for r in rows], pa.string()),
        })
        pq.write_table(t, os.path.join(GOLDEN, f"hmm_entities_{tag}.parquet"))
        print(f"hmm_entities_{tag}: {t.num_rows} rows")

    df = contract.q_media_features(spark, "/root/testdata/sf0.01")
    rows = sorted((r["media_id"], r["kind"], r["content_sha256"], r["n_bytes"])
                  for r in df.collect())
    t = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "content_sha256": pa.array([r[2] for r in rows], pa.string()),
        "n_bytes": pa.array([r[3] for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(GOLDEN, "media_features.parquet"))
    print(f"media_features: {t.num_rows} rows")
    spark.stop()


if __name__ == "__main__":
    main()
