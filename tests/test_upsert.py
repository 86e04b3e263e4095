"""Incremental KG upsert (operators/triples.upsert_triples): CDC status
tags, max-conf merge, exactly-one-row-per-key — plus the contract query's
portable md5 split exercising all three statuses."""
import pytest

from ht_ner_spark import contract as C
from ht_ner_spark.operators.triples import upsert_triples

SCHEMA = "subj string, pred string, obj string, conf double"


def test_statuses_and_merge(spark):
    existing = spark.createDataFrame(
        [("a", "p", "x", 0.6), ("a", "p", "x", 0.4),   # dup key, max = 0.6
         ("b", "p", "y", 0.9),
         ("c", "p", "z", 0.5)], SCHEMA)
    delta = spark.createDataFrame(
        [("a", "p", "x", 0.8),    # raises 0.6 -> updated
         ("b", "p", "y", 0.7),    # lower      -> unchanged
         ("d", "p", "w", 0.3)],   # absent     -> new
        SCHEMA)
    got = {(r["subj"], r["pred"], r["obj"]): (r["conf"], r["status"])
           for r in upsert_triples(existing, delta).collect()}
    assert got == {
        ("a", "p", "x"): (0.8, "updated"),
        ("b", "p", "y"): (0.9, "unchanged"),
        ("c", "p", "z"): (0.5, "unchanged"),   # untouched by delta
        ("d", "p", "w"): (0.3, "new"),
    }


def test_contract_split_covers_all_statuses(spark):
    out = C.q_kg_upsert(spark, "/root/testdata/sf0.001")
    counts = {r["status"]: r["n"] for r in
              out.groupBy("status").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"new", "updated", "unchanged"}
    assert all(v > 0 for v in counts.values())
    # key set == union of both sides' keys, one row each
    assert out.count() == out.select("subj", "pred", "obj").distinct().count()
