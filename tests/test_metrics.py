"""Metric parity (SURVEY §5.5): Spark F1 port vs a literal reimplementation
of /root/reference/src/metrics.py on edge cases — 'N', empty, duplicates,
case, whitespace, multi-word entities, both ignore_duplicates modes."""

import math

import pytest

from ht_ner_spark.operators.metrics import f1_scores

from . import oracle

CASES = [
    # (truth, pred) '|'-encoded strings
    ("alice|bob", "alice|bob"),
    ("alice|bob", "bob|alice"),          # order-insensitive
    ("N", "N"),                            # both-empty sentinel
    ("N", "alice"),                        # pure FP
    ("alice", "N"),                        # pure FN
    ("", ""),
    ("Alice", "alice"),                    # case-folded match
    (" alice | bob ", "alice|bob"),        # whitespace strip
    ("alice|alice|bob", "alice"),          # duplicates in truth
    ("alice", "alice|alice"),              # duplicates in pred
    ("mary ann", "mary|ann"),              # multi-word: entity-level miss,
                                            # token-level hit
    ("alice|bob|carol", "alice|dave"),
    ("a.b|x", "a.b"),                       # tokenizer splits on punctuation
]


@pytest.mark.parametrize("ignore_duplicates", [True, False])
def test_f1_parity(spark, ignore_duplicates):
    truth = [t for t, _ in CASES]
    pred = [p for _, p in CASES]
    df = spark.createDataFrame(list(zip(truth, pred)), "truth string, pred string")
    got = f1_scores(df, "truth", "pred", ignore_duplicates=ignore_duplicates)
    want = oracle.f1_reference(truth, pred, ignore_duplicates=ignore_duplicates)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), (k, got[k], want[k])


def test_pairwise_cluster_metrics(spark):
    from ht_ner_spark.operators.metrics import pairwise_cluster_metrics

    # pred clusters {1:(a,b,c), 2:(d,e)}; gold {g1:(a,b), g2:(c,d,e)}
    assign = spark.createDataFrame(
        [("a", "1", "g1"), ("b", "1", "g1"), ("c", "1", "g2"),
         ("d", "2", "g2"), ("e", "2", "g2")],
        "item string, component_id string, gold string")
    r = pairwise_cluster_metrics(assign.select("component_id", "gold")) \
        .collect()[0]
    # pred pairs: C(3,2)+C(2,2)=4; gold pairs: C(2,2)+C(3,2)=4
    # tp pairs: cells (1,g1)=2 -> 1, (1,g2)=1 -> 0, (2,g2)=2 -> 1  => 2
    assert (r["n_items"], r["n_pred_clusters"], r["n_gold_clusters"]) \
        == (5, 2, 2)
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (2, 4, 4)
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["f1"] == 0.5


def test_pairwise_cluster_metrics_all_singletons(spark):
    from ht_ner_spark.operators.metrics import pairwise_cluster_metrics

    assign = spark.createDataFrame(
        [("1", "g1"), ("2", "g2")], "component_id string, gold string")
    r = pairwise_cluster_metrics(assign).collect()[0]
    # no pairs on either side -> NULL-guarded metrics, not a crash
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (0, 0, 0)
    assert r["precision"] is None and r["recall"] is None and r["f1"] is None


def test_source_accuracy_and_fusion(spark):
    from ht_ner_spark.operators.votes import fuse_labels, source_accuracy

    # items i1, i2: good (always right), flip (right on i1 only),
    # anti (always wrong vs majority)
    votes = spark.createDataFrame(
        [("i1", "good", "A"), ("i1", "flip", "A"), ("i1", "anti", "B"),
         ("i2", "good", "B"), ("i2", "flip", "A"), ("i2", "anti", "A")],
        "item string, src string, label string")
    # majority: i1 -> A (2-1); i2 -> A (2-1, 'A' < 'B' irrelevant: counts 2-1)
    acc = {r["src"]: r for r in
           source_accuracy(votes, ["item"]).collect()}
    assert acc["flip"]["accuracy"] == 1.0      # agrees with majority twice
    assert acc["good"]["accuracy"] == 0.5
    assert acc["anti"]["accuracy"] == 0.5
    assert acc["good"]["n_votes"] == 2 and acc["good"]["n_agree"] == 1

    fused = {r["item"]: r for r in fuse_labels(votes, ["item"]).collect()}
    # i1: A gets 1.0 + 0.5 = 1.5, B gets 0.5 -> A, score 0.75
    assert fused["i1"]["label"] == "A" and fused["i1"]["score"] == 0.75
    assert fused["i1"]["n_sources"] == 3
    # i2: A gets flip 1.0 + anti 0.5 = 1.5, B gets good 0.5 -> A, 0.75
    assert fused["i2"]["label"] == "A" and fused["i2"]["score"] == 0.75


def test_fusion_tiebreak_smallest_label(spark):
    from ht_ner_spark.operators.votes import fuse_labels

    votes = spark.createDataFrame(
        [("i", "s1", "Z"), ("i", "s2", "A")],
        "item string, src string, label string")
    # both sources 50% "accurate" (majority tie-break picks A; s2 agrees,
    # s1 disagrees -> acc 1.0 / 0.0) -> weighted: A=1.0, Z=0.0 -> A
    r = fuse_labels(votes, ["item"]).collect()[0]
    assert r["label"] == "A"
