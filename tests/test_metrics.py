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
