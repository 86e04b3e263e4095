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
