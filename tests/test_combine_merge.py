"""J5 combiner, A11 product merge, P8 threshold band, W2 adjacency merge —
vs hand-computed / oracle expectations."""

import math

from pyspark.sql import functions as F

from ht_ner_spark.operators.combine import combine_dict_rule, confidence_filter, product_merge
from ht_ner_spark.operators.merge import merge_adjacent

from . import oracle

MENTION_SCHEMA = (
    "row_id long, lf_name string, begin int, end int, surface string, "
    "label string, base_conf double, confidence double"
)


def test_combine_dict_rule_matches_reference_set_algebra(spark):
    # keyed by (text, begin): both-fired -> 0.5d+0.5r; one-fired -> 0.5conf
    d_rows = [(0, "dict", 1, 2, "alice", "PERSON_NAME", 0.9, 0.9),
              (0, "dict", 5, 6, "bob", "PERSON_NAME", 0.8, 0.8)]
    r_rows = [(0, "rule0", 1, 2, "alice", "PERSON_NAME", 0.5, 0.5),
              (0, "rule4", 9, 10, "carol", "PERSON_NAME", 0.67, 0.67)]
    d = spark.createDataFrame(d_rows, MENTION_SCHEMA)
    r = spark.createDataFrame(r_rows, MENTION_SCHEMA)
    got = {
        (row["surface"], row["begin"]): row["base_conf"]
        for row in combine_dict_rule(d, r).collect()
    }
    want = oracle.compute_combined(
        {("alice", 1): 0.9, ("bob", 5): 0.8},
        {("alice", 1): 0.5, ("carol", 9): 0.67},
    )
    want = {(s, b): c for (s, b), c in want.items()}
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k]), (k, got[k], want[k])


def test_product_merge_multiplies_duplicates(spark):
    rows = [
        (0, "x", 1, 2, "alice", "PERSON_NAME", 0.5, 0.0),
        (0, "x", 1, 2, "alice", "PERSON_NAME", 0.4, 0.0),
        (0, "x", 3, 4, "bob", "PERSON_NAME", 0.0, 0.0),  # zero guard
    ]
    df = spark.createDataFrame(
        rows,
        "row_id long, lf_name string, begin int, end int, surface string, "
        "label string, base_conf double, fill_mask_conf double",
    )
    got = {
        (r["surface"], r["begin"]): (r["base_conf"], r["n_occurrences"])
        for r in product_merge(df).collect()
    }
    assert math.isclose(got[("alice", 1)][0], 0.2)
    assert got[("alice", 1)][1] == 2
    assert got[("bob", 3)][0] == 0.0


def test_confidence_filter_band(spark):
    rows = [(0, "alice", 1, 0.5, 0.3), (0, "bob", 2, 0.9, 0.9), (0, "c", 3, 0.1, 0.0)]
    df = spark.createDataFrame(
        rows, "row_id long, surface string, begin int, base_conf double, fill_mask_conf double"
    )
    # confidence = 0.5*base + 0.5*fm: alice .4, bob .9, c .05
    keep = confidence_filter(df, 0.35).select("surface").collect()
    assert {r["surface"] for r in keep} == {"alice", "bob"}
    band = confidence_filter(df, 0.35, add_bound=0.1, upper_bound=True).collect()
    assert {r["surface"] for r in band} == {"alice"}


def test_merge_adjacent_islands(spark):
    # reference: merge when start == prev end (finetune_evaluation_HT.py:109-122)
    rows = [
        (0, 0, 2, "Al", 0.9),
        (0, 2, 4, "ic", 0.8),
        (0, 4, 5, "e", 0.7),
        (0, 10, 13, "Bob", 0.6),
        (1, 0, 3, "Eve", 0.5),
    ]
    df = spark.createDataFrame(rows, "row_id long, start int, end int, word string, score double")
    got = {
        (r["row_id"], r["start"], r["end"], r["word"], r["score"])
        for r in merge_adjacent(df).collect()
    }
    assert got == {
        (0, 0, 5, "Alice", 0.9),   # score of first fragment kept
        (0, 10, 13, "Bob", 0.6),
        (1, 0, 3, "Eve", 0.5),
    }
