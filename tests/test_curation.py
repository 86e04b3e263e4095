"""Planted-case tests for the round-3 curation additions: Gopher-style
repetition signals, benchmark decontamination, KG negative sampling.
(The contract test cross-checks all three against DuckDB on driver data;
these pin the SEMANTICS on hand-built rows.)"""

from pyspark.sql import functions as F

from ht_ner_spark.operators.textstats import decontaminate, repetition_stats
from ht_ner_spark.operators.triples import negative_sample


def test_repetition_planted(spark):
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),          # all bigrams identical
            (1, "a b c d e"),                    # no repetition at all
            (2, "x y z x y z x y w"),            # dup trigrams: "x y z" x2
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}

    assert out[0]["top_bigram"] == "spam spam"
    assert out[0]["top_bigram_cnt"] == 3
    assert out[0]["top_bigram_frac"] == 1.0
    assert out[0]["dup_trigram_frac"] == 1.0   # both trigrams are the same

    assert out[1]["top_bigram"] == "a b"       # all cnt 1 -> tie, gram asc
    assert out[1]["top_bigram_frac"] == 0.25
    assert out[1]["dup_trigram_frac"] == 0.0

    # doc 2: 8 bigrams, "x y" appears 3x; of 7 trigrams, "x y z"/"y z x"/
    # "z x y" each appear twice -> 6 of 7 trigram slots are duplicates
    assert out[2]["top_bigram"] == "x y"
    assert out[2]["top_bigram_cnt"] == 3
    assert out[2]["dup_trigram_frac"] == round(6 / 7, 4)


def test_repetition_short_doc_absent(spark):
    docs = spark.createDataFrame([(0, "solo"), (1, "a b")],
                                 "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert 0 not in rows            # <2 tokens: no bigram, documented absent
    assert rows[1]["top_bigram"] == "a b"
    assert rows[1]["dup_trigram_frac"] == 0.0  # no trigram -> 0/1 guard


def test_decontaminate_planted(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (0, "intro quick brown fox jumps outro"),  # shares 1 4-gram
            (1, "totally clean document here now"),    # shares none
            (2, "the quick brown fox jumps again"),    # shares 2 4-grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, ev, n=4).collect()}
    assert set(out) == {0, 2}                  # clean doc drops out
    assert out[0]["shared_grams"] == 1
    assert out[0]["total_grams"] == 3
    assert out[0]["contamination"] == round(1 / 3, 4)
    assert out[2]["shared_grams"] == 2


def test_negative_sample_planted(spark):
    triples = spark.createDataFrame(
        [("s1", "p", "a"), ("s2", "p", "b"), ("s3", "p", "c"),
         ("s4", "q", "a"), ("s5", "q", "c")],
        "subj string, pred string, obj string",
    )
    out = negative_sample(triples).collect()
    vocab = {"a", "b", "c"}
    assert 0 < len(out) <= 5                   # self-draws are dropped
    for r in out:
        assert r["neg_obj"] in vocab
        assert r["neg_obj"] != r["obj"]
    # deterministic: a second run returns the identical set
    again = negative_sample(triples).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
