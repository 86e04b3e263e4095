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


def test_pack_sequences_planted(spark):
    from ht_ner_spark.operators.packing import pack_sequences

    # one shard (n_shards=1), budget 10: docs of 4/8/3 tokens ->
    # starts 0, 4, 12 -> seqs 0, 0, 1; offsets 0, 4, 2
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g h i j k l"), (2, "m n o")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, budget=10, n_shards=1).collect()}
    assert (out[0]["seq_id"], out[0]["offset"]) == (0, 0)
    assert (out[1]["seq_id"], out[1]["offset"]) == (0, 4)  # straddles into 1
    assert (out[2]["seq_id"], out[2]["offset"]) == (1, 2)
    assert out[1]["n_tokens"] == 8

    # shards isolate cumsums: same docs over 2 shards restart at 0
    two = {r["doc_id"]: r for r in
           pack_sequences(docs, budget=10, n_shards=2).collect()}
    assert two[0]["shard"] != two[1]["shard"]
    assert two[1]["offset"] == 0                 # first doc of its shard


def test_quality_sample_deterministic(spark):
    from ht_ner_spark.operators.packing import quality_sample

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again") for i in range(50)]
        + [(100 + i, "!!!! #### $$$$ %%%%") for i in range(10)],   # junk docs
        "doc_id long, text string",
    )
    out = quality_sample(docs).collect()
    again = quality_sample(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    kept = {r["doc_id"] for r in out}
    # identical text -> identical keep_prob; draws differ by doc_id: the
    # good docs are mostly kept, junk docs mostly dropped (floor 0.25+)
    good_rate = len([d for d in kept if d < 100]) / 50
    junk_rate = len([d for d in kept if d >= 100]) / 10
    assert good_rate > junk_rate
    for r in out:
        assert r["draw"] < r["keep_prob"]


def test_cohens_kappa_planted(spark):
    from ht_ner_spark.operators.metrics import cohens_kappa

    # perfect agreement -> kappa 1.0
    rows = [(True, True)] * 30 + [(False, False)] * 70
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa"] == 1.0 and r["po"] == 1.0

    # exact independence (2x2 margins 50/50): po == pe -> kappa 0.0
    rows = ([(True, True)] * 25 + [(True, False)] * 25
            + [(False, True)] * 25 + [(False, False)] * 25)
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa"] == 0.0 and r["pe"] == 0.5
