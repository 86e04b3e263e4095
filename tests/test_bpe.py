"""BPE vocabulary induction: planted-corpus semantics + fold edge cases.
(The contract test cross-checks the full merge table against the DuckDB
round-replay oracle; these pin the greedy-merge semantics by hand.)"""

from pyspark.sql import functions as F

from ht_ner_spark.operators.bpe import _merge_adjacent, train_bpe


def test_merge_adjacent_fold(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],), ([],)],
        "syms array<string>",
    )
    out = [r[0] for r in df.select(
        _merge_adjacent(F.col("syms"), F.lit("a"), F.lit("a")).alias("m")
    ).collect()]
    assert out[0] == ["aa", "a"]          # leftmost non-overlapping
    out2 = [r[0] for r in df.select(
        _merge_adjacent(F.col("syms"), F.lit("a"), F.lit("b")).alias("m")
    ).collect()]
    assert out2[1] == ["ab", "ab"]
    assert out2[2] == ["x"] and out2[3] == []


def test_train_bpe_planted(spark):
    # "banana" x3, "bandana" x1: round-1 winner is ('a','n') freq 3*2+1*2=8
    docs = spark.createDataFrame(
        [(0, "banana banana banana bandana")], "doc_id long, text string"
    )
    out = {r["merge_rank"]: r for r in train_bpe(docs, merges=2).collect()}
    assert (out[1]["lhs"], out[1]["rhs"], out[1]["merged"]) == ("a", "n", "an")
    # word frequency weighting: banana has freq 3 but is ONE vocab entry
    # contributing 2 'an' pairs * freq 3 = 6; bandana adds 2 * 1 = 2
    assert out[1]["pair_freq"] == 8
    # round 2 over merged symbols: banana -> [b,an,an,a] (freq 3),
    # bandana -> [b,an,d,an,a]. ('b','an') and ('an','a') tie at 4;
    # tie-break lhs ASC: 'an' < 'b' -> ('an','a') wins
    assert (out[2]["lhs"], out[2]["rhs"], out[2]["merged"]) == ("an", "a", "ana")
    assert out[2]["pair_freq"] == 4


def test_bpe_encode_planted(spark):
    from ht_ner_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(0, "banana banana"), (1, "bandana nab")], "doc_id long, text string"
    )
    # merges learned elsewhere: (a,n) then (an,a)
    out = {r["doc_id"]: r for r in
           bpe_encode(docs, [("a", "n"), ("an", "a")]).collect()}
    # banana -> [b,an,an,a] -> [b,an,ana] = 3 tokens each, 2 words
    assert (out[0]["n_words"], out[0]["n_bpe_tokens"]) == (2, 6)
    # bandana -> [b,an,d,an,a] -> [b,an,d,ana] = 4; nab -> [n,a,b] (no 'an')
    assert (out[1]["n_words"], out[1]["n_bpe_tokens"]) == (2, 7)
