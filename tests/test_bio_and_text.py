"""BIO transforms (AR1-AR4) vs literal reference behavior + property
round-trips; text scalar functions (T1/T5/T7) quirk checks."""

from pyspark.sql import functions as F

from ht_ner_spark.functions import bio
from ht_ner_spark.functions.text import (
    entities_to_string,
    preprocess,
    string_to_entities,
    truncate_words,
)


# literal ports of /root/reference/src/dataset.py:823-855 for the oracle side
def ref_toBIO(x):
    if x:
        new = ["O"] * len(x)
        new[0] = "O" if x[0] == "O" else "B-" + x[0]
        for i in range(1, len(x)):
            if x[i] != "O":
                new[i] = ("B-" if x[i - 1] != x[i] else "I-") + x[i]
        return new
    return x


def ref_fixBIO(x):
    if x:
        new = ["O"] * len(x)
        new[0] = "O" if x[0] == "O" else x[0].replace("I-", "B-")
        for i in range(1, len(x)):
            if x[i] == "O":
                continue
            if x[i - 1] != x[i] and "B-" not in x[i]:
                new[i] = x[i].replace("I-", "B-")
            else:
                new[i] = x[i]
        return new
    return x


def ref_toIO(x):
    return ["O" if y == "O" else "I-" + y for y in x] if x else x


TAG_CASES = [
    ["O", "NAME", "NAME", "O", "LOC"],
    ["NAME", "NAME", "LOC", "LOC", "O"],
    ["O", "O", "O"],
    ["NAME"],
    [],
    ["LOC", "O", "LOC", "LOC", "NAME", "NAME", "NAME"],
]
BIO_CASES = [
    ["I-NAME", "I-NAME", "O"],            # run starting with I- (fixBIO)
    ["B-NAME", "I-NAME", "I-NAME"],
    ["O", "I-LOC", "B-LOC", "I-LOC"],
    ["I-NAME"],
    [],
]


def _run(spark, cases, fn):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "id int, tags array<string>")
    out = df.select("id", fn(F.col("tags")).alias("r")).orderBy("id").collect()
    return [r["r"] for r in out]


def test_to_bio_matches_reference(spark):
    got = _run(spark, TAG_CASES, bio.to_bio)
    assert got == [ref_toBIO(c) for c in TAG_CASES]


def test_fix_bio_matches_reference(spark):
    got = _run(spark, BIO_CASES, bio.fix_bio)
    assert got == [ref_fixBIO(c) for c in BIO_CASES]


def test_to_io_matches_reference_including_prepend_quirk(spark):
    got = _run(spark, TAG_CASES + BIO_CASES, bio.to_io)
    assert got == [ref_toIO(c) for c in TAG_CASES + BIO_CASES]
    # the quirk: BIO input gets I- prepended verbatim
    assert ref_toIO(["B-NAME"]) == ["I-B-NAME"]


def test_project_label(spark):
    tags = [["O", "B-person-name", "I-person-name", "B-LOC"]]
    got = _run(spark, tags, lambda c: bio.project_label(c, "name", "NAME"))
    assert got == [["O", "B-NAME", "I-NAME", "O"]]


def test_entity_string_roundtrip(spark):
    df = spark.createDataFrame(
        [("alice|bob",), ("N",), ("",), (None,), (" A | b ",)], "s string"
    )
    out = df.select(
        string_to_entities("s").alias("ents"),
    ).withColumn("back", entities_to_string(F.col("ents"))).collect()
    assert out[0]["ents"] == ["alice", "bob"] and out[0]["back"] == "alice|bob"
    assert out[1]["ents"] == [] and out[1]["back"] == "N"
    assert out[2]["ents"] == [] and out[2]["back"] == "N"
    assert out[3]["ents"] == [] and out[3]["back"] == "N"
    assert out[4]["ents"] == ["a", "b"]


def test_preprocess_chain_quirks(spark):
    cases = [
        # contraction expansion keeps first char; 's removed by quote strip
        ("It's me", "It is me"),
        ("my name's Bob!!", "my name is Bob "),
        # reference quirk: 'its' matches inside words (no \b)
        ("bits", "bit is"),
        # html strip + punctuation class + repeated punct
        ("<b>hello</b> world?!...", " hello world "),
        ("a·b", "a b"),
    ]
    df = spark.createDataFrame(cases, "inp string, want string")
    got = df.select(preprocess("inp").alias("g"), "want").collect()
    for r in got:
        assert r["g"] == r["want"], (r["g"], r["want"])


def test_truncate_words_spaceless_char_count(spark):
    # reference quirk (src/openai_infer.py:18): count chars of first N words
    # EXCLUDING spaces -> truncation lands mid-way into the Nth word region
    df = spark.createDataFrame([("ab cd ef gh",)], "s string")
    got = df.select(truncate_words(F.col("s"), 3).alias("t")).collect()[0]["t"]
    text = "ab cd ef gh"
    n = sum(len(x) for x in text.split()[:3])
    assert got == text[:n]


def test_truecase_hook_gated_both_ways(spark):
    """T1 truecase is a config hook: absent library -> clear
    NotImplementedError; with use_truecase=False the chain is exactly
    preprocess() (the documented sandbox fallback)."""
    import pytest

    from ht_ner_spark.functions.text import (
        preprocess_with_config,
        truecase_udf,
    )

    try:
        import truecase  # noqa: F401

        have = True
    except ImportError:
        have = False

    if not have:
        with pytest.raises(NotImplementedError):
            truecase_udf()
    df = spark.createDataFrame([("It's <b>me</b>",)], "inp string")
    a = df.select(preprocess("inp").alias("g")).collect()[0]["g"]
    b = df.select(
        preprocess_with_config("inp", use_truecase=False).alias("g")
    ).collect()[0]["g"]
    assert a == b


class TestSubtokenAlign:
    """AR6 forward alignment (operators/align.py) — reference semantics of
    finetune.py:83-106 with the deterministic 4-char piece inventory."""

    def test_alignment_semantics(self, spark):
        import pandas as pd

        from ht_ner_spark.operators.align import align_labels_to_subtokens

        df = spark.createDataFrame(
            [
                (1, ["hello", "Alexandra", "ok"], ["O", "B-NAME", "O"]),
                (2, [], []),
            ],
            "row_id long, tokens array<string>, tags array<string>",
        )
        out = {r["row_id"]: r for r in
               align_labels_to_subtokens(df).collect()}
        r1 = out[1]
        # hello -> hell ##o ; Alexandra -> Alex ##andr ##a ; ok -> ok
        assert r1["subtokens"] == ["[CLS]", "hell", "##o", "Alex", "##andr",
                                   "##a", "ok", "[SEP]"]
        # label_all_tokens=True: continuations inherit the word's label id
        assert r1["label_ids"] == [-100, 0, 0, 1, 1, 1, 0, -100]
        assert out[2]["subtokens"] == ["[CLS]", "[SEP]"]
        assert out[2]["label_ids"] == [-100, -100]

    def test_first_subtoken_only_and_truncation(self, spark):
        from ht_ner_spark.operators.align import align_labels_to_subtokens

        df = spark.createDataFrame(
            [(1, ["Alexandra"] * 300, ["B-NAME"] * 300)],
            "row_id long, tokens array<string>, tags array<string>",
        )
        r = align_labels_to_subtokens(
            df, label_all_tokens=False).collect()[0]
        # 300 words x 3 pieces = 900 pieces -> truncated to 510 + specials
        assert len(r["subtokens"]) == 512 == len(r["label_ids"])
        assert r["subtokens"][0] == "[CLS]" and r["subtokens"][-1] == "[SEP]"
        # label_all_tokens=False: only first pieces carry the label
        body = r["label_ids"][1:-1]
        assert body[0] == 1 and body[1] == -100 and body[2] == -100
        assert body[3] == 1
