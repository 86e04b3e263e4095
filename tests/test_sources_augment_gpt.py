"""S8 file readers, AR7 augmentation, T8 GPT-response parsing — each vs a
faithful pure-Python port of the reference logic."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ht_ner_spark.functions.text import parse_gpt_response
from ht_ner_spark.operators.augment import substitute_tag_runs
from ht_ner_spark.sources.conll import read_conll, read_wikiner


def _ref_parse(content: str):
    """Literal port of /root/reference/src/openai_infer.py:41-101."""
    try:
        name, location = content.split("Locations: ")
        location, social = location.split("Social: ")
        name = name.strip().replace("Names: ", "").replace("\n", "|").replace(", ", "|")
        location = location.strip().replace("Locations: ", "").replace("\n", "|").replace(", ", "|")
        social = social.strip().replace("Social: ", "").replace("\n", "|").replace(", ", "|")
        if name == "N":
            name = ""
        if location == "N":
            location = ""
        if social == "N":
            social = ""
    except Exception:
        name, location, social = "", "", ""
        for line in content.split("\n"):
            if "Names: " in line:
                name += line.replace("Names: ", "")
            elif "Locations: " in line:
                location += line.replace("Locations: ", "")
            elif "Social: " in line:
                social += line.replace("Social: ", "")
            elif not line:
                pass
            else:
                break
            if name == "N":
                name = ""
            if location == "N":
                location = ""
            if social == "N":
                social = ""
    return name, location, social


GPT_CASES = [
    "Names: alice, bob\nLocations: NYC\nSocial: @al",          # happy
    "Names: N\nLocations: N\nSocial: N",                        # all-N happy
    "Names: x\nLocations: a Locations: b\nSocial: s",           # 3-way split -> fallback
    "I'm sorry, but as an AI language model I cannot.",         # no headers
    "Names: carol\n\nLocations: berlin\ngarbage line\nSocial: @c",  # break quirk
    "Names: N\nLocations: rome\nSocial: N\nextra Social: x",    # 3-way social
    "",
]


def test_gpt_parse_matches_reference_port(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(GPT_CASES)], "i long, content string")
    got = {
        r["i"]: (r["p"]["name"], r["p"]["location"], r["p"]["social"])
        for r in df.select("i", parse_gpt_response("content").alias("p")).collect()
    }
    for i, c in enumerate(GPT_CASES):
        assert got[i] == _ref_parse(c), (i, c, got[i], _ref_parse(c))


def test_read_conll(spark, tmp_path):
    p = tmp_path / "a.conll"
    p.write_text("Alice\tB-PER\nruns\tO\n\nBob\tB-PER\nsleeps\tO\nnow\tO\n")
    df = read_conll(spark, str(p))
    rows = {r["doc_idx"]: (r["tokens"], r["tags"]) for r in df.collect()}
    assert rows[0] == (["Alice", "runs"], ["B-PER", "O"])
    assert rows[1] == (["Bob", "sleeps", "now"], ["B-PER", "O", "O"])


def test_read_wikiner(spark, tmp_path):
    p = tmp_path / "w.txt"
    p.write_text("Alice|NNP|B-PER runs|VBZ|O\n\nBob|NNP|B-PER\n")
    df = read_wikiner(spark, str(p))
    got = {tuple(r["tokens"]): (r["pos_tags"], r["ner_tags"]) for r in df.collect()}
    assert got[("Alice", "runs")] == (["NNP", "VBZ"], ["B-PER", "O"])
    assert got[("Bob",)] == (["NNP"], ["B-PER"])


def test_substitute_tag_runs(spark):
    df = spark.createDataFrame(
        [
            (0, ["I", "saw", "New", "York", "today"], ["O", "O", "B-LOC", "I-LOC", "O"]),
            (1, ["no", "locs", "here"], ["O", "O", "O"]),
            (2, ["Main", "St", "and", "Oak", "Ave"], ["B-LOC", "I-LOC", "O", "B-LOC", "I-LOC"]),
        ],
        "row_id long, tokens array<string>, tags array<string>",
    )
    reps = ["Elm Street", "Baker Road"]
    out = {r["row_id"]: (r["aug_tokens"], r["aug_tags"])
           for r in substitute_tag_runs(df, reps).collect()}
    # row 0: one run replaced; surrounding tokens unchanged
    toks0, tags0 = out[0]
    assert toks0[:2] == ["I", "saw"] and toks0[-1] == "today"
    assert " ".join(toks0[2:-1]) in reps
    assert tags0[2] == "B-LOC" and all(t == "I-LOC" for t in tags0[3:-1])
    # row 1: untouched
    assert out[1] == (["no", "locs", "here"], ["O", "O", "O"])
    # row 2: two separate runs, each replaced; determinism: same input -> same output
    out2 = {r["row_id"]: (r["aug_tokens"], r["aug_tags"])
            for r in substitute_tag_runs(df, reps).collect()}
    assert out == out2


def test_read_wikiner_bz2(spark, tmp_path):
    """S8 bz2 variant (reference reads aij-wikiner-*.bz2 via bz2.open):
    Hadoop's codec decompresses transparently — same reader, same rows."""
    import bz2

    body = "The|DT|O Alps|NNP|B-LOC rise|VB|O\nSee|VB|O Paris|NNP|B-LOC\n"
    p = tmp_path / "aij-wikiner-en.bz2"
    p.write_bytes(bz2.compress(body.encode()))
    df = read_wikiner(spark, str(p))
    rows = {tuple(r["tokens"]): tuple(r["ner_tags"]) for r in df.collect()}
    assert rows == {
        ("The", "Alps", "rise"): ("O", "B-LOC", "O"),
        ("See", "Paris"): ("O", "B-LOC"),
    }


def test_hf_loader_gated(spark):
    import pytest

    from ht_ner_spark.sources.conll import load_hf_dataset

    try:
        import datasets  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            load_hf_dataset(spark, "conll2003")
