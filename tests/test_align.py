"""AR6: wordpiece label alignment vs a direct port of the reference loop."""
import pytest

from ht_ner_spark.operators.align import align_labels_to_subtokens

pytestmark = pytest.mark.usefixtures("spark")


def _fake_wordpiece(word: str, piece_len: int = 4) -> list[str]:
    """The engine's deterministic subword stand-in (align.py docstring)."""
    if len(word) <= piece_len:
        return [word]
    chunks = [word[i:i + piece_len] for i in range(0, len(word), piece_len)]
    return [chunks[0]] + ["##" + c for c in chunks[1:]]


def _reference_align(tokens, labels, l2id, label_all_tokens=True,
                     max_length=512, piece_len=4, padding_value=-100):
    """Direct port of finetune.py:83-106 `tokenize_and_align_labels` over
    the stand-in tokenizer: build word_ids() (None for specials), then the
    reference's first-piece / continuation / padding loop, truncating the
    body to max_length-2 before appending [SEP]."""
    pieces, word_ids = [], []
    for i, w in enumerate(tokens):
        for p in _fake_wordpiece(w, piece_len):
            pieces.append(p)
            word_ids.append(i)
    pieces, word_ids = pieces[:max_length - 2], word_ids[:max_length - 2]
    pieces = ["[CLS]"] + pieces + ["[SEP]"]
    word_ids = [None] + word_ids + [None]
    label_ids, prev = [], None
    for wid in word_ids:
        if wid is None:
            label_ids.append(padding_value)
        elif wid != prev:
            label_ids.append(l2id[labels[wid]])
        else:
            label_ids.append(
                l2id[labels[wid]] if label_all_tokens else padding_value)
        prev = wid
    return pieces, word_ids, label_ids


CASES = [
    # short words, no continuations
    (["Bob", "ran"], ["B-NAME", "O"]),
    # long word -> continuation pieces
    (["Alexandria", "visited", "Rome"], ["B-NAME", "O", "B-NAME"]),
    # multi-word entity: B- then I-
    (["Mary", "Ann", "Lee", "slept"], ["B-NAME", "I-NAME", "I-NAME", "O"]),
    # empty document
    ([], []),
]


@pytest.mark.parametrize("label_all_tokens", [True, False])
def test_alignment_matches_reference_loop(spark, label_all_tokens):
    from ht_ner_spark.operators.align import DEFAULT_L2ID

    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(CASES)],
        "doc_id long, tokens array<string>, labels array<string>",
    )
    out = {
        r["doc_id"]: r for r in
        align_labels_to_subtokens(
            df, labels_col="labels", label_all_tokens=label_all_tokens).collect()
    }
    for i, (toks, labs) in enumerate(CASES):
        want = _reference_align(toks, labs, DEFAULT_L2ID,
                                label_all_tokens=label_all_tokens)
        got = (out[i]["subtokens"], out[i]["word_ids"], out[i]["label_ids"])
        assert got == want, f"case {i} label_all_tokens={label_all_tokens}"


def test_truncation_caps_body_and_keeps_sep(spark):
    from ht_ner_spark.operators.align import DEFAULT_L2ID

    toks = ["word%04d" % i for i in range(400)]  # 8 chars -> 2 pieces each
    labs = ["O"] * 400
    df = spark.createDataFrame(
        [(0, toks, labs)],
        "doc_id long, tokens array<string>, labels array<string>")
    row = align_labels_to_subtokens(df, labels_col="labels", max_length=512).collect()[0]
    want = _reference_align(toks, labs, DEFAULT_L2ID, max_length=512)
    assert (row["subtokens"], row["word_ids"], row["label_ids"]) == want
    assert len(row["subtokens"]) == 512
    assert row["subtokens"][0] == "[CLS]" and row["subtokens"][-1] == "[SEP]"
