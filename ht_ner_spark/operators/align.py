"""AR6 (forward): word-level token/tag alignment to subword pieces.

Reference: ``tokenize_and_align_labels`` in
/root/reference/src/finetune.py:83-106 — HF ``word_ids()`` mapping with the
exact quirks mirrored here:

* special tokens (``word_idx is None`` — [CLS]/[SEP]) get label ``-100``
  (the ``padding_value``);
* the FIRST subtoken of each word gets the word's label id;
* continuation subtokens get the word's label id when ``label_all_tokens``
  (the reference's default) else ``-100``;
* the subtoken sequence is truncated to ``max_length`` INCLUDING the two
  specials (``truncation=True, max_length=512``).

The HF wordpiece tokenizer itself is a model artifact (not available in this
sandbox, SURVEY §7.0); a deterministic stand-in splits each word into fixed
``chunk``-char pieces, continuations carrying the BERT ``##`` marker — the
same convention ``functions/text.strip_subword_marker`` (T9) and the W2
adjacent-subtoken merge invert. Alignment semantics (what this operator
exists to verify at scale) are independent of the piece inventory.

Everything is pure within-row higher-order column expressions — narrow,
codegen'd, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# label-id vocabulary of the engine's binary BIO tag set (reference builds
# l2id from the dataset's label list, finetune.py:60-66; ours is fixed).
DEFAULT_L2ID = {"O": 0, "B-NAME": 1, "I-NAME": 2}
PAD_LABEL = -100


def subword_pieces(tok: Column, chunk: int = 4) -> Column:
    """array<string> of fixed-width pieces of one word; continuations carry
    the '##' marker. A word shorter than ``chunk`` is a single piece."""
    n = F.greatest(F.ceil(F.length(tok) / F.lit(chunk)).cast("int"), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.when(i == 0, F.substr(tok, F.lit(1), F.lit(chunk)))
        .otherwise(F.concat(F.lit("##"),
                            F.substr(tok, i * chunk + 1, F.lit(chunk)))),
    )


def align_labels_to_subtokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    tags_col: str = "tags",
    l2id: dict[str, int] | None = None,
    label_all_tokens: bool = True,
    max_len: int = 512,
    chunk: int = 4,
) -> DataFrame:
    """-> df + (subtokens: array<string>, label_ids: array<int>), aligned.

    Layout per row: [CLS] + up to ``max_len - 2`` word pieces + [SEP]; label
    ids follow the reference mapping above."""
    mapping = l2id or DEFAULT_L2ID
    id_map = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])

    pairs = F.zip_with(
        F.col(tokens_col), F.col(tags_col),
        lambda t, g: F.struct(subword_pieces(t, chunk).alias("p"),
                              g.alias("g")),
    )
    sub = F.flatten(F.transform(pairs, lambda x: x["p"]))
    # unknown tags -> PAD (the reference's l2id[x] would raise; our tag
    # vocabulary is closed so this branch is never taken on engine output)
    lab = F.flatten(F.transform(
        pairs,
        lambda x: F.transform(
            x["p"],
            lambda _pc, j: F.when(
                (j == 0) | F.lit(label_all_tokens),
                F.coalesce(id_map[x["g"]], F.lit(PAD_LABEL)),
            ).otherwise(F.lit(PAD_LABEL)).cast("int"),
        ),
    ))
    body = max_len - 2
    return df.withColumns({
        "subtokens": F.concat(F.array(F.lit("[CLS]")),
                              F.slice(sub, 1, body),
                              F.array(F.lit("[SEP]"))),
        "label_ids": F.concat(F.array(F.lit(PAD_LABEL).cast("int")),
                              F.slice(lab, 1, body),
                              F.array(F.lit(PAD_LABEL).cast("int"))),
    })
