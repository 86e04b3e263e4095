"""AR6: training-side wordpiece label alignment (tokenize_and_align_labels).

Re-expresses the reference's HF label alignment (finetune.py:83-106) as pure
column expressions: given word-level ``tokens`` + ``labels`` arrays, emit the
wordpiece sequence, the HF ``word_ids()`` mapping, and the aligned label-id
sequence with the reference's exact semantics —

* special tokens ([CLS]/[SEP]) -> ``padding_value`` (-100) and a null
  word_id (``word_ids()`` yields None there);
* the FIRST piece of each word -> that word's label id;
* continuation pieces -> the label id when ``label_all_tokens`` (the
  reference's default) else ``padding_value``;
* truncation to ``max_length`` INCLUDING the two specials
  (HF ``truncation=True``: body capped at max_length-2, then [SEP]).

The subword split itself is model-specific (the HF tokenizer is an
import-gated dependency, SURVEY §7.0), so this module uses the engine's
deterministic stand-in — fixed-width ``piece_len`` chunks with '##'
continuation markers, wordpiece-style — which makes the alignment logic
(the part the reference implements by hand) fully oracle-checkable. A
production deployment swaps ``tokenizer.word_ids()`` in via the same
mapInPandas harness as M1; the alignment columns here are tokenizer-
agnostic given (pieces, word_ids).

Zero UDFs and zero shuffles: transform / flatten / slice / concat only —
the whole operator is a single Project at any corpus size.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_L2ID = {"O": 0, "B-NAME": 1, "I-NAME": 2}
PADDING_VALUE = -100  # reference finetune.py:80 (non-GP structures)


def align_labels_to_subtokens(
    df: DataFrame,
    tokens_col: str = "tokens",
    labels_col: str = "tags",
    l2id: dict[str, int] | None = None,
    label_all_tokens: bool = True,
    max_length: int = 512,
    piece_len: int = 4,
    padding_value: int = PADDING_VALUE,
    cls_token: str = "[CLS]",
    sep_token: str = "[SEP]",
) -> DataFrame:
    """Adds ``subtokens``, ``word_ids``, ``label_ids`` array columns.

    ``word_ids[k]`` is the 0-based source-word index of piece k (null for
    specials) — the exact contract of HF ``word_ids()`` the reference's
    alignment loop consumes.
    """
    l2id = DEFAULT_L2ID if l2id is None else l2id
    lmap = F.create_map(
        *[F.lit(x) for k in sorted(l2id) for x in (k, l2id[k])]
    )
    toks, labs = F.col(tokens_col), F.col(labels_col)

    def word_items(w: Column, i: Column) -> Column:
        n_pieces = F.greatest(
            F.lit(1), F.ceil(F.length(w) / F.lit(piece_len))
        ).cast("int")
        lab_id = F.coalesce(
            F.element_at(lmap, F.element_at(labs, i + 1)),
            F.lit(padding_value),
        )

        def piece(j: Column) -> Column:
            first = j == 1
            raw = w.substr((j - 1) * piece_len + 1, F.lit(piece_len))
            return F.struct(
                F.when(first, raw).otherwise(F.concat(F.lit("##"), raw))
                .alias("piece"),
                i.cast("int").alias("word_id"),
                (lab_id if label_all_tokens
                 else F.when(first, lab_id).otherwise(F.lit(padding_value)))
                .cast("int").alias("label_id"),
            )

        return F.transform(F.sequence(F.lit(1), n_pieces), piece)

    special = lambda tok: F.struct(  # noqa: E731 - tiny local factory
        F.lit(tok).alias("piece"),
        F.lit(None).cast("int").alias("word_id"),
        F.lit(padding_value).cast("int").alias("label_id"),
    )
    body = F.slice(
        F.flatten(F.transform(toks, word_items)), 1, max_length - 2
    )
    items = F.concat(
        F.array(special(cls_token)), body, F.array(special(sep_token))
    )
    return df.withColumn("_items", items).select(
        "*",
        F.transform("_items", lambda x: x["piece"]).alias("subtokens"),
        F.transform("_items", lambda x: x["word_id"]).alias("word_ids"),
        F.transform("_items", lambda x: x["label_id"]).alias("label_ids"),
    ).drop("_items")
