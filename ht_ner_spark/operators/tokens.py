"""Token views over the corpus.

The reference's central IR is a spacy Doc (token sequence); ours is a pair of
DataFrames derived once and reused by every LF (the reference re-tokenizes per
LF — /root/reference/sweet/labeling_functions.py re-runs matchers per doc per
annotator; we tokenize exactly once per corpus pass):

* ``with_tokens(corpus)``  -> corpus + ``tokens: array<string>``
* ``token_view(tokens_df)`` -> exploded ``(row_id, pos, tok)`` — the shape all
  positional/caps/frequency LFs consume.

Both are narrow (no shuffle); the exploded view fan-out is columnar and feeds
whole-stage-codegen predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import TOKEN_PATTERN, tokenize


def with_tokens(corpus: DataFrame, text_col: str = "content",
                pattern: str = TOKEN_PATTERN) -> DataFrame:
    return corpus.withColumn("tokens", tokenize(text_col, pattern))


def token_view(tokens_df: DataFrame) -> DataFrame:
    """(row_id, pos, tok, n_toks) — pos is 0-based like spacy token.i."""
    return tokens_df.select(
        "row_id",
        F.size("tokens").alias("n_toks"),
        F.posexplode("tokens").alias("pos", "tok"),
    )


def char_token_view(corpus: DataFrame, text_col: str = "content",
                    pattern: str = TOKEN_PATTERN) -> DataFrame:
    """(row_id, pos, tok, char_start, char_end) — the token view WITH
    character offsets (Entity.begin_offset semantics,
    /root/reference/sweet/neat_base_classes.py:33-34). Regex match offsets
    are not relationally derivable, so this is ONE Arrow pass (finditer);
    the fused stage-1 path gets the same offsets inside its own single pass
    and never needs this view — it exists for the composed/oracle path."""
    import re
    from typing import Iterator

    import pandas as pd

    tok_re = re.compile(pattern)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row_id, text in zip(pdf["row_id"], pdf[text_col]):
                for pos, m in enumerate(tok_re.finditer(text or "")):
                    rows.append((int(row_id), pos, m.group(0),
                                 m.start(), m.end()))
            yield pd.DataFrame(
                rows, columns=["row_id", "pos", "tok", "char_start", "char_end"]
            ).astype({"row_id": "int64", "pos": "int32",
                      "char_start": "int32", "char_end": "int32"})

    return corpus.select("row_id", text_col).mapInPandas(
        run, "row_id long, pos int, tok string, char_start int, char_end int"
    )


def attach_char_offsets(mentions: DataFrame, ctv: DataFrame) -> DataFrame:
    """mentions (token spans begin/end) + char_token_view -> + begin_char/
    end_char. Two row_id-co-partitioned equi-joins (begin token's start,
    (end-1) token's end) — composed-path only; the fused path emits offsets
    inline."""
    b = ctv.select("row_id", F.col("pos").alias("begin"),
                   F.col("char_start").alias("begin_char"))
    e = ctv.select("row_id", (F.col("pos") + 1).alias("end"),
                   F.col("char_end").alias("end_char"))
    return (
        mentions.join(b, ["row_id", "begin"], "left")
        .join(e, ["row_id", "end"], "left")
    )
