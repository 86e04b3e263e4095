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
