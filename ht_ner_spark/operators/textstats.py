"""Text analysis for training-data curation: language-ID, quality scoring,
token counting, document fingerprinting. All pure column expressions
(whole-stage codegen; zero Python)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .antirules import STOPWORDS

# tiny per-language stopword profiles for the n-gram/stopword-hit heuristic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to", "in", "that", "for", "with", "a"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "des", "un", "une", "dans"],
}


def token_count(col: Column) -> Column:
    """whitespace token count (the cheap counter; the BPE-ish estimate below
    approximates subword counts without a tokenizer model)."""
    return F.size(F.split(F.trim(col), r"\s+"))


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token-count estimate: words + extra splits for long words
    (every 6 chars beyond the first 6) + punctuation runs — a deterministic
    stand-in for a real BPE vocab, good enough for budget accounting."""
    words = F.split(F.trim(col), r"\s+")
    word_cost = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + 1 + F.floor(F.greatest(F.length(w) - 1, F.lit(0)) / 6).cast("int"),
    )
    punct = F.size(F.regexp_extract_all(col, F.lit(r"[\p{P}\p{S}]"), 0))
    return (word_cost + punct).cast("long")


def quality_stats(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio, punct_ratio,
    upper_ratio, digit_ratio, quality_score) — the usual corpus-quality
    heuristics (length/punct/stopword ratios)."""
    c = F.col(text_col)
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n_toks = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*sorted(STOPWORDS))))
    n_chars = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^\p{P}\p{S}]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    uppers = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_toks.cast("long").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_toks, F.lit(1)), 4).alias("avg_token_len"),
        F.round(sw / F.greatest(n_toks, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(uppers / F.greatest(n_chars, F.lit(1)), 4).alias("upper_ratio"),
        F.round(digits / F.greatest(n_chars, F.lit(1)), 4).alias("digit_ratio"),
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .when(F.col("punct_ratio") > 0.3, 0.2)
        .otherwise(
            F.round(
                F.least(F.col("stopword_ratio") * 2, F.lit(1.0)) * 0.5
                + F.when((F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 12), 0.5)
                .otherwise(0.2),
                4,
            )
        )
    )
    return out.withColumn("quality_score", score)


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, hits): argmax over per-language stopword hit
    counts; ties broken by language code asc; no hits -> 'und'."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, lambda t: t.isin(*words))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_PROFILES.items())
        ]
    )
    best = F.array_sort(
        scores,
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].cast("long").alias("hits"),
    )


def document_fingerprint(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", stride: int = 5) -> DataFrame:
    """(doc_id, fingerprint): order-sensitive digest of every `stride`-th
    lower-cased token (winnowing-style sampled fingerprint, md5-portable)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sampled = F.filter(toks, lambda t, i: i % stride == 0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws("\x1f", sampled)).alias("fingerprint"),
    )
