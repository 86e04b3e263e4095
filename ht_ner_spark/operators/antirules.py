"""A1/W6: corpus-frequency antirules.

Reference (/root/reference/sweet/create_lfs.py:17-34 +
sweet/labeling_functions.py:135-143): Counter over all non-stop, non-punct
token texts; sort by count descending (Counter.most_common tie-break =
first-seen order); FrequencyDetector(threshold t) labels any token whose text
is in the top ``int(V * t)`` of that ranking as NOT_NAME, for
t in {0.01, 0.02, 0.03, 0.04, 0.05}.

Spark shape: explode -> filter -> groupBy(token).count() (map-side partial agg
makes this one cheap shuffle) -> row_number window ordered by
(count DESC, first_seen ASC) — the deterministic stand-in for Counter's
insertion-order tie-break, replicated by the oracle — -> top-k cut. The
ranked list is tiny (vocabulary-sized) and is broadcast back as the
anti-dimension; votes come from a broadcast semi-join, so the whole operator
costs one aggregation shuffle regardless of corpus size.

spacy is_stop/is_punct are approximated with a fixed stopword set + an
all-punctuation regex (deviation shared with the oracle, SURVEY §7.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THRESHOLDS = [0.01, 0.02, 0.03, 0.04, 0.05]

# the non-stop, non-punct predicate — shared verbatim by the exploded-view
# aggregate (filter before agg) and the Arrow-partial aggregate (filter on
# the vocabulary-sized result; equivalent for a per-key predicate), so the
# JVM regex semantics are identical on both paths
def _freq_filter_expr():
    return ((~F.lower("tok").isin(list(STOPWORDS)))
            & (~F.col("tok").rlike(PUNCT_REGEX)))

# compact subset of spacy's English stop list — fixed so engine and oracle
# share it exactly (tests/oracle.py imports this).
STOPWORDS = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "had", "has", "have", "he", "her", "his", "i", "in", "is", "it", "its",
    "me", "my", "no", "not", "of", "on", "or", "our", "she", "that", "the",
    "their", "them", "they", "this", "to", "was", "we", "were", "when",
    "which", "who", "will", "with", "you", "your", "after", "about", "all",
    "am", "been", "before", "between", "both", "can", "do", "does", "down",
    "during", "each", "few", "more", "most", "other", "out", "over", "own",
    "same", "so", "some", "such", "than", "then", "there", "these", "those",
    "through", "under", "until", "up", "very", "what", "where", "while",
    "why", "how", "if", "into", "just", "now", "only", "said", "say", "see",
}

PUNCT_REGEX = r"^[\p{P}\p{S}]+$"


def word_frequency_agg(token_view: DataFrame) -> DataFrame:
    """(tok, cnt, first_seen) — the frequency aggregation WITHOUT the global
    rank (one hash-agg shuffle). The pipeline ranks driver-side when the
    vocabulary fits its broadcast budget; word_frequency() below adds the
    distributed exact rank for the oversized case.

    ``first_seen`` is the lexicographic MIN of struct(row_id, pos) — the
    global first occurrence. A struct min (not an arithmetic encoding like
    ``row_id * 2^20 + pos``): multi-MB web/code documents exceed 2^20 tokens,
    and real corpus row_ids are xxhash64 values whose multiplication
    overflows a long (an error under Spark 4 ANSI mode, silent drift
    otherwise). Struct comparison is exact at any document length or id."""
    filtered = token_view.where(_freq_filter_expr())
    return filtered.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(
            F.struct(F.col("row_id").alias("r"),
                     F.col("pos").cast("long").alias("p"))
        ).alias("first_seen"),
    )


def word_frequency_agg_arrow(corpus: DataFrame, text_col: str = "content",
                             pattern: str | None = None) -> DataFrame:
    """word_frequency_agg computed from the corpus via an Arrow partial
    aggregation — row-set identical output ON ASCII TEXT (see the
    equivalence-domain note below), one corpus scan, no 25x token explode
    through the JVM regex engine.

    EQUIVALENCE DOMAIN (round-5 clarification, per the round-4 advisor):
    this path tokenizes with Python ``re`` — Unicode ``\\w``/``\\s``
    semantics, the same semantics as the reference's nltk
    RegexpTokenizer (/root/reference/src/preprocess/human_trafficking.py
    tokenizes with Python re), so THIS path is the reference-faithful
    one and the engine's default (PipelineConfig.freq_impl='vector').
    The relational twin (word_frequency_agg over token_view) tokenizes
    with JVM regexp_extract_all — ASCII ``\\w``/``\\s`` — so the two
    DIVERGE on non-ASCII text: 'café' is one token here but
    ['caf', 'é'] in the JVM, and NBSP separates tokens only here. The
    row-set-identity claim and test_word_frequency_agg_arrow_parity
    hold on ASCII corpora (the synthetic corpus is ASCII);
    test_word_frequency_tokenizer_divergence_non_ascii pins the
    non-ASCII divergence as an explicit, tested deviation with the
    Python side authoritative.

    The JVM path pays regexp_extract_all + posexplode over every token
    (~25 rows materialized per document) before its hash aggregate; this
    path tokenizes each Arrow batch with the C-level findall + factorize
    machinery (operators/fused_vec.tokenize_batch — the same tokenizer the
    fused labeler uses, so the two stage-1 passes cannot drift from each
    other) and emits ONE partial row per DISTINCT token per batch:
    (tok, cnt, r, p) with (r, p) the VALUE-minimum (row_id, pos) — two
    np.minimum.at passes, not scan order, because row_ids are not sorted
    within a batch on a real corpus. The final groupBy sums counts and
    min-merges the structs; the stopword/punctuation filter then runs on
    the VOCABULARY-sized frame with the exact same Spark expressions as
    word_frequency_agg (filter-then-agg == agg-then-filter for a per-key
    predicate), so JVM regex semantics (\\p{P}\\p{S}) are preserved
    bit-for-bit. Measured at 2M rows: the s1_freq stage's scan cost drops
    ~3x (the aggregate itself was already vocabulary-sized).
    tests/test_fused_vec.py::test_word_frequency_agg_arrow_parity holds
    the two row-set identical."""
    import re as _re

    from ..functions.text import TOKEN_PATTERN as _TP

    tok_re = _re.compile(pattern or _TP)

    def partials(batches):
        import numpy as np
        import pandas as pd

        from .fused_vec import tokenize_batch

        for pdf in batches:
            rid_tok, pos, _n, _s, _e, _tok, codes, uniques = tokenize_batch(
                pdf["row_id"].to_numpy(), list(pdf[text_col]), tok_re)
            if len(codes) == 0:
                yield pd.DataFrame({"tok": pd.Series(dtype=object),
                                    "cnt": pd.Series(dtype="int64"),
                                    "r": pd.Series(dtype="int64"),
                                    "p": pd.Series(dtype="int64")})
                continue
            nu = len(uniques)
            cnt = np.bincount(codes, minlength=nu).astype("int64")
            # value-min of (row_id, pos) per unique: min row_id first,
            # then min pos among that token's occurrences in that row
            min_r = np.full(nu, np.iinfo(np.int64).max)
            np.minimum.at(min_r, codes, rid_tok)
            at_min = rid_tok == min_r[codes]
            min_p = np.full(nu, np.iinfo(np.int64).max)
            np.minimum.at(min_p, codes[at_min], pos[at_min])
            yield pd.DataFrame({"tok": np.asarray(uniques, dtype=object),
                                "cnt": cnt, "r": min_r, "p": min_p})

    part = corpus.select("row_id", text_col).mapInPandas(
        partials, "tok string, cnt long, r long, p long")
    agg = part.groupBy("tok").agg(
        F.sum("cnt").alias("cnt"),
        F.min(F.struct(F.col("r"), F.col("p"))).alias("first_seen"),
    )
    return agg.where(_freq_filter_expr())


def word_frequency(token_view: DataFrame) -> DataFrame:
    """(tok, cnt, first_seen, rank) over non-stop, non-punct tokens.
    first_seen = min(struct(row_id, pos)) — global first occurrence for the
    Counter-insertion-order tie-break (exact at any document length).

    The rank is an EXACT global row_number but computed distributed
    (range-sort + partition prefix offsets, operators/rank.py): (cnt,
    first_seen) is duplicate-free — one corpus position holds one token — so
    no unpartitioned Window is needed, and a 10^9-token web-corpus vocabulary
    ranks across all executors instead of one."""
    from .rank import exact_global_rank

    return exact_global_rank(word_frequency_agg(token_view),
                             [F.desc("cnt"), F.asc("first_seen")], "rank")


def frequency_votes(token_view: DataFrame, freq: DataFrame,
                    thresholds: list[float] | None = None) -> DataFrame:
    """NOT_NAME votes for each threshold LF. Membership is on the exact token
    text (reference `tok.text in self.common_words`), via broadcast join of
    the tiny ranked vocabulary."""
    thresholds = thresholds or THRESHOLDS
    vocab_size = freq.count()
    max_k = max(int(vocab_size * t) for t in thresholds)
    # ONE broadcast join against the widest top-k, then one explode emitting
    # each threshold LF whose cutoff the token's rank clears — single corpus
    # pass for all five antirule LFs.
    top = freq.where(F.col("rank") <= max_k).select(
        F.col("tok").alias("common_tok"), "rank"
    )
    lf_hits = F.filter(
        F.array(
            *[
                F.when(F.col("rank") <= int(vocab_size * t), F.lit(f"freq_{t}"))
                for t in thresholds
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        token_view.join(F.broadcast(top), F.col("tok") == F.col("common_tok"), "inner")
        .select(
            "row_id",
            F.col("pos").cast("int").alias("pos"),
            F.explode(lf_hits).alias("lf_name"),
            F.lit("NOT_NAME").alias("label"),
            F.lit(1.0).alias("weight"),
            "tok",
        )
    )
