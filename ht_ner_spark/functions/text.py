"""Text scalar functions (SURVEY.md §2.7) as pure Spark Column expressions.

Everything here stays JVM-side (whole-stage codegen); the only pieces of the
reference preprocess chain that need Python are NFKD ASCII folding (provided
as an optional Arrow pandas UDF) and truecasing (dropped — documented
deviation, SURVEY.md §7.0: truecase is unavailable in-sandbox and a no-op on
source code).

Reference chain: /root/reference/sweet/neat_preprocess.py:4-72.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# canonical tokenizer — exactly nltk RegexpTokenizer(r"\w+|\$[\d\.]+|\S+")
# (/root/reference/src/metrics.py:5); same class semantics in Java regex.
TOKEN_PATTERN = r"\w+|\$[\d\.]+|\S+"
# ad-text variant (/root/reference/src/preprocess/human_trafficking.py:9)
AD_TOKEN_PATTERN = r"[/|(|)|{|}|$|?|!]|\w+|\$[\d\.]+|\S+"
# name-only / loc variants (human_trafficking.py:10-11)
NAME_TOKEN_PATTERN = r"[a-zA-Z]+"
LOC_TOKEN_PATTERN = r"\w+|\$[\d\.|-]+|\d+"

# contraction map of neat_preprocess.py:12-22 (case-preserving first char is
# honored for the forms that matter after lowering; we apply the map
# case-insensitively and keep the original first character like the reference)
_CONTRACTIONS = {
    "names": "name is",
    "its": "it is",
    "i'm": "i am",
    "name's": "name is",
    "it's": "it is",
    "i've": "i have",
    "we've": "we have",
}

_EMOJI_CLASS = (
    "[\U0001F1E0-\U0001F1FF\U0001F300-\U0001F5FF\U0001F600-\U0001F64F"
    "\U0001F680-\U0001F6FF\U0001F700-\U0001F77F\U0001F780-\U0001F7FF"
    "\U0001F800-\U0001F8FF\U0001F900-\U0001F9FF\U0001FA00-\U0001FA6F"
    "\U0001FA70-\U0001FAFF\U00002702-\U000027B0\U000024C2-\U0001F251]+"
)


def tokenize(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """T3: text -> array<string> tokens, identical to nltk RegexpTokenizer."""
    return F.regexp_extract_all(F.coalesce(F.col(col) if isinstance(col, str) else col,
                                           F.lit("")), F.lit(pattern), 0)


def strip_html(col: Column) -> Column:
    """T2: BeautifulSoup get_text approximation (reference double-strips with
    the regex `<.*?>` anyway — neat_preprocess.py:66)."""
    return F.regexp_replace(col, r"<[^>]*>", " ")


def preprocess(col: Column | str) -> Column:
    """T1: the reference normalization chain (neat_preprocess.py:4-72), minus
    truecase (deviation) and NFKD fold (see nfkd_ascii_fold for the faithful
    variant; plain ASCII corpora are unaffected)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))                       # NaN -> '' (line 58-60)
    c = F.regexp_replace(c, _EMOJI_CLASS, " ")          # emoji (24-39, 62)
    c = F.regexp_replace(c, "·", " ")                   # line 63
    c = F.regexp_replace(c, r"<.*?>", " ")              # line 66
    # contractions (41-55, 67): the reference pattern has NO word boundaries
    # (quirk preserved: 'its' matches inside 'bits'); case-insensitive with the
    # original first character kept (expand_match, lines 45-51). Sequential
    # replaces in dict order == the reference's leftmost-first alternation for
    # this map (no overlapping keys).
    import re as _re
    for k, v in _CONTRACTIONS.items():
        c = F.regexp_replace(c, f"(?i)({_re.escape(k[0])}){_re.escape(k[1:])}",
                             f"$1{v[1:]}")
    c = F.regexp_replace(c, "'", "")                    # line 54
    c = F.regexp_replace(c, r"""['·"”#$%&’()*+/:;<=>@\[\]^_`{|}~-]+""", " ")  # 68
    c = F.regexp_replace(c, r"[!,.?]{2,}\s?", " ")      # 69
    c = F.regexp_replace(c, r"\s+", " ")                # 70
    return c


def truecase_udf():
    """T1 truecasing hook (neat_preprocess.py:71 `truecase.get_true_case`).

    The `truecase` library is absent in this sandbox, so preprocess() omits
    the step (a no-op on source code, documented deviation SURVEY §7.0) —
    but the deviation is CONFIG, not a silent drop: environments with the
    library get the reference step via
    ``df.withColumn('content', truecase_udf()(F.col('content')))``, the same
    import-gate pattern as HFScorer/HFTokenClassifier. Raises
    NotImplementedError (with the working fallback named) when the library
    is missing."""
    try:
        import truecase  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "truecase_udf needs the 'truecase' package; preprocess() without "
            "truecasing is the documented sandbox fallback (SURVEY §7.0)"
        ) from e
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _tc(s: pd.Series) -> pd.Series:  # pragma: no cover - needs truecase
        import truecase as _t

        return s.fillna("").map(_t.get_true_case)

    return _tc


def preprocess_with_config(col: Column | str, use_truecase: bool = False,
                           use_nfkd: bool = False) -> Column:
    """T1 with the gated optional steps switched on by config — production
    parity is configuration, not code edits. Order matches the reference:
    fold/normalize before the punctuation strips, truecase last
    (neat_preprocess.py:65,71)."""
    c = preprocess(col)
    if use_nfkd:
        c = nfkd_ascii_fold()(c)
    if use_truecase:
        c = truecase_udf()(c)
    return c


def nfkd_ascii_fold():
    """T1 NFKD->ASCII fold (neat_preprocess.py:65), Arrow-vectorized.
    Factory (pandas_udf needs an active session to parse its return type)."""
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _fold(s: pd.Series) -> pd.Series:
        return (
            s.fillna("")
            .str.normalize("NFKD")
            .str.encode("ascii", errors="ignore")
            .str.decode("utf-8", errors="ignore")
        )

    return _fold


def entities_to_string(col: Column) -> Column:
    """S3: array<string> -> '|'-joined, 'N' when empty
    (/root/reference/sweet/run_sweet.py:77-93)."""
    return F.when(F.size(col) > 0, F.concat_ws("|", col)).otherwise(F.lit("N"))


def string_to_entities(col: Column | str) -> Column:
    """T5/P2/P3: eval normalization of '|'-separated entity strings
    (/root/reference/src/metrics.py:28-45): fillna('') , ^N$ -> '', lower,
    split '|', strip each, drop empties; set semantics applied downstream."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    c = F.regexp_replace(c, "^N$", "")
    c = F.lower(c)
    arr = F.split(c, r"\|")
    arr = F.transform(arr, lambda x: F.trim(x))
    return F.filter(arr, lambda x: x != "")


def detokenize(tokens: Column) -> Column:
    """T4: join + punctuation re-spacing (finetune_evaluation.py:87-94)."""
    c = F.concat_ws(" ", tokens)
    c = F.regexp_replace(c, r"\s([?.!,;:](?:\s|$))", "$1")
    c = F.regexp_replace(c, r"\s'\s?", "'")
    return c


def normalize_quotes(col: Column) -> Column:
    """T6 (human_trafficking.py:31-32)."""
    return F.regexp_replace(col, "’", "'")


def truncate_words(col: Column, n_words: int = 2500) -> Column:
    """T7: keep the first chars-of-first-N-words characters — faithfully
    reproducing the reference quirk that the char count EXCLUDES inter-word
    spaces (/root/reference/src/openai_infer.py:18)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.aggregate(
        F.slice(F.split(c, " "), 1, n_words),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    return F.substring(c, 1, n_chars)


def strip_subword_marker(col: Column) -> Column:
    """T9: strip HF 'Ġ'/'▁' markers (neat_disambiguation.py:63-66)."""
    return F.regexp_replace(col, "^[Ġ▁]+", "")


def _gpt_clean(c: Column, header: str) -> Column:
    """strip() -> remove header -> '\\n'->'|' -> ', '->'|' -> ^N$->''
    (/root/reference/src/openai_infer.py:46-70, literal replace-all order)."""
    c = F.regexp_replace(c, r"^\s+|\s+$", "")
    c = F.replace(c, F.lit(header), F.lit(""))
    c = F.replace(c, F.lit("\n"), F.lit("|"))
    c = F.replace(c, F.lit(", "), F.lit("|"))
    return F.when(c == "N", F.lit("")).otherwise(c)


def parse_gpt_response(col: Column | str) -> Column:
    """T8: parse a 'Names: ... Locations: ... Social: ...' response into
    struct<name,location,social> (/root/reference/src/openai_infer.py:36-101).

    Happy path: exactly one 'Locations: ' then one 'Social: ' split; any
    other shape falls back to the reference's line-wise accumulator with its
    break-on-unknown-line and per-line ^N$ reset quirks (implemented as an
    F.aggregate fold over the lines — sequential semantics, column-only)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))

    loc_parts = F.split(c, F.lit("Locations: "), -1)
    happy1 = F.size(loc_parts) == 2
    name_part = F.element_at(loc_parts, 1)
    rest = F.element_at(loc_parts, 2)
    soc_parts = F.split(rest, F.lit("Social: "), -1)
    happy = happy1 & (F.size(soc_parts) == 2)
    h_name = _gpt_clean(name_part, "Names: ")
    h_loc = _gpt_clean(F.element_at(soc_parts, 1), "Locations: ")
    h_soc = _gpt_clean(F.element_at(soc_parts, 2), "Social: ")

    # fallback fold (openai_infer.py:73-101): acc = (name, loc, soc, stopped)
    lines = F.split(c, F.lit("\n"), -1)
    zero = F.struct(
        F.lit("").alias("n"), F.lit("").alias("l"), F.lit("").alias("s"),
        F.lit(False).alias("stop"),
    )

    def step(acc, line):
        has = lambda h: F.contains(line, F.lit(h))
        strip_h = lambda h: F.replace(line, F.lit(h), F.lit(""))
        n1 = F.when(has("Names: "), F.concat(acc["n"], strip_h("Names: "))).otherwise(acc["n"])
        l1 = F.when(~has("Names: ") & has("Locations: "),
                    F.concat(acc["l"], strip_h("Locations: "))).otherwise(acc["l"])
        s1 = F.when(~has("Names: ") & ~has("Locations: ") & has("Social: "),
                    F.concat(acc["s"], strip_h("Social: "))).otherwise(acc["s"])
        unknown = ~has("Names: ") & ~has("Locations: ") & ~has("Social: ") & (line != "")
        # per-line ^N$ reset (:96-101) — skipped for the breaking line
        n2 = F.when(~unknown & (n1 == "N"), F.lit("")).otherwise(n1)
        l2 = F.when(~unknown & (l1 == "N"), F.lit("")).otherwise(l1)
        s2 = F.when(~unknown & (s1 == "N"), F.lit("")).otherwise(s1)
        return F.when(acc["stop"], acc).otherwise(
            F.struct(n2.alias("n"), l2.alias("l"), s2.alias("s"),
                     unknown.alias("stop"))
        )

    folded = F.aggregate(lines, zero, step)

    return F.struct(
        F.when(happy, h_name).otherwise(folded["n"]).alias("name"),
        F.when(happy, h_loc).otherwise(folded["l"]).alias("location"),
        F.when(happy, h_soc).otherwise(folded["s"]).alias("social"),
    )
