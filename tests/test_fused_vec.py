"""Columnar fused labeler (operators/fused_vec.py) must be row-MULTISET
identical to the per-token reference loop (fused._label_row) — the
vectorization is a physical optimization, never a semantic change.

Function-level (no Spark) on adversarial corpora: unicode case edges,
empty/None texts, multi-word gazetteer phrases, $-number tokens,
punctuation-glued \\S+ tokens, trigger bigrams at row boundaries, and the
frequency-antirule original-case rank quirk.  The Spark-level knob
(PipelineConfig.fused_impl) is covered in tests/test_fused.py.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest

from ht_ner_spark.corpus import DEFAULT_GAZETTEER, synthetic_rows
from ht_ner_spark.functions.text import TOKEN_PATTERN
from ht_ner_spark.operators import fused_vec
from ht_ner_spark.operators.fused import _COLS, _TYPES, _label_row
from ht_ner_spark.operators.gazetteer import build_trie

TOK_RE = re.compile(TOKEN_PATTERN)


def loop_frame(rows, trie, ranks, cutoffs):
    out = []
    for rid, text in rows:
        ms = list(TOK_RE.finditer(text or ""))
        toks = [m.group(0) for m in ms]
        low = [t.lower() for t in toks]
        _label_row(rid, toks, low, [m.start() for m in ms],
                   [m.end() for m in ms], trie, cutoffs, ranks, out)
    return pd.DataFrame(out, columns=_COLS).astype(_TYPES)


def vec_frame(rows, trie, ranks, cutoffs):
    return fused_vec.label_batch([r[0] for r in rows],
                                 [r[1] for r in rows],
                                 TOK_RE, trie, ranks, cutoffs)


def multiset(df):
    return sorted(map(tuple, df[_COLS].itertuples(index=False)))


def assert_parity(rows, gaz=None, ranks=None, cutoffs=None):
    trie = build_trie(gaz if gaz is not None else dict(DEFAULT_GAZETTEER))
    lk = multiset(loop_frame(rows, trie, ranks or {}, cutoffs or []))
    vk = multiset(vec_frame(rows, trie, ranks or {}, cutoffs or []))
    assert lk == vk


def test_synthetic_corpus_parity():
    rows = [(r[0], r[5]) for r in synthetic_rows(800)]
    assert_parity(rows)


def test_synthetic_corpus_parity_with_frequency():
    rows = [(r[0], r[5]) for r in synthetic_rows(500)]
    ranks = {"the": 1, "ok": 2, "about": 3, "Alice": 4, "call": 5}
    cutoffs = [("freq_0.1", 2), ("freq_0.3", 5)]
    assert_parity(rows, ranks=ranks, cutoffs=cutoffs)


def test_empty_none_and_whitespace_rows():
    rows = [(0, ""), (1, None), (2, "   \t\n  "), (3, "Alice"),
            (4, "     "), (5, "ok")]
    assert_parity(rows)


def test_unicode_case_and_whitespace():
    rows = [
        (0, "İstanbul ĲSBRAND ß ẞEТA   Ångström"),
        (1, "ΣΙΓΜΑ σίγμα Δὲν ΞΕΡΩ"),
        (2, "naïve CAFÉ résumé"),
        (3, "tab\tsep thin　ideographic"),
    ]
    assert_parity(rows)


def test_dollar_numbers_and_punctuation_glue():
    rows = [
        (0, "pay $3.50 not $.. nor $x then a$3.5 and x,$9.9"),
        (1, "foo,BAR baz..QUX (PAREN) {BRACE} end$"),
        (2, "$5 $5.5.5 $ alone"),
    ]
    assert_parity(rows)


def test_multiword_gazetteer_walks():
    gaz = {"jane smith": 0.9, "jane": 0.6, "jane smith jones": 0.8,
           "de la cruz": 0.7, "smith": 0.5}
    rows = [
        (0, "met Jane Smith Jones and DE LA CRUZ today"),
        (1, "jane smith spoke; Jane alone; smith jane reversed"),
        (2, "Jane Smith"),          # phrase ends exactly at row end
        (3, "prefix Jane"),         # partial phrase at row end
    ]
    assert_parity(rows, gaz=gaz)


def test_trigger_bigrams_and_row_boundaries():
    # bigram trigger split across rows must NOT fire (the loop path is
    # per-row; the vec path joins rows — boundary handling must match)
    rows = [
        (0, "according to"),
        (1, "Reuters said ok"),
        (2, "according to Reuters said hm"),
        (3, "Mr"),
        (4, "Smith arrived"),
        (5, "Mr Smith arrived"),
    ]
    assert_parity(rows)


def test_rank_lookup_is_original_case():
    # the loop path looks ranks up by ORIGINAL token text (quirk);
    # lower-cased keys must not match capitalized occurrences
    rows = [(0, "The the THE tHe"), (1, "the said The")]
    ranks = {"the": 1, "The": 2}
    cutoffs = [("freq_0.1", 1), ("freq_0.3", 2)]
    assert_parity(rows, ranks=ranks, cutoffs=cutoffs)


def test_j2_reprojection_exact_case():
    # a rule-extracted surface votes at every EXACT-case occurrence only
    rows = [(0, "mr Smith saw Smith and SMITH and smith Smith")]
    assert_parity(rows)


def test_non_tiling_pattern_falls_back():
    # a pattern without a \S+ fallback skips chars -> the arithmetic-span
    # fast path must detect the gap and fall back to per-match spans
    pat = re.compile(r"[A-Za-z]+")
    rows = [(7, "ab,cd EF--gh")]
    out = []
    for rid, text in rows:
        ms = list(pat.finditer(text))
        toks = [m.group(0) for m in ms]
        low = [t.lower() for t in toks]
        _label_row(rid, toks, low, [m.start() for m in ms],
                   [m.end() for m in ms], build_trie({"ab": 0.9}), [], {},
                   out)
    ldf = pd.DataFrame(out, columns=_COLS).astype(_TYPES)
    vdf = fused_vec.label_batch([7], [rows[0][1]], pat,
                                build_trie({"ab": 0.9}), {}, [])
    assert multiset(ldf) == multiset(vdf)


def test_capture_group_pattern_rejected():
    # findall on a grouped pattern returns group text, not full matches —
    # tokenize_batch refuses rather than silently misaligning spans
    pat = re.compile(r"([A-Za-z]+)")
    with pytest.raises(ValueError, match="capture group"):
        fused_vec.tokenize_batch([0], ["ab cd"], pat)
    # the non-capturing form is accepted
    fused_vec.tokenize_batch([0], ["ab cd"], re.compile(r"(?:[A-Za-z])+"))


def test_whitespace_matching_pattern_spans_correct():
    # a pattern whose tokens CONTAIN whitespace can tile the \S-run char
    # totals coincidentally; the fallback must kick in and emit true spans
    pat = re.compile(r"\w+ \w+|\w+")
    text = "ab cd"  # one token "ab cd" (5 chars) vs \S runs "ab"+"cd" (4)
    _, _, _, start, end, toks, _, _ = fused_vec.tokenize_batch(
        [0], [text], pat)
    assert list(toks) == ["ab cd"]
    assert list(start) == [0] and list(end) == [5]
    # and a case where totals DO coincide: token "b c" (3 chars, skips the
    # \S char 'a', includes the ws char ' ') over runs "ab"(2)+"c"(1) = 3
    # — only the ws-containing-token check routes this to the fallback;
    # the arithmetic fast path would emit the wrong span (0,3) = "ab "
    text2 = "ab c"
    pat2 = re.compile(r"b c")
    _, _, _, s2, e2, t2, _, _ = fused_vec.tokenize_batch([0], [text2], pat2)
    assert list(zip(t2, s2, e2)) == [("b c", 1, 4)]
    # cross-row guard: a ws-capable pattern must NEVER match across the
    # "\n" joiner between batch rows — the joined scan would emit a
    # phantom token "ab\ncd" for row 0 with span (0, 5) on a 2-char row;
    # the ws-token branch rescans per row (here: no matches at all)
    rid3, _, _, _, _, t3, _, _ = fused_vec.tokenize_batch(
        [0, 1], ["ab", "cd"], re.compile(r"\w+\s\w+|\w+ \w+"))
    assert len(t3) == 0 and len(rid3) == 0
    # and per-row matches stay row-local with row-local spans
    rid4, pos4, _, s4, e4, t4, _, _ = fused_vec.tokenize_batch(
        [7, 9], ["x y", "p q"], re.compile(r"\w \w|\w+\s\w+"))
    assert list(zip(rid4, t4, s4, e4)) == [(7, "x y", 0, 3), (9, "p q", 0, 3)]
    assert list(pos4) == [0, 0]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_randomized_fuzz(seed):
    import random

    rng = random.Random(seed)
    vocab = ["Alice", "BOB", "the", "Mr", "mr", "according", "to", "$3.5",
             "x,y", "İ", "ß", "CAFÉ", "ok", "Jane", "Smith", "a", "AB",
             "ALLCAPSWORD", "Capitalized", "notcap", "X" * 20, "..", "()"]
    rows = []
    for i in range(200):
        n = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    gaz = {"jane smith": 0.9, "alice": 0.8, "bob": 0.4}
    ranks = {"the": 1, "ok": 2, "Alice": 3}
    cutoffs = [("freq_0.1", 1), ("freq_0.3", 3)]
    assert_parity(rows, gaz=gaz, ranks=ranks, cutoffs=cutoffs)


def test_word_frequency_agg_arrow_parity(spark):
    """The Arrow partial-count frequency aggregate must be row-set
    identical to the exploded-view JVM aggregate — including the
    first_seen struct (VALUE-min of (row_id, pos), not scan order) and
    the stopword/punct filter."""
    from ht_ner_spark.corpus import synthetic_corpus
    from ht_ner_spark.operators import antirules as ar
    from ht_ner_spark.operators.tokens import token_view, with_tokens

    c = synthetic_corpus(spark, 300).cache()
    rel = ar.word_frequency_agg(token_view(with_tokens(c)))
    arrow = ar.word_frequency_agg_arrow(c)
    rk = {(r["tok"], r["cnt"], r["first_seen"]["r"], r["first_seen"]["p"])
          for r in rel.collect()}
    ak = {(r["tok"], r["cnt"], r["first_seen"]["r"], r["first_seen"]["p"])
          for r in arrow.collect()}
    assert rk == ak and len(rk) > 0
    c.unpersist()


def test_word_frequency_agg_arrow_value_min(spark):
    """first_seen must be the value-min even when row_ids arrive out of
    order inside a batch (descending ids here): token 'zzq' first occurs
    by VALUE in row 1 pos 2, though row 9 is scanned first."""
    from ht_ner_spark.operators import antirules as ar
    from ht_ner_spark.operators.tokens import token_view, with_tokens
    from ht_ner_spark.schemas import CORPUS

    rows = [
        (9, "r", "p", "c", "py", "zzq zzq here", "h9"),
        (5, "r", "p", "c", "py", "nothing zzq", "h5"),
        (1, "r", "p", "c", "py", "alpha beta zzq tail", "h1"),
    ]
    df = spark.createDataFrame(rows, CORPUS).coalesce(1)
    arrow = {(r["tok"], r["cnt"], r["first_seen"]["r"], r["first_seen"]["p"])
             for r in ar.word_frequency_agg_arrow(df).collect()}
    rel = {(r["tok"], r["cnt"], r["first_seen"]["r"], r["first_seen"]["p"])
           for r in ar.word_frequency_agg(
               token_view(with_tokens(df))).collect()}
    assert arrow == rel
    zzq = {t for t in arrow if t[0] == "zzq"}
    assert zzq == {("zzq", 4, 1, 2)}


def test_word_frequency_tokenizer_divergence_non_ascii(spark):
    """The two frequency paths' EQUIVALENCE DOMAIN is ASCII — pinned here
    as an explicit, tested deviation (round-4 advisor): the Arrow path
    tokenizes with Python re (Unicode \\w/\\s — the reference-faithful
    nltk semantics, and the engine default), the relational path with JVM
    regexp_extract_all (ASCII \\w/\\s). On 'café' and NBSP they MUST
    diverge exactly as documented in word_frequency_agg_arrow; if this
    test ever fails because they AGREE, the JVM path changed semantics
    and the docstring + this pin need updating together."""
    from ht_ner_spark.operators import antirules as ar
    from ht_ner_spark.operators.tokens import token_view, with_tokens
    from ht_ner_spark.schemas import CORPUS

    rows = [(1, "r", "p", "c", "py", "café bistro menu", "h1")]
    df = spark.createDataFrame(rows, CORPUS).coalesce(1)
    arrow = {r["tok"] for r in ar.word_frequency_agg_arrow(df).collect()}
    rel = {r["tok"] for r in ar.word_frequency_agg(
        token_view(with_tokens(df))).collect()}
    # Python \w+ keeps 'café' whole; NBSP is \s, so 'bistro' and 'menu'
    # split into two tokens
    assert arrow == {"café", "bistro", "menu"}
    # JVM \w+ stops at 'é' ('caf' + 'é' via the \S+ fallback... which
    # greedily eats through the NBSP since JVM \S matches it)
    assert "caf" in rel and "café" not in rel
    assert arrow != rel
    # NBSP: \s in Python (a separator), \S in the JVM (the \S+ arm
    # glues it onto the next token)
    rows2 = [(2, "r", "p", "c", "py", "bistro menu", "h2")]
    df2 = spark.createDataFrame(rows2, CORPUS).coalesce(1)
    arrow2 = {r["tok"] for r in ar.word_frequency_agg_arrow(df2).collect()}
    rel2 = {r["tok"] for r in ar.word_frequency_agg(
        token_view(with_tokens(df2))).collect()}
    assert arrow2 == {"bistro", "menu"}
    assert rel2 == {"bistro", " menu"}


def test_pipeline_freq_impl_parity(spark, tmp_path):
    """End-to-end: pipeline triples identical under freq_impl
    'vector' vs 'relational'."""
    from ht_ner_spark.corpus import synthetic_corpus
    from ht_ner_spark.pipeline import PipelineConfig, run

    c = synthetic_corpus(spark, 200).cache()
    a = run(spark, c, PipelineConfig(warehouse=str(tmp_path / "a"),
                                     freq_impl="vector"))
    b = run(spark, c, PipelineConfig(warehouse=str(tmp_path / "b"),
                                     freq_impl="relational"))
    ka = {(r["subj"], r["pred"], r["obj"]) for r in a.collect()}
    kb = {(r["subj"], r["pred"], r["obj"]) for r in b.collect()}
    assert ka == kb and len(ka) > 0
    c.unpersist()
