"""TrieMatcher backend selection + parity (VERDICT r3 next-#6).

The 'pure' backend is the engine default and is regression-tested against
the relational gazetteer path elsewhere (tests/test_fused.py,
test_stage1_parity.py). Here:

* the pure matcher's match set is verified against a hand-computed fixture
  (overlaps, nesting, prefix phrases, case folding);
* backend='ahocorasick' raises NotImplementedError with swap instructions
  when the C extension is absent (this sandbox) — the HFScorer gating
  convention;
* when pyahocorasick IS installed, the AC matcher must produce the
  IDENTICAL (begin, end, weight) set as the pure walk on every synthetic
  corpus row, and fused_stage1(trie_backend='ahocorasick') must be
  row-set-identical to the pure fused pass.
"""

from __future__ import annotations

import re

import pytest

from ht_ner_spark.functions.text import TOKEN_PATTERN
from ht_ner_spark.operators.gazetteer import HAS_AHOCORASICK, TrieMatcher

GAZ = {
    "ana": 0.9,
    "ana maria": 0.8,
    "maria": 0.7,
    "de la cruz": 0.6,
    "la": 0.5,
}

TEXTS = [
    "Ana Maria de la Cruz spoke.",          # nesting + overlap + 3-gram
    "ana ANA Maria",                        # case folding, repeats
    "la la la",                             # repeated unigram
    "nothing to see",                       # no matches
    "",                                     # empty
    "maria de la cruz and ana maria again",  # multiple phrases
]


def _toks(text):
    toks = re.findall(TOKEN_PATTERN, text)
    return toks, [t.lower() for t in toks]


def test_pure_matcher_fixture():
    m = TrieMatcher(GAZ, backend="pure")
    toks, low = _toks(TEXTS[0])  # Ana Maria de la Cruz spoke .
    got = sorted(m.matches(toks, low))
    assert got == sorted([
        (0, 1, 0.9),   # ana
        (0, 2, 0.8),   # ana maria
        (1, 2, 0.7),   # maria
        (2, 5, 0.6),   # de la cruz
        (3, 4, 0.5),   # la
    ])
    toks, low = _toks(TEXTS[2])  # la la la
    assert sorted(m.matches(toks, low)) == [(0, 1, 0.5), (1, 2, 0.5),
                                            (2, 3, 0.5)]
    for text in TEXTS[3:5]:
        toks, low = _toks(text)
        assert m.matches(toks, low) == []


def test_auto_backend_resolves():
    m = TrieMatcher(GAZ, backend="auto")
    assert m.backend == ("ahocorasick" if HAS_AHOCORASICK else "pure")


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        TrieMatcher(GAZ, backend="spacy")


@pytest.mark.skipif(HAS_AHOCORASICK, reason="extension present: gate is moot")
def test_ahocorasick_gate_raises_without_extension():
    with pytest.raises(NotImplementedError, match="pyahocorasick"):
        TrieMatcher(GAZ, backend="ahocorasick")


@pytest.mark.skipif(not HAS_AHOCORASICK,
                    reason="dormant: needs pyahocorasick")
def test_ahocorasick_matches_pure_on_synthetic_corpus(spark):
    from ht_ner_spark.corpus import DEFAULT_GAZETTEER, synthetic_corpus

    pure = TrieMatcher(dict(DEFAULT_GAZETTEER), backend="pure")
    ac = TrieMatcher(dict(DEFAULT_GAZETTEER), backend="ahocorasick")
    texts = [r["content"] for r in
             synthetic_corpus(spark, 500).select("content").collect()]
    for text in texts + TEXTS:
        toks, low = _toks(text)
        assert sorted(ac.matches(toks, low)) == sorted(pure.matches(toks, low))


@pytest.mark.skipif(not HAS_AHOCORASICK,
                    reason="dormant: needs pyahocorasick")
def test_fused_stage1_backend_row_set_identical(spark):
    from ht_ner_spark.corpus import DEFAULT_GAZETTEER, synthetic_corpus
    from ht_ner_spark.operators.fused import fused_stage1

    corpus = synthetic_corpus(spark, 300)
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    a = fused_stage1(corpus, dict(DEFAULT_GAZETTEER), trie_backend="pure")
    b = fused_stage1(corpus, dict(DEFAULT_GAZETTEER),
                     trie_backend="ahocorasick")
    assert rows(a) == rows(b)
