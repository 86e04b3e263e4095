"""tf-idf top-k and term-cooccurrence PMI: hand-computed tiny-corpus values,
df-band pruning, and the deterministic per-doc fan-out cap.

Reference analog: corpus word-frequency ranking feeding the antirules
(reference src/neat_extractors.py count/most_common), generalized to the
curation-pipeline term-weighting / word-association features a 100 TB
training-data pipeline needs (SURVEY.md §2.10 extensions).
"""

import math

import pytest

from ht_ner_spark.operators import textstats as ts

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple cherry cherry date"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_tfidf_topk_values(docs):
    rows = {(r.doc_id, r.term): r for r in ts.tfidf_topk(docs, k=3).collect()}
    # df: apple 2, banana 2, cherry 2, date 1; n_docs = 3
    ln32 = round(math.log(3 / 2), 4)
    assert rows[(0, "apple")].tf == 2 and rows[(0, "apple")].df == 2
    assert rows[(0, "apple")].tfidf == pytest.approx(round(2 * math.log(3 / 2), 4))
    assert rows[(0, "apple")].rnk == 1
    assert rows[(2, "date")].tfidf == pytest.approx(round(math.log(3.0), 4))
    assert rows[(2, "date")].rnk == 1  # rare term outranks tf=2 'cherry'
    assert rows[(2, "cherry")].rnk == 2
    assert rows[(1, "banana")].tfidf == pytest.approx(ln32)
    # ties broken term asc: d1 banana/cherry both ln(3/2)
    assert rows[(1, "banana")].rnk == 1 and rows[(1, "cherry")].rnk == 2


def test_tfidf_topk_limits_k(docs):
    out = ts.tfidf_topk(docs, k=1).collect()
    assert len(out) == 3  # one row per doc
    assert all(r.rnk == 1 for r in out)


def test_cooccurrence_pmi_values(docs):
    rows = {(r.term_a, r.term_b): r for r in ts.term_cooccurrence(docs).collect()}
    assert set(rows) == {("apple", "banana"), ("banana", "cherry"),
                         ("apple", "cherry"), ("apple", "date"),
                         ("cherry", "date")}
    r = rows[("apple", "date")]
    assert (r.n_ab, r.n_a, r.n_b) == (1, 2, 1)
    assert r.pmi == pytest.approx(round(math.log(3 * 1 / (2 * 1)), 4))
    assert rows[("apple", "banana")].pmi == pytest.approx(round(math.log(3 / 4), 4))


def test_cooccurrence_df_band_prunes(docs):
    # min_df=2 drops 'date' (df=1) before the pair join
    rows = ts.term_cooccurrence(docs, min_df=2).collect()
    terms = {t for r in rows for t in (r.term_a, r.term_b)}
    assert "date" not in terms and len(rows) == 3


def test_cooccurrence_doc_cap_deterministic(docs):
    # cap=2 keeps the 2 alphabetically-first terms per doc:
    # d0 {apple,banana}, d1 {banana,cherry}, d2 {apple,cherry}
    rows = ts.term_cooccurrence(docs, max_terms_per_doc=2).collect()
    assert {(r.term_a, r.term_b) for r in rows} == {
        ("apple", "banana"), ("banana", "cherry"), ("apple", "cherry")}


def test_cooccurrence_topk_order(docs):
    rows = ts.term_cooccurrence(docs, k=2).collect()
    # ordered pmi desc then term_a, term_b asc; top 2 are the pmi=ln(1.5) pairs
    assert [(r.term_a, r.term_b) for r in rows] == [
        ("apple", "date"), ("cherry", "date")]
