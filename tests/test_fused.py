"""Fused single-pass stage 1 must be row-set identical to the composed
relational operators (SURVEY §2 J1/J2/W3/W5/A1 — the fusion is a physical
optimization, never a semantic change)."""

from __future__ import annotations

from ht_ner_spark.corpus import DEFAULT_GAZETTEER, synthetic_corpus
from ht_ner_spark.pipeline import PipelineConfig, stage1_mentions

N_ROWS = 120


def _rowset(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_fused_equals_composed(spark, tmp_path):
    c = synthetic_corpus(spark, N_ROWS).cache()
    fused_cfg = PipelineConfig(warehouse=str(tmp_path), fused=True)
    comp_cfg = PipelineConfig(warehouse=str(tmp_path), fused=False, use_trie=True)

    fm, fv = stage1_mentions(c, fused_cfg)
    cm, cv = stage1_mentions(c, comp_cfg)

    mcols = ["row_id", "lf_name", "begin", "end", "surface", "label",
             "base_conf", "confidence", "begin_char", "end_char"]
    assert _rowset(fm, mcols) == _rowset(cm, mcols)

    vcols = ["row_id", "pos", "lf_name", "label", "weight", "tok"]
    got, want = _rowset(fv, vcols), _rowset(cv, vcols)
    assert got == want
    assert len(got) > 0


def test_fused_vector_equals_loop_impl(spark, tmp_path):
    """The columnar labeler (fused_impl='vector', the default) and the
    per-token loop twin must agree through the full Spark path."""
    c = synthetic_corpus(spark, N_ROWS).cache()
    vec_cfg = PipelineConfig(warehouse=str(tmp_path), fused=True,
                             fused_impl="vector")
    loop_cfg = PipelineConfig(warehouse=str(tmp_path), fused=True,
                              fused_impl="loop")

    vm, vv = stage1_mentions(c, vec_cfg)
    lm, lv = stage1_mentions(c, loop_cfg)

    mcols = ["row_id", "lf_name", "begin", "end", "surface", "label",
             "base_conf", "confidence", "begin_char", "end_char"]
    assert _rowset(vm, mcols) == _rowset(lm, mcols)
    vcols = ["row_id", "pos", "lf_name", "label", "weight", "tok"]
    got, want = _rowset(vv, vcols), _rowset(lv, vcols)
    assert got == want
    assert len(got) > 0


def test_fused_no_frequency(spark, tmp_path):
    c = synthetic_corpus(spark, 40)
    cfg = PipelineConfig(warehouse=str(tmp_path), fused=True,
                         frequency_antirules=False)
    _, votes = stage1_mentions(c, cfg)
    lfs = {r["lf_name"] for r in votes.select("lf_name").distinct().collect()}
    assert not any(lf.startswith("freq_") for lf in lfs)


def test_fused_relational_vocab_fallback(spark, tmp_path):
    """Forcing max_broadcast_vocab=0 exercises the relational frequency
    fallback; the vote set must not change."""
    c = synthetic_corpus(spark, 60).cache()
    a = PipelineConfig(warehouse=str(tmp_path), fused=True)
    b = PipelineConfig(warehouse=str(tmp_path), fused=True, max_broadcast_vocab=0)
    _, va = stage1_mentions(c, a)
    _, vb = stage1_mentions(c, b)
    vcols = ["row_id", "pos", "lf_name", "label", "weight", "tok"]
    assert _rowset(va, vcols) == _rowset(vb, vcols)
