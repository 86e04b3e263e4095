"""triples_layout='read-optimized': same triple set, skippable file layout.

Evidence is read from the parquet footers (pyarrow), not inferred from the
plan: under the range layout, per-file (min, max) subj intervals within one
pred directory must be pairwise non-overlapping (boundary sharing allowed),
which is exactly what lets a subj-equality scan skip files on stats.
"""

import os

from ht_ner_spark.corpus import synthetic_corpus
from ht_ner_spark.pipeline import PipelineConfig, run


def _subj_intervals(warehouse):
    """{pred: [(min_subj, max_subj) per file]} from footer stats only."""
    import pyarrow.parquet as pq

    root = os.path.join(warehouse, "triples")
    out = {}
    for pred_dir in sorted(os.listdir(root)):
        if not pred_dir.startswith("pred="):
            continue
        for fn in sorted(os.listdir(os.path.join(root, pred_dir))):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, pred_dir, fn)).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}["subj"]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.setdefault(pred_dir, []).append((min(mins), max(maxs)))
    return out


def test_read_optimized_layout(spark, tmp_path):
    corpus = synthetic_corpus(spark, 400, partitions=8)
    t_fast = run(spark, corpus,
                 PipelineConfig(warehouse=str(tmp_path / "fast")))
    # at 400 rows AQE coalesces the layout shuffle to one partition per
    # pred (a correct physical choice at this size — at real scale the
    # range partitioner keeps many); pin it off so the multi-file layout
    # is observable
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        t_opt = run(spark, corpus,
                    PipelineConfig(warehouse=str(tmp_path / "opt"),
                                   triples_layout="read-optimized"))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "true")
    # identical triple sets — layout is a physical property only
    cols = ["subj", "pred", "obj"]
    assert (t_fast.select(cols).exceptAll(t_opt.select(cols)).count() == 0
            and t_opt.select(cols).exceptAll(t_fast.select(cols)).count() == 0)

    ivs = _subj_intervals(str(tmp_path / "opt"))
    multi = {p: v for p, v in ivs.items() if len(v) > 1}
    assert multi, "need >1 file per pred for the layout to be observable"
    for pred_dir, spans in multi.items():
        spans = sorted(spans)
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            # disjoint up to a shared boundary value
            assert hi1 <= lo2, (pred_dir, (lo1, hi1), (lo2, hi2))
