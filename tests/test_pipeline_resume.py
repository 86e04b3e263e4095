"""End-to-end pipeline: triples written partitionBy(pred), sha invariant,
and resume-after-restart == single-run output (SURVEY §5.4)."""

import os

from pyspark.sql import functions as F

from ht_ner_spark.corpus import synthetic_corpus
from ht_ner_spark.pipeline import PipelineConfig, run
from ht_ner_spark.storage import checkpoint as ck


def _triple_set(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.select("subj", "pred", "obj").collect()}


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    c = synthetic_corpus(spark, 80)

    wh1 = str(tmp_path / "wh_single")
    cfg1 = PipelineConfig(warehouse=wh1, run_id="r1")
    t1 = run(spark, c, cfg1)
    full = _triple_set(t1)
    assert len(full) > 0
    assert {r["pred"] for r in t1.select("pred").distinct().collect()} <= {
        "mentions", "alias_of", "appears_in"
    }
    # physical layout: partitioned by pred
    assert any(d.startswith("pred=") for d in os.listdir(os.path.join(wh1, "triples")))

    # sha invariant recorded ok
    ckpt = ck.read_checkpoints(spark, wh1)
    s4 = ckpt.where("stage = 's4'").collect()
    assert s4 and all(r["sha_ok"] for r in s4)

    # lineage carries the per-row invariant
    shas = {r["content_sha256"] for r in c.select("content_sha256").collect()}
    tsha = {r["lineage"]["content_sha256"] for r in t1.select("lineage").limit(50).collect()}
    assert tsha <= shas

    # resume: run stages 1-2 under run_id r2, then "crash"; a fresh run()
    # with the same run_id must skip completed stages (checkpoint rows) and
    # produce identical triples.
    wh2 = str(tmp_path / "wh_resume")
    cfg2 = PipelineConfig(warehouse=wh2, run_id="r2")
    from ht_ner_spark.pipeline import stage1_mentions
    from ht_ner_spark.storage import catalog as cat

    mentions, votes = stage1_mentions(c, cfg2)
    cat.write_table(mentions, wh2, "mentions")
    cat.write_table(votes, wh2, "votes")
    m = cat.read_table(spark, wh2, "mentions")
    ck.record_stage(spark, wh2, "r2", "s1", rows_out=m.count())
    # crash here -> restart
    t2 = run(spark, c, cfg2)
    assert _triple_set(t2) == full

    # stage s1 was NOT re-executed: only one s1 checkpoint row exists
    n_s1 = ck.read_checkpoints(spark, wh2).where("stage='s1'").count()
    assert n_s1 == 1


def test_checkpoint_partition_stats_recorded(spark, tmp_path):
    c = synthetic_corpus(spark, 40)
    wh = str(tmp_path / "wh")
    cfg = PipelineConfig(warehouse=wh, run_id="rX")
    run(spark, c, cfg)
    ckpt = ck.read_checkpoints(spark, wh)
    stages = {r["stage"] for r in ckpt.select("stage").distinct().collect()}
    assert {"s1", "s1b", "s2", "s3", "s4"} <= stages
    # per-partition lineage rows exist for s1 and s4
    assert ckpt.where("stage='s1' and partition_id >= 0").count() >= 1
