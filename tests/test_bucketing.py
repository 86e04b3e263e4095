"""Bucketed co-located joins: same-bucketed tables must join with NO
shuffle Exchange (the write-side distribution replaces the join-time one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ht_ner_spark.storage.catalog import read_bucketed, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # spark.sql.warehouse.dir is static per session; managed test tables use
    # unique names in the default warehouse and are dropped on teardown.
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    b = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y")
    )
    write_bucketed(a, "bk_a", ["k"], 8, sort_cols=["k"])
    write_bucketed(b, "bk_b", ["k"], 8, sort_cols=["k"])
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    na, nb = bucketed_pair
    # disable broadcast so the join strategy must be SMJ — the interesting case
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, na).join(read_bucketed(spark, nb), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert j.count() == 500
        # correctness vs plain join
        got = {(r["k"], r["x"], r["y"]) for r in j.collect()}
        assert got == {(i, i * 2, i * 3) for i in range(500)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_pipeline_stage4_bucketed_join_no_exchange(spark, tmp_path):
    """bucket_buckets>0: the pipeline writes corpus+entities as row_id-
    bucketed tables; the stage-4 corpus ⋈ entities join must need no
    Exchange on either side, and the triples must be identical to the
    unbucketed run."""
    from pyspark.sql import functions as F

    from ht_ner_spark.corpus import synthetic_corpus
    from ht_ner_spark.pipeline import (
        PipelineConfig,
        _bucket_table_name,
        run,
    )
    from ht_ner_spark.storage.catalog import read_bucketed

    c = synthetic_corpus(spark, 60).cache()
    plain = run(spark, c, PipelineConfig(warehouse=str(tmp_path / "a"),
                                         run_id="plain"))
    bucketed = run(spark, c, PipelineConfig(warehouse=str(tmp_path / "b"),
                                            run_id="bk", bucket_buckets=8))
    keys = lambda df: {(r["subj"], r["pred"], r["obj"])
                       for r in df.select("subj", "pred", "obj").collect()}
    assert keys(plain) == keys(bucketed)

    # the run must have left both bucketed tables; their row_id join plans
    # with no Exchange (the write-side distribution replaces the shuffle)
    ct = _bucket_table_name(str(tmp_path / "b"), "bk", "corpus")
    et = _bucket_table_name(str(tmp_path / "b"), "bk", "entities")
    assert spark.catalog.tableExists(ct) and spark.catalog.tableExists(et)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ents = read_bucketed(spark, et).select(
            "row_id", F.explode("entities").alias("entity")
        )
        j = ents.join(read_bucketed(spark, ct), "row_id")
        j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS {ct}")
        spark.sql(f"DROP TABLE IF EXISTS {et}")


def test_bucket_table_name_collision_free():
    """ADVICE r2: 'a-b' and 'a.b' sanitized to the same name; distinct
    warehouses with the same run_id shared tables. The hash tag makes all
    four distinct."""
    from ht_ner_spark.pipeline import _bucket_table_name

    names = {
        _bucket_table_name("/w1", "a-b", "corpus"),
        _bucket_table_name("/w1", "a.b", "corpus"),
        _bucket_table_name("/w2", "a-b", "corpus"),
        _bucket_table_name("/w2", "a.b", "corpus"),
    }
    assert len(names) == 4


def test_stage4_bucketed_no_stale_reuse(spark, tmp_path):
    """ADVICE r2 (medium): a second run() in the same session reusing a
    run_id with a DIFFERENT corpus must not join stage 4 against the stale
    bucketed tables of the first run."""
    from ht_ner_spark.corpus import synthetic_corpus
    from ht_ner_spark.pipeline import PipelineConfig, run

    keys = lambda df: {(r["subj"], r["pred"], r["obj"])
                       for r in df.select("subj", "pred", "obj").collect()}
    c1 = synthetic_corpus(spark, 40).cache()
    c2 = synthetic_corpus(spark, 90).cache()
    run(spark, c1, PipelineConfig(warehouse=str(tmp_path / "w1"),
                                  run_id="bench", bucket_buckets=4))
    got = run(spark, c2, PipelineConfig(warehouse=str(tmp_path / "w2"),
                                        run_id="bench", bucket_buckets=4))
    ref = run(spark, c2, PipelineConfig(warehouse=str(tmp_path / "w3"),
                                        run_id="ref"))
    assert keys(got) == keys(ref)
    c1.unpersist(); c2.unpersist()
