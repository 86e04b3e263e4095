"""The 4-stage KG-construction pipeline with keyed resume.

stage 1  mentions   corpus -> MENTIONS + VOTES      (gazetteer + rules + caps
                                                     + frequency antirules)
stage 2  linking    mentions -> alias edges          (MinHash/LSH + Jaccard)
stage 3  cc         edges -> COMPONENTS              (iterative min-label)
stage 4  triples    corpus ⋈ entities ⋈ components -> TRIPLES partitioned by pred

Every stage writes its output table atomically (overwrite) to the warehouse
and appends per-partition checkpoint rows; ``run()`` skips stages already
recorded for the same run_id (resume = restart with the same run_id).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import DEFAULT_GAZETTEER
from .operators import antirules as ar
from .operators import rules as ru
from .operators import votes as vo
from .operators.aggregate import predicted_entities, weighted_vote
from .operators.components import connected_components
from .operators.gazetteer import gazetteer_df, match_relational, match_trie
from .operators.linking import link_surfaces
from .operators.tokens import token_view, with_tokens
from .operators.triples import build_triples, dedup_triples, sha_invariant_audit
from .storage import catalog as cat
from .storage import checkpoint as ck


@dataclass
class PipelineConfig:
    warehouse: str
    run_id: str = "run0"
    gazetteer: dict[str, float] = field(default_factory=lambda: dict(DEFAULT_GAZETTEER))
    use_trie: bool = True          # scale path; False = relational broadcast join
    vote_threshold: float = 0.0
    lsh_bands: int = 8
    lsh_min_jaccard: float = 0.5
    lsh_max_block: int = 50
    frequency_antirules: bool = True
    cc_max_iter: int = 20


def stage1_mentions(corpus: DataFrame, cfg: PipelineConfig) -> tuple[DataFrame, DataFrame]:
    """-> (mentions, votes). One tokenize pass feeds every LF."""
    spark = corpus.sparkSession
    toks = with_tokens(corpus)
    tview = token_view(toks)

    if cfg.use_trie:
        gaz_mentions = match_trie(corpus, cfg.gazetteer)
    else:
        gaz_mentions = match_relational(toks, gazetteer_df(spark, cfg.gazetteer))
    rule_ments = ru.rule_mentions(tview)
    caps = ru.all_caps_mentions(tview)
    name_case = ru.name_case_mentions(tview)
    mentions = gaz_mentions.unionByName(rule_ments).unionByName(caps).unionByName(name_case)

    # votes: J2 projection for span LFs (gazetteer + rules), position-faithful
    # for caps detectors, frequency antirules as NOT_NAME.
    span_votes = vo.project_mentions_to_votes(
        tview, gaz_mentions.unionByName(rule_ments)
    )
    caps_votes = vo.mentions_to_votes_direct(caps.unionByName(name_case))
    votes = span_votes.unionByName(caps_votes)
    if cfg.frequency_antirules:
        freq = ar.word_frequency(tview)
        votes = votes.unionByName(ar.frequency_votes(tview, freq))
    return mentions, votes


def run(spark: SparkSession, corpus: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Execute (or resume) the full pipeline; returns the triples DataFrame
    read back from the warehouse."""
    wh = cfg.warehouse
    os.makedirs(wh, exist_ok=True)

    # ---- stage 1
    if not ck.stage_done(spark, wh, cfg.run_id, "s1"):
        mentions, votes = stage1_mentions(corpus, cfg)
        cat.write_table(mentions, wh, "mentions")
        cat.write_table(votes, wh, "votes")
        m = cat.read_table(spark, wh, "mentions")
        ck.record_stage(spark, wh, cfg.run_id, "s1",
                        partition_stats=ck.partition_stats(m),
                        rows_in=corpus.count(), rows_out=m.count())
    mentions = cat.read_table(spark, wh, "mentions")
    votes = cat.read_table(spark, wh, "votes")

    # ---- aggregate votes -> per-row entities (part of stage 1 output contract)
    if not ck.stage_done(spark, wh, cfg.run_id, "s1b"):
        agg = weighted_vote(votes, threshold=cfg.vote_threshold)
        ents = predicted_entities(agg, token_view(with_tokens(corpus)))
        cat.write_table(ents, wh, "entities")
        e = cat.read_table(spark, wh, "entities")
        ck.record_stage(spark, wh, cfg.run_id, "s1b", rows_out=e.count())
    entities = cat.read_table(spark, wh, "entities")

    # ---- stage 2
    if not ck.stage_done(spark, wh, cfg.run_id, "s2"):
        edges, dropped = link_surfaces(
            mentions, num_bands=cfg.lsh_bands,
            min_jaccard=cfg.lsh_min_jaccard, max_block=cfg.lsh_max_block,
        )
        cat.write_table(edges, wh, "edges")
        n_dropped = dropped.count()
        ck.record_stage(spark, wh, cfg.run_id, "s2",
                        rows_out=cat.read_table(spark, wh, "edges").count(),
                        counters={"dropped_blocks": n_dropped})
    edges = cat.read_table(spark, wh, "edges")

    # ---- stage 3
    if not ck.stage_done(spark, wh, cfg.run_id, "s3"):
        comps = connected_components(
            edges.where(F.col("sim") >= cfg.lsh_min_jaccard), max_iter=cfg.cc_max_iter
        )
        cat.write_table(comps, wh, "components")
        ck.record_stage(spark, wh, cfg.run_id, "s3",
                        rows_out=cat.read_table(spark, wh, "components").count())
    comps = cat.read_table(spark, wh, "components")

    # ---- stage 4
    if not ck.stage_done(spark, wh, cfg.run_id, "s4"):
        triples = dedup_triples(build_triples(corpus, entities, comps))
        audit = sha_invariant_audit(corpus, triples)
        sha_ok = audit.limit(1).count() == 0
        triples.repartition("pred").write.mode("overwrite").partitionBy("pred").parquet(
            os.path.join(wh, "triples")
        )
        t = cat.read_table(spark, wh, "triples")
        ck.record_stage(spark, wh, cfg.run_id, "s4",
                        partition_stats=ck.partition_stats(t),
                        rows_out=t.count(), sha_ok=sha_ok)
    return cat.read_table(spark, wh, "triples")
