"""Graph-materialize analytics over the flagship pipeline's emitted KG
(contract `graph_stats` / `hub_entities`). Cross-engine value equality is
gated by the driver's DuckDB oracle; here the internal consistency:

* per-predicate triple counts partition the triple set exactly;
* hub ranks are 1..k contiguous with non-increasing degree and the
  documented (degree DESC, subj ASC) tie-break;
* every hub's degree matches a direct recount of the triple frame.
"""
import pytest

from ht_ner_spark import contract as C

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def triples(spark):
    return C.q_kg_pipeline_triples(spark, SF).cache()


def test_graph_stats_partitions_triples(spark, triples):
    stats = C.q_graph_stats(spark, SF).collect()
    assert sum(r["n_triples"] for r in stats) == triples.count()
    by_pred = {r["pred"]: r for r in stats}
    assert len(by_pred) == len(stats)  # one row per predicate
    for pred, r in by_pred.items():
        sub = triples.where(triples.pred == pred)
        assert r["n_subj"] == sub.select("subj").distinct().count()
        assert r["n_obj"] == sub.select("obj").distinct().count()


def test_hub_entities_topk_shape(spark, triples):
    hubs = C.q_hub_entities(spark, SF).orderBy("rank").collect()
    assert 0 < len(hubs) <= C.HUB_TOP_K
    assert [r["rank"] for r in hubs] == list(range(1, len(hubs) + 1))
    degs = [r["degree"] for r in hubs]
    assert degs == sorted(degs, reverse=True)
    for a, b in zip(hubs, hubs[1:]):  # tie-break: subj ASC within a degree
        if a["degree"] == b["degree"]:
            assert a["subj"] < b["subj"]
    # degrees are honest recounts of the triple frame
    from collections import Counter

    true_deg = Counter(r["subj"] for r in triples.select("subj").collect())
    for r in hubs:
        assert true_deg[r["subj"]] == r["degree"]
