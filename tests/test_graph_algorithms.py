"""Graph algorithms over the materialized KG (operators/graph.py; contract
`graph_triangles` / `pagerank_topk`). Cross-engine value equality is the
driver's DuckDB gate; here each operator is recounted against a driver-side
brute-force oracle on the collected sf0.001 edge list, so the distributed
join shapes (wedge join, per-round contribution shuffle) are checked against
plain Python, not against themselves.
"""
from collections import defaultdict

import pytest

from ht_ner_spark import contract as C
from ht_ner_spark.operators.graph import (
    PR_DAMPING, PR_ITERS, copair_edges, pagerank, triangle_summary,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def triples(spark):
    return C.q_kg_pipeline_triples(spark, SF).cache()


def test_triangle_summary_matches_bruteforce(spark, triples):
    row = triangle_summary(triples).collect()[0]
    edges, _ = copair_edges(triples)
    e = {(r["u"], r["v"]) for r in edges.collect()}
    assert row["n_edges"] == len(e)
    adj = defaultdict(set)
    for u, v in e:
        adj[u].add(v)
        adj[v].add(u)
    assert row["max_degree"] == max((len(s) for s in adj.values()), default=0)
    tri = sum(
        1 for u, v in e for w in (adj[u] & adj[v]) if v < w
    )  # oriented count: each triangle once via its (min, mid) edge
    assert row["n_triangles"] == tri
    assert tri > 0  # non-vacuous on the test corpus
    assert row["n_nodes"] == triples.select("subj").distinct().count()


def test_copair_degree_cap_reports_dropped(spark, triples):
    full, none_dropped = copair_edges(triples)
    assert none_dropped.count() == 0
    capped, dropped = copair_edges(triples, max_obj_degree=2)
    hot = {r["obj"] for r in dropped.collect()}
    assert all(r["obj_deg"] > 2 for r in dropped.collect())
    # capped edge set == brute-force projection excluding hot objects
    so = [(r["subj"], r["obj"]) for r in
          triples.select("subj", "obj").distinct().collect()]
    by_obj = defaultdict(list)
    for s, o in so:
        if o not in hot:
            by_obj[o].append(s)
    want = {(a, b) for subs in by_obj.values()
            for a in subs for b in subs if a < b}
    assert {(r["u"], r["v"]) for r in capped.collect()} == want
    assert capped.count() < full.count()


def test_pagerank_matches_local_iterations(spark, triples):
    got = {r["node"]: r["pr"] for r in pagerank(triples).collect()}
    e = {(r["src"], r["dst"]) for r in triples.select(
        triples.subj.alias("src"), triples.obj.alias("dst"))
        .distinct().collect()}
    nodes = {u for u, _ in e} | {v for _, v in e}
    outdeg = defaultdict(int)
    for u, _ in e:
        outdeg[u] += 1
    pr = {n: 1.0 for n in nodes}
    for _ in range(PR_ITERS):
        s = defaultdict(float)
        for u, v in e:
            s[v] += pr[u] / outdeg[u]
        pr = {n: (1.0 - PR_DAMPING) + PR_DAMPING * s[n] for n in nodes}
    assert set(got) == nodes
    assert all(abs(got[n] - pr[n]) < 1e-9 for n in nodes)
    # structural invariants: floor at (1-d) for in-degree-0 nodes, never below
    indeg0 = nodes - {v for _, v in e}
    assert indeg0 and all(got[n] == pytest.approx(1.0 - PR_DAMPING)
                          for n in indeg0)
    assert min(got.values()) >= (1.0 - PR_DAMPING) - 1e-12


def test_label_propagation_invariants(spark):
    from ht_ner_spark.operators.graph import label_propagation

    # two disjoint triangles: labels must never cross components
    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a"),
         ("x", "p", "y"), ("y", "p", "z"), ("z", "p", "x")],
        "subj string, pred string, obj string",
    )
    out = {r["node"]: r["community"] for r in label_propagation(triples).collect()}
    assert set(out) == {"a", "b", "c", "x", "y", "z"}       # total
    left, right = {"a", "b", "c"}, {"x", "y", "z"}
    assert all(out[n] in left for n in left)                # no cross-component
    assert all(out[n] in right for n in right)
    again = {r["node"]: r["community"] for r in label_propagation(triples).collect()}
    assert out == again                                     # deterministic


def test_khop_neighborhood_planted(spark):
    from ht_ner_spark.operators.graph import khop_neighborhood

    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("x", "p", "a")],
        "subj string, pred string, obj string",
    )
    out = {r["node"]: r["dist"] for r in
           khop_neighborhood(triples, ["a"], hops=2).collect()}
    # undirected: a->{b,x} at 1; {c} via b at 2; x's other side none; d is 3 hops
    assert out == {"a": 0, "b": 1, "x": 1, "c": 2}

    out1 = {r["node"]: r["dist"] for r in
            khop_neighborhood(triples, ["a"], hops=2,
                              broadcast_frontier=False).collect()}
    assert out1 == out


def test_adamic_adar_planted(spark):
    import math

    from ht_ner_spark.operators.graph import adamic_adar

    # path a-b-c: only non-adjacent distance-2 pair is (a,c) through b
    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")], "subj string, pred string, obj string"
    )
    preds, dropped = adamic_adar(t)
    rows = preds.collect()
    assert len(rows) == 1 and dropped.count() == 0
    r = rows[0]
    assert (r["u"], r["v"], r["common"]) == ("a", "c", 1)
    assert abs(r["aa"] - 1 / math.log(2)) < 1e-5

    # hub cap: star center z with 3 leaves; capping deg>2 drops z entirely
    star = spark.createDataFrame(
        [("z", "p", "l1"), ("z", "p", "l2"), ("z", "p", "l3")],
        "subj string, pred string, obj string",
    )
    preds2, dropped2 = adamic_adar(star, max_center_degree=2)
    assert preds2.count() == 0
    assert {r["node"] for r in dropped2.collect()} == {"z"}


def test_entity_cards_planted(spark):
    from ht_ner_spark.operators.graph import entity_cards

    t = spark.createDataFrame(
        [("a", "p1", "x"), ("a", "p1", "y"), ("a", "p2", "z"),
         ("b", "p9", "w")],
        "subj string, pred string, obj string",
    )
    out = {r["subj"]: r for r in entity_cards(t, obj_sample_k=2).collect()}
    assert out["a"]["n_triples"] == 3 and out["a"]["n_preds"] == 2
    assert out["a"]["top_pred"] == "p1" and out["a"]["top_pred_n"] == 2
    assert out["a"]["objs_sample"] == "x,y"     # capped at 2, lexicographic
    assert out["b"]["top_pred"] == "p9" and out["b"]["objs_sample"] == "w"


def test_random_walks_planted(spark):
    import hashlib

    from ht_ner_spark.operators.graph import random_walks

    # path graph a-b-c: from b, step 1 chooses argmin-md5 of {a, c}
    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")], "subj string, pred string, obj string"
    )
    out = {(r["node"], r["wid"]): r["path"]
           for r in random_walks(t, walks_per_node=2, length=3).collect()}
    assert len(out) == 6                       # 3 nodes x 2 walks
    # replay walk (b, 0) in pure python
    cur, path = "b", "b"
    for step in (1, 2):
        nbrs = {"a": ["b"], "b": ["a", "c"], "c": ["b"]}[cur]
        cur = min(nbrs, key=lambda d: hashlib.md5(
            f"b\x1f0\x1f{step}\x1f{d}".encode()).hexdigest())
        path += "->" + cur
    assert out[("b", 0)] == path
    # a's walk is forced: a->b->{a or c}
    assert out[("a", 0)].startswith("a->b->")
    # all walks have full length
    assert all(p.count("->") == 2 for p in out.values())


def test_kcore_planted(spark):
    from ht_ner_spark.operators.graph import kcore

    # triangle a-b-c (2-core) plus a pendant chain c-d-e (peels off)
    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("a", "p", "c"),
         ("c", "p", "d"), ("d", "p", "e")],
        "subj string, pred string, obj string",
    )
    out = {r["node"]: r["deg"] for r in kcore(t, k=2, rounds=3).collect()}
    # e peels round 1, d peels round 2; the triangle survives with deg 2
    assert out == {"a": 2, "b": 2, "c": 2}


def test_personalized_pagerank_planted(spark):
    from ht_ner_spark.operators.graph import personalized_pagerank

    # star: seed s -> x, y; unrelated z -> w gets zero mass
    t = spark.createDataFrame(
        [("s", "p", "x"), ("s", "p", "y"), ("z", "p", "w")],
        "subj string, pred string, obj string",
    )
    out = {r["node"]: r["pr"]
           for r in personalized_pagerank(t, ["s"], iters=2).collect()}
    assert out["s"] > 0                      # restart mass stays on seed
    assert abs(out["x"] - out["y"]) < 1e-12  # symmetric children
    assert out["x"] > 0 and out["z"] == 0.0 and out["w"] == 0.0
