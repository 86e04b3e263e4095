"""Incremental KG upsert (operators/triples.upsert_triples): CDC status
tags, max-conf merge, exactly-one-row-per-key — plus the contract query's
portable md5 split exercising all three statuses."""
import pytest

from ht_ner_spark import contract as C
from ht_ner_spark.operators.triples import upsert_triples

SCHEMA = "subj string, pred string, obj string, conf double"


def test_statuses_and_merge(spark):
    existing = spark.createDataFrame(
        [("a", "p", "x", 0.6), ("a", "p", "x", 0.4),   # dup key, max = 0.6
         ("b", "p", "y", 0.9),
         ("c", "p", "z", 0.5)], SCHEMA)
    delta = spark.createDataFrame(
        [("a", "p", "x", 0.8),    # raises 0.6 -> updated
         ("b", "p", "y", 0.7),    # lower      -> unchanged
         ("d", "p", "w", 0.3)],   # absent     -> new
        SCHEMA)
    got = {(r["subj"], r["pred"], r["obj"]): (r["conf"], r["status"])
           for r in upsert_triples(existing, delta).collect()}
    assert got == {
        ("a", "p", "x"): (0.8, "updated"),
        ("b", "p", "y"): (0.9, "unchanged"),
        ("c", "p", "z"): (0.5, "unchanged"),   # untouched by delta
        ("d", "p", "w"): (0.3, "new"),
    }


def test_contract_split_covers_all_statuses(spark):
    out = C.q_kg_upsert(spark, "/root/testdata/sf0.001")
    counts = {r["status"]: r["n"] for r in
              out.groupBy("status").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"new", "updated", "unchanged"}
    assert all(v > 0 for v in counts.values())
    # key set == union of both sides' keys, one row each
    assert out.count() == out.select("subj", "pred", "obj").distinct().count()


def test_diff_triples_all_statuses(spark):
    from ht_ner_spark.operators.triples import diff_triples

    old = spark.createDataFrame(
        [("a", "p", "x", 2), ("a", "p", "y", 1), ("b", "p", "x", 3)],
        "subj string, pred string, obj string, n_witnesses long")
    new = spark.createDataFrame(
        [("a", "p", "x", 2), ("a", "p", "y", 5), ("c", "p", "z", 1)],
        "subj string, pred string, obj string, n_witnesses long")
    got = {(r["subj"], r["pred"], r["obj"]): (r["old_w"], r["new_w"],
                                              r["status"])
           for r in diff_triples(old, new).collect()}
    assert got == {
        ("a", "p", "x"): (2, 2, "unchanged"),
        ("a", "p", "y"): (1, 5, "changed"),
        ("b", "p", "x"): (3, None, "removed"),
        ("c", "p", "z"): (None, 1, "added"),
    }


def test_scd2_intervals_versions(spark):
    from datetime import datetime
    from ht_ner_spark.operators.eventstats import scd2_intervals

    rows = [
        (1, datetime(2024, 1, 1), 10, "t", 1.0),
        (2, datetime(2024, 1, 3), 10, "t", 2.0),
        (3, datetime(2024, 1, 2), 10, "t", 1.5),
        (4, datetime(2024, 1, 1), 11, "t", 9.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = {(r["user_id"], r["version"]): r
           for r in scd2_intervals(ev).collect()}
    assert [got[(10, v)]["value"] for v in (1, 2, 3)] == [1.0, 1.5, 2.0]
    assert got[(10, 1)]["valid_to"] == datetime(2024, 1, 2)
    assert got[(10, 3)]["valid_to"] is None and got[(10, 3)]["is_current"]
    assert not got[(10, 1)]["is_current"]
    assert got[(11, 1)]["is_current"]


def test_pred_profile_functional_flag(spark):
    from ht_ner_spark.operators.triples import pred_profile

    t = spark.createDataFrame(
        [("a", "imports", "x", 1), ("a", "imports", "y", 1),
         ("b", "imports", "x", 2),
         ("a", "lang_is", "python", 1), ("b", "lang_is", "go", 1)],
        "subj string, pred string, obj string, n_witnesses long")
    got = {r["pred"]: r for r in pred_profile(t).collect()}
    imp, lng = got["imports"], got["lang_is"]
    assert (imp["n_facts"], imp["n_subjects"], imp["n_objects"]) == (3, 2, 2)
    assert imp["max_fanout"] == 2 and not imp["is_functional"]
    assert imp["avg_fanout"] == 1.5
    assert lng["is_functional"] and lng["max_fanout"] == 1
    assert (lng["n_facts"], lng["n_subjects"], lng["n_objects"]) == (2, 2, 2)


def test_dangling_refs_resolution(spark):
    from ht_ner_spark.operators.triples import dangling_refs

    t = spark.createDataFrame(
        [("a", "imports", "m1", 1), ("b", "imports", "m1", 1),
         ("a", "imports", "m2", 1),
         ("c", "defines", "m1", 1), ("c", "defines", "m9", 1)],
        "subj string, pred string, obj string, n_witnesses long")
    got = {r["obj"]: (r["n_refs"], r["resolved"])
           for r in dangling_refs(t).collect()}
    # m9 is defined but never referenced: absent (the audit is ref-driven)
    assert got == {"m1": (2, True), "m2": (1, False)}


def test_snapshot_at_matches_scd2_interval(spark):
    from datetime import datetime
    from ht_ner_spark.operators.eventstats import scd2_intervals, snapshot_at

    rows = [
        (1, datetime(2024, 1, 1), 10, "t", 1.0),
        (2, datetime(2024, 1, 3), 10, "t", 2.0),
        (3, datetime(2024, 1, 2), 10, "t", 1.5),
        (4, datetime(2024, 1, 5), 11, "t", 9.0),   # after the cutoff
        (5, datetime(2024, 1, 2), 12, "u", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    at = "2024-01-02 12:00:00"
    snap = {(r["user_id"], r["event_type"]):
            (r["value"], r["valid_from"], r["version"])
            for r in snapshot_at(ev, at).collect()}
    assert snap == {
        (10, "t"): (1.5, datetime(2024, 1, 2), 2),
        (12, "u"): (7.0, datetime(2024, 1, 2), 1),
    }
    # property: equals the SCD2 interval containing `at`
    cutoff = datetime(2024, 1, 2, 12)
    iv = scd2_intervals(ev)
    live = {(r["user_id"], r["event_type"]):
            (r["value"], r["valid_from"], r["version"])
            for r in iv.collect()
            if r["valid_from"] <= cutoff
            and (r["valid_to"] is None or r["valid_to"] > cutoff)}
    assert snap == live


def test_diff_triples_null_weights_keep_presence(spark):
    from ht_ner_spark.operators.triples import diff_triples

    old = spark.createDataFrame(
        [("a", "p", "x", None), ("b", "p", "y", 1)],
        "subj string, pred string, obj string, n_witnesses long")
    new = spark.createDataFrame(
        [("a", "p", "x", 2), ("b", "p", "y", None)],
        "subj string, pred string, obj string, n_witnesses long")
    got = {(r["subj"], r["obj"]): r["status"]
           for r in diff_triples(old, new).collect()}
    # NULL-summed weights must not read as an absent key
    assert got == {("a", "x"): "changed", ("b", "y"): "changed"}


def test_infer_entity_types_majority_and_tiebreak(spark):
    from ht_ner_spark.operators.triples import infer_entity_types

    t = spark.createDataFrame(
        [("a", "imports", "m1", 3), ("b", "imports", "m1", 1),
         ("c", "defines", "m1", 1),            # m1: imports 4 vs defines 1
         ("a", "defines", "s1", 2),            # s1: defines only
         ("a", "imports", "tie", 1), ("a", "defines", "tie", 1)],
        "subj string, pred string, obj string, n_witnesses long")
    got = {r["entity"]: r for r in
           infer_entity_types(t, weight_col="n_witnesses").collect()}
    m1 = got["m1"]
    assert m1["entity_type"] == "imports"
    assert (m1["n_top"], m1["n_total"]) == (4, 5)
    assert m1["confidence"] == 0.8
    assert got["s1"]["entity_type"] == "defines"
    assert got["s1"]["confidence"] == 1.0
    # equal weight -> lexicographically smallest predicate wins
    assert got["tie"]["entity_type"] == "defines"
    assert got["tie"]["confidence"] == 0.5


def test_infer_entity_types_unweighted_counts_rows(spark):
    from ht_ner_spark.operators.triples import infer_entity_types

    t = spark.createDataFrame(
        [("a", "p", "x", 99), ("b", "p", "x", 99), ("a", "q", "x", 99)],
        "subj string, pred string, obj string, n_witnesses long")
    r = infer_entity_types(t).collect()[0]   # weight_col=None ignores weights
    assert (r["entity_type"], r["n_top"], r["n_total"]) == ("p", 2, 3)


def test_export_property_graph_ids(spark):
    import hashlib

    from ht_ner_spark.operators.triples import export_property_graph

    t = spark.createDataFrame(
        [("a", "imports", "m1"), ("a", "imports", "m1"),   # dup collapses
         ("b", "defines", "s1"), ("a", "defines", "m1")],
        "subj string, pred string, obj string")
    rows = export_property_graph(t).collect()
    assert len(rows) == 3                                   # deduped
    by_edge = {(r["subj"], r["pred"], r["obj"]): r for r in rows}

    def nid(name):
        return int(hashlib.md5(name.encode()).hexdigest()[:15], 16)

    e = by_edge[("a", "imports", "m1")]
    assert e["src_id"] == nid("a") and e["dst_id"] == nid("m1")
    # dense relation ids, alphabetical: defines=1, imports=2
    assert e["rel_id"] == 2
    assert by_edge[("b", "defines", "s1")]["rel_id"] == 1
    # shared node -> identical id across edges (hash-portable invariant)
    assert by_edge[("a", "defines", "m1")]["dst_id"] == e["dst_id"]
    assert by_edge[("a", "defines", "m1")]["src_id"] == e["src_id"]


def test_induce_schema_typed_and_untyped(spark):
    from ht_ner_spark.operators.triples import induce_schema

    t = spark.createDataFrame(
        [("r1", "imports", "m1"), ("r1", "imports", "m2"),
         ("r2", "imports", "m1"), ("r1", "defines", "s1")],
        "subj string, pred string, obj string")
    types = spark.createDataFrame(
        [("m1", "module"), ("m2", "module"), ("s1", "symbol")],
        "entity string, entity_type string")
    got = {(r["subj_type"], r["pred"], r["obj_type"]):
           (r["n_facts"], r["n_subjects"], r["n_objects"])
           for r in induce_schema(t, types).collect()}
    assert got == {
        ("<untyped>", "imports", "module"): (3, 2, 2),
        ("<untyped>", "defines", "symbol"): (1, 1, 1),
    }
