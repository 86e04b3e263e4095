"""Explicit skew salting (operators/salt.py): salted results must be
row-identical to unsalted (SURVEY §5.4 property: salted join == unsalted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ht_ner_spark.operators.components import connected_components
from ht_ner_spark.operators.salt import salted_join, salted_min_agg


def test_salted_min_agg_equals_plain(spark):
    rows = [(f"k{i % 5}", f"v{(i * 7) % 23}", f"s{i}") for i in range(500)]
    # hub key: k0 gets 10x the rows
    rows += [("k0", f"v{i % 9}", f"hub{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, val string, src string")
    plain = {(r["key"], r["val"])
             for r in df.groupBy("key").agg(F.min("val").alias("val")).collect()}
    salted = {(r["key"], r["val"])
              for r in salted_min_agg(df, "key", "val", k=8, salt_by=["src"]).collect()}
    assert plain == salted


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [(f"k{i % 4}", i) for i in range(2000)], "key string, x long"
    )
    small = spark.createDataFrame(
        [(f"k{i}", f"dim{i}") for i in range(6)], "key string, d string"
    )
    plain = {(r["key"], r["x"], r["d"]) for r in big.join(small, "key").collect()}
    salted = {(r["key"], r["x"], r["d"])
              for r in salted_join(big, small, "key", k=8).collect()}
    assert plain == salted
    assert len(salted) == 2000 * 1  # every big row matches exactly one dim


def test_cc_salted_equals_unsalted(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(0, 40, 2)]
    edges += [("hub", f"n{i}") for i in range(0, 40, 4)]  # hub entity
    df = spark.createDataFrame(edges, "src string, dst string")
    # driver_budget=0: the salted-vs-unsalted comparison must exercise the
    # DISTRIBUTED loop (the driver funnel has no aggregation to salt)
    a = {(r["entity_id"], r["component_id"])
         for r in connected_components(
             df, max_iter=20, salt_k=16, driver_budget=0).collect()}
    b = {(r["entity_id"], r["component_id"])
         for r in connected_components(
             df, max_iter=20, salt_k=0, driver_budget=0).collect()}
    assert a == b
    assert len(a) > 0
