"""IVF (inverted-file) ANN: centroid-partitioned approximate top-k.

Properties gated here (the cross-engine determinism of the contract query
`ivf_topk` is gated by the driver's DuckDB oracle, not re-tested):

* probe-everything degrades to exact: nprobe = n_cells makes the candidate
  set the whole corpus, so ivf_topk must equal brute_force_topk row-for-row.
* assignment is a partition: every vector lands in exactly one cell.
* the production quantizer (pyspark.ml KMeans) plugs in unchanged and
  recalls a healthy fraction of the exact top-k at nprobe << n_cells.
"""
import pytest
from pyspark.sql import functions as F

from ht_ner_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"
K = 5
QUERIES = 3


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(vecs):
    return vecs.where(F.col("vec_id") < QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding")


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect())


def test_probe_all_equals_brute_force(vecs, queries):
    cents = sim.seed_centroids(vecs, n_cells=8)
    exact = sim.brute_force_topk(vecs, queries, k=K)
    approx = sim.ivf_topk(vecs, queries, cents, k=K, nprobe=len(cents))
    assert _rows(approx.select("query_id", "neighbor_id", "rank")) == \
        _rows(exact.select("query_id", "neighbor_id", "rank"))


def test_assignment_partitions_corpus(vecs, queries):
    cents = sim.seed_centroids(vecs, n_cells=16)
    n = vecs.count()
    # reconstruct the assignment the operator uses: nprobe=1 probes of the
    # corpus against itself = each vector's own cell, exactly once
    own = sim.ivf_topk(
        vecs, vecs.select(F.col("vec_id").alias("query_id"), "embedding"),
        cents, k=1, nprobe=1)
    assert own.select("query_id").distinct().count() <= n
    cells = sim._cell_sims(  # noqa: SLF001 - asserting the internal shape
        F.col("embedding").cast("array<double>"), cents)
    asg = vecs.select(
        (F.array_position(cells, F.array_max(cells)) - 1).alias("cell"))
    assert asg.where(F.col("cell").isNull()).count() == 0
    assert asg.count() == n
    assert asg.where((F.col("cell") < 0) | (F.col("cell") >= 16)).count() == 0


def test_seed_centroids_deterministic(vecs):
    a = sim.seed_centroids(vecs, n_cells=4)
    b = sim.seed_centroids(vecs, n_cells=4)
    assert a == b
    assert [i for i, _ in a] == [0, 1, 2, 3]
    assert all(len(v) == 64 for _, v in a)


def test_kmeans_quantizer_plugs_in(vecs, queries):
    cents = sim.kmeans_centroids(vecs, n_cells=8, seed=42, max_iter=5)
    assert len(cents) == 8
    exact = {(r["query_id"], r["neighbor_id"])
             for r in sim.brute_force_topk(vecs, queries, k=K).collect()}
    got = sim.ivf_topk(vecs, queries, cents, k=K, nprobe=3)
    approx = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    recall = len(exact & approx) / len(exact)
    # synthetic embeddings are adversarially unclustered (mean top-5 cosine
    # ~0.32 — see bucketed_ann_topk docstring); kmeans cells at nprobe 3/8
    # still must beat random candidate sampling by a wide margin
    assert recall >= 0.4, f"kmeans-IVF recall {recall:.2f}"


def test_norm_outliers_planted(spark):
    from ht_ner_spark.operators.similarity import norm_outliers

    rows = [(i, [1.0, 0.0]) for i in range(8)]          # norm2 = 1
    rows += [(100, [0.0, 0.0]), (101, [10.0, 10.0])]    # degenerate tails
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in norm_outliers(emb, frac=0.1).collect()}
    assert out[100]["flag"] == "low" and out[100]["norm2"] == 0.0
    assert out[101]["flag"] == "high" and abs(out[101]["norm2"] - 200.0) < 1e-6
    assert all(out[i]["flag"] == "ok" for i in range(8))
