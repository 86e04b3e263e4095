"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  query set, score with within-row array arithmetic (zip_with + aggregate,
  JVM-side), rank with a per-query window. One shuffle (the window).
* sign-bucket ANN — the scale path: multi-table LSH; table t's bucket key is
  the sign bits of coordinate slice [t*b, (t+1)*b); candidates share ANY
  table's bucket (or a 1-bit probe neighborhood of it), then exact cosine
  within candidates. At 10^9 vectors the bucket joins replace the cartesian
  scan; recall is tunable via tables/bits/probes.
* embedding near-duplicate pairs: cosine >= threshold within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """(query_id, neighbor_id, rank, sim): exact top-k by cosine.
    `queries` must be small (broadcast); ties broken by neighbor_id asc."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col).cast("array<double>"), F.col("qvec").cast("array<double>")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Coarse LSH bucket: '+'/'-' of the first `bits` coordinates."""
    return F.concat_ws(
        "",
        F.transform(
            F.slice(vec, 1, bits), lambda v: F.when(v >= 0, "1").otherwise("0")
        ),
    )


def bucketed_ann_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                      bits: int = 8, tables: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k via MULTI-TABLE sign-bucket LSH: table t keys on the
    sign bits of coordinate slice [t*bits, (t+1)*bits); a candidate matches
    if it shares ANY table's bucket with the query (or a radius-1 multiprobe
    flip of it); exact cosine re-rank within the candidate union.

    One table (the round-1 form) recalls ~0.2 of the exact top-5 on
    low-similarity embeddings; the union over 8 disjoint-slice tables
    recalls ~0.6 at a ~25% candidate fraction on the synthetic testdata
    (mean top-5 cosine only 0.32 — adversarially unclustered; real corpora
    with near-dup structure sit far right of this trade-off curve). Tune
    recall/cost with ``tables`` (more -> higher recall, more candidates) and
    ``bits`` (more -> fewer candidates, lower recall).

    Requires dim >= bits*tables (default 64 = the embeddings testdata dim).
    All bucket keys are substrings of ONE sign string — no arithmetic, so
    the DuckDB oracle reproduces buckets bit-for-bit."""
    nbits = bits * tables
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vvec"),
        sign_bucket(F.col(vec_col), nbits).alias("sb"),
    )
    tbl = F.explode(
        F.array(*[
            F.struct(F.lit(t).alias("t"),
                     F.substring("sb", t * bits + 1, bits).alias("key"))
            for t in range(tables)
        ])
    ).alias("tk")
    vt = v.select("neighbor_id", "vvec", tbl).select(
        "neighbor_id", "vvec", F.col("tk.t").alias("t"), F.col("tk.key").alias("key")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(F.col(vec_col), nbits).alias("sb"),
    )

    def flip(s, i):
        c = F.substring(s, i + 1, 1)
        fc = F.when(c == "1", "0").otherwise("1")
        return F.concat(F.substring(s, 1, i), fc, F.substring(s, i + 2, bits))

    probe_structs = []
    for t in range(tables):
        qb = F.substring("sb", t * bits + 1, bits)
        for p in [qb] + [flip(qb, i) for i in range(bits)]:
            probe_structs.append(F.struct(F.lit(t).alias("t"), p.alias("key")))
    qt = q.select(
        "query_id", "qvec", F.explode(F.array(*probe_structs)).alias("tk")
    ).select("query_id", "qvec", F.col("tk.t").alias("t"), F.col("tk.key").alias("key"))

    cand = vt.join(qt, ["t", "key"]).where(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        cosine(F.col("vvec").cast("array<double>"), F.col("qvec").cast("array<double>")).alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dupes(vectors: DataFrame, min_cosine: float = 0.95,
                         bits: int = 6, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_block: int = 1000
                         ) -> tuple[DataFrame, DataFrame]:
    """-> (pairs(src, dst, sim), dropped_blocks(bucket, block_size)):
    near-duplicate vector pairs via sign-bucket blocking + exact cosine
    verify. Near-identical vectors share sign buckets with high probability;
    oversized buckets are excluded and REPORTED (no silent caps — same
    contract as linking.lsh_candidates)."""
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    sized = v.withColumn("bs", F.count(F.lit(1)).over(Window.partitionBy("bucket")))
    dropped = (
        sized.where(F.col("bs") > max_block)
        .groupBy("bucket")
        .agg(F.max("bs").alias("block_size"))
    )
    ok = sized.where(F.col("bs") <= max_block)
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("src"), F.col("b.id").alias("dst"),
            cosine(F.col("a.vec").cast("array<double>"),
                   F.col("b.vec").cast("array<double>")).alias("sim"),
        )
    )
    return pairs.where(F.col("sim") >= min_cosine), dropped
