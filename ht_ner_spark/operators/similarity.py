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
                      bits: int = 6, tables: int = 10, radius: int = 1,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k via MULTI-TABLE sign-bucket LSH: table t keys on the
    sign bits of coordinate slice [t*bits, (t+1)*bits); a candidate matches
    if it shares ANY table's bucket with the query (or a hamming-``radius``
    multiprobe flip of it, radius 0|1|2); exact cosine re-rank within the
    candidate union.

    Defaults (10 tables x 6 bits, radius 1) are the committed-sweep point
    with recall >= 0.9 at the lowest candidate fraction on the synthetic
    sf0.1 testdata (ANN_SWEEP_r04.json, recall@10 over 50 queries):

        tables bits radius   recall  cand_frac
        10     6    1        0.958   0.686   <- default (round 5)
        8      6    1        0.918   0.603
        16     4    0        0.932   0.646
        8      8    1        0.658   0.250   <- round-4 default, retired
        8      8    2        0.978   0.716

    The testdata is adversarially unclustered (mean top-5 cosine ~0.32), so
    recall tracks candidate fraction almost linearly and >=0.9 recall costs
    >=0.6 of the corpus as candidates — which is why the engine's default
    ANN path is IVF, not LSH (see ivf_topk); real corpora with near-dup
    structure sit far left of this curve. Tune with ``tables`` (more ->
    higher recall, more candidates), ``bits`` (more -> fewer candidates,
    lower recall), ``radius``.

    Requires dim >= bits*tables (default 60 <= the embeddings testdata's 64).
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

    if radius not in (0, 1, 2):
        raise ValueError(f"radius must be 0, 1 or 2, got {radius}")
    probe_structs = []
    for t in range(tables):
        qb = F.substring("sb", t * bits + 1, bits)
        probes = [qb]
        if radius >= 1:
            probes += [flip(qb, i) for i in range(bits)]
        if radius >= 2:
            import itertools

            probes += [flip(flip(qb, i), j)
                       for i, j in itertools.combinations(range(bits), 2)]
        for p in probes:
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


def seed_centroids(vectors: DataFrame, n_cells: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   min_id: int = 0) -> list[tuple[int, list[float]]]:
    """Deterministic medoid coarse quantizer: the ``n_cells`` vectors of
    smallest id >= ``min_id``, cell_id = their rank in id order. A pure
    function of the data (no RNG, no float accumulation), so a SQL oracle
    reproduces the cells bit-for-bit — the determinism twin of
    :func:`kmeans_centroids` (same role as FakeTokenClassifier vs
    HFTokenClassifier in M1). Pass ``min_id`` past the query-id range to
    get the HONEST medoid baseline (bench ann_tradeoff's
    ivf_medoid_disjoint and tests/test_ivf.py use this — one
    implementation, not three copies).

    EVALUATION CAVEAT (round-5 diagnosis): recall measured with a query set
    that overlaps these lowest-id medoids is INFLATED — a query that is
    itself a centroid probes cells centered on itself, and its true
    neighbors' cell assignments correlate with exactly those cells. On the
    sf0.1 testdata at (64 cells, nprobe 12) this artifact is worth +0.42
    recall: 0.962 with queries ``vec_id < 50`` (all of them medoids) vs
    0.544 with medoids drawn disjoint from the query set (ids past the
    query range — the bench/sweep construction; a second draw from ids
    >= 1000 measured 0.452). The honest quantizer ranking at matched
    candidate fraction (~0.19) is
    kmeans 0.614 > disjoint-medoid 0.544 — the production quantizer WINS;
    gate recall claims on :func:`kmeans_centroids` or disjoint medoids,
    never on overlapping ones (tests/test_ivf.py does)."""
    rows = (vectors.where(F.col(id_col) >= min_id)
            .select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy("id").limit(n_cells).collect())
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def kmeans_centroids(vectors: DataFrame, n_cells: int = 16, seed: int = 42,
                     max_iter: int = 20, vec_col: str = "embedding"
                     ) -> list[tuple[int, list[float]]]:
    """Production coarse quantizer: pyspark.ml KMeans over the embedding
    column (distributed Lloyd's — one pass over the data per iteration,
    centroids broadcast by MLlib). Returns [(cell_id, centroid)] for
    :func:`ivf_topk`. Seeded, but float reduction order makes it
    cross-engine nondeterministic — pytest gates it on recall, the DuckDB
    contract oracle pins the seed_centroids twin instead.

    Recall is honest and healthy: at (64 cells, nprobe 12) on sf0.1 it
    recalls 0.614 of the exact top-10 from a 0.191 candidate fraction — a
    3.2x lift over random sampling on data with NO cluster structure, and
    ahead of query-disjoint medoids (0.544) at the same cost. The round-4
    "kmeans 0.614 vs seed 0.962" gap was an evaluation artifact of
    overlapping queries and medoids (see seed_centroids), not a quantizer
    defect; Euclidean-vs-cosine metric mismatch was also ruled out —
    L2-normalizing inputs before the fit (spherical k-means) measured an
    identical 0.614 at the same settings, so the raw-vector fit is kept.
    For >= 0.8 recall on unclustered corpora probe wider: nprobe 28/64 ->
    0.840, 32/64 -> 0.870 (IVF_NPROBE_PROD in contract.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [(i, list(map(float, c))) for i, c in enumerate(model.clusterCenters())]


def _cell_sims(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """array<double> of cosine(vec, centroid_i) in cell order — the literal
    centroid table is folded into the plan, so assignment is a pure per-row
    Project: ZERO shuffle and no N x K candidate explosion at any corpus
    size (the IVF-assignment shape a 10^9-vector index needs). Keep
    ``len(centroids)`` modest (<= ~256): each centroid is a plan literal."""
    cents = F.array(*[
        F.array(*[F.lit(float(x)) for x in cv]) for _, cv in centroids
    ])
    return F.transform(cents, lambda c: cosine(vec, c))


def ivf_topk(vectors: DataFrame, queries: DataFrame,
             centroids: list[tuple[int, list[float]]], k: int = 5,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", query_id_col: str = "query_id"
             ) -> DataFrame:
    """(query_id, neighbor_id, rank): approximate top-k via an IVF (inverted
    file) index — the centroid-partitioned counterpart of the sign-bucket
    LSH path. Every vector is assigned to its nearest centroid's cell (ties
    -> lowest cell id); a query probes its ``nprobe`` nearest cells and
    exact-cosine re-ranks within them. nprobe = len(centroids) degrades to
    exact brute force (tests/test_ivf.py asserts equality).

    Scale shape: assignment is a shuffle-free per-row Project (see
    _cell_sims); the only shuffles are the cell-key candidate join and the
    per-query top-k window — at 10^9 vectors the cell join replaces the
    brute-force cartesian, and cells are size-balanced by construction when
    centroids come from kmeans_centroids."""
    n_cells = len(centroids)
    nprobe = min(nprobe, n_cells)
    sims = _cell_sims(F.col(vec_col).cast("array<double>"), centroids)
    # argmax with lowest-index tie-break: array_position finds the FIRST
    # occurrence of the max
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vvec"),
        (F.array_position(sims, F.array_max(sims)) - 1).cast("int").alias("cell"),
    )
    # top-nprobe cells per query, within-row: sort (−sim, cell) structs asc
    probe_cells = F.slice(
        F.array_sort(
            F.zip_with(
                sims, F.sequence(F.lit(0), F.lit(n_cells - 1)),
                lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
            )
        ),
        1, nprobe,
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_cells.getField("cell")).alias("cell"),
    )
    cand = v.join(q, "cell").where(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        cosine(F.col("vvec").cast("array<double>"),
               F.col("qvec").cast("array<double>")).alias("sim"),
    )
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


def semantic_dedup(vectors: DataFrame,
                   centroids: list[tuple[int, list[float]]],
                   tau: float = 0.5, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell, is_dup, dup_of): SemDeDup (Abbas et al. 2023) —
    cluster the embedding space with a coarse quantizer, then WITHIN each
    cluster drop every vector whose cosine to a lower-id cluster-mate is
    >= tau (the lower id is the kept representative; dup_of = the smallest
    such id, null for keepers). Greedy-by-id matches the paper's
    keep-one-per-neighborhood semantics deterministically.

    100 TB shape: cell assignment is the shuffle-free per-row Project of
    _cell_sims (centroids are plan literals — the IVF path's trick), so the
    only shuffle is the within-cell self-join; cells bound the quadratic
    term the way the paper's k-means clustering does (k scales with corpus
    size, cells stay ~|corpus|/k). Pass seed_centroids for the
    deterministic/oracle twin, kmeans_centroids in production."""
    sims = _cell_sims(F.col(vec_col).cast("array<double>"), centroids)
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        (F.array_position(sims, F.array_max(sims)) - 1).cast("int").alias("cell"),
    )
    a, b = v.alias("a"), v.alias("b")
    dup_of = (
        a.join(b, F.col("a.cell") == F.col("b.cell"))
        .where(F.col("b.vec_id") < F.col("a.vec_id"))
        .where(
            cosine(F.col("a.vec").cast("array<double>"),
                   F.col("b.vec").cast("array<double>")) >= tau
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.min(F.col("b.vec_id")).alias("dup_of"))
    )
    return (
        v.join(dup_of, "vec_id", "left")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            "cell",
            F.col("dup_of").isNotNull().alias("is_dup"),
            F.col("dup_of").cast("long").alias("dup_of"),
        )
    )


def norm_outliers(df: DataFrame, frac: float = 0.01,
                  id_col: str = "vec_id", vec_col: str = "embedding"
                  ) -> DataFrame:
    """(vec_id, norm2, flag): embedding quality gate — squared L2 norm per
    vector plus an outlier flag for the bottom/top ``frac`` tail by EXACT
    global rank ('low' | 'high' | 'ok'). Degenerate embeddings (near-zero
    or exploded norms) are the standard symptom of encoder failures
    upstream; curation drops or re-embeds the tails.

    Rank cutoffs are integer positions (ceil(frac*n)), not interpolated
    quantiles — deterministic and engine-portable. Per-element squares land
    on the 1e-6 long grid BEFORE summation (array order is engine/SIMD
    dependent; long sums are order-proof).

    100 TB shape: one narrow scan computes norms and DROPS the vector
    payload before anything shuffles; ONE distributed exact_global_rank
    (range shuffle) gives the ascending rank, and because the sort key
    (norm2, vec_id) is duplicate-free the descending rank is just
    n + 1 - r_lo — no second range pass."""
    from .rank import exact_global_rank

    norm6 = F.aggregate(
        F.col(vec_col),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.round(x.cast("double") * x.cast("double") * 1e6).cast("long"),
    )
    norms = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.round(norm6 / 1e6, 6).alias("norm2"),
    )
    ranked = exact_global_rank(
        norms, [F.asc("norm2"), F.asc("vec_id")], "r_lo")
    n = norms.count()
    import math
    k = max(1, math.ceil(frac * n))
    return ranked.select(
        "vec_id", "norm2",
        F.when(F.col("r_lo") <= k, F.lit("low"))
        .when(F.lit(n) + 1 - F.col("r_lo") <= k, F.lit("high"))
        .otherwise(F.lit("ok")).alias("flag"),
    )
