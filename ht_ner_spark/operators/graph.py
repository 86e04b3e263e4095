"""Consumer-side graph analytics over the materialized KG (stage-4 output).

The reference stops at materializing the triple CSV
(`/root/reference/src/kg_construction_HT.py` analog — see operators/triples.py
for the emit-side parity); a production KG pipeline is immediately asked the
next questions: which entities co-occur, how clustered is the graph, which
nodes are central. These operators answer them with plain DataFrame
joins/aggs so Catalyst + AQE own the physical strategy.

Public algorithms only:
* triangle counting via the edge-iterator join (Suri & Vassilvitskii,
  "Counting Triangles and the Curse of the Last Reducer", WWW'11 — the
  MapReduce formulation; here each "round" is an equi-join Catalyst plans);
* PageRank, classic un-normalized form r' = (1-d) + d * sum(r/outdeg)
  (Page et al. 1999; same semantics as Spark's own examples/pagerank).

Scale notes (100 TB posture):
* ``copair_edges`` is a bipartite projection — a hot object (an obj value
  shared by k subjects) fans out k*(k-1)/2 edges. AQE skew-split handles
  moderate skew; for web-scale hubs callers cap per-object fan-out with
  ``max_obj_degree`` (dropped hot objects are RETURNED, not silently
  swallowed — same contract as dedup/linking's dropped-block frames).
* ``pagerank`` is the canonical iterate = join(edges, ranks) + groupBy(dst)
  shuffle per round; the rank frame is repartitioned once on node so every
  iteration reuses the same hash partitioning, and lineage is truncated
  with localCheckpoint every ``checkpoint_every`` rounds (components.py
  learned this the hard way — an unbounded iterative plan OOMs the planner
  long before the data hurts).
* triangle counting re-orients each edge from the lower-(degree, id)
  endpoint to the higher one (Suri & Vassilvitskii, WWW'11), capping every
  out-degree at O(sqrt(m)), then counts per EDGE as |N+(s) ∩ N+(t)| with
  out-neighborhoods collected into arrays — the O(m^1.5) wedge work happens
  inside a per-row hash-set array_intersect instead of a materialized
  wedge-frame join + semi-join (co-occurrence cliques make tens of millions
  of wedges). Triangle counts are identical under any total-order
  orientation, so the DuckDB oracle keeps the id-ordered join form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITERS = 3


def copair_edges(triples: DataFrame,
                 max_obj_degree: int | None = None,
                 ) -> tuple[DataFrame, DataFrame]:
    """Undirected subject-subject co-occurrence edges via a shared object
    (the bipartite projection of the KG). Returns ``(edges, dropped)``:
    edges as (u, v) with u < v, distinct; dropped = the hot objects excluded
    by ``max_obj_degree`` (empty frame when no cap or nothing hot).
    """
    so = triples.select("subj", "obj").distinct()
    if max_obj_degree is not None:
        od = so.groupBy("obj").agg(F.count(F.lit(1)).alias("obj_deg"))
        hot = od.where(F.col("obj_deg") > max_obj_degree)
        dropped = hot.select("obj", "obj_deg")
        so = so.join(F.broadcast(hot.select("obj")), "obj", "left_anti")
    else:
        dropped = so.sparkSession.createDataFrame(
            [], "obj string, obj_deg long")
    a, b = so.alias("a"), so.alias("b")
    edges = (
        a.join(b, (F.col("a.obj") == F.col("b.obj"))
               & (F.col("a.subj") < F.col("b.subj")))
        .select(F.col("a.subj").alias("u"), F.col("b.subj").alias("v"))
        .distinct()
    )
    return edges, dropped


def triangle_summary(triples: DataFrame) -> DataFrame:
    """One-row graph profile of the co-occurrence projection:
    (n_nodes, n_edges, n_triangles, max_degree).

    n_nodes counts distinct subjects of the KG (isolated ones included);
    triangles are counted once each via the degree-ordered edge iterator:
    every undirected edge is oriented from its lower-(degree, id) endpoint
    to the higher one — any total-order orientation counts each triangle
    exactly once, at its unique (s, t) base edge as |N+(s) ∩ N+(t)| — and
    degree order bounds each out-degree at O(sqrt(m)), so the total
    intersection work is O(m^1.5) even when the co-occurrence projection
    contains hub cliques, with no wedge frame ever materialized.
    """
    # the incoming frame's lineage is the whole KG pipeline; it is consumed
    # twice below (projection + n_nodes), so materialize it once
    triples = triples.localCheckpoint()
    edges, _ = copair_edges(triples)
    edges = edges.localCheckpoint()  # 3 consumers below — scan once
    # Integer-encode nodes before the heavy phase: the hot loop below
    # shuffles and intersects NEIGHBOR ARRAYS, and a long element is one
    # word where a string id is a fat pointer + bytes — standard graph-
    # engine practice.  monotonically_increasing_id is collision-free; the
    # triangle count is invariant under ANY total order of ids, so the
    # code assignment being run-dependent is harmless (and the oracle's
    # id-ordered form agrees on the count for the same reason).
    codes = (
        edges.select(F.col("u").alias("name"))
        .unionAll(edges.select("v")).distinct()
        .withColumn("code", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    ce = (
        edges.join(codes.select(F.col("name").alias("u"),
                                F.col("code").alias("cu")), "u")
        .join(codes.select(F.col("name").alias("v"),
                           F.col("code").alias("cv")), "v")
        .select("cu", "cv")
        .localCheckpoint()  # deg (x2), orientation join, and max_deg below
    )
    deg = (
        ce.select(F.col("cu").alias("n"))
        .unionAll(ce.select("cv"))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("cu"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("cv"), F.col("d").alias("dv"))
    # orient u->v when (du, u) < (dv, v): degree first, code tiebreak
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("cu") < F.col("cv")))
    oriented = (
        ce.join(du, "cu").join(dv, "cv")
        .select(
            F.when(fwd, F.col("cu")).otherwise(F.col("cv")).alias("s"),
            F.when(fwd, F.col("cv")).otherwise(F.col("cu")).alias("t"),
        )
        .localCheckpoint()  # neighbor agg + both sides of the edge join
    )
    # edge-iterator over the SAME orientation: each triangle's unique
    # topological (s -> t -> w, s -> w) ordering is counted once at edge
    # (s, t) as |N+(s) ∩ N+(t)|.  Collecting N+ as an array (bounded at
    # O(sqrt(m)) by the degree orientation) keeps the O(m^1.5) wedge work
    # INSIDE a per-row hash-set array_intersect instead of materializing
    # the wedge frame through a join + semi-join shuffle — on clique-ish
    # co-occurrence projections (a low-cardinality shared object makes
    # one) that removes tens of millions of shuffled wedge rows; the
    # neighbor dimension is |nodes| rows, which AQE broadcasts when small.
    nbrs = oriented.groupBy("s").agg(F.collect_list("t").alias("nb"))
    empty = F.array().cast("array<long>")
    per_edge = (
        oriented.select("s", "t")
        .join(nbrs.select(F.col("s").alias("js"), F.col("nb").alias("nb_s")),
              F.col("s") == F.col("js"))
        .join(nbrs.select(F.col("s").alias("jt"), F.col("nb").alias("nb_t")),
              F.col("t") == F.col("jt"), "left")
        .select(F.size(F.array_intersect(
            F.col("nb_s"), F.coalesce(F.col("nb_t"), empty))).alias("k"))
    )
    n_nodes = triples.agg(
        F.countDistinct("subj").cast("long").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_tri = per_edge.agg(F.coalesce(F.sum("k"), F.lit(0))
                         .cast("long").alias("n_triangles"))
    max_deg = deg.agg(
        F.coalesce(F.max("d"), F.lit(0)).cast("long").alias("max_degree"))
    # four 1-row aggregates -> one summary row (cross of singletons, no data
    # shuffle beyond the aggs themselves)
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri).crossJoin(max_deg)


def pagerank(triples: DataFrame, iters: int = PR_ITERS,
             damping: float = PR_DAMPING,
             checkpoint_every: int = 8) -> DataFrame:
    """(node, pr) after ``iters`` synchronous PageRank rounds over the
    DIRECTED subj->obj edge set (distinct edges; node set = subjects plus
    objects). Un-normalized classic form: r'(v) = (1-d) + d * sum over
    in-neighbors u of r(u)/outdeg(u); dangling nodes simply contribute
    nothing (Page et al. 1999 variant, matching Spark's example semantics).
    Deterministic given the edge set — used fixed-iteration so the contract
    oracle can unroll the same rounds in SQL.
    """
    # materialize the edge list once: its lineage is the caller's whole
    # pipeline, and every derivation below (sym union / degree / node set)
    # would otherwise recompute that lineage per scan
    e = triples.select(F.col("subj").alias("src"),
                       F.col("obj").alias("dst")).distinct().localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select("dst")).distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant; checkpoint so every round rescans
    # a materialized frame instead of re-deriving distinct+join lineage
    src_edges = e.join(deg, "src").localCheckpoint()
    nodes = nodes.localCheckpoint()
    ranks = nodes.withColumn("pr", F.lit(1.0))
    for i in range(iters):
        contribs = (
            src_edges.join(ranks, src_edges.src == ranks.node)
            .select(F.col("dst").alias("node"),
                    (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(1.0 - damping)
             + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
             ).alias("pr"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks


LPA_ITERS = 3


def label_propagation(triples: DataFrame, iters: int = LPA_ITERS,
                      checkpoint_every: int = 8) -> DataFrame:
    """(node, community) after ``iters`` SYNCHRONOUS label-propagation
    rounds over the undirected subj—obj edge set: every node adopts the
    most frequent label among its neighbors, ties broken label ASC, isolated
    nodes (none here, but totality matters) keep their own. Deterministic by
    construction — synchronous rounds + a total tie-break — unlike classic
    async LPA (Raghavan et al. 2007), so the contract oracle unrolls the
    identical rounds as chained SQL CTEs. Complements connected components
    (structure) and PageRank (centrality) with community structure.

    100 TB shape: per round, one edge⋈labels broadcast-or-shuffle hash join
    keyed on node and one (node, label) partial-agg shuffle; the argmax is
    min(struct(-cnt, label)) — no per-node window, no global state. The
    symmetrized edge list is loop-invariant and localCheckpoint'd once."""
    # materialize the edge list once: its lineage is the caller's whole
    # pipeline, and every derivation below (sym union / degree / node set)
    # would otherwise recompute that lineage per scan
    e = triples.select(F.col("subj").alias("src"),
                       F.col("obj").alias("dst")).distinct().localCheckpoint()
    sym = (e.unionAll(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct()
           .localCheckpoint())
    nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    labels = nodes.withColumn("community", F.col("node"))
    for i in range(iters):
        best = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("community"))
            .groupBy("node", "community").agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("node")
            .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                                F.col("community").alias("lab"))).alias("top"))
            .select("node", F.col("top.lab").alias("new_community"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_community", "community")
                    .alias("community"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            labels = labels.localCheckpoint()
    return labels


KHOP_HOPS = 2


def khop_neighborhood(triples: DataFrame, seeds: list[str],
                      hops: int = KHOP_HOPS,
                      broadcast_frontier: bool = True) -> DataFrame:
    """(node, dist): the <= ``hops``-hop undirected neighborhood of a seed
    entity set over the KG — the context-retrieval primitive a KG consumer
    runs per query entity (RAG subgraph extraction, entity cards). dist =
    minimum hop count, BFS expanded as ``hops`` fixed rounds.

    100 TB shape: the frontier is joined against the symmetrized edge list
    once per hop (frontier side is neighborhood-sized — broadcast in
    practice; the edge side never moves twice thanks to the loop-invariant
    localCheckpoint), and the final min-dist fold is one node-keyed agg.
    No windows, no driver-side traversal; seeds ship as a plan literal.
    broadcast_frontier=False switches to a src-keyed shuffle join for the
    hub-explosion case where a frontier outgrows executor memory."""
    # materialize the edge list once: its lineage is the caller's whole
    # pipeline, and every derivation below (sym union / degree / node set)
    # would otherwise recompute that lineage per scan
    e = triples.select(F.col("subj").alias("src"),
                       F.col("obj").alias("dst")).distinct().localCheckpoint()
    sym = (e.unionAll(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct()
           .localCheckpoint())
    seed_df = sym.sparkSession.createDataFrame(
        [(s, 0) for s in seeds], "node string, dist int"
    )
    layers = [seed_df]
    frontier = seed_df.select("node")
    for h in range(1, hops + 1):
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        frontier = (
            sym.join(f, sym.src == F.col("node"))
            .select(F.col("dst").alias("node")).distinct()
        ).localCheckpoint()
        layers.append(frontier.withColumn("dist", F.lit(h)))
    out = layers[0]
    for l in layers[1:]:
        out = out.unionByName(l)
    return (
        out.groupBy("node").agg(F.min("dist").alias("dist"))
        .select("node", F.col("dist").cast("int").alias("dist"))
    )


def adamic_adar(triples: DataFrame, max_center_degree: int | None = None
                ) -> tuple[DataFrame, DataFrame]:
    """(u, v, common, aa): Adamic-Adar link prediction over the undirected
    KG — for each non-adjacent pair at distance 2, score = sum over common
    neighbors z of 1/ln(deg(z)) (Adamic & Adar 2003, the standard
    KG-completion baseline). ``common`` = |N(u) ∩ N(v)|. deg(z) >= 2 by
    construction (z touches both u and v in the distinct symmetrized
    graph), so ln never hits 0.

    100 TB shape: the wedge join through center z fans out deg(z)^2 — the
    same hub explosion as copair_edges, so hot centers are capped by
    ``max_center_degree`` and RETURNED as the second frame, not silently
    dropped. One degree agg, one broadcastable degree join, one wedge
    self-join (AQE skew-split), one pair agg, one anti-join against the
    existing edge set."""
    # materialize the edge list once: its lineage is the caller's whole
    # pipeline, and every derivation below (sym union / degree / node set)
    # would otherwise recompute that lineage per scan
    e = triples.select(F.col("subj").alias("src"),
                       F.col("obj").alias("dst")).distinct().localCheckpoint()
    # sym is scanned ~4x below (deg, both wedge sides, existing) and its
    # lineage is the caller's whole pipeline — materialize it once
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    if max_center_degree is not None:
        hot = deg.where(F.col("deg") > max_center_degree)
        dropped = hot.select(F.col("src").alias("node"),
                             F.col("deg").alias("deg"))
        sym_in = sym.join(
            F.broadcast(hot.select(F.col("src").alias("dst"))),
            "dst", "left_anti")
    else:
        dropped = sym.sparkSession.createDataFrame([], "node string, deg long")
        sym_in = sym
    # wedge u -z- v (u < v): sym_in rows are (z-adjacent) edges INTO z
    a = sym_in.select(F.col("src").alias("u"), F.col("dst").alias("z"))
    b = sym_in.select(F.col("src").alias("v"), F.col("dst").alias("z"))
    wedges = a.join(b, "z").where(F.col("u") < F.col("v"))
    # per-center weight on the 1e-6 long grid (the lm_perplexity float
    # discipline): summation order differs across partitions/engines, long
    # sums do not
    scored = (
        wedges.join(deg.withColumnRenamed("src", "z"), "z")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"),
             F.sum(F.round(F.lit(1e6) / F.log("deg")).cast("long")).alias("aa6"))
    )
    existing = sym.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    preds = scored.join(existing, ["u", "v"], "left_anti").select(
        "u", "v", F.col("common").cast("long").alias("common"),
        F.round(F.col("aa6") / 1e6, 6).alias("aa"),
    )
    return preds, dropped


def entity_cards(triples: DataFrame, obj_sample_k: int = 5) -> DataFrame:
    """(subj, n_triples, n_preds, top_pred, top_pred_n, objs_sample): the
    per-entity profile card a KG consumer renders (RAG entity context,
    disambiguation pages): triple count, predicate diversity, dominant
    predicate (ties -> pred asc), and the first ``obj_sample_k`` distinct
    objects (lexicographic, comma-joined — deterministic and audit-sized,
    not a full neighbor dump).

    100 TB shape: everything is keyed on subj — one (subj, pred) agg, one
    subj-partitioned Window for the dominant predicate, one (subj, obj)
    distinct + Window rank to cap the sample BEFORE collect_list (hub
    entities have millions of objects; the cap bounds agg state), then
    subj-keyed joins that reuse the same hash partitioning."""
    from pyspark.sql import Window

    # two independent scans below (pred stats + obj sample) over a frame
    # whose lineage is the caller's whole pipeline — materialize once
    triples = triples.localCheckpoint()
    tp = triples.groupBy("subj", "pred").agg(F.count(F.lit(1)).alias("n"))
    stats = tp.groupBy("subj").agg(
        F.sum("n").alias("n_triples"),
        F.count(F.lit(1)).alias("n_preds"),
    )
    w = Window.partitionBy("subj").orderBy(F.desc("n"), F.asc("pred"))
    top = (
        tp.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
        .select("subj", F.col("pred").alias("top_pred"),
                F.col("n").alias("top_pred_n"))
    )
    wo = Window.partitionBy("subj").orderBy("obj")
    objs = (
        triples.select("subj", "obj").distinct()
        .withColumn("rn", F.row_number().over(wo))
        .where(F.col("rn") <= obj_sample_k)
        .groupBy("subj")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("obj")))
             .alias("objs_sample"))
    )
    return (
        stats.join(top, "subj").join(objs, "subj")
        .select("subj",
                F.col("n_triples").cast("long").alias("n_triples"),
                F.col("n_preds").cast("long").alias("n_preds"),
                "top_pred",
                F.col("top_pred_n").cast("long").alias("top_pred_n"),
                "objs_sample")
    )


def random_walks(triples: DataFrame, walks_per_node: int = 2,
                 length: int = 4) -> DataFrame:
    """(node, wid, path): DeepWalk-style walk corpus over the undirected KG
    (Perozzi et al. 2014) — ``walks_per_node`` walks of ``length`` nodes
    from every node, '->'-joined. The step is DETERMINISTIC pseudo-random:
    next = argmin over neighbors of md5(node, wid, step, neighbor) — the
    same device as the engine's md5-portable negative sampling, so walks
    are reproducible across engines/retries (a seeded RNG is not: partition
    order isn't stable) and the contract oracle replays them exactly.

    100 TB shape: length-1 rounds of frontier ⋈ edges (hash join on the
    current node) + a (node, wid)-keyed min_by agg per round — the
    pagerank/khop iteration shape; the edge frame is loop-invariant and
    localCheckpointed once. Hub fan-out per round is deg(cur) per walk,
    reduced immediately by the min_by partial agg (map-side combine)."""
    # materialize the edge list once: its lineage is the caller's whole
    # pipeline, and every derivation below (sym union / degree / node set)
    # would otherwise recompute that lineage per scan
    e = triples.select(F.col("subj").alias("src"),
                       F.col("obj").alias("dst")).distinct().localCheckpoint()
    sym = (e.unionAll(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct()
           .localCheckpoint())
    walks = (
        sym.select(F.col("src").alias("node")).distinct()
        .select("node", F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("wid"))
        .select("node", "wid", F.col("node").alias("cur"),
                F.col("node").alias("path"))
    )
    for t in range(1, length):
        step = walks.join(sym, walks.cur == sym.src).withColumn(
            "h", F.md5(F.concat_ws("\x1f", "node", "wid",
                                   F.lit(str(t)), "dst")))
        walks = (
            step.groupBy("node", "wid", "path")
            .agg(F.min_by("dst", "h").alias("cur"))
            .select("node", "wid", "cur",
                    F.concat_ws("->", "path", "cur").alias("path"))
        )
    return walks.select("node", F.col("wid").cast("int").alias("wid"),
                        "path")


def kcore(triples: DataFrame, k: int = 2, rounds: int = 3) -> DataFrame:
    """(node, deg): nodes surviving ``rounds`` synchronous k-core peeling
    rounds over the undirected KG (each round removes every node whose
    degree among CURRENT survivors is < k), with their within-core degree
    at the final round. Fixed synchronous rounds (not run-to-fixpoint) so
    the contract oracle unrolls identical SQL rounds; at web scale the
    caller raises ``rounds`` until the Observation-counted removals hit 0
    (the components.py convergence pattern).

    100 TB shape: per round one semi-join of the (loop-invariant,
    localCheckpointed) edge frame against the survivor set on EACH
    endpoint + one degree agg — all keyed on node."""
    # materialize the edge list once: its lineage is the caller's whole
    # pipeline, and every derivation below (sym union / degree / node set)
    # would otherwise recompute that lineage per scan
    e = triples.select(F.col("subj").alias("src"),
                       F.col("obj").alias("dst")).distinct().localCheckpoint()
    sym = (e.unionAll(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))).distinct()
           .localCheckpoint())
    alive = sym.select(F.col("src").alias("node")).distinct()
    deg = None
    for _ in range(rounds):
        e2 = (
            sym.join(alive.withColumnRenamed("node", "src"), "src", "semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "semi")
        )
        deg = e2.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = (deg.where(F.col("deg") >= k)
                 .select(F.col("src").alias("node")).localCheckpoint())
    return (
        deg.where(F.col("deg") >= k)
        .select(F.col("src").alias("node"),
                F.col("deg").cast("long").alias("deg"))
    )


def personalized_pagerank(triples: DataFrame, seeds: list[str],
                          iters: int = PR_ITERS,
                          damping: float = PR_DAMPING) -> DataFrame:
    """(node, pr): fixed-round personalized PageRank — the restart mass
    lands on ``seeds`` only (r' = (1-d)*1[seed] + d * sum r(u)/outdeg(u)),
    so scores rank entities by relevance TO THE SEED SET. This is the
    RAG context ranker: given a query's entities as seeds, the top-PPR
    nodes are the subgraph worth retrieving (khop gives the candidate
    ball; PPR orders it).

    Same iteration shape and scale posture as ``pagerank`` (one edge⋈ranks
    join + one dst-keyed agg per round, loop-invariant frame checkpointed);
    seeds ship as a plan literal."""
    # materialize the edge list once: its lineage is the caller's whole
    # pipeline, and every derivation below (sym union / degree / node set)
    # would otherwise recompute that lineage per scan
    e = triples.select(F.col("subj").alias("src"),
                       F.col("obj").alias("dst")).distinct().localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .unionAll(e.select("dst")).distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    src_edges = e.join(deg, "src").localCheckpoint()
    nodes = nodes.localCheckpoint()
    seed_ind = F.when(F.col("node").isin(*seeds), 1.0).otherwise(0.0)
    ranks = nodes.withColumn("pr", seed_ind)
    for _ in range(iters):
        contribs = (
            src_edges.join(ranks, src_edges.src == ranks.node)
            .select(F.col("dst").alias("node"),
                    (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(1.0 - damping) * seed_ind
             + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
             ).alias("pr"),
        )
    return ranks
