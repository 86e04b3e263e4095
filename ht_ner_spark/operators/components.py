"""Stage 3 — canonicalization via connected components (J9).

Large-star / small-star alternation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SOCC'14 — public algorithm): each round is two
self-join + min-aggregation passes; converges in O(log n) rounds on
path-like graphs and O(log log n) typically.

Scale notes (north_rule: explicit skew handling, lineage truncation):
* every iteration ends in ``localCheckpoint()`` to cut the lineage chain —
  without it the plan doubles per round and the driver OOMs planning;
* hub entities (a surface aliased by thousands) make `groupBy(u)` skew; AQE
  skew-join splitting is on, and the star operations themselves bound fan-out
  because each round contracts stars toward the minimum id;
* convergence is detected with a cheap changed-edge count (sum over an
  anti-join of consecutive label frames).

Implementation detail: we operate on the *label frame* l(v) (v -> current
component min). large_star: for each edge (u,v) emit (v, min(l(u),l(v))) for
neighbors v > u's label; small_star symmetrically. We use the simpler,
provably-convergent variant: alternate
  l'(v) = min over neighbors-and-self of l(.)
propagation (one join + groupBy per round) with star contraction on the label
graph — equivalent fixpoint, same join/agg shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import COMPONENTS


def _driver_union_find(spark, rows) -> DataFrame:
    """Union-find with path compression over a collected edge list; component
    id = lexicographic min entity in the component (same canonical election
    as the distributed loop, so the two paths are output-identical)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        u, v = row[0], row[1]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[rv] = ru
    comp_min: dict[str, str] = {}
    for v in parent:
        r = find(v)
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    out = [(v, comp_min[find(v)]) for v in parent]
    return spark.createDataFrame(out, COMPONENTS)


def connected_components(edges: DataFrame, max_iter: int = 20,
                         salt_k: int = 16,
                         driver_budget: int = 200_000) -> DataFrame:
    """edges(src, dst) [strings] -> COMPONENTS(entity_id, component_id).

    component_id = min(entity_id) over the component (lexicographic min for
    string ids — deterministic canonical alias election).

    Small-graph funnel (same budgeted-collect-with-distributed-fallback
    pattern as the pipeline's frequency rank, pipeline.py): the alias graph
    is orders of magnitude smaller than the corpus (distinct linked surface
    pairs, not documents), so below ``driver_budget`` edges ONE bounded
    limit+collect job replaces O(log n) iterative rounds of join/agg/
    checkpoint jobs — at bench scale that is most of stage 3's wall. Beyond
    the budget the provably-convergent distributed loop runs; both paths
    elect the same canonical labels. ``driver_budget=0`` forces distributed
    (tests exercise both).

    Skew (north rule "salted keys for skewed hub entities"): the neighbor-min
    aggregation keys on ``dst`` — a hub entity with thousands of alias edges
    concentrates on one reducer. The min-agg is algebraic, so it runs as a
    two-level salted aggregation (operators/salt.py): partial min on
    (dst, salt) spreads each hub over ``salt_k`` reducers, the final min
    combines k tiny partials. ``salt_k=0`` disables (kept for the
    salted==unsalted property test).
    """
    if driver_budget and driver_budget > 0:
        head = edges.select("src", "dst").limit(driver_budget + 1).collect()
        if len(head) <= driver_budget:
            return _driver_union_find(edges.sparkSession, head)
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # self-loops keep isolated endpoints in the label frame
    nodes = sym.select(F.col("src").alias("v")).distinct()
    labels = nodes.select("v", F.col("v").alias("l")).localCheckpoint()
    sym = sym.localCheckpoint()

    for i in range(max_iter):
        # propagate: candidate label of v = min(l(u)) over neighbors u, then
        # min with v's own label; l_prev rides along so the convergence probe
        # is a near-free limit(1) scan of the checkpointed frame (no join).
        joined = sym.join(labels.withColumnRenamed("v", "src"), "src")
        if salt_k and salt_k > 1:
            from .salt import salted_min_agg

            # salt by src (varies within a hub dst; l often does not)
            nbr_min = salted_min_agg(
                joined.select("dst", "l", "src"), key="dst", value="l",
                k=salt_k, salt_by=["src"],
            ).withColumnRenamed("l", "nl").withColumnRenamed("dst", "v")
        else:
            nbr_min = (
                joined.groupBy("dst")
                .agg(F.min("l").alias("nl"))
                .withColumnRenamed("dst", "v")
            )
        # the convergence metric rides the checkpoint job itself (Observation
        # on the materializing action) — one fewer serial job per round than
        # a separate changed-rows count against the checkpointed frame.
        from pyspark.sql import Observation

        obs = Observation(f"cc_changed_{i}")
        prop = (
            labels.join(nbr_min, "v", "left")
            .select(
                "v",
                F.least(F.col("l"), F.coalesce("nl", F.col("l"))).alias("l"),
                F.col("l").alias("l_prev"),
            )
            .observe(obs, F.sum((F.col("l") != F.col("l_prev")).cast("long"))
                     .alias("changed"))
            .localCheckpoint()  # cut lineage BEFORE the self-join below
        )
        changed = int(obs.get["changed"] or 0)
        labels = prop.select("v", "l")
        if changed == 0:
            break
        # pointer jump (label's label — O(diameter) -> O(log diameter)); the
        # self-join reads the checkpointed frame twice, not the full plan.
        jump_tbl = labels.select(F.col("v").alias("jv"), F.col("l").alias("jl"))
        labels = (
            labels.join(jump_tbl, F.col("l") == F.col("jv"), "left")
            .select(
                "v",
                F.least(F.col("l"), F.coalesce("jl", F.col("l"))).alias("l"),
            )
            .localCheckpoint()
        )

    return labels.select(
        F.col("v").alias("entity_id"), F.col("l").alias("component_id")
    )


def incremental_components(assign: DataFrame, delta_edges: DataFrame,
                           **cc_kwargs) -> DataFrame:
    """Incremental stage-3 maintenance: fold a batch of NEW alias edges into
    an existing COMPONENTS assignment without recomputing over the full
    edge history — the consolidation pass the streaming triple path
    (streaming/windowed.py's merge-on-read deltas) runs per epoch.

    Correctness device: because ``component_id`` is the component's min
    entity, the existing assignment IS a contraction of the old graph.  So:
    (1) relabel the delta endpoints with their current component (unseen
    endpoints label themselves), (2) run connected_components on that
    CONTRACTED edge set — sized by the delta, not the corpus — and (3) join
    the relabel map back onto the full assignment.  The min-label election
    composes (min of mins is the global min), so the output is row-identical
    to a full recompute over old ∪ delta edges (property-tested).

    Shape at scale: the iterative CC touches only components adjacent to
    delta edges; the corpus-sized assignment is read once and joined once
    against a relabel map bounded by the affected components (AQE
    broadcasts it for any realistic delta).  No shuffle of the assignment
    beyond that single join."""
    ep = delta_edges.select("src", "dst")
    a_src = assign.select(F.col("entity_id").alias("src"),
                          F.col("component_id").alias("lsrc"))
    a_dst = assign.select(F.col("entity_id").alias("dst"),
                          F.col("component_id").alias("ldst"))
    contracted = (ep.join(a_src, "src", "left").join(a_dst, "dst", "left")
                  .select(F.coalesce("lsrc", F.col("src")).alias("src"),
                          F.coalesce("ldst", F.col("dst")).alias("dst"))
                  .where(F.col("src") != F.col("dst"))
                  .distinct())
    merged = connected_components(contracted, **cc_kwargs)
    relabel = merged.select(F.col("entity_id").alias("component_id"),
                            F.col("component_id").alias("_new"))

    nodes = (ep.select(F.col("src").alias("entity_id"))
             .union(ep.select(F.col("dst").alias("entity_id"))).distinct())
    new_nodes = (nodes.join(assign.select("entity_id"), "entity_id",
                            "left_anti")
                 .select("entity_id",
                         F.col("entity_id").alias("component_id")))
    return (assign.select("entity_id", "component_id")
            .unionByName(new_nodes)
            .join(relabel, "component_id", "left")
            .select("entity_id",
                    F.coalesce("_new", F.col("component_id"))
                    .alias("component_id")))
