"""Iterative graph analytics over the property graph — beyond-reference
extension (SURVEY §1.4: the "GraphX direction" realized the PySpark way,
since GraphX has no Python API: vertices/edges as DataFrames, one
aggregate-messages-shaped join+groupBy per superstep).

Both algorithms run on the undirected bipartite Link↔Keyword graph
(type-prefixed node ids, matching the S9 export convention). They are
genuinely iterative — the driver contract's rows-only check class; unit
tests pin exact values on hand-checkable graphs instead of a SQL oracle.

Scale notes: each superstep is one equi-join (messages) + one groupBy
(combine) on node id — the aggregateMessages pattern. Ranks/labels are
``persist()``-ed and the previous iteration unpersisted so the lineage
stays one superstep deep (without this, plan depth grows linearly and
planning cost quadratically). At cluster scale the edge table is
pre-partitioned by ``src`` once and every superstep's join reuses that
partitioning; only the (node, value) table moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import PropertyGraph


def bipartite_edges(g: PropertyGraph) -> DataFrame:
    """Undirected (src, dst) edge list of the Link↔Keyword graph with
    type-prefixed ids (both directions materialized)."""
    fwd = g.has_keyword.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Keyword:"), F.col("dst_keyword")).alias("dst"),
    )
    return fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(
    g: PropertyGraph, iterations: int = 5, alpha: float = 0.85
) -> DataFrame:
    """PageRank on the undirected bipartite graph: (node_id, rank).

    r ← (1-α)/N + α · Σ_in r_src/deg_src, ``iterations`` supersteps from
    the uniform start. The graph is undirected so there are no dangling
    nodes (every node has out-edges). Ranks are rounded to 6 dp at the
    end only."""
    edges = bipartite_edges(g).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node_id"))
    n = nodes.count()

    ranks = nodes.select("node_id", F.lit(1.0 / n).alias("rank")).persist()
    ranks.count()
    for _ in range(iterations):
        contribs = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("node_id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        new_ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node_id"), "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit((1.0 - alpha) / n)
                    + F.lit(alpha) * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select("node_id", F.round("rank", 6).alias("rank"))
    edges.unpersist()
    return out


def connected_components(g: PropertyGraph, max_iterations: int = 20) -> DataFrame:
    """Connected components of the Link↔Keyword graph: (node_id,
    component) where ``component`` is the smallest node id in the
    component. Thin wrapper over :func:`components_from_edges` with the
    type-prefixed bipartite edge list."""
    fwd = g.has_keyword.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Keyword:"), F.col("dst_keyword")).alias("dst"),
    )
    return components_from_edges(fwd, max_iterations)


def components_from_edges(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components by min-label propagation over any (src, dst)
    edge DataFrame (ids of any orderable type; pass each undirected edge
    once — it is mirrored here): (node_id, component) where
    ``component`` is the smallest node id in the component — exact and
    deterministic at any scale.

    Each superstep every node adopts min(own label, neighbors' labels);
    stops at the fixpoint (checked with one count per superstep, the
    iterative-algorithm analog of AQE's runtime adaptivity). Superstep
    count is bounded by graph diameter."""
    fwd = edges.select("src", "dst")
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .select("node_id", F.col("node_id").alias("component"))
        .persist()
    )
    labels.count()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("node_id", "src"), "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        new_labels.count()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels
