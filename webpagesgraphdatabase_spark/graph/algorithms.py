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
    g: PropertyGraph,
    iterations: int = 5,
    alpha: float = 0.85,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank on the undirected bipartite graph: (node_id, rank).

    r ← (1-α)·s + α · Σ_in r_src/deg_src, ``iterations`` supersteps
    from r0 = s. With ``seeds=None`` s is uniform (classic PageRank,
    arithmetic byte-identical to the pre-seeded implementation so the
    oracle series is stable). Passing ``seeds`` (a DataFrame with a
    ``node_id`` column) makes it Personalized PageRank (Haveliwala
    2002): the restart mass concentrates on the seed set — the random
    surfer teleports home — so ranks measure relevance *to the seeds*
    rather than global centrality; unreachable nodes read exactly 0.

    The graph is undirected so there are no dangling nodes (every node
    has out-edges). Ranks are rounded to 6 dp at the end only.

    Scale shape per superstep is unchanged by seeding: one equi-join of
    the edge list against the current ranks, a partial-agg sum per dst,
    and a join back to the (node, restart) table — the restart column
    rides the node table, never a broadcast of the seed set into the
    edge-sized join."""
    edges = bipartite_edges(g).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node_id"))
    n = nodes.count()

    if seeds is None:
        base = nodes.select("node_id", F.lit(1.0 / n).alias("s"))
        # single fused double op, byte-compatible with the r1-r6 oracle
        restart = F.lit((1.0 - alpha) / n)
    else:
        seed_set = nodes.join(
            seeds.select("node_id").distinct(), "node_id", "left_semi"
        ).persist()
        k = seed_set.count()
        if k == 0:
            seed_set.unpersist()
            edges.unpersist()
            raise ValueError("no seed node_id is present in the graph")
        base = (
            nodes.join(
                seed_set.select("node_id", F.lit(1.0 / k).alias("s")),
                "node_id",
                "left",
            )
            .select("node_id", F.coalesce("s", F.lit(0.0)).alias("s"))
        )
        seed_set.unpersist()
        restart = F.lit(1.0 - alpha) * F.col("s")
    base = base.persist()
    base.count()

    ranks = base.select("node_id", F.col("s").alias("rank")).persist()
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
            base.join(contribs.withColumnRenamed("dst", "node_id"), "node_id", "left")
            .select(
                "node_id",
                "s",
                (
                    restart
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
    base.unpersist()
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


def _components_union_find(edges: DataFrame, rows: list) -> DataFrame:
    """Exact union-find over a collected edge list; identical output
    contract to the distributed loop: (node_id, component=min id in the
    component), same column types as the input edge endpoints."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    comp_min: dict = {}
    members: list = []
    for node in parent:
        root = find(node)
        members.append((node, root))
        m = comp_min.get(root)
        if m is None or node < m:
            comp_min[root] = node

    node_type = edges.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("node_id", node_type, False),
            T.StructField("component", node_type, False),
        ]
    )
    return edges.sparkSession.createDataFrame(
        [(n, comp_min[r]) for n, r in members], schema
    )


#: Edge budget for the driver union-find fast path. Below it, a local
#: union-find (microseconds) replaces 2·diameter distributed jobs whose
#: fixed scheduling cost dominates on small graphs — the iterative
#: analog of the broadcast-join threshold. Above it, the superstep loop
#: runs; nothing is collected.
DRIVER_MAX_EDGES = 500_000


def components_from_edges(
    edges: DataFrame,
    max_iterations: int = 20,
    driver_max_edges: int = DRIVER_MAX_EDGES,
) -> DataFrame:
    """Connected components by min-label propagation over any (src, dst)
    edge DataFrame (ids of any orderable type; pass each undirected edge
    once — it is mirrored here): (node_id, component) where
    ``component`` is the smallest node id in the component — exact and
    deterministic at any scale.

    Two physical strategies behind one result (chosen by a size probe
    that costs nothing extra: the probe *is* the fast path's collect,
    capped at ``driver_max_edges + 1`` rows):

    - **≤ driver_max_edges** — collect the edge list, exact union-find
      with path compression on the driver, parallelize the labels back.
      Near-dup pair graphs and test-scale graphs live here; the
      distributed loop's ~2·diameter jobs of fixed scheduling cost
      would dominate the actual work.
    - **larger** — the superstep loop: every node adopts min(own,
      neighbors') per superstep, fixpoint-checked with one count per
      superstep (the iterative-algorithm analog of AQE's runtime
      adaptivity), superstep count bounded by graph diameter.
    """
    fwd = edges.select("src", "dst")
    if driver_max_edges is not None:
        head = fwd.limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            return _components_union_find(edges, head)
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
    pinned = labels  # the persisted handle backing `labels`
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("node_id", "src"), "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # carry the did-anything-improve flag IN the label row: the
        # fixpoint check is then one aggregate over the frame the
        # superstep materializes anyway, instead of a second job
        # re-joining new labels against old (full |V|-vs-|V| shuffle
        # join per superstep for one boolean)
        upd = (
            labels.join(neighbor_min, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                F.coalesce(
                    F.col("nbr_min") < F.col("component"), F.lit(False)
                ).alias("_chg"),
            )
            .persist()
        )
        # ONE action materializes the superstep AND reads the flag
        changed = int(
            upd.agg(F.sum(F.col("_chg").cast("long"))).first()[0] or 0
        )
        pinned.unpersist()
        pinned = upd
        labels = upd.select("node_id", "component")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def bounded_reach(
    g: PropertyGraph,
    max_hops: int = 2,
    exact: bool = True,
    seeds: DataFrame | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Variable-length path query — the Cypher shape
    ``MATCH (n)-[*1..h]-(m) RETURN n, count(DISTINCT m)`` for every
    radius h ≤ ``max_hops`` over the bipartite Link↔Keyword graph:
    (node_id, n_reach_1, …, n_reach_<max_hops>). For a Link, radius 1
    is its keywords, radius 2 adds every co-keyword link, radius 3
    those links' keywords, and so on. (The reference has no var-length
    patterns — all its Cypher is ≤3 fixed hops, SURVEY §2 note — so
    this closes the classic graph-query gap the fixed-hop operators
    leave.)

    Plan shape: one single-hop frontier expansion per level — join the
    ≤h pair set against the edge list on the middle node, union,
    distinct. Each step's intermediate is |pairs| · deg(middle), linear
    in the closure size; squaring the pair set instead (p∘p, the
    log-step trick) looks cheaper but explodes through hub nodes —
    Σ indeg²(hub) intermediate rows, OOM-tested here at sf0.01 — so
    linear-step expansion is the plan that survives scale. The pair
    sets are never collected; only per-node counts leave the shuffle.

    Cost grows with the closure, which on dense graphs approaches
    |component|² pairs: corpus-wide, radius 2 is the sane default
    (measured here: radius 3 over all sf0.01 nodes is ~10× radius 2);
    deeper radii belong on seed sets — pass ``seeds`` (a DataFrame with
    a ``node_id`` column) and only those sources expand: the first
    frontier is semi-joined down *before* any expansion, so every later
    level's pair set is the seeds' closure, not the graph's. Seeded
    counts are identical to the same nodes' rows in a full run (the
    expansion never depends on other sources' pairs), which the unit
    test pins.

    ``exact=False`` is the 100 TB counting mode: per-radius counts come
    from ``approx_count_distinct`` (HyperLogLog++, partial-aggregatable
    sketch — no exact distinct-count shuffle per radius, robust to
    celebrity-node skew since a hot node's count is one sketch, not a
    hash-set of its whole neighborhood). The frontier dedup between
    levels stays exact either way — it bounds expansion growth and is
    keyed by (src, dst), which hash-partitions evenly. The default
    stays exact so the DuckDB oracle reproduces the counts
    bit-for-bit; HLL is exact on small neighborhoods, so the unit test
    pins approx ≡ exact on the hand-checkable graph.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    # ``edges`` overrides the default undirected bipartite frame — the
    # directed/labelled Cypher var-length forms (-[:REL*1..h]->) pass
    # a single-direction edge list here; expansion semantics are
    # otherwise identical (reachable via 1..h edges of the frame)
    e1 = (bipartite_edges(g) if edges is None else edges).select("src", "dst")

    first = e1
    if seeds is not None:
        first = e1.join(
            seeds.select(F.col("node_id").alias("src")), "src", "left_semi"
        )
    levels = [first.distinct()]
    for _ in range(max_hops - 1):
        pairs = levels[-1]
        nxt = (
            pairs.alias("p")
            .join(e1.alias("e"), F.col("p.dst") == F.col("e.src"))
            .select(F.col("p.src").alias("src"), F.col("e.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        levels.append(nxt.unionByName(pairs).distinct())

    count_fn = F.count if exact else (lambda c: F.approx_count_distinct("dst"))
    out = None
    for h, pairs in enumerate(levels, start=1):
        r = pairs.groupBy("src").agg(count_fn("*").alias(f"n_reach_{h}"))
        out = r if out is None else out.join(r, "src")
    return out.withColumnRenamed("src", "node_id")


def label_propagation(g: PropertyGraph, iterations: int = 3) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) on the Link↔Keyword graph: (node_id, community).

    Every node starts labeled with its own id; each superstep every
    node adopts the most frequent label among its neighbors, ties
    broken toward the lexicographically smallest label — a total order,
    so the fixed-``iterations`` run is deterministic and reproducible
    in any engine (the registry oracle unrolls the same recurrence as
    chained CTEs, the :func:`pagerank` discipline). Classic LPA
    iterates to convergence with random tie-breaks; the deterministic
    fixed-step variant trades some community quality for a checkable
    contract. Synchronous updates can oscillate on bipartite structure
    — with fixed iterations that is part of the defined output, and an
    odd step count lets Link-side labels reach other Links (via their
    shared Keyword) and settle.

    Scale shape per superstep: one equi-join of the edge list against
    the current (node, label) table, a partial-agg count on
    (dst, label), and an argmax window partitioned by dst (unique key,
    no skew beyond true hub degree). Labels persist per superstep with
    the same lineage control as :func:`pagerank`."""
    from pyspark.sql import Window

    edges = bipartite_edges(g).persist()
    labels = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .select("node_id", F.col("node_id").alias("community"))
        .persist()
    )
    labels.count()
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("nl").asc())
    for _ in range(iterations):
        counts = (
            edges.join(
                labels.select(
                    F.col("node_id").alias("src"), F.col("community").alias("nl")
                ),
                "src",
            )
            .groupBy("dst", "nl")
            .agg(F.count("*").alias("cnt"))
        )
        new_labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node_id"), F.col("nl").alias("community"))
            .persist()
        )
        new_labels.count()
        labels.unpersist()
        labels = new_labels
    edges.unpersist()
    return labels


def keyword_cooccurrence_edges(g: PropertyGraph, top_n: int = 100) -> DataFrame:
    """Undirected keyword co-occurrence projection: (u, v) with
    ``u < v``, distinct — two of the ``top_n`` most-used keywords
    (link-count desc, name asc: a total order, so the cutoff is
    engine-independent) connected when some link carries both.

    The cap is the operator's scale bound, not a convenience: an
    unbounded projection of a bipartite graph is quadratic in the
    hottest link's keyword count.

    Plan shape: broadcast semi-join to the capped vocabulary, ONE
    groupBy(src_url) collecting each link's surviving keywords, then
    the ordered pairs expand row-locally with array transforms
    (codegen) before the distinct. One scan and one shuffle of the
    edge list — a self-join formulation scans and shuffles it twice
    and re-derives it per consumer."""
    top = (
        g.has_keyword.groupBy("dst_keyword")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("dst_keyword").asc())
        .limit(top_n)
        .select("dst_keyword")
    )
    hk = g.has_keyword.join(
        F.broadcast(top), "dst_keyword", "left_semi"
    ).select("src_url", "dst_keyword")
    per_link = hk.groupBy("src_url").agg(
        F.array_sort(F.collect_set("dst_keyword")).alias("ks")
    )
    pairs = F.flatten(
        F.transform(
            "ks",
            lambda x, i: F.transform(
                F.slice(F.col("ks"), i + F.lit(2), F.size(F.col("ks"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    return (
        per_link.select(F.explode(pairs).alias("p"))
        .select("p.u", "p.v")
        .distinct()
    )


def _triangles_driver(edges: DataFrame, rows: list) -> DataFrame:
    """Exact degree-ordered triangle counting over a collected edge
    list; identical output contract to the distributed path:
    (node, triangles), nodes in ≥1 triangle only."""
    from collections import defaultdict

    from pyspark.sql import types as T

    eset = set()
    for r in rows:
        a, b = r[0], r[1]
        if a == b:
            continue
        eset.add((a, b) if a < b else (b, a))
    deg: dict = defaultdict(int)
    for a, b in eset:
        deg[a] += 1
        deg[b] += 1
    order = lambda x: (deg[x], x)  # noqa: E731
    out_nbrs: dict = defaultdict(set)
    for a, b in eset:
        lo, hi = (a, b) if order(a) < order(b) else (b, a)
        out_nbrs[lo].add(hi)
    counts: dict = defaultdict(int)
    for a, nbrs in out_nbrs.items():
        nbrs_sorted = sorted(nbrs, key=order)
        for i, b in enumerate(nbrs_sorted):
            for c in nbrs_sorted[i + 1 :]:
                # b ≺ c, so the closing edge is oriented b → c
                if c in out_nbrs.get(b, ()):
                    counts[a] += 1
                    counts[b] += 1
                    counts[c] += 1
    node_type = edges.schema["u"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("triangles", T.LongType(), False),
        ]
    )
    return edges.sparkSession.createDataFrame(
        sorted(counts.items()), schema
    )


#: Edge budget for the driver triangle fast path — the
#: components_from_edges discipline: below it, six tiny shuffle rounds
#: of fixed scheduling cost dominate the actual work.
TRIANGLES_DRIVER_MAX_EDGES = 200_000


def triangle_counts(
    edges: DataFrame,
    driver_max_edges: int | None = TRIANGLES_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Per-node triangle participation over an undirected edge list
    (columns ``u``, ``v``): (node, triangles), nodes in ≥1 triangle
    only. Exact and deterministic.

    Two physical strategies behind one result (the
    :func:`components_from_edges` discipline; the size probe IS the
    fast path's collect, capped at ``driver_max_edges + 1`` rows):
    an exact collected count for small edge lists — where six tiny
    distributed shuffle rounds of fixed scheduling cost dominate the
    work — and the distributed plan below otherwise. Pass
    ``driver_max_edges=None`` (or 0) to force the distributed path.

    Degree-ordered node-iterator (Chiba & Nishizeki 1985; the shape
    distributed triangle counting settled on — Suri & Vassilvitskii,
    WWW'11): orient every edge from its lower-(degree, id) endpoint to
    the higher, enumerate each low endpoint's ordered out-neighbor
    pairs as wedges, and close wedges with one semi-join back against
    the oriented edges. The orientation is the skew bound: a celebrity
    node's neighbors charge their wedges to the *low-degree* endpoints,
    so no task ever materializes |N(hub)|² pairs — out-degrees are
    O(√|E|) regardless of hub size. Three shuffles (degree agg, wedge
    equi-join on the pivot, closing semi-join); no cartesian products.
    """
    if driver_max_edges:
        head = edges.select("u", "v").limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            return _triangles_driver(edges, head)
    # the normalized edge list feeds und (twice) and the orientation
    # join within the single materialization job below; persist so an
    # expensive caller-supplied projection runs exactly once, released
    # deterministically once `oriented` is at rest
    e = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    try:
        und = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = und.groupBy("u").agg(F.count("*").alias("d"))
        ed = e.join(
            deg.select(F.col("u"), F.col("d").alias("du")), "u"
        ).join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
        )
        u_low = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        # the oriented list feeds three consumers (both wedge sides +
        # the closing semi-join); eagerly localCheckpoint it — one row
        # per edge, three narrow columns — so the upstream edge
        # derivation (possibly an expensive projection like the keyword
        # co-occurrence self-join) runs once, not once per consumer (at
        # sf0.1 the difference between ~2 s and ~12 s). Checkpoint, not
        # a GC-finalized persist: composed callers (e.g.
        # clustering_coefficients' .select over this result) drop the
        # Python wrapper at plan-construction time, so a
        # wrapper-lifetime cache would be released before any execution.
        oriented = ed.select(
            F.when(u_low, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(u_low, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(u_low, F.col("dv")).otherwise(F.col("du")).alias("db"),
        ).localCheckpoint(eager=True)
    finally:
        e.unpersist()
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    # b ≺ c in the same (degree, id) order as the orientation, so each
    # triangle {x≺y≺z} closes exactly once, as the wedge (x; y, z)
    wedges = (
        e1.join(e2, F.col("e1.a") == F.col("e2.a"))
        .filter(
            (F.col("e1.db") < F.col("e2.db"))
            | (
                (F.col("e1.db") == F.col("e2.db"))
                & (F.col("e1.b") < F.col("e2.b"))
            )
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    tri = wedges.join(
        oriented.select(F.col("a").alias("b"), F.col("b").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    members = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    out = members.groupBy("node").agg(F.count("*").alias("triangles"))
    import weakref

    def _unpersist_quietly(frames=(e, oriented)):
        for df in frames:
            try:
                df.unpersist(False)
            except Exception:  # session already stopped at interpreter exit
                pass

    weakref.finalize(out, _unpersist_quietly)
    return out


def k_core(g: PropertyGraph, k: int = 2, max_iterations: int = 30) -> DataFrame:
    """The k-core of the Link↔Keyword graph: iteratively peel nodes of
    degree < k until fixpoint (Seidman 1983) — the standard dense-
    substructure filter (spam/boilerplate rings survive coring; pendant
    pages don't). Returns (node_id, degree) for surviving nodes with
    their within-core degree. Deterministic: the k-core is a unique
    fixpoint, independent of peel order.

    Scale shape per peel round: one partial-agg degree count + two
    semi-joins restricting the edge list to surviving endpoints — all
    equi-joins on node id, edge list persisted per superstep with the
    :func:`pagerank` lineage discipline. Rounds needed equal the
    longest peel cascade (≤ graph diameter in practice); each round's
    cost shrinks with the surviving edge set."""
    edges = bipartite_edges(g).persist()
    edges.count()
    for _ in range(max_iterations):
        deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("src")
        new_edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .persist()
        )
        n_old, n_new = edges.count(), new_edges.count()
        edges.unpersist()
        edges = new_edges
        if n_new == n_old:
            break
    out = edges.groupBy("src").agg(F.count("*").alias("degree")).select(
        F.col("src").alias("node_id"), "degree"
    )
    return out


def clustering_coefficients(
    edges: DataFrame,
    driver_max_edges: int | None = TRIANGLES_DRIVER_MAX_EDGES,
) -> DataFrame:
    """Local clustering coefficient per node over an undirected edge
    list (columns ``u``, ``v``): (node, degree, triangles, coeff) with
    coeff = 2·T(v) / (deg(v)·(deg(v)−1)), 0.0 for degree < 2 — the
    classic cohesion signal (Watts & Strogatz 1998) and, on a keyword
    co-occurrence projection, a topic-tightness score.

    Pure composition: :func:`triangle_counts` (with its two-strategy
    size dispatch) left-joined onto the degree table — one extra
    partial-agg count and a key equi-join beyond the triangle pass,
    rounded to 6 dp for cross-engine comparability."""
    e = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("degree")
    )
    tri = triangle_counts(edges, driver_max_edges=driver_max_edges)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0).cast("long")).alias("triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("coeff"),
        )
    )


def pagerank_from_edges(
    edges: DataFrame,
    iterations: int = 5,
    alpha: float = 0.85,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Directed PageRank over an arbitrary (src, dst) edge list — the
    crawl-ranking shape: feed it the href graph harvested from stored
    markup (``functions.html.link_graph`` / ``warc.warc_link_graph``)
    and rank pages by incoming-link structure, the original use of the
    algorithm (Page et al. 1999).

    Unlike :func:`pagerank` (undirected bipartite — no dangling nodes
    by construction), a link graph is directed and pages with no
    out-links are common, so each superstep redistributes the dangling
    mass uniformly: r ← (1-α)/N + α·(Σ in-contribs + dangling/N).
    Total mass stays 1 (asserted by the tests, not the operator).

    Scale shape per superstep: one equi-join of the edge list against
    the current ranks + a partial-agg sum per dst (the same shape as
    :func:`pagerank`), plus a ONE-ROW aggregate for the dangling mass
    broadcast back — never a per-node window, never a collect. Ranks
    are rounded to 6 dp at the end only. Returns (node_id, rank)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    persisted = [e]
    try:
        nodes = (
            e.select(F.col("src").alias("node_id"))
            .unionByName(e.select(F.col("dst").alias("node_id")))
            .distinct()
            .persist()
        )
        persisted.append(nodes)
        n = nodes.count()
        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
        base = nodes.join(
            outdeg.withColumnRenamed("src", "node_id"), "node_id", "left"
        ).select("node_id", F.coalesce("deg", F.lit(0)).alias("deg"))
        base = base.persist()
        persisted.append(base)
        base.count()

        ranks = base.select("node_id", F.lit(1.0 / n).alias("rank"))
        for _ in range(iterations):
            dangling = (
                ranks.join(
                    base.filter(F.col("deg") == 0), "node_id", "left_semi"
                )
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            contribs = (
                e.join(
                    base.withColumnRenamed("node_id", "src"), "src"
                )
                .join(ranks.withColumnRenamed("node_id", "src"), "src")
                .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("inflow"))
            )
            ranks = (
                nodes.join(
                    contribs.withColumnRenamed("dst", "node_id"),
                    "node_id",
                    "left",
                )
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node_id",
                    (
                        F.lit((1.0 - alpha) / n)
                        + F.lit(alpha)
                        * (
                            F.coalesce("inflow", F.lit(0.0))
                            + F.col("dm") / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
            )
            ranks = ranks.localCheckpoint(eager=True)
        # the final frame is a projection of the eager localCheckpoint,
        # so the cached inputs are safe to release here
        return ranks.select("node_id", F.round("rank", 6).alias("rank"))
    finally:
        for df in persisted:
            try:
                df.unpersist(False)
            except Exception:
                pass


def hits_from_edges(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed
    (src, dst) edge list — PageRank's companion for webpage link
    graphs: a good *hub* links to good authorities, a good *authority*
    is linked from good hubs. Returns (node_id, hub, authority), both
    scores L2-normalized per iteration (the standard power-iteration
    normalization; 6-dp rounding at the end only).

    Per superstep: authority = Σ hub over in-edges, hub = Σ authority
    over out-edges — two equi-join + partial-agg passes over the edge
    list, each normalization a ONE-ROW aggregate broadcast back.
    Same aggregateMessages shape as the PageRank loop; lineage cut per
    superstep with an eager localCheckpoint."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    persisted = [e]
    try:
        nodes = (
            e.select(F.col("src").alias("node_id"))
            .unionByName(e.select(F.col("dst").alias("node_id")))
            .distinct()
            .persist()
        )
        persisted.append(nodes)
        nodes.count()

        scores = nodes.select(
            "node_id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
        )
        for _ in range(iterations):
            auth = (
                e.join(
                    scores.select(
                        F.col("node_id").alias("src"), F.col("hub").alias("h")
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("h").alias("a_raw"))
            )
            scored_a = nodes.join(
                auth.withColumnRenamed("dst", "node_id"), "node_id", "left"
            ).select(
                "node_id", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw")
            )
            a_norm = scored_a.agg(
                F.sqrt(F.sum(F.col("a_raw") * F.col("a_raw"))).alias("z")
            )
            scored_a = scored_a.crossJoin(F.broadcast(a_norm)).select(
                "node_id",
                F.when(F.col("z") > 0, F.col("a_raw") / F.col("z"))
                .otherwise(F.lit(0.0))
                .alias("authority"),
            )
            hub = (
                e.join(
                    scored_a.select(
                        F.col("node_id").alias("dst"),
                        F.col("authority").alias("a"),
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.sum("a").alias("h_raw"))
            )
            scored_h = nodes.join(
                hub.withColumnRenamed("src", "node_id"), "node_id", "left"
            ).select(
                "node_id", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw")
            )
            h_norm = scored_h.agg(
                F.sqrt(F.sum(F.col("h_raw") * F.col("h_raw"))).alias("z")
            )
            scored_h = scored_h.crossJoin(F.broadcast(h_norm)).select(
                "node_id",
                F.when(F.col("z") > 0, F.col("h_raw") / F.col("z"))
                .otherwise(F.lit(0.0))
                .alias("hub"),
            )
            scores = scored_h.join(scored_a, "node_id").localCheckpoint(
                eager=True
            )
        return scores.select(
            "node_id",
            F.round("hub", 6).alias("hub"),
            F.round("authority", 6).alias("authority"),
        )
    finally:
        for df in persisted:
            try:
                df.unpersist(False)
            except Exception:
                pass


def _bfs_driver(
    edges: DataFrame, rows: list, sources: list, max_hops: int,
    directed: bool = False,
) -> DataFrame:
    """Exact BFS over a collected edge list — the union-find fast
    path's sibling for distances. Returns (node_id, dist) for every
    node reached within ``max_hops`` (the same cap the superstep loop
    honors, so the two paths agree on any graph); same endpoint types
    as the input edges. ``directed`` follows src→dst arrows only."""
    from collections import deque

    from pyspark.sql import types as T

    adj: dict = {}
    for r in rows:
        a, b = r[0], r[1]
        adj.setdefault(a, []).append(b)
        if not directed:
            adj.setdefault(b, []).append(a)
        else:
            adj.setdefault(b, [])
    # Every source starts at dist 0 even when absent from the edge list
    # (isolated/unknown seed) — the distributed superstep path emits the
    # seed frame unconditionally, and the two paths must agree on any
    # graph regardless of which side of driver_max_edges it falls.
    dist = {s: 0 for s in sources}
    dq = deque(dist)
    while dq:
        u = dq.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    node_type = edges.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("node_id", node_type, False),
            T.StructField("dist", T.LongType(), False),
        ]
    )
    return edges.sparkSession.createDataFrame(
        [(n, int(d)) for n, d in dist.items()], schema
    )


def bfs_distances_from_edges(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 20,
    driver_max_edges: int = DRIVER_MAX_EDGES,
    directed: bool = False,
) -> DataFrame:
    """Single-source (or multi-source) shortest hop counts over a
    (src, dst) edge list: (node_id, dist), unreached nodes absent.
    ``sources`` is any frame with a ``node_id`` column (dist 0).
    ``directed=True`` follows the arrows only — click distance from a
    homepage over a harvested href graph is the canonical use.

    Same two physical strategies as :func:`components_from_edges`, and
    the same size probe IS the fast path's collect:

    - **≤ driver_max_edges** — adjacency BFS on the driver (the whole
      frontier machinery costs microseconds where the distributed loop
      would pay ~diameter fixed-cost jobs).
    - **larger** — frontier supersteps: each hop joins the frontier to
      the edge list, anti-joins already-settled nodes, and appends the
      new layer at dist h. Every shuffle carries only frontier-sized
      key rows; the settled set grows monotonically, so a node is
      joined as frontier exactly once — total work O(|E|·1) amortized
      across hops, never O(|E|·hops).
    """
    fwd = edges.select("src", "dst")
    if driver_max_edges is not None:
        head = fwd.limit(driver_max_edges + 1).collect()
        if len(head) <= driver_max_edges:
            srcs = [r[0] for r in sources.select("node_id").collect()]
            return _bfs_driver(edges, head, srcs, max_hops, directed)
    und = (
        fwd
        if directed
        else fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    ).persist()
    dist = (
        sources.select("node_id")
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .persist()
    )
    dist.count()
    frontier = dist.select("node_id")
    prev_nxt = None
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(und, frontier.node_id == und.src)
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(dist.select("node_id"), "node_id", "left_anti")
            .withColumn("dist", F.lit(h).cast("long"))
            .persist()
        )
        n_new = nxt.count()
        if n_new == 0:
            nxt.unpersist()
            break
        new_dist = dist.unionByName(nxt).persist()
        new_dist.count()
        dist.unpersist()
        # The previous hop's frontier is folded into new_dist now —
        # release it so deep graphs don't accumulate one cached frame
        # per BFS level for the rest of the session.
        if prev_nxt is not None:
            prev_nxt.unpersist()
        prev_nxt = nxt
        dist = new_dist
        frontier = nxt.select("node_id")
    if prev_nxt is not None:
        prev_nxt.unpersist()
    und.unpersist()
    return dist


def bfs_distances(g, max_hops: int = 20) -> DataFrame:
    """Hop distance from the smallest Link node over the Link↔Keyword
    bipartite graph — the deterministic data-derived seed discipline of
    the PPR leg (registry.py), so the DuckDB oracle reproduces the seed
    with ``min(src) WHERE src LIKE 'Link:%'``. Returns (node_id, dist)
    for reached nodes."""
    fwd = g.has_keyword.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Keyword:"), F.col("dst_keyword")).alias("dst"),
    )
    seed = fwd.agg(F.min("src").alias("node_id"))
    return bfs_distances_from_edges(fwd, seed, max_hops)
