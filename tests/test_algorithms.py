"""Iterative graph algorithms on hand-checkable graphs (these are the
rows-only registry entries — unit tests carry the correctness burden)."""

from __future__ import annotations

import pytest

from webpagesgraphdatabase_spark.graph.algorithms import (
    connected_components,
    pagerank,
)
from webpagesgraphdatabase_spark.graph.model import PropertyGraph


def _graph(spark, hk_pairs):
    """Minimal PropertyGraph with only has_keyword populated."""
    hk = spark.createDataFrame(hk_pairs, ["src_url", "dst_keyword"])
    empty = spark.createDataFrame([], "name string")
    links = spark.createDataFrame([], "url string")
    return PropertyGraph(
        links=links,
        categories=empty,
        keywords=empty,
        belongs_to=spark.createDataFrame([], "src_url string, dst_category string"),
        has_keyword=hk,
    )


def test_pagerank_star_center_dominates(spark):
    # star: one keyword shared by 3 links -> keyword gets the highest rank
    g = _graph(spark, [("a", "K"), ("b", "K"), ("c", "K")])
    ranks = {r.node_id: r.rank for r in pagerank(g, iterations=10).collect()}
    assert ranks["Keyword:K"] > ranks["Link:a"]
    assert ranks["Link:a"] == ranks["Link:b"] == ranks["Link:c"]
    # ranks are a probability distribution
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_symmetric_pair_is_uniform(spark):
    g = _graph(spark, [("a", "K1"), ("b", "K2")])
    ranks = {r.node_id: r.rank for r in pagerank(g, iterations=5).collect()}
    assert len(set(ranks.values())) == 1  # two disjoint symmetric pairs


def test_personalized_pagerank_concentrates_on_seed_component(spark):
    """PPR with the restart mass on Link:a: nodes in a's island carry
    all the mass (seed highest among links), the other island reads
    exactly 0.0 — relevance-to-seed, not global centrality."""
    g = _graph(spark, [("a", "K1"), ("b", "K1"), ("c", "K2")])
    seeds = spark.createDataFrame([("Link:a",)], "node_id string")
    ppr = {r.node_id: r.rank for r in
           pagerank(g, iterations=10, seeds=seeds).collect()}
    assert ppr["Link:c"] == 0.0 and ppr["Keyword:K2"] == 0.0
    assert ppr["Link:a"] > ppr["Link:b"] > 0.0
    assert ppr["Keyword:K1"] > 0.0
    assert sum(ppr.values()) == pytest.approx(1.0, abs=1e-4)
    # uniform ranks unchanged by the seeded branch (regression pin)
    uniform = {r.node_id: r.rank for r in pagerank(g, iterations=5).collect()}
    assert sum(uniform.values()) == pytest.approx(1.0, abs=1e-4)
    with pytest.raises(ValueError, match="no seed"):
        pagerank(g, seeds=spark.createDataFrame([("Link:zzz",)],
                                                "node_id string"))


def test_connected_components_two_islands(spark):
    g = _graph(spark, [("a", "K1"), ("b", "K1"), ("c", "K2")])
    comp = {r.node_id: r.component for r in connected_components(g).collect()}
    # island 1: a, b, K1 ; island 2: c, K2 — labels are min ids
    assert comp["Link:a"] == comp["Link:b"] == comp["Keyword:K1"] == "Keyword:K1"
    assert comp["Link:c"] == comp["Keyword:K2"] == "Keyword:K2"


def test_connected_components_chain_converges(spark):
    # path graph: a-K1-b-K2-c-K3-d (diameter 6) must collapse to one label
    g = _graph(
        spark,
        [("a", "K1"), ("b", "K1"), ("b", "K2"), ("c", "K2"), ("c", "K3"), ("d", "K3")],
    )
    comp = {r.node_id: r.component for r in connected_components(g).collect()}
    assert len(set(comp.values())) == 1
    assert set(comp.values()) == {"Keyword:K1"}


def test_edge_endpoints_share_component_on_testdata(spark):
    from webpagesgraphdatabase_spark.graph.algorithms import bipartite_edges
    from webpagesgraphdatabase_spark.graph.tpch_adapter import graph_from_tpch
    from pyspark.sql import functions as F

    g = graph_from_tpch(spark, "/root/testdata/sf0.001")
    labels = connected_components(g)
    e = bipartite_edges(g)
    mismatched = (
        e.join(labels.withColumnRenamed("node_id", "src"), "src")
        .withColumnRenamed("component", "src_comp")
        .join(
            labels.select(
                F.col("node_id").alias("dst"), F.col("component").alias("dst_comp")
            ),
            "dst",
        )
        .filter(F.col("src_comp") != F.col("dst_comp"))
        .count()
    )
    assert mismatched == 0


def test_components_driver_path_equals_distributed_loop(spark):
    from webpagesgraphdatabase_spark.graph import algorithms as alg

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (7, 7), (3, 1)], ["src", "dst"]
    )
    fast = sorted(map(tuple, alg.components_from_edges(edges).collect()))
    slow = sorted(
        map(tuple, alg.components_from_edges(edges, driver_max_edges=0).collect())
    )
    assert fast == slow
    assert fast == [
        (1, 1), (2, 1), (3, 1), (7, 7), (10, 10), (11, 10),
    ]


def test_components_guard_routes_large_graphs_to_loop(spark):
    from webpagesgraphdatabase_spark.graph import algorithms as alg

    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["src", "dst"])
    out = {r.node_id: r.component
           for r in alg.components_from_edges(edges, driver_max_edges=2).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_bounded_reach_path_graph(spark):
    # path: a-K1-b-K2-c  (bipartite hops)
    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach

    g = _graph(spark, [("a", "K1"), ("b", "K1"), ("b", "K2"), ("c", "K2")])
    r = {x.node_id: x for x in bounded_reach(g, max_hops=3).collect()}
    # radius 1 = degree
    assert r["Link:a"].n_reach_1 == 1
    assert r["Link:b"].n_reach_1 == 2
    assert r["Keyword:K1"].n_reach_1 == 2
    # radius 2: a reaches K1 and b; b reaches K1, K2, a, c
    assert r["Link:a"].n_reach_2 == 2
    assert r["Link:b"].n_reach_2 == 4
    # radius 3: a adds K2 (via b); the whole path has 5 nodes
    assert r["Link:a"].n_reach_3 == 3
    assert r["Link:b"].n_reach_3 == 4  # already saturated
    assert r["Keyword:K1"].n_reach_3 == 4  # everything but itself


def test_bounded_reach_matches_component_size_at_diameter(spark):
    # at radius >= diameter every node reaches its whole component
    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach

    g = _graph(spark, [("a", "K1"), ("b", "K1"), ("c", "K2")])
    r = {x.node_id: x for x in bounded_reach(g, max_hops=2).collect()}
    assert r["Link:a"].n_reach_2 == 2  # a, b, K1 island minus self
    assert r["Link:c"].n_reach_2 == 1  # c, K2 island minus self


def test_bounded_reach_seeded_equals_filtered_full_run(spark):
    # the documented scale discipline is now expressible: seeded reach
    # must equal the same nodes' rows from the corpus-wide run
    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach

    g = _graph(spark, [("a", "K1"), ("b", "K1"), ("b", "K2"), ("c", "K2")])
    seeds = spark.createDataFrame(
        [("Link:a",), ("Keyword:K1",)], ["node_id"]
    )
    seeded = sorted(map(tuple, bounded_reach(g, 3, seeds=seeds).collect()))
    full = sorted(
        tuple(r)
        for r in bounded_reach(g, 3).collect()
        if r.node_id in {"Link:a", "Keyword:K1"}
    )
    assert seeded == full and len(seeded) == 2


def test_bounded_reach_approx_mode_matches_exact_on_small_graph(spark):
    # HLL is exact at small cardinalities, so the sketch mode must
    # reproduce the exact counts on the hand-checkable path graph
    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach

    g = _graph(spark, [("a", "K1"), ("b", "K1"), ("b", "K2"), ("c", "K2")])
    exact = {r.node_id: (r.n_reach_1, r.n_reach_2) for r in bounded_reach(g).collect()}
    approx = {
        r.node_id: (r.n_reach_1, r.n_reach_2)
        for r in bounded_reach(g, exact=False).collect()
    }
    assert exact == approx


def test_label_propagation_two_dense_communities(spark):
    """Two keyword-dense link groups joined by a single bridge edge:
    after propagation each dense group shares one community label, and
    the groups' labels differ."""
    from webpagesgraphdatabase_spark.graph.algorithms import label_propagation

    left = [(l, k) for l in ("a1", "a2", "a3") for k in ("KA", "KB")]
    right = [(l, k) for l in ("b1", "b2", "b3") for k in ("KX", "KY")]
    bridge = [("a1", "KX")]
    g = _graph(spark, left + right + bridge)
    comm = {r.node_id: r.community for r in label_propagation(g).collect()}

    left_nodes = {f"Link:{l}" for l in ("a1", "a2", "a3")}
    right_nodes = {f"Link:{l}" for l in ("b1", "b2", "b3")}
    left_labels = {comm[n] for n in left_nodes}
    right_labels = {comm[n] for n in right_nodes - {"Link:b1"}} | {comm["Link:b1"]}
    assert len(left_labels) == 1
    assert len(right_labels) == 1
    assert left_labels != right_labels


def test_label_propagation_deterministic(spark):
    from webpagesgraphdatabase_spark.graph.algorithms import label_propagation

    g = _graph(spark, [("a", "K1"), ("b", "K1"), ("b", "K2"), ("c", "K2")])
    r1 = sorted(map(tuple, label_propagation(g).collect()))
    r2 = sorted(map(tuple, label_propagation(g).collect()))
    assert r1 == r2
    assert len(r1) == 5  # every node (3 links + 2 keywords) labeled once


def test_k_core_peels_cascading_pendants(spark):
    """2-core of a bipartite graph: the dense block survives; a pendant
    link is peeled, and the keyword it alone supported cascades out."""
    from webpagesgraphdatabase_spark.graph.algorithms import k_core

    dense = [(l, kw) for l in ("a", "b", "c") for kw in ("K1", "K2")]
    # pendant: link p has one keyword KP; KP has degree 2 via link a,
    # but once p peels, KP drops to 1 and cascades out too
    extra = [("p", "KP"), ("a", "KP")]
    g = _graph(spark, dense + extra)
    core = {r.node_id: r.degree for r in k_core(g, k=2).collect()}
    assert set(core) == {
        "Link:a", "Link:b", "Link:c", "Keyword:K1", "Keyword:K2"
    }
    assert core["Keyword:K1"] == 3 and core["Link:b"] == 2


def test_k_core_empty_when_k_exceeds_density(spark):
    from webpagesgraphdatabase_spark.graph.algorithms import k_core

    g = _graph(spark, [("a", "K1"), ("b", "K1")])
    assert k_core(g, k=2).count() == 0


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant: K4 has 4 triangles; every K4 vertex sits in
    exactly 3 of them; the pendant and the edgeless path are in none."""
    from webpagesgraphdatabase_spark.graph.algorithms import triangle_counts

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    pendant = [("d", "e"), ("e", "f")]
    edges = spark.createDataFrame(k4 + pendant, ["u", "v"])
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_counts_dedups_and_normalizes_direction(spark):
    """Duplicate edges, reversed duplicates, and self-loops must not
    inflate the count: one triangle remains one triangle."""
    from webpagesgraphdatabase_spark.graph.algorithms import triangle_counts

    messy = [
        ("a", "b"), ("b", "a"), ("a", "b"),
        ("b", "c"), ("c", "a"), ("a", "a"),
    ]
    edges = spark.createDataFrame(messy, ["u", "v"])
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_triangle_free_graph_is_empty(spark):
    from webpagesgraphdatabase_spark.graph.algorithms import triangle_counts

    square = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    edges = spark.createDataFrame(square, ["u", "v"])
    assert triangle_counts(edges).count() == 0


def test_keyword_cooccurrence_caps_to_top_n(spark):
    """Only pairs among the top_n keywords survive: with top_n=2 the
    third keyword's co-occurrences disappear."""
    from webpagesgraphdatabase_spark.graph.algorithms import (
        keyword_cooccurrence_edges,
    )

    pairs = [
        ("l1", "K1"), ("l1", "K2"), ("l1", "K3"),
        ("l2", "K1"), ("l2", "K2"),
        ("l3", "K1"),
    ]
    g = _graph(spark, pairs)
    got = {(r.u, r.v) for r in keyword_cooccurrence_edges(g, top_n=2).collect()}
    assert got == {("K1", "K2")}
    full = {(r.u, r.v) for r in keyword_cooccurrence_edges(g, top_n=10).collect()}
    assert full == {("K1", "K2"), ("K1", "K3"), ("K2", "K3")}


def test_triangle_counts_driver_and_distributed_paths_agree(spark):
    """Path equivalence (the components_from_edges discipline): the
    driver fast path and the forced distributed superstep plan return
    identical counts on the same graph."""
    from webpagesgraphdatabase_spark.graph.algorithms import triangle_counts

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    extra = [("d", "e"), ("e", "f"), ("e", "a")]  # adds triangle a-d-e
    edges = spark.createDataFrame(k4 + extra, ["u", "v"])
    fast = sorted(map(tuple, triangle_counts(edges).collect()))
    dist = sorted(
        map(tuple, triangle_counts(edges, driver_max_edges=0).collect())
    )
    assert fast == dist and len(fast) >= 4


def test_clustering_coefficients_hand_graph(spark):
    """K3 + one pendant off node c: a and b are fully clustered
    (coeff 1.0); c has degree 3 with 1 of 3 possible wedges closed
    (coeff 1/3); the pendant has degree 1 (coeff 0)."""
    from webpagesgraphdatabase_spark.graph.algorithms import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["u", "v"]
    )
    got = {r.node: r for r in clustering_coefficients(edges).collect()}
    assert got["a"].coeff == 1.0 and got["b"].coeff == 1.0
    assert got["c"].coeff == pytest.approx(1 / 3, abs=1e-6)
    assert got["d"].coeff == 0.0 and got["d"].triangles == 0
    assert got["c"].degree == 3


def test_pagerank_from_edges_directed_dangling(spark):
    """Directed PageRank over an href-style edge list, checked against
    a driver-local power iteration with dangling-mass redistribution:
    identical ranks to 6 dp, total mass 1."""
    from webpagesgraphdatabase_spark.graph.algorithms import pagerank_from_edges

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
        # e is dangling (no out-edges); nothing links to d
        ("a", "e"),
    ]
    df = spark.createDataFrame(edges, ["src_url", "dst_url"])
    got = {r.node_id: r.rank for r in pagerank_from_edges(df, iterations=5).collect()}

    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: [d for s, d in edges if s == v] for v in nodes}
    alpha, rank = 0.85, {v: 1.0 / n for v in nodes}
    for _ in range(5):
        dm = sum(rank[v] for v in nodes if not out[v])
        new = {}
        for v in nodes:
            inflow = sum(rank[s] / len(out[s]) for s in nodes if v in out[s])
            new[v] = (1 - alpha) / n + alpha * (inflow + dm / n)
        rank = new
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1.5e-6), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_from_edges_ranks_crawled_link_graph(spark, tmp_path):
    """End-to-end crawl ranking: WARC fixture -> link_graph ->
    pagerank_from_edges; the page everything links to outranks the
    leaves."""
    from webpagesgraphdatabase_spark import warc as W
    from webpagesgraphdatabase_spark.graph.algorithms import pagerank_from_edges

    def page(uri, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs).encode()
        return {
            "record_id": f"<urn:uuid:{uri}>",
            "warc_type": "response",
            "target_uri": uri,
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(body),
        }

    hub = "https://s.example/hub"
    recs = [
        page("https://s.example/a", [hub, "/b"]),
        page("https://s.example/b", [hub]),
        page("https://s.example/c", [hub, "/a"]),
        page(hub, []),
    ]
    (tmp_path / "c.warc").write_bytes(W.build_warc(recs))
    g = W.warc_link_graph(W.read_warc(spark, str(tmp_path)))
    ranks = {
        r.node_id: r.rank
        for r in pagerank_from_edges(g, iterations=8).collect()
    }
    assert max(ranks, key=ranks.get) == hub


def test_hits_from_edges_hand_checked(spark):
    """HITS on a small directed graph against a driver-local power
    iteration (L2 normalization per step): equal to 6 dp; the page
    everything points at is the top authority, the page linking to
    the most authorities the top hub."""
    import math

    from webpagesgraphdatabase_spark.graph.algorithms import hits_from_edges

    edges = [
        ("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h3", "a1"),
        ("h3", "a3"), ("a1", "a2"),
    ]
    df = spark.createDataFrame(edges, ["src_url", "dst_url"])
    got = {
        r.node_id: (r.hub, r.authority)
        for r in hits_from_edges(df, iterations=5).collect()
    }

    nodes = sorted({x for e in edges for x in e})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(5):
        a = {v: sum(hub[s] for s, d in edges if d == v) for v in nodes}
        z = math.sqrt(sum(x * x for x in a.values()))
        a = {v: (x / z if z else 0.0) for v, x in a.items()}
        h = {v: sum(a[d] for s, d in edges if s == v) for v in nodes}
        z = math.sqrt(sum(x * x for x in h.values()))
        h = {v: (x / z if z else 0.0) for v, x in h.items()}
        hub, auth = h, a
    for v in nodes:
        assert got[v][0] == pytest.approx(hub[v], abs=1.5e-6), ("hub", v)
        assert got[v][1] == pytest.approx(auth[v], abs=1.5e-6), ("auth", v)
    assert max(got, key=lambda v: got[v][1]) == "a1"
    # h1 -> {a1, a2} beats h3 -> {a1, a3}: a2 carries extra authority
    # from a1's own outlink, a3 only h3's hub mass
    assert max(got, key=lambda v: got[v][0]) == "h1"


def test_bfs_distances_driver_and_superstep_agree(spark):
    """BFS hop distances: the driver fast path and the distributed
    frontier-superstep loop return identical (node, dist) sets on a
    hand-built graph with two components; unreached nodes are absent;
    multi-source takes the nearest seed."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph import algorithms as A

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], ["src", "dst"]
    )
    seed = spark.createDataFrame([("a",)], ["node_id"])
    want = {("a", 0), ("b", 1), ("c", 2), ("d", 3)}
    fast = {
        (r.node_id, r.dist)
        for r in A.bfs_distances_from_edges(edges, seed).collect()
    }
    slow = {
        (r.node_id, r.dist)
        for r in A.bfs_distances_from_edges(
            edges, seed, driver_max_edges=0
        ).collect()
    }
    assert fast == want and slow == want  # x/y unreached, absent

    multi = spark.createDataFrame([("a",), ("d",)], ["node_id"])
    got = {
        (r.node_id, r.dist)
        for r in A.bfs_distances_from_edges(edges, multi).collect()
    }
    assert got == {("a", 0), ("d", 0), ("b", 1), ("c", 1)}
    # max_hops truncates the frontier expansion — on BOTH paths
    for dme in (0, None):
        capped = {
            (r.node_id, r.dist)
            for r in A.bfs_distances_from_edges(
                edges, seed, max_hops=1, driver_max_edges=dme
            ).collect()
        }
        assert capped == {("a", 0), ("b", 1)}


def test_bfs_distances_isolated_seed_agrees_on_both_paths(spark):
    """A seed absent from the edge list (isolated/unknown node) is
    still emitted at dist 0 by BOTH physical strategies — the answer
    must not depend on which side of driver_max_edges the graph falls."""
    from webpagesgraphdatabase_spark.graph import algorithms as A

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seed = spark.createDataFrame([("lonely",), ("a",)], ["node_id"])
    want = {("lonely", 0), ("a", 0), ("b", 1)}
    for dme in (None, 0):
        got = {
            (r.node_id, r.dist)
            for r in A.bfs_distances_from_edges(
                edges, seed, driver_max_edges=dme
            ).collect()
        }
        assert got == want, f"driver_max_edges={dme}"


def test_bfs_distances_directed(spark):
    """directed=True follows arrows only — b is 1 hop from a, but a is
    unreachable FROM b; both physical paths agree."""
    from webpagesgraphdatabase_spark.graph import algorithms as A

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "a")], ["src", "dst"]
    )
    seed = spark.createDataFrame([("a",)], ["node_id"])
    want = {("a", 0), ("b", 1), ("c", 2)}  # d unreached (arrow points in)
    for dme in (None, 0):
        got = {
            (r.node_id, r.dist)
            for r in A.bfs_distances_from_edges(
                edges, seed, directed=True, driver_max_edges=dme
            ).collect()
        }
        assert got == want
