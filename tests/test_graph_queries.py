"""Read-operator unit tests on tiny literal graphs (SURVEY §2.2-§2.6)."""

from __future__ import annotations

import pytest

from webpagesgraphdatabase_spark.graph import queries as Q
from webpagesgraphdatabase_spark.graph.model import (
    BELONGS_TO_SCHEMA,
    HAS_KEYWORD_SCHEMA,
    NAME_SCHEMA,
    PropertyGraph,
)
from tests.conftest import link_row


@pytest.fixture()
def tiny_graph(spark):
    """u1,u2 in different categories share k1; u3 shares category with u1.
    kOrphan has no edges."""
    links = spark.createDataFrame(
        [
            link_row("u1", suggested_category="CatA", keywords="k1, k2"),
            link_row("u2", suggested_category="CatB", keywords="k1"),
            link_row("u3", suggested_category="CatA", keywords="k1",
                     category_explanation=None),
        ]
    )
    return PropertyGraph(
        links=links,
        categories=spark.createDataFrame([("CatA",), ("CatB",)], NAME_SCHEMA),
        keywords=spark.createDataFrame(
            [("k1",), ("k2",), ("kOrphan",)], NAME_SCHEMA
        ),
        belongs_to=spark.createDataFrame(
            [("u1", "CatA"), ("u2", "CatB"), ("u3", "CatA")], BELONGS_TO_SCHEMA
        ),
        has_keyword=spark.createDataFrame(
            [("u1", "k1"), ("u1", "k2"), ("u2", "k1"), ("u3", "k1")],
            HAS_KEYWORD_SCHEMA,
        ),
    )


@pytest.fixture()
def multi_category_graph(spark, tiny_graph):
    """tiny_graph plus a second category membership for u1 — violates
    the one-category-per-link precondition of the algebraic flagship
    plan, which must then fall back to the naive spec plan."""
    extra = spark.createDataFrame([("u1", "CatB")], BELONGS_TO_SCHEMA)
    return PropertyGraph(
        links=tiny_graph.links,
        categories=tiny_graph.categories,
        keywords=tiny_graph.keywords,
        belongs_to=tiny_graph.belongs_to.unionByName(extra),
        has_keyword=tiny_graph.has_keyword,
    )


def test_interconnect_multi_category_falls_back_to_naive(multi_category_graph):
    got = [tuple(r) for r in Q.interconnections_canonical(multi_category_graph).collect()]
    want = [
        tuple(r)
        for r in Q.interconnections_canonical_naive(multi_category_graph).collect()
    ]
    assert got == want
    # u1 now matches u2's CatB membership across categories via k1
    assert any(r[3] == "u1" and r[4] == "u2" for r in got)


def test_links_with_categories_null_coalesce(tiny_graph):
    rows = {r.url: r for r in Q.links_with_categories(tiny_graph).collect()}
    assert rows["u1"].category == "CatA"
    assert rows["u3"].category_explanation == "None"  # P9 default


def test_interconnections_canonical(tiny_graph):
    rows = Q.interconnections_canonical(tiny_graph).collect()
    # cross-category pairs sharing a keyword, url_1 < url_2:
    # (u1,u2) via k1, (u2,u3) via k1 — (u1,u3) same category excluded
    assert [(r.url_1, r.url_2, r.keyword) for r in rows] == [
        ("u1", "u2", "k1"),
        ("u2", "u3", "k1"),
    ]


def test_interconnections_canonical_matches_naive_spec(tiny_graph):
    """The limit-pushdown plan must equal the naive self-join spec."""
    for lim in (1, 2, 100):
        fast = Q.interconnections_canonical(tiny_graph, lim).collect()
        naive = Q.interconnections_canonical_naive(tiny_graph, lim).collect()
        assert fast == naive


def test_interconnections_symmetric_both_orientations(tiny_graph):
    rows = Q.interconnections_symmetric(tiny_graph).collect()
    pairs = {(r.url_1, r.url_2) for r in rows}
    assert pairs == {("u1", "u2"), ("u2", "u1"), ("u2", "u3"), ("u3", "u2")}


def test_pair_counts_matches_symmetric(tiny_graph):
    rows = {
        (r.category_1, r.category_2): (r.cnt, r.ra_score)
        for r in Q.interconnection_pair_counts(tiny_graph).collect()
    }
    # k1 is carried by 3 links -> w = 1e9 div 3 = 333333333; both
    # cross-category pairs (u1-u2, u3-u2) share only k1, so each
    # direction's Resource-Allocation total is 2 * w
    assert rows == {
        ("CatA", "CatB"): (2, 666_666_666),
        ("CatB", "CatA"): (2, 666_666_666),
    }


def test_counts_and_distinct(tiny_graph):
    assert Q.count_links(tiny_graph).collect()[0].cnt == 3
    per_cat = {r.category: r.cnt for r in Q.links_per_category(tiny_graph).collect()}
    assert per_cat == {"CatA": 2, "CatB": 1}
    cats = {r.category for r in Q.distinct_categories(tiny_graph).collect()}
    assert cats == {"CatA", "CatB"}


def test_orphans(tiny_graph):
    assert [r.name for r in Q.orphan_keywords(tiny_graph).collect()] == ["kOrphan"]
    assert Q.orphan_categories(tiny_graph).count() == 0


def test_export_nodes_tagged_union(tiny_graph):
    rows = Q.export_nodes(tiny_graph).collect()
    groups = {r.group for r in rows}
    assert groups == {"Link", "Category", "Keyword"}
    ids = {r.id for r in rows}
    assert "Link:u1" in ids and "Keyword:kOrphan" in ids
    assert len(rows) == 3 + 2 + 3


def test_export_edges_tagged_union(tiny_graph):
    rows = Q.export_edges(tiny_graph).collect()
    rels = {r.rel for r in rows}
    assert rels == {"BELONGS_TO", "HAS_KEYWORD"}
    assert len(rows) == 3 + 4


def test_top_keywords_explodes_denormalized_column(tiny_graph):
    rows = Q.top_keywords(tiny_graph).collect()
    assert (rows[0].keyword, rows[0].cnt) == ("k1", 3)
    assert (rows[1].keyword, rows[1].cnt) == ("k2", 1)


def test_point_lookup_and_sample(tiny_graph):
    assert Q.point_lookup(tiny_graph, "u2").collect()[0].title == "title u2"
    assert Q.point_lookup(tiny_graph, "missing").count() == 0
    s1 = [r.url for r in Q.sample_links(tiny_graph, 2).collect()]
    s2 = [r.url for r in Q.sample_links(tiny_graph, 2).collect()]
    assert s1 == s2 and len(s1) == 2  # deterministic sample
