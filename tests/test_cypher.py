"""Cypher front-end tests: the reference's verbatim query strings
(``dockerapp/app/main.py``) executed through ``cypher()`` /
``cypher_write()`` must agree with the hand-written DataFrame layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.graph import queries as Q
from webpagesgraphdatabase_spark.graph.cypher import (
    CypherSyntaxError,
    cypher,
    cypher_write,
)
from webpagesgraphdatabase_spark.graph.model import PropertyGraph


@pytest.fixture(scope="module")
def g(spark):
    links = spark.createDataFrame(
        [
            ("a", "ta", None, "X", None, None, "none", None, None),
            ("b", "tb", None, "Y", None, None, "none", None, None),
            ("c", None, None, "Y", None, None, "none", None, None),
        ],
        "url string, title string, raw_category string, suggested_category string,"
        "raw_content string, cleaned_content string, keywords string,"
        "category_explanation string, keyword_explanation string",
    )
    categories = spark.createDataFrame([("X",), ("Y",)], ["name"])
    keywords = spark.createDataFrame([("k1",), ("k2",)], ["name"])
    belongs_to = spark.createDataFrame(
        [("a", "X"), ("b", "Y"), ("c", "Y")], ["src_url", "dst_category"]
    )
    has_keyword = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k2"), ("c", "k1")],
        ["src_url", "dst_keyword"],
    )
    return PropertyGraph(links, categories, keywords, belongs_to, has_keyword)


def test_reference_flagship_verbatim(g):
    """main.py:199-204 pasted unchanged: the multi-pattern interconnection
    with WHERE, against the query layer's symmetric variant."""
    df = cypher(
        g,
        """
            MATCH (l1:Link)-[:HAS_KEYWORD]->(k:Keyword)<-[:HAS_KEYWORD]-(l2:Link),
                  (l1)-[:BELONGS_TO]->(c1:Category), (l2)-[:BELONGS_TO]->(c2:Category)
            WHERE l1.url <> l2.url AND c1.name <> c2.name
            RETURN l1.url, l2.url, k.name, c1.name, c2.name
        """,
    )
    assert df.columns == ["l1.url", "l2.url", "k.name", "c1.name", "c2.name"]
    got = {tuple(r) for r in df.collect()}
    want = {
        (r.url_1, r.url_2, r.keyword, r.category_1, r.category_2)
        for r in Q.interconnections_symmetric(g).collect()
    }
    assert got == want and got  # non-empty on the fixture


def test_reference_one_hop_projection(g):
    """main.py:461: 1-hop BELONGS_TO with null guards."""
    rows = {
        tuple(r)
        for r in cypher(
            g,
            "MATCH (l:Link)-[:BELONGS_TO]->(c:Category) "
            "WHERE l.url IS NOT NULL AND c.name IS NOT NULL RETURN l.url, c.name",
        ).collect()
    }
    assert rows == {("a", "X"), ("b", "Y"), ("c", "Y")}


def test_point_lookup_with_param(g):
    rows = cypher(
        g,
        "MATCH (l:Link {url: $url}) RETURN l.url, l.title",
        {"url": "a"},
    ).collect()
    assert [tuple(r) for r in rows] == [("a", "ta")]


def test_count_aggregate(g):
    """main.py:25: MATCH (l:Link) RETURN COUNT(l) AS cnt."""
    rows = cypher(g, "MATCH (l:Link) RETURN COUNT(l) AS cnt").collect()
    assert rows[0].cnt == 3


def test_where_is_not_null_on_link_prop(g):
    """main.py:439: title-null guard joins the Link property table."""
    rows = {
        tuple(r)
        for r in cypher(
            g, "MATCH (l:Link) WHERE l.title IS NOT NULL RETURN l.url, l.title"
        ).collect()
    }
    assert rows == {("a", "ta"), ("b", "tb")}


def test_implicit_grouping_count_per_category(g):
    rows = {
        (r["c.name"], r.n)
        for r in cypher(
            g,
            "MATCH (l:Link)-[:BELONGS_TO]->(c:Category) RETURN c.name, COUNT(l) AS n",
        ).collect()
    }
    assert rows == {("X", 1), ("Y", 2)}


def test_distinct_order_limit(g):
    rows = cypher(
        g,
        "MATCH (l:Link)-[:HAS_KEYWORD]->(k:Keyword) "
        "RETURN DISTINCT k.name ORDER BY k.name DESC LIMIT 1",
    ).collect()
    assert [r["k.name"] for r in rows] == ["k2"]


def test_matches_motif_layer_plan_free_of_nested_loops(g):
    """The compiled pattern is equi-joins only — no cartesian /
    broadcast-nested-loop nodes in the physical plan."""
    df = cypher(
        g,
        "MATCH (l1:Link)-[:HAS_KEYWORD]->(k:Keyword)<-[:HAS_KEYWORD]-(l2:Link) "
        "WHERE l1.url <> l2.url RETURN l1.url, l2.url, k.name",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unbound_multi_chain_anchor_refused(g):
    """r5 verdict item 4: a standalone chain anchor with no shared
    variable and no binding would cross-join the full node table —
    refused at compile time, before any compute."""
    from webpagesgraphdatabase_spark.graph.cypher import CypherUnboundAnchorError

    for bad in (
        "MATCH (a:Link), (b:Link) RETURN a.url, b.url",
        "MATCH (a:Link), (b:Link), (c:Link) RETURN COUNT(*)",
        # second chain's b is unbound even though a is point-bound
        "MATCH (a:Link {url: 'a'}), (b:Category) RETURN a.url, b.name",
    ):
        with pytest.raises(CypherUnboundAnchorError):
            cypher(g, bad, {})
    # the error is a CypherSyntaxError subclass (HTTP routes 400 it)
    with pytest.raises(CypherSyntaxError):
        cypher(g, "MATCH (a:Link), (b:Link) RETURN COUNT(*)", {})


def test_bound_multi_chain_anchors_still_compile(g):
    """All three legitimate bindings pass the guard: inline property
    map (the reference's main.py:136-139 shape), WHERE var.prop =
    literal, and WHERE equality joining the chains."""
    by_props = cypher(
        g,
        "MATCH (a:Link {url: 'a'}), (b:Link {url: 'b'}) RETURN a.url, b.url",
    )
    assert [tuple(r) for r in by_props.collect()] == [("a", "b")]
    by_where_lit = cypher(
        g,
        "MATCH (a:Link {url: 'a'}), (b:Link) WHERE b.url = 'c' "
        "RETURN a.url, b.url",
    )
    assert [tuple(r) for r in by_where_lit.collect()] == [("a", "c")]
    by_where_join = cypher(
        g,
        "MATCH (a:Link)-[:BELONGS_TO]->(c1:Category), (b:Link) "
        "WHERE b.suggested_category = c1.name AND a.url = 'a' "
        "RETURN a.url, b.url",
    )
    assert {tuple(r) for r in by_where_join.collect()} == {("a", "a")}


def test_syntax_errors(g):
    for bad in (
        "MATCH (l:Link) RETURN l.url EXTRA",
        "MATCH (l:Link)-[:NO_SUCH]->(c:Category) RETURN l.url",
        "MATCH (l:Link {url: $missing}) RETURN l.url",
        "MATCH (c:Category) RETURN c.title",
        "FOO (l:Link)",
    ):
        with pytest.raises(CypherSyntaxError):
            cypher(g, bad, {})


def test_write_surface_reference_sequence(spark, store):
    """main.py:28-34 pasted shape-for-shape: MERGE nodes, MERGE rels,
    then main.py:490's DETACH DELETE — against the GraphStore."""
    cypher_write(
        store,
        "MERGE (:Link {url: 'https://kuzudb.com', title: 'K', raw_category: 'Database', "
        "suggested_category: 'Database', raw_content: 'g', cleaned_content: 'g', "
        "keywords: 'graph database', category_explanation: 'None', "
        "keyword_explanation: 'None'})",
    )
    cypher_write(store, "MERGE (:Category {name: 'Database'})")
    cypher_write(store, "MERGE (:Keyword {name: 'graph database'})")
    cypher_write(
        store,
        "MATCH (l:Link {url: 'https://kuzudb.com'}), (c:Category {name: 'Database'}) "
        "MERGE (l)-[:BELONGS_TO]->(c)",
    )
    cypher_write(
        store,
        "MATCH (l:Link {url: $url}), (k:Keyword {name: $name}) "
        "MERGE (l)-[:HAS_KEYWORD]->(k)",
        {"url": "https://kuzudb.com", "name": "graph database"},
    )
    g2 = store.graph()
    assert g2.links.count() == 1
    assert g2.belongs_to.count() == 1 and g2.has_keyword.count() == 1
    # read it back through the same front end
    rows = cypher(
        g2,
        "MATCH (l:Link)-[:BELONGS_TO]->(c:Category) RETURN l.url, c.name",
    ).collect()
    assert [tuple(r) for r in rows] == [("https://kuzudb.com", "Database")]

    cypher_write(
        store,
        "MATCH (l:Link {url: $url}) DETACH DELETE l",
        {"url": "https://kuzudb.com"},
    )
    g3 = store.graph()
    assert g3.links.count() == 0
    assert g3.belongs_to.count() == 0 and g3.has_keyword.count() == 0


def test_write_merge_is_insert_if_absent(spark, store):
    cypher_write(store, "MERGE (:Category {name: 'A'})")
    cypher_write(store, "MERGE (:Category {name: 'A'})")
    assert store.graph().categories.count() == 1


def _notebook_populate_rows():
    # two rows shaped like links_with_metadata.csv (Edits.ipynb c10),
    # incl. an escaped quote and a two-keyword list
    return [
        {
            "url": "https://kuzudb.com",
            "category": "Database",
            "title": "Kuzu \\'embedded\\' DB",
            "keyword": "graph database, cypher",
            "category_explanation": "it is a database",
            "keyword_explanation": "mentions graphs",
        },
        {
            "url": "https://spark.apache.org",
            "category": "Analytics",
            "title": "Apache Spark",
            "keyword": "distributed compute",
            "category_explanation": "analytics engine",
            "keyword_explanation": "mentions compute",
        },
    ]


def _table_snapshot(store):
    g = store.graph()
    return {
        "links": sorted(tuple(r) for r in g.links.collect()),
        "categories": sorted(tuple(r) for r in g.categories.collect()),
        "keywords": sorted(tuple(r) for r in g.keywords.collect()),
        "belongs_to": sorted(tuple(r) for r in g.belongs_to.collect()),
        "has_keyword": sorted(tuple(r) for r in g.has_keyword.collect()),
    }


def test_write_notebook_populate_verbatim(spark, store, tmp_path):
    """r9 verdict item 2 (M2 front end): the notebook's c10 populate
    loop — MERGE Category/Keyword, MERGE+SET Link (the f-string shape
    with escaped quotes, c10:69-76), MATCH+MERGE edges — replayed
    VERBATIM through cypher_write produces a graph identical to the
    GraphStore API path."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    rows = _notebook_populate_rows()

    # --- the cypher_write path, statement strings as c10 emits them ---
    for row in rows:
        cypher_write(
            store, f"MERGE (c:Category {{name: '{row['category']}'}})"
        )
        for kw in row["keyword"].split(","):
            kw = kw.strip()
            cypher_write(store, f"MERGE (k:Keyword {{name: '{kw}'}})")
    for row in rows:
        cypher_write(
            store,
            f"""
            MERGE (l:Link {{url: '{row['url']}'}})
            SET l.category = '{row['category']}',
                l.title = '{row['title']}',
                l.keyword = '{row['keyword']}',
                l.category_explanation = '{row['category_explanation']}',
                l.keyword_explanation = '{row['keyword_explanation']}'
        """,
        )
        cypher_write(
            store,
            f"""
                MATCH (l:Link {{url: '{row['url']}'}}), (c:Category {{name: '{row['category']}'}})
                MERGE (l)-[:BELONGS_TO]->(c)
            """,
        )
        for kw in row["keyword"].split(","):
            kw = kw.strip()
            cypher_write(
                store,
                f"""
                    MATCH (l:Link {{url: '{row['url']}'}}), (k:Keyword {{name: '{kw}'}})
                    MERGE (l)-[:HAS_KEYWORD]->(k)
                """,
            )

    # --- the GraphStore API path, same mapping ---
    api = GraphStore(spark, str(tmp_path / "api_wh"))
    api.init_schema()
    for row in rows:
        api.merge_names(
            "categories", spark.createDataFrame([(row["category"],)], ["name"])
        )
        kws = [k.strip() for k in row["keyword"].split(",")]
        api.merge_names(
            "keywords", spark.createDataFrame([(k,) for k in kws], ["name"])
        )
    for row in rows:
        unesc = {k: v.replace("\\'", "'") for k, v in row.items()}
        df = spark.createDataFrame(
            [
                (
                    unesc["url"],
                    unesc["title"],
                    unesc["category"],
                    unesc["category"],
                    None,
                    None,
                    unesc["keyword"],
                    unesc["category_explanation"],
                    unesc["keyword_explanation"],
                )
            ],
            "url string, title string, raw_category string,"
            "suggested_category string, raw_content string,"
            "cleaned_content string, keywords string,"
            "category_explanation string, keyword_explanation string",
        )
        api.merge_set_links(
            df,
            (
                "raw_category",
                "suggested_category",
                "title",
                "keywords",
                "category_explanation",
                "keyword_explanation",
            ),
        )
        api.merge_edges(
            "belongs_to",
            spark.createDataFrame(
                [(unesc["url"], unesc["category"])], ["src_url", "dst_category"]
            ),
        )
        api.merge_edges(
            "has_keyword",
            spark.createDataFrame(
                [(unesc["url"], k.strip()) for k in unesc["keyword"].split(",")],
                ["src_url", "dst_keyword"],
            ),
        )

    assert _table_snapshot(store) == _table_snapshot(api)
    # the escaped quote round-tripped
    titles = {r.url: r.title for r in store.graph().links.collect()}
    assert titles["https://kuzudb.com"] == "Kuzu 'embedded' DB"


def test_write_merge_set_is_per_property(spark, store):
    """SET assigns ONLY the listed properties: an app-enriched row's
    raw_content survives a notebook-style MERGE+SET replay (whole-row
    replacement would NULL it)."""
    cypher_write(
        store,
        "MERGE (:Link {url: 'u1', title: 'old', raw_content: 'fetched body', "
        "cleaned_content: 'clean body'})",
    )
    cypher_write(
        store,
        "MERGE (l:Link {url: 'u1'}) SET l.title = 'new', l.category = 'Cat'",
    )
    row = store.graph().links.filter(F.col("url") == "u1").first()
    assert row.title == "new"
    assert row.raw_content == "fetched body"  # untouched by SET
    assert row.cleaned_content == "clean body"
    # the notebook alias fans out to both store columns (preload parity)
    assert row.raw_category == "Cat" and row.suggested_category == "Cat"
    # fresh-node MERGE+SET: unlisted props are NULL, map props kept
    cypher_write(
        store, "MERGE (l:Link {url: 'u2', title: 'kept'}) SET l.category = 'C2'"
    )
    row2 = store.graph().links.filter(F.col("url") == "u2").first()
    assert row2.title == "kept" and row2.raw_content is None
    assert row2.suggested_category == "C2"


def test_write_merge_pk_match_divergence_pinned(spark, store):
    """r10 verdict item 6: the two documented divergences from full
    Cypher MERGE semantics, pinned so they cannot drift silently.

    (1) MERGE matches on the PRIMARY KEY alone: a url-match whose map
    carries a DIFFERING title is an existing-row match (real Cypher
    would attempt a create and hit the uniqueness constraint) — the
    stored row wins untouched when there is no SET.
    (2) With SET, a non-SET map property fills a NULL stored value
    (coalesce: the map is better knowledge than NULL) but never
    overrides a non-NULL one."""
    cypher_write(store, "MERGE (:Link {url: 'pk1', title: 'stored'})")
    # (1) differing non-key property, no SET: existing row untouched,
    # no error, no second row
    cypher_write(store, "MERGE (:Link {url: 'pk1', title: 'different'})")
    rows = store.graph().links.filter(F.col("url") == "pk1").collect()
    assert len(rows) == 1 and rows[0].title == "stored"

    # (2) SET path: stored title is NULL -> the map fills it; stored
    # cleaned_content is non-NULL -> the map must NOT override it
    cypher_write(
        store, "MERGE (:Link {url: 'pk2', cleaned_content: 'kept clean'})"
    )
    cypher_write(
        store,
        "MERGE (l:Link {url: 'pk2', title: 'fills-null', "
        "cleaned_content: 'must-not-win'}) SET l.category = 'C'",
    )
    row = store.graph().links.filter(F.col("url") == "pk2").first()
    assert row.title == "fills-null"  # NULL stored value filled
    assert row.cleaned_content == "kept clean"  # non-NULL stored wins
    assert row.raw_category == "C"


def test_write_merge_set_unlabeled_infers_link(spark, store):
    """The bare `MERGE (l {url:…}) SET …` form infers :Link from the
    url key — the free-endpoint shortestPath discipline."""
    cypher_write(store, "MERGE (l {url: 'u3'}) SET l.title = 't3'")
    row = store.graph().links.filter(F.col("url") == "u3").first()
    assert row.title == "t3"


def test_write_merge_set_refusals(store):
    # SET variable must be the MERGE binding
    with pytest.raises(CypherSyntaxError):
        cypher_write(store, "MERGE (l:Link {url: 'u'}) SET x.title = 't'")
    # SET on Category/Keyword would rekey the primary key
    with pytest.raises(CypherSyntaxError):
        cypher_write(store, "MERGE (c:Category {name: 'n'}) SET c.name = 'm'")
    # unknown property (neither schema column nor notebook alias)
    with pytest.raises(CypherSyntaxError):
        cypher_write(store, "MERGE (l:Link {url: 'u'}) SET l.nope = 'v'")
    # unlabeled MERGE with a name key is ambiguous
    with pytest.raises(CypherSyntaxError):
        cypher_write(store, "MERGE (n {name: 'x'}) SET n.name = 'y'")
    # malformed assignment
    with pytest.raises(CypherSyntaxError):
        cypher_write(store, "MERGE (l:Link {url: 'u'}) SET l.title")


def test_registry_row_equivalence_distinct_categories(g):
    """The Cypher-routed registry row ≡ the hand-written query layer."""
    via_cypher = {
        r.category
        for r in cypher(
            g,
            "MATCH (l:Link)-[:BELONGS_TO]->(c:Category) "
            "RETURN DISTINCT c.name AS category",
        ).collect()
    }
    direct = {r.category for r in Q.distinct_categories(g).collect()}
    assert via_cypher == direct == {"X", "Y"}


def test_write_orphan_cleanup_notebook_verbatim(spark, store):
    """Edits.ipynb c12's orphan DELETEs pasted unchanged: categories and
    keywords with no incoming edge are removed, referenced ones stay."""
    cypher_write(store, "MERGE (:Category {name: 'used'})")
    cypher_write(store, "MERGE (:Category {name: 'orphan'})")
    cypher_write(store, "MERGE (:Keyword {name: 'kw_used'})")
    cypher_write(store, "MERGE (:Keyword {name: 'kw_orphan'})")
    cypher_write(
        store,
        "MERGE (:Link {url: 'https://a.example', title: 't', raw_category: 'r', "
        "suggested_category: 'used', raw_content: 'c', cleaned_content: 'c', "
        "keywords: 'kw_used', category_explanation: 'None', "
        "keyword_explanation: 'None'})",
    )
    cypher_write(
        store,
        "MATCH (l:Link {url: 'https://a.example'}), (c:Category {name: 'used'}) "
        "MERGE (l)-[:BELONGS_TO]->(c)",
    )
    cypher_write(
        store,
        "MATCH (l:Link {url: 'https://a.example'}), (k:Keyword {name: 'kw_used'}) "
        "MERGE (l)-[:HAS_KEYWORD]->(k)",
    )
    cypher_write(store, "MATCH (c:Category) WHERE NOT (c)<-[:BELONGS_TO]-() DELETE c")
    g2 = store.graph()
    assert {r.name for r in g2.categories.collect()} == {"used"}
    # keywords untouched by the category statement
    assert {r.name for r in g2.keywords.collect()} == {"kw_used", "kw_orphan"}
    cypher_write(store, "MATCH (k:Keyword) WHERE NOT (k)<-[:HAS_KEYWORD]-() DELETE k")
    assert {r.name for r in store.graph().keywords.collect()} == {"kw_used"}


def test_write_orphan_cleanup_rejects_wrong_rel(store):
    with pytest.raises(CypherSyntaxError):
        cypher_write(
            store, "MATCH (c:Category) WHERE NOT (c)<-[:HAS_KEYWORD]-() DELETE c"
        )


# --- OPTIONAL MATCH (left-join semantics) ----------------------------


def test_optional_match_keeps_unmatched_rows_with_nulls(g):
    """Keywords without a matching link under the optional WHERE keep
    their row with null link columns — the WHERE is scoped to the
    optional part, never dropping mandatory rows."""
    out = cypher(
        g,
        "MATCH (k:Keyword) "
        "OPTIONAL MATCH (l:Link)-[:HAS_KEYWORD]->(k) WHERE l.url = $u "
        "RETURN k.name AS kw, l AS link",
        {"u": "a"},
    )
    got = {(r.kw, r.link) for r in out.collect()}
    # only link a carries k1; k2 has no matching link under the filter
    assert got == {("k1", "a"), ("k2", None)}


def test_optional_match_count_includes_zero_groups(g):
    """The canonical OPTIONAL MATCH use: per-category link counts where
    empty categories report 0 (COUNT(var) skips nulls)."""
    # give the graph an empty category to make the zero visible
    import pyspark.sql.functions as F

    from webpagesgraphdatabase_spark.graph.model import PropertyGraph

    g2 = PropertyGraph(
        g.links,
        g.categories.unionByName(
            g.categories.sparkSession.createDataFrame([("EMPTY",)], ["name"])
        ),
        g.keywords,
        g.belongs_to,
        g.has_keyword,
    )
    out = cypher(
        g2,
        "MATCH (c:Category) "
        "OPTIONAL MATCH (c)<-[:BELONGS_TO]-(l:Link) "
        "RETURN c.name AS category, COUNT(l) AS n "
        "ORDER BY category",
    )
    got = [(r.category, r.n) for r in out.collect()]
    assert got == [("EMPTY", 0), ("X", 1), ("Y", 2)]


def test_optional_match_requires_shared_variable(g):
    with pytest.raises(CypherSyntaxError, match="share"):
        cypher(
            g,
            "MATCH (c:Category) OPTIONAL MATCH (k:Keyword) "
            "RETURN c.name, k.name",
        )


def test_optional_match_chained_clauses(g):
    """Two optional clauses accrete: category -> optional link ->
    optional keyword of that link."""
    out = cypher(
        g,
        "MATCH (c:Category {name: $c}) "
        "OPTIONAL MATCH (c)<-[:BELONGS_TO]-(l:Link) WHERE l.title = $t "
        "OPTIONAL MATCH (l)-[:HAS_KEYWORD]->(k:Keyword) "
        "RETURN c.name AS category, l AS link, k AS kw",
        {"c": "Y", "t": "tb"},
    )
    got = {(r.category, r.link, r.kw) for r in out.collect()}
    assert got == {("Y", "b", "k1")}
    # and with a title matching nothing, the category row survives alone
    out2 = cypher(
        g,
        "MATCH (c:Category {name: $c}) "
        "OPTIONAL MATCH (c)<-[:BELONGS_TO]-(l:Link) WHERE l.title = $t "
        "OPTIONAL MATCH (l)-[:HAS_KEYWORD]->(k:Keyword) "
        "RETURN c.name AS category, l AS link, k AS kw",
        {"c": "Y", "t": "no-such-title"},
    )
    assert {(r.category, r.link, r.kw) for r in out2.collect()} == {
        ("Y", None, None)
    }


# --- undirected relationships ----------------------------------------


def test_undirected_hop_matches_regardless_of_written_order(g):
    """-[:REL]- orients itself from the schema: both writings return
    the same rows as the directed form."""
    want = {
        (r["l.url"], r["c.name"])
        for r in cypher(
            g, "MATCH (l:Link)-[:BELONGS_TO]->(c:Category) RETURN l.url, c.name"
        ).collect()
    }
    a = {
        (r["l.url"], r["c.name"])
        for r in cypher(
            g, "MATCH (l:Link)-[:BELONGS_TO]-(c:Category) RETURN l.url, c.name"
        ).collect()
    }
    b = {
        (r["l.url"], r["c.name"])
        for r in cypher(
            g, "MATCH (c:Category)-[:BELONGS_TO]-(l:Link) RETURN l.url, c.name"
        ).collect()
    }
    assert a == want and b == want and want


def test_undirected_hop_orients_from_one_labeled_endpoint(g):
    out = cypher(
        g,
        "MATCH (k:Keyword {name: $k})-[:HAS_KEYWORD]-(l) RETURN l AS url",
        {"k": "k2"},
    )
    assert {r.url for r in out.collect()} == {"c"}


def test_undirected_hop_between_unlabeled_vars_is_rejected(g):
    with pytest.raises(CypherSyntaxError, match="labeled endpoint"):
        cypher(g, "MATCH (a)-[:HAS_KEYWORD]-(b) RETURN a, b")


# -- variable-length paths (r6 verdict item 7) -----------------------------


def test_varlen_reach_full_graph(g):
    """MATCH (n:Link)-[*1..2]-(m) RETURN n.url, COUNT(DISTINCT m):
    radius-2 reach over the Link<->Keyword graph, hand-checked. a and b
    reach {k1, the other, c}; c reaches {k1, k2, a, b}."""
    df = cypher(
        g,
        "MATCH (n:Link)-[*1..2]-(m) RETURN n.url AS url, "
        "COUNT(DISTINCT m) AS reach ORDER BY url",
    )
    assert df.columns == ["url", "reach"]
    assert [tuple(r) for r in df.collect()] == [("a", 3), ("b", 3), ("c", 4)]


def test_varlen_reach_matches_bounded_reach_api(g):
    """The compiled statement must agree with algorithms.bounded_reach
    row-for-row (the Done criterion)."""
    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach

    got = {
        (r["n.url"], r["COUNT(DISTINCT m)"])
        for r in cypher(
            g, "MATCH (n:Link)-[*1..3]-(m) RETURN n.url, COUNT(DISTINCT m)"
        ).collect()
    }
    want = {
        (r.node_id.removeprefix("Link:"), r.n_reach_3)
        for r in bounded_reach(g, max_hops=3).collect()
        if r.node_id.startswith("Link:")
    }
    assert got == want and got


def test_varlen_reach_seeded_point_query(g):
    """An inline key binding (or WHERE equality) seeds the expansion:
    only the anchor's row comes back, identical to the full run's."""
    df = cypher(
        g,
        "MATCH (n:Link {url: $u})-[*1..2]-(m) "
        "RETURN n.url, COUNT(DISTINCT m)",
        {"u": "c"},
    )
    assert [tuple(r) for r in df.collect()] == [("c", 4)]
    df2 = cypher(
        g,
        "MATCH (n:Link)-[*1..2]-(m) WHERE n.url = 'a' "
        "RETURN n.url AS u, COUNT(DISTINCT m) AS c",
    )
    assert [tuple(r) for r in df2.collect()] == [("a", 3)]


def test_varlen_reach_conjunctive_bindings_intersect(g):
    """An inline property map AND a WHERE equality are conjunctive
    (Cypher AND = intersection): two different bound values intersect
    to the empty seed set — zero rows, never the union of both seeds
    (the r7 ADVICE defect). Two bindings of the SAME value behave as
    one."""
    df = cypher(
        g,
        "MATCH (n:Link {url: 'a'})-[*1..2]-(m) WHERE n.url = 'c' "
        "RETURN n.url, COUNT(DISTINCT m)",
    )
    assert df.collect() == []
    df2 = cypher(
        g,
        "MATCH (n:Link {url: 'c'})-[*1..2]-(m) WHERE n.url = 'c' "
        "RETURN n.url, COUNT(DISTINCT m)",
    )
    assert [tuple(r) for r in df2.collect()] == [("c", 4)]


def test_varlen_reach_keyword_anchor(g):
    """Keyword-side anchors work symmetrically: k1 touches all three
    links at radius 1."""
    df = cypher(
        g,
        "MATCH (n:Keyword {name: 'k1'})-[*1..1]-(m) "
        "RETURN n.name, COUNT(DISTINCT m)",
    )
    assert [tuple(r) for r in df.collect()] == [("k1", 3)]


def test_varlen_unsupported_shapes_raise(g):
    """Unbounded *, non-1 lower bounds, direction/label-inconsistent
    anchors, and constrained targets all refuse with
    CypherSyntaxError. (Directed arrows and BELONGS_TO labels became
    SUPPORTED in r8 — see the directed tests below.)"""
    bad = [
        "MATCH (n:Link)-[*]-(m) RETURN n.url, COUNT(DISTINCT m)",
        "MATCH (n:Link)-[*1..]-(m) RETURN n.url, COUNT(DISTINCT m)",
        "MATCH (n:Link)-[*2..3]-(m) RETURN n.url, COUNT(DISTINCT m)",
        # a Keyword has no outgoing HAS_KEYWORD arrows; a Link no
        # incoming ones — vacuous statements refuse, never empty-return
        "MATCH (n:Keyword)-[*1..2]->(m) RETURN n.name, COUNT(DISTINCT m)",
        "MATCH (n:Link)<-[*1..2]-(m) RETURN n.url, COUNT(DISTINCT m)",
        "MATCH (n:Keyword)-[:BELONGS_TO*1..2]-(m) RETURN n.name, COUNT(DISTINCT m)",
        "MATCH (n:Link)-[*1..2]-(m:Keyword) RETURN n.url, COUNT(DISTINCT m)",
        "MATCH (n:Link)-[*1..2]-(m) RETURN n.url, COUNT(m)",
        "MATCH (n:Link)-[*1..2]-(m) RETURN n.url",
        "MATCH (n:Link)-[*1..2]-(m), (x:Link) RETURN n.url, COUNT(DISTINCT m)",
    ]
    for q in bad:
        with pytest.raises(CypherSyntaxError):
            cypher(g, q)


def test_varlen_directed_matches_bounded_reach_edge_frame(g):
    """-[:HAS_KEYWORD*1..2]-> expands along the arrows only (r7
    verdict item 8): ≡ bounded_reach over the forward typed edge frame,
    row-for-row (the Done criterion)."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach

    got = {
        tuple(r)
        for r in cypher(
            g,
            "MATCH (n:Link)-[:HAS_KEYWORD*1..2]->(m) "
            "RETURN n.url AS u, COUNT(DISTINCT m) AS c",
        ).collect()
    }
    fwd = g.has_keyword.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Keyword:"), F.col("dst_keyword")).alias("dst"),
    )
    want = {
        (r.node_id.removeprefix("Link:"), r.n_reach_2)
        for r in bounded_reach(g, max_hops=2, edges=fwd).collect()
        if r.node_id.startswith("Link:")
    }
    assert got == want and got
    # on this bipartite schema a directed radius-2 equals radius 1
    # (Keywords have no outgoing arrows) — the semantics, not a bug
    r1 = {
        tuple(r)
        for r in cypher(
            g,
            "MATCH (n:Link)-[:HAS_KEYWORD*1..1]->(m) "
            "RETURN n.url AS u, COUNT(DISTINCT m) AS c",
        ).collect()
    }
    assert got == r1


def test_varlen_directed_backward_and_belongs_to(g):
    """<-[:HAS_KEYWORD*1..1]- anchored at a Keyword counts its links;
    the BELONGS_TO label traverses the Link<->Category side."""
    df = cypher(
        g,
        "MATCH (n:Keyword {name: 'k1'})<-[*1..1]-(m) "
        "RETURN n.name AS k, COUNT(DISTINCT m) AS c",
    )
    assert [tuple(r) for r in df.collect()] == [("k1", 3)]
    df2 = cypher(
        g,
        "MATCH (n:Link)-[:BELONGS_TO*1..1]->(m) "
        "RETURN n.url AS u, COUNT(DISTINCT m) AS c ORDER BY u",
    )
    rows = [tuple(r) for r in df2.collect()]
    assert rows and all(c == 1 for _, c in rows)


def test_where_string_predicates(g):
    """openCypher string predicates (r7): CONTAINS / STARTS WITH /
    ENDS WITH compile to codegen string ops; null properties drop
    (three-valued logic, like the other comparisons)."""
    got = {
        r[0]
        for r in cypher(
            g, "MATCH (l:Link) WHERE l.url CONTAINS 'a' RETURN l.url"
        ).collect()
    }
    assert "a" in got and all("a" in u for u in got)
    starts = {
        r[0]
        for r in cypher(
            g, "MATCH (l:Link) WHERE l.title STARTS WITH 't' RETURN l.url"
        ).collect()
    }
    assert starts == {"a", "b"}  # the null-title link drops
    ends = {
        r[0]
        for r in cypher(
            g, "MATCH (l:Link) WHERE l.title ENDS WITH 'b' RETURN l.url"
        ).collect()
    }
    assert ends == {"b"}
    import pytest as _pytest

    from webpagesgraphdatabase_spark.graph.cypher import CypherSyntaxError

    with _pytest.raises(CypherSyntaxError):
        cypher(g, "MATCH (l:Link) WHERE l.title STARTS 'x' RETURN l.url")


def test_where_boolean_or_not_parens(g):
    """openCypher boolean WHERE (r7): OR / NOT / parentheses with AND
    binding tighter than OR; an equality under OR does NOT count as an
    anchor binding for the unbound-anchor guard."""
    rows = {
        r[0]
        for r in cypher(
            g, "MATCH (l:Link) WHERE l.url = 'a' OR l.url = 'b' RETURN l.url"
        ).collect()
    }
    assert rows == {"a", "b"}
    rows = {
        r[0]
        for r in cypher(
            g, "MATCH (l:Link) WHERE NOT l.url = 'a' RETURN l.url"
        ).collect()
    }
    assert "a" not in rows and rows
    # precedence: x OR (y AND z) vs the explicit parens form
    q1 = "MATCH (l:Link) WHERE l.url = 'a' OR l.url = 'b' AND l.title = 'tb' RETURN l.url"
    q2 = "MATCH (l:Link) WHERE l.url = 'a' OR (l.url = 'b' AND l.title = 'tb') RETURN l.url"
    assert {r[0] for r in cypher(g, q1).collect()} == {
        r[0] for r in cypher(g, q2).collect()
    } == {"a", "b"}
    # (a AND b) OR c groups differently from a AND (b OR c)
    q3 = "MATCH (l:Link) WHERE (l.url = 'a' AND l.title = 'tb') OR l.url = 'b' RETURN l.url"
    assert {r[0] for r in cypher(g, q3).collect()} == {"b"}
    # null propagation: NOT (title = 'x') drops null-title rows
    q4 = "MATCH (l:Link) WHERE NOT l.title = 'tb' RETURN l.url"
    got = {r[0] for r in cypher(g, q4).collect()}
    assert got == {"a"}  # the null-title link drops under 3VL


def test_shortest_path_statement(g):
    """MATCH p = shortestPath(...) RETURN length(p): hop counts over
    the bipartite graph — Link a and Link b share keyword k1 (2 hops),
    a to its own keyword is 1 hop, a to an unreachable-within-cap pair
    returns zero rows (Cypher no-match), and the hop cap binds."""
    rows = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-"
        "(m:Link {url: 'b'})) RETURN length(p)",
    ).collect()
    assert [r["length(p)"] for r in rows] == [2]
    rows = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[:HAS_KEYWORD*1..4]-"
        "(m:Keyword {name: 'k1'})) RETURN length(p) AS d",
    ).collect()
    assert [r["d"] for r in rows] == [1]
    # a -k1- {b, c} -k2- : distance a->k2 is 3; a 2-hop cap finds nothing
    assert (
        cypher(
            g,
            "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..2]-"
            "(m:Keyword {name: 'k2'})) RETURN length(p)",
        ).count()
        == 0
    )
    rows = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-"
        "(m:Keyword {name: 'k2'})) RETURN length(p) AS d",
    ).collect()
    assert [r["d"] for r in rows] == [3]


def test_shortest_path_free_endpoint(g):
    """One bound end, one free: distances from the seed to EVERY node
    of the free endpoint's label — 'how far is X from everything'. The
    label is explicit or inferred from the projected key property
    (url → Link, name → the rel's non-Link endpoint); the seed itself
    is excluded ([*1..h] paths have ≥1 hop); either pattern position
    may hold the bound end; compiled onto bfs_distances_from_edges."""
    from webpagesgraphdatabase_spark.graph import algorithms as A

    q = (
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-(m)) "
        "RETURN m.url AS u, length(p) AS d"
    )
    df = cypher(g, q)
    assert df.columns == ["u", "d"]
    got = {(r.u, r.d) for r in df.collect()}
    assert got == {("b", 2), ("c", 2)}
    # ≡ the BFS API on the same bipartite edge set
    fwd = g.has_keyword.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Keyword:"), F.col("dst_keyword")).alias("dst"),
    )
    seed = g.links.sparkSession.createDataFrame([("Link:a",)], ["node_id"])
    want = {
        (r.node_id[len("Link:"):], r.dist)
        for r in A.bfs_distances_from_edges(fwd, seed, max_hops=4).collect()
        if r.node_id.startswith("Link:") and r.node_id != "Link:a"
    }
    assert got == want
    # name → the rel's non-Link endpoint (Keyword for HAS_KEYWORD)
    got_k = {
        (r[0], r[1])
        for r in cypher(
            g,
            "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-(m)) "
            "RETURN m.name, length(p)",
        ).collect()
    }
    assert got_k == {("k1", 1), ("k2", 3)}
    # explicit label agrees; default output names are Kùzu-style
    df2 = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-(m:Keyword)) "
        "RETURN m.name, length(p)",
    )
    assert df2.columns == ["m.name", "length(p)"]
    assert {tuple(r) for r in df2.collect()} == got_k
    # the bound end may sit in either pattern position
    got_rev = {
        (r[0], r[1])
        for r in cypher(
            g,
            "MATCH p = shortestPath((m)-[*1..4]-(n:Link {url: 'a'})) "
            "RETURN m.url, length(p)",
        ).collect()
    }
    assert got_rev == {("b", 2), ("c", 2)}
    # BELONGS_TO: categories within reach of Link a
    got_c = {
        (r[0], r[1])
        for r in cypher(
            g,
            "MATCH p = shortestPath((n:Link {url: 'a'})-[:BELONGS_TO*1..3]-(m)) "
            "RETURN m.name, length(p)",
        ).collect()
    }
    assert got_c == {("X", 1)}
    # hop cap binds: only the 1-hop keyword survives *1..1
    got_cap = {
        (r[0], r[1])
        for r in cypher(
            g,
            "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..1]-(m)) "
            "RETURN m.name, length(p)",
        ).collect()
    }
    assert got_cap == {("k1", 1)}
    # the reference's query style: bound end carries no label, just the
    # key property (url → Link inferred); param substitution works
    got_bare = {
        (r[0], r[1])
        for r in cypher(
            g,
            "MATCH p = shortestPath((n {url: $u})-[*1..4]-(m)) "
            "RETURN m.url, length(p)",
            {"u": "a"},
        ).collect()
    }
    assert got_bare == {("b", 2), ("c", 2)}
    # both-bound with bare key properties also infers
    rows = cypher(
        g,
        "MATCH p = shortestPath((n {url: 'a'})-[*1..4]-(m {name: 'k2'})) "
        "RETURN length(p) AS d",
    ).collect()
    assert [r["d"] for r in rows] == [3]
    # nearest-first: ORDER BY length(p) [+ tie key] and LIMIT compose
    ordered = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-(m)) "
        "RETURN m.name AS kw, length(p) AS d ORDER BY d ASC, kw ASC LIMIT 1",
    ).collect()
    assert [(r.kw, r.d) for r in ordered] == [("k1", 1)]
    # ...by the original spellings too (length(p) / m.name)
    ordered2 = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-(m)) "
        "RETURN m.name, length(p) ORDER BY length(p) DESC, m.name LIMIT 1",
    ).collect()
    assert [tuple(r) for r in ordered2] == [("k2", 3)]
    # unknown ORDER BY key refuses
    with pytest.raises(CypherSyntaxError):
        cypher(
            g,
            "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..4]-(m)) "
            "RETURN m.name, length(p) ORDER BY m.title",
        )


def test_shortest_path_free_endpoint_refusals(g):
    """Both ends free, label/property mismatches, and a missing
    length(p) projection refuse with CypherSyntaxError."""
    bad = [
        # both endpoints free
        "MATCH p = shortestPath((n)-[*1..3]-(m)) RETURN m.name, length(p)",
        # free endpoint's label is not an endpoint of the rel
        "MATCH p = shortestPath((n:Link {url: 'a'})-[:HAS_KEYWORD*1..3]-"
        "(m:Category)) RETURN m.name, length(p)",
        # projected property is not the free endpoint's key
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..3]-(m:Keyword)) "
        "RETURN m.title, length(p)",
        # un-inferable property on an unlabelled free end
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..3]-(m)) "
        "RETURN m.title, length(p)",
        # missing length(p)
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..3]-(m)) "
        "RETURN m.url",
        # identical bound endpoints: a [*1..h] path has >=1 hop, and a
        # distance table cannot answer the same-node cycle question —
        # refusing beats silently returning the impossible length 0
        # (for existing AND nonexistent nodes alike)
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..3]-"
        "(m:Link {url: 'a'})) RETURN length(p)",
        "MATCH p = shortestPath((n {url: 'nosuch'})-[*1..3]-"
        "(m {url: 'nosuch'})) RETURN length(p)",
        # fractional LIMIT is a statement error, not a ValueError
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..3]-(m)) "
        "RETURN m.name, length(p) LIMIT 3.5",
    ]
    for q in bad:
        with pytest.raises(CypherSyntaxError):
            cypher(g, q)
    # two DIFFERENT nonexistent endpoints still no-match cleanly
    assert (
        cypher(
            g,
            "MATCH p = shortestPath((n {url: 'nosuch1'})-[*1..3]-"
            "(m {url: 'nosuch2'})) RETURN length(p)",
        ).count()
        == 0
    )


def test_shortest_path_refusals(g):
    """Unbound endpoints, missing var-length spec, and mismatched path
    variables refuse with CypherSyntaxError."""
    bad = [
        # free target but RETURN projects only length(p)
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..3]-(m)) "
        "RETURN length(p)",
        # single hop (no var-length)
        "MATCH p = shortestPath((n:Link {url: 'a'})-[:HAS_KEYWORD]-"
        "(m:Keyword {name: 'k1'})) RETURN length(p)",
        # wrong path var in RETURN
        "MATCH p = shortestPath((n:Link {url: 'a'})-[*1..3]-"
        "(m:Keyword {name: 'k1'})) RETURN length(q)",
    ]
    for q in bad:
        with pytest.raises(CypherSyntaxError):
            cypher(g, q)


def test_shortest_path_directed_bound(g):
    """r9 verdict item 3: directed shortestPath arrows compile (both
    orientations) and agree with bfs_distances_from_edges(directed=
    True). Arrows in this schema always point Link → Category/Keyword,
    so direction is observable: the with-the-arrows query finds the
    path, the against-the-arrows query finds none."""
    from webpagesgraphdatabase_spark.graph.algorithms import (
        bfs_distances_from_edges,
    )

    rows = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[:HAS_KEYWORD*1..3]->"
        "(m:Keyword {name: 'k1'})) RETURN length(p) AS d",
    ).collect()
    assert [r.d for r in rows] == [1]

    # ≡ the BFS API, directed, on the same prefixed edge frame
    edges = g.has_keyword.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Keyword:"), F.col("dst_keyword")).alias("dst"),
    )
    seeds = g.links.sparkSession.createDataFrame(
        [("Link:a",)], "node_id string"
    )
    api = {
        r.node_id: r.dist
        for r in bfs_distances_from_edges(
            edges, seeds, max_hops=3, directed=True
        ).collect()
    }
    assert api.get("Keyword:k1") == 1

    # against the arrows: no directed path Keyword → Link exists
    none = cypher(
        g,
        "MATCH p = shortestPath((n:Keyword {name: 'k1'})-"
        "[:HAS_KEYWORD*1..3]->(m:Link {url: 'a'})) RETURN length(p)",
    ).collect()
    assert none == []

    # the backward arrow is the same path written from the other end
    back = cypher(
        g,
        "MATCH p = shortestPath((n:Keyword {name: 'k1'})<-"
        "[:HAS_KEYWORD*1..3]-(m:Link {url: 'a'})) RETURN length(p) AS d",
    ).collect()
    assert [r.d for r in back] == [1]


def test_shortest_path_directed_free_endpoint(g):
    """Directed free-endpoint form: distances respect arrow direction
    relative to whichever end is bound."""
    # from Link a along arrows: its keywords, dist 1
    rows = cypher(
        g,
        "MATCH p = shortestPath((n:Link {url: 'a'})-[:HAS_KEYWORD*1..2]->"
        "(m)) RETURN m.name AS kw, length(p) AS d ORDER BY kw",
    ).collect()
    assert [(r.kw, r.d) for r in rows] == [("k1", 1)]

    # free SOURCE, bound target: every link pointing at k1
    rows2 = cypher(
        g,
        "MATCH p = shortestPath((m)-[:HAS_KEYWORD*1..2]->"
        "(n:Keyword {name: 'k1'})) RETURN m.url AS u, length(p) AS d "
        "ORDER BY u",
    ).collect()
    assert [(r.u, r.d) for r in rows2] == [("a", 1), ("b", 1), ("c", 1)]

    # directed away from a keyword: nothing has outgoing arrows there
    rows3 = cypher(
        g,
        "MATCH p = shortestPath((n:Keyword {name: 'k1'})-"
        "[:HAS_KEYWORD*1..2]->(m)) RETURN m.url AS u, length(p) AS d",
    ).collect()
    assert rows3 == []
