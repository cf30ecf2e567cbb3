"""M1-M6 mutation semantics + SURVEY §5 property checks:
upsert idempotency, DETACH-DELETE leaves no dangling edges,
orphan-cleanup fixpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import link_row


def _links_df(spark, *rows):
    return spark.createDataFrame([link_row(**r) if isinstance(r, dict) else link_row(r) for r in rows])


def _names(spark, *names):
    return spark.createDataFrame([(n,) for n in names], ["name"])


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_merge_insert_if_absent_existing_wins(spark, store):
    store.merge_links(_links_df(spark, {"url": "u1", "title": "first"}), update=False)
    store.merge_links(_links_df(spark, {"url": "u1", "title": "second"}), update=False)
    rows = store.graph().links.collect()
    assert len(rows) == 1
    assert rows[0].title == "first"  # M1: MERGE without SET keeps existing


def test_merge_update_new_wins(spark, store):
    store.merge_links(_links_df(spark, {"url": "u1", "title": "first"}))
    store.merge_links(_links_df(spark, {"url": "u1", "title": "second"}))
    rows = store.graph().links.collect()
    assert len(rows) == 1
    assert rows[0].title == "second"  # M2: MERGE+SET replaces


def test_merge_idempotency(spark, store):
    """Property: applying the same MERGE twice == once."""
    df = _links_df(spark, "u1", "u2")
    store.merge_links(df)
    once = sorted(r.url for r in store.graph().links.collect())
    store.merge_links(df)
    twice = sorted(r.url for r in store.graph().links.collect())
    assert once == twice == ["u1", "u2"]


def test_merge_links_null_tolerant_missing_columns(spark, store):
    """Schema-drift fidelity (main.py:412-424 omits explanation props):
    missing columns become NULL, readable with coalesce defaults."""
    partial = spark.createDataFrame([("u1", "t1")], ["url", "title"])
    store.merge_links(partial)
    row = store.graph().links.collect()[0]
    assert row.category_explanation is None
    assert row.title == "t1"


def test_merge_edges_idempotent_and_endpoint_checked(spark, store):
    store.merge_links(_links_df(spark, "u1", "u2"))
    store.merge_names("categories", _names(spark, "CatA"))
    edges = _edges(spark, [("u1", "CatA"), ("u1", "CatA"), ("ghost", "CatA"), ("u2", "NoCat")])
    store.merge_edges("belongs_to", edges)
    store.merge_edges("belongs_to", edges)
    rows = store.graph().belongs_to.collect()
    # dup collapsed, ghost src and unknown dst rejected (MATCH-before-MERGE)
    assert [(r.src_url, r.dst_category) for r in rows] == [("u1", "CatA")]


def test_detach_delete_no_dangling_edges(spark, store):
    store.merge_links(_links_df(spark, "u1", "u2"))
    store.merge_names("categories", _names(spark, "CatA"))
    store.merge_names("keywords", _names(spark, "k1"))
    store.merge_edges("belongs_to", _edges(spark, [("u1", "CatA"), ("u2", "CatA")]))
    store.merge_edges("has_keyword", _edges(spark, [("u1", "k1")]))

    store.detach_delete_link("u1")

    g = store.graph()
    assert [r.url for r in g.links.collect()] == ["u2"]
    assert [r.src_url for r in g.belongs_to.collect()] == ["u2"]
    assert g.has_keyword.count() == 0  # no dangling edges
    # every remaining edge endpoint exists
    dangling = g.belongs_to.join(g.links, g.belongs_to.src_url == g.links.url, "left_anti")
    assert dangling.count() == 0


def test_orphan_cleanup_and_fixpoint(spark, store):
    store.merge_links(_links_df(spark, "u1"))
    store.merge_names("categories", _names(spark, "CatA", "CatOrphan"))
    store.merge_names("keywords", _names(spark, "k1", "kOrphan"))
    store.merge_edges("belongs_to", _edges(spark, [("u1", "CatA")]))
    store.merge_edges("has_keyword", _edges(spark, [("u1", "k1")]))

    deleted = store.cleanup_orphans()
    assert deleted == {"categories": 1, "keywords": 1}
    assert sorted(r.name for r in store.graph().categories.collect()) == ["CatA"]

    # fixpoint: second run deletes nothing
    assert store.cleanup_orphans() == {"categories": 0, "keywords": 0}


def test_reinit_destructive(spark, store):
    store.merge_links(_links_df(spark, "u1"))
    store.reinit()
    assert store.graph().links.count() == 0
    assert sorted(store.wh.list_tables()) == [
        "belongs_to", "categories", "has_keyword", "keywords", "links",
    ]


def test_link_exists_and_filter_new_urls(spark, store):
    store.merge_links(_links_df(spark, "u1"))
    assert store.link_exists("u1")
    assert not store.link_exists("u2")
    cand = spark.createDataFrame([("u1",), ("u2",)], ["url"])
    assert [r.url for r in store.filter_new_urls(cand).collect()] == ["u2"]


def test_pk_uniqueness_invariant_by_construction(spark, store):
    """PK discipline: whatever mix of merges runs, no duplicate keys."""
    store.merge_links(_links_df(spark, "u1", "u2"))
    store.merge_links(_links_df(spark, "u2", "u3"), update=False)
    store.merge_links(_links_df(spark, "u3"))
    dup = store.graph().duplicate_key_report()
    assert dup.count() == 0
