"""Tests for the serving/export layer (S5 snapshot, S6 preload, S9 JSON
export) against a warehouse-backed GraphStore."""

from __future__ import annotations

import glob

import pytest

from webpagesgraphdatabase_spark import serving


@pytest.fixture()
def metadata_df(spark):
    rows = [
        # url (schemeless + trailing slash), title, content, category,
        # keyword, category_explanation, keyword_explanation
        ("site-a.example/x/", "A", "c" * 200, "Database", "alpha, beta", "exp", "kex"),
        ("site-b.example/y", "B", "d" * 200, "Quantum Baking", "alpha", "", ""),
        ("site-b.example/y/", "B-dup", "e" * 200, "News", "gamma", "", ""),  # same url after normalize
        ("", "empty", "f", "News", "g", "", ""),  # dropped: empty url
    ]
    cols = [
        "url",
        "title",
        "content",
        "category",
        "keyword",
        "category_explanation",
        "keyword_explanation",
    ]
    return spark.createDataFrame(rows, cols)


def test_preload_normalizes_dedups_and_inserts(store, metadata_df):
    n = serving.preload_csv(store, metadata_df)
    assert n == 2  # b-dup collapses onto b, empty url dropped
    g = store.graph()
    urls = {r.url for r in g.links.collect()}
    assert urls == {"https://site-a.example/x", "https://site-b.example/y"}
    # category re-parse through the allowlist: 'Database' hits, miss -> Uncategorized
    cats = {r.dst_category for r in g.belongs_to.collect()}
    assert cats == {"Database", "Uncategorized"}
    kws = {(r.src_url, r.dst_keyword) for r in g.has_keyword.collect()}
    assert ("https://site-a.example/x", "alpha") in kws
    assert ("https://site-a.example/x", "beta") in kws


def test_preload_is_idempotent(store, metadata_df):
    assert serving.preload_csv(store, metadata_df) == 2
    assert serving.preload_csv(store, metadata_df) == 0  # second run: all skipped
    assert store.graph().links.count() == 2


def test_preload_batch_size_cap(store, metadata_df):
    n = serving.preload_csv(store, metadata_df.limit(1), batch_size=5)
    assert n == 1


def test_preload_rejects_missing_columns(store, spark):
    bad = spark.createDataFrame([("u",)], ["url"])
    with pytest.raises(ValueError, match="missing required columns"):
        serving.preload_csv(store, bad)


def test_export_graph_json_shape(store, metadata_df):
    serving.preload_csv(store, metadata_df)
    out = serving.export_graph_json(store)
    assert out["duplicate_ids"] == []
    groups = {n["group"] for n in out["nodes"]}
    assert groups == {"Link", "Category", "Keyword"}
    ids = {n["id"] for n in out["nodes"]}
    assert "Link:https://site-a.example/x" in ids
    assert "Category:Database" in ids
    # every edge endpoint resolves to an exported node
    for e in out["edges"]:
        assert e["from"] in ids and e["to"] in ids
    assert out["truncated"] is False
    assert out["node_count"] == len(out["nodes"])
    assert out["edge_count"] == len(out["edges"])


def test_export_graph_json_enforced_cap(store, metadata_df):
    serving.preload_csv(store, metadata_df)
    out = serving.export_graph_json(store, max_nodes=2, max_edges=3)
    assert len(out["nodes"]) == 2 and len(out["edges"]) == 3
    assert out["truncated"] is True
    # counts still reflect the full stored graph, not the capped slice
    assert out["node_count"] > 2 and out["edge_count"] > 3
    # deterministic slice: the 2 alphabetically-first node ids
    full = serving.export_graph_json(store)
    want = sorted(n["id"] for n in full["nodes"])[:2]
    assert [n["id"] for n in out["nodes"]] == want


def test_save_snapshot_csv_roundtrip(store, metadata_df, spark, tmp_path):
    serving.preload_csv(store, metadata_df)
    path = str(tmp_path / "snapshot")
    serving.save_snapshot_csv(store, path)
    files = glob.glob(f"{path}/*.csv")
    assert len(files) == 1  # coalesced single part
    back = spark.read.option("header", True).csv(path)
    assert set(back.columns) == set(serving.SNAPSHOT_COLUMNS)
    assert back.count() == 2
