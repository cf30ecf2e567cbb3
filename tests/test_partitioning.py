"""Partitioned warehouse tables: write layout, pruning, merge roundtrip."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import link_row


def _load(store, urls_cats):
    links = store.spark.createDataFrame(
        [link_row(u, suggested_category=c) for u, c in urls_cats]
    )
    store.merge_links(links)
    store.merge_names(
        "categories",
        store.spark.createDataFrame([(c,) for _, c in urls_cats], ["name"]),
    )
    store.merge_edges(
        "belongs_to",
        store.spark.createDataFrame(
            [(u, c) for u, c in urls_cats], ["src_url", "dst_category"]
        ),
    )


def test_belongs_to_partitioned_layout_and_roundtrip(store):
    _load(store, [("u1", "A"), ("u2", "A"), ("u3", "B")])
    # hive-style directory per category in the current version
    ver = store.wh.list_versions("belongs_to")[-1]
    dirs = glob.glob(
        f"{store.wh.root}/belongs_to/v{ver:08d}/dst_category=*"
    )
    assert sorted(d.rsplit("=", 1)[1] for d in dirs) == ["A", "B"]
    # read-back sees all rows with correct values
    rows = {(r.src_url, r.dst_category) for r in store.wh.read("belongs_to").collect()}
    assert rows == {("u1", "A"), ("u2", "A"), ("u3", "B")}


def test_partition_pruning_in_plan(store):
    _load(store, [("u1", "A"), ("u2", "B"), ("u3", "C")])
    df = store.wh.read("belongs_to").filter(F.col("dst_category") == "B")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dst_category" in plan
    assert {r.src_url for r in df.collect()} == {"u2"}


def test_merge_into_partitioned_table_is_idempotent(store):
    _load(store, [("u1", "A")])
    _load(store, [("u1", "A")])  # second run: anti-join skips everything
    assert store.wh.read("belongs_to").count() == 1
