"""Streaming graph ingestion tests: CSV drops -> foreachBatch -> batched
upserts; plus warehouse time travel over the resulting versions."""

from __future__ import annotations

import pytest

from webpagesgraphdatabase_spark.catalog import TableNotFoundError
from webpagesgraphdatabase_spark.streaming.ingest import (
    read_metadata_csv_stream,
    stream_preload,
)

HEADER = "url,title,content,category,keyword,category_explanation,keyword_explanation"


def _write_csv(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join([HEADER, *rows]) + "\n")


@pytest.fixture()
def csv_dir(tmp_path):
    d = tmp_path / "drops"
    _write_csv(
        d / "batch1.csv",
        [
            f'a.example/one,A,{"x" * 150},Database,"alpha, beta",exp,kex',
            f'b.example/two,B,{"y" * 150},News,gamma,,',
        ],
    )
    _write_csv(
        d / "batch2.csv",
        [
            f'a.example/one,A-dup,{"z" * 150},Blog,delta,,',  # dup url: skipped
            f'c.example/three,C,{"w" * 150},News,gamma,,',
        ],
    )
    return d


def test_stream_preload_ingests_and_dedups(spark, store, csv_dir, tmp_path):
    stream = read_metadata_csv_stream(spark, str(csv_dir))
    q = stream_preload(stream, store, str(tmp_path / "ckpt"))
    q.awaitTermination()

    g = store.graph()
    urls = {r.url for r in g.links.collect()}
    assert urls == {
        "https://a.example/one",
        "https://b.example/two",
        "https://c.example/three",
    }
    # the duplicate url kept its FIRST-seen title (insert-if-absent MERGE)
    titles = {r.url: r.title for r in g.links.collect()}
    assert titles["https://a.example/one"] == "A"
    # edges landed for both batches
    kws = {(r.src_url, r.dst_keyword) for r in g.has_keyword.collect()}
    assert ("https://c.example/three", "gamma") in kws
    assert ("https://a.example/one", "alpha") in kws


def test_stream_preload_restart_is_idempotent(spark, store, csv_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    q = stream_preload(read_metadata_csv_stream(spark, str(csv_dir)), store, ckpt)
    q.awaitTermination()
    n1 = store.graph().links.count()
    # restart with same checkpoint: no new files -> no changes; and even a
    # fresh checkpoint (full replay) must not duplicate (anti-join sink)
    q = stream_preload(read_metadata_csv_stream(spark, str(csv_dir)), store, ckpt)
    q.awaitTermination()
    q = stream_preload(
        read_metadata_csv_stream(spark, str(csv_dir)), store, str(tmp_path / "ckpt2")
    )
    q.awaitTermination()
    assert store.graph().links.count() == n1


def test_warehouse_time_travel(spark, store, csv_dir, tmp_path):
    stream = read_metadata_csv_stream(spark, str(csv_dir), max_files_per_trigger=1)
    q = stream_preload(stream, store, str(tmp_path / "c"))
    q.awaitTermination()
    versions = store.wh.list_versions("links")
    assert len(versions) >= 3  # empty init + one per micro-batch ingest
    v_first = store.wh.read_version("links", versions[0])
    assert v_first.count() == 0  # schema-init snapshot
    assert store.wh.read_version("links", versions[-1]).count() == 3
    # monotone growth across ingest versions (insert-only workload)
    counts = [store.wh.read_version("links", v).count() for v in versions]
    assert counts == sorted(counts)
    with pytest.raises(TableNotFoundError):
        store.wh.read_version("links", 9999)
