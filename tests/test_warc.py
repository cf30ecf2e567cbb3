"""WARC/WET ingestion: parser round-trips, distributed read, document
and link-graph derivation."""

from __future__ import annotations

import pytest

from webpagesgraphdatabase_spark import warc as W

HTML = (
    b"<html><head><title>Page A</title></head><body>"
    b'<p>Alpha &amp; beta.</p><a href="/b">b</a>'
    b'<a href="https://other.example/c">c</a></body></html>'
)


def _records():
    return [
        {
            "record_id": "<urn:uuid:r1>",
            "warc_type": "response",
            "target_uri": "https://site.example/a",
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(HTML),
        },
        {
            "record_id": "<urn:uuid:r2>",
            "warc_type": "conversion",
            "target_uri": "https://site.example/a",
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "text/plain",
            "block": b"Alpha & beta. b c",
        },
        {
            "record_id": "<urn:uuid:r3>",
            "warc_type": "response",
            "target_uri": "https://site.example/404",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(b"gone", status=404),
        },
        {
            "record_id": "<urn:uuid:r4>",
            "warc_type": "response",
            "target_uri": "https://site.example/img.gif",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(
                b"GIF89a\x01\x00\x01\x00", content_type="image/gif"
            ),
        },
    ]


@pytest.mark.parametrize("compress", ["none", "file", "record"])
def test_iter_warc_records_roundtrip_all_compressions(compress):
    buf = W.build_warc(_records(), compress=compress)
    got = list(W.iter_warc_records(buf))
    assert [r["record_id"] for r in got] == [
        "<urn:uuid:r1>",
        "<urn:uuid:r2>",
        "<urn:uuid:r3>",
        "<urn:uuid:r4>",
    ]
    assert got[1]["block"] == b"Alpha & beta. b c"
    assert got[0]["content_length"] == len(W.http_response_block(HTML))
    status, ctype, body = W.parse_http_payload(got[0]["block"])
    assert (status, body) == (200, HTML)
    assert ctype.startswith("text/html")


def test_iter_warc_records_truncation_and_bad_stream():
    buf = W.build_warc(_records()[:2])
    # cut inside the second record's block (10 bytes = the 4 closing
    # CRLF bytes + 6 block bytes): first record still parses, the
    # truncated one yields the bytes that are present
    cut = buf[: len(buf) - 10]
    got = list(W.iter_warc_records(cut))
    assert len(got) == 2
    assert got[1]["block"] == b"Alpha & bet"
    with pytest.raises(W.WarcFormatError):
        list(W.iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_read_warc_distributed_and_documents(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(W.build_warc(_records()))
    (tmp_path / "b.warc.gz").write_bytes(
        W.build_warc(
            [
                {
                    "record_id": "<urn:uuid:r5>",
                    "warc_type": "conversion",
                    "target_uri": "https://site.example/wet",
                    "content_type": "text/plain",
                    "block": b"wet text only",
                }
            ],
            compress="record",
        )
    )
    recs = W.read_warc(spark, str(tmp_path))
    rows = {r.record_id: r for r in recs.collect()}
    assert len(rows) == 5
    assert rows["<urn:uuid:r1>"].http_status == 200
    assert rows["<urn:uuid:r1>"].body_text.startswith("<html>")
    # binary body stays bytes, text side null (and vice versa)
    assert rows["<urn:uuid:r4>"].content == b"GIF89a\x01\x00\x01\x00"
    assert rows["<urn:uuid:r4>"].body_text is None
    assert rows["<urn:uuid:r5>"].body_text == "wet text only"

    docs = {r.url: r for r in W.warc_documents(recs).collect()}
    # 404 and image dropped; html response text-extracted; WET passes
    assert set(docs) == {"https://site.example/a", "https://site.example/wet"}
    assert docs["https://site.example/a"].text == "Alpha & beta. b c"
    assert docs["https://site.example/wet"].n_chars == 13
    doc_ids = [r.doc_id for r in W.warc_documents(recs).collect()]
    assert len(set(doc_ids)) == len(doc_ids)


def test_warc_link_graph(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(W.build_warc(_records()))
    edges = {
        (r.src_url, r.dst_url)
        for r in W.warc_link_graph(W.read_warc(spark, str(tmp_path))).collect()
    }
    assert edges == {
        ("https://site.example/a", "https://site.example/b"),
        ("https://site.example/a", "https://other.example/c"),
    }


def test_preload_warc_into_graph_idempotent(spark, tmp_path):
    """The crawl front door lands through the CSV preload machinery:
    2xx HTML pages become Link nodes (normalized url, extracted title
    and text), re-preloading the same archive inserts nothing."""
    from webpagesgraphdatabase_spark import serving
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    (tmp_path / "crawl.warc").write_bytes(W.build_warc(_records()))
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    n = serving.preload_warc(spark, store, str(tmp_path / "crawl.warc"))
    assert n == 1  # only the 200 text/html response qualifies
    links = {r.url: r for r in store.graph().links.collect()}
    assert "https://site.example/a" in links
    row = links["https://site.example/a"]
    assert row.title == "Page A"
    assert row.raw_content == "Alpha & beta. b c"
    # idempotent: the anti-join drops the existing url
    assert serving.preload_warc(spark, store, str(tmp_path / "crawl.warc")) == 0


def test_domain_stats(spark):
    docs = spark.createDataFrame(
        [
            ("https://a.example/1", "xxxx"),
            ("https://a.example/2", "xx"),
            ("https://b.example/1", "x"),
            ("not-a-url", "ignored"),
        ],
        ["url", "text"],
    )
    got = {r.domain: (r.n_docs, r.total_chars, r.mean_chars)
           for r in W.domain_stats(docs).collect()}
    assert got == {"a.example": (2, 6, 3.0), "b.example": (1, 1, 1.0)}


def test_crawl_frontier_composition(spark):
    from webpagesgraphdatabase_spark import robots as R

    edges = spark.createDataFrame(
        [
            ("https://s.example/a", "https://s.example/new1"),
            ("https://s.example/a", "https://s.example/seen"),
            ("https://s.example/b", "https://s.example/new1"),  # dedup
            ("https://s.example/b", "https://s.example/private/x"),
            ("https://s.example/b", "https://t.example/n1"),
            ("https://s.example/b", "https://t.example/n2"),
            ("https://s.example/b", "https://t.example/n3"),
        ],
        ["src_url", "dst_url"],
    )
    seen = spark.createDataFrame([("https://s.example/seen",)], ["url"])
    rules = R.robots_rules(
        spark.createDataFrame(
            [("s.example", "User-agent: *\nDisallow: /private/")],
            ["host", "body"],
        )
    )
    got = {r.url for r in W.crawl_frontier(edges, seen, rules).collect()}
    assert got == {
        "https://s.example/new1",
        "https://t.example/n1",
        "https://t.example/n2",
        "https://t.example/n3",
    }
    capped = W.crawl_frontier(edges, seen, rules, limit_per_domain=2)
    by_host = {}
    for r in capped.collect():
        h = r.url.split("/")[2]
        by_host[h] = by_host.get(h, 0) + 1
    assert by_host["t.example"] == 2 and by_host["s.example"] == 1


def test_read_warc_stream_matches_batch(spark, tmp_path):
    """The streaming reader parses the same records as the batch
    reader over a closed archive directory."""
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.warc").write_bytes(W.build_warc(_records()))
    out = []
    q = (
        W.read_warc_stream(spark, str(land))
        .writeStream.foreachBatch(
            lambda b, i: out.extend(
                (r.record_id, r.warc_type, r.http_status, r.body_text)
                for r in b.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    want = [
        (r.record_id, r.warc_type, r.http_status, r.body_text)
        for r in W.read_warc(spark, str(land)).collect()
    ]
    assert sorted(out) == sorted(want) and len(out) == 4


def test_streaming_warc_preload_idempotent(spark, tmp_path):
    """Continuous crawl landing: archives arriving over two
    micro-batches preload into the graph; a second drain over the
    same directory (fresh checkpoint = full replay) inserts nothing
    new thanks to the skip-existing anti-join."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.warc").write_bytes(W.build_warc(_records()))
    (land / "b.warc").write_bytes(
        W.build_warc(
            [
                {
                    "record_id": "<urn:uuid:p2>",
                    "warc_type": "response",
                    "target_uri": "https://site.example/second",
                    "content_type": "application/http; msgtype=response",
                    "block": W.http_response_block(
                        b"<html><head><title>Two</title></head>"
                        b"<body>second page</body></html>"
                    ),
                }
            ]
        )
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    W.streaming_warc_preload(spark, store, str(land), str(tmp_path / "ck1"))
    links = {r.url: r.title for r in store.graph().links.collect()}
    assert links == {
        "https://site.example/a": "Page A",
        "https://site.example/second": "Two",
    }
    # full replay with a fresh checkpoint: anti-join keeps it a no-op
    W.streaming_warc_preload(spark, store, str(land), str(tmp_path / "ck2"))
    assert store.graph().links.count() == 2


def test_write_wet_roundtrip(spark, tmp_path):
    """documents -> WET export -> read_warc -> warc_documents recovers
    every text; files are record-gzipped WARC; manifest counts add up;
    the export is deterministic (same digest-named files twice)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta", "https://s.example/1"),
         (2, "gamma", "https://s.example/2"),
         (3, "", "https://s.example/3")],
        ["doc_id", "text", "url"],
    )
    out = str(tmp_path / "wet")
    manifest = W.write_wet(docs, out, url_col="url")
    assert sum(m["n_records"] for m in manifest) == 3
    back = W.warc_documents(W.read_warc(spark, out))
    got = {r.url: r.text for r in back.collect()}
    assert got == {
        "https://s.example/1": "alpha beta",
        "https://s.example/2": "gamma",
        "https://s.example/3": "",
    }
    # determinism: a second export produces the same file set
    out2 = str(tmp_path / "wet2")
    manifest2 = W.write_wet(docs, out2, url_col="url")
    import os
    assert sorted(os.path.basename(m["file"]) for m in manifest) == sorted(
        os.path.basename(m["file"]) for m in manifest2
    )


def _crawl_records():
    def page(rid, path_, title, body, links=()):
        anchors = "".join(f'<a href="{h}">x</a>' for h in links)
        html_doc = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{body}</p>{anchors}</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": f"https://site.example{path_}",
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    return [
        page(
            "a", "/a", "Page A",
            "alpha tokens common to nobody else here today",
            links=["/b", "/new-target", "https://other.example/c"],
        ),
        page(
            "b", "/b", "Page B",
            "beta words entirely distinct from the first page text",
            links=["/seen-already", "/private/x"],
        ),
        # robots-disallowed page: must reach neither graph nor indexes
        page("p", "/private/p", "Secret", "hidden body text"),
        {
            # Common Crawl URL-level dedup hint: content already
            # archived elsewhere — the frontier must skip it unfetched
            "record_id": "<urn:uuid:rv>",
            "warc_type": "revisit",
            "target_uri": "https://site.example/seen-already",
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=revisit",
            "block": b"",
        },
    ]


def _rules(spark):
    from webpagesgraphdatabase_spark import robots as R

    return R.robots_rules(
        spark.createDataFrame(
            [("site.example", "User-agent: *\nDisallow: /private/\n")],
            ["host", "body"],
        )
    )


def _index_state(spark, text_index, sq8_index):
    posts = sorted(
        map(tuple, spark.read.parquet(f"{text_index}/postings.parquet")
            .select("term", "doc_id", "tf", "bucket", "batch").collect())
    )
    lens = sorted(
        map(tuple, spark.read.parquet(f"{text_index}/doclens.parquet")
            .select("doc_id", "dl", "batch").collect())
    )
    sq8 = sorted(
        (int(r.vec_id), tuple(r.codes), int(r.bucket), int(r.batch))
        for r in spark.read.parquet(f"{sq8_index}/sq8.parquet").collect()
    )
    return posts, lens, sq8


def _graph_state(store):
    g = store.graph()
    return {
        "links": sorted(map(tuple, g.links.collect())),
        "has_keyword": sorted(map(tuple, g.has_keyword.collect())),
        "belongs_to": sorted(map(tuple, g.belongs_to.collect())),
    }


def test_crawl_round_end_to_end_and_replay_identical(spark, tmp_path):
    """The closed crawl loop (r7 verdict item 3): one call lands the
    archive, politeness-filters, CDC-dedups, preloads the graph,
    appends the BM25 + SQ8 indexes exactly-once, and emits the next
    frontier. A second call over the SAME archive (the crash-replay /
    re-delivery case) must leave graph and indexes row-identical."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S

    (tmp_path / "crawl.warc").write_bytes(W.build_warc(_crawl_records()))
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, si = str(tmp_path / "ti"), str(tmp_path / "si")
    rep = W.crawl_round(
        spark, store, str(tmp_path / "crawl.warc"),
        rules=_rules(spark), text_index=ti, sq8_index=si,
    )
    assert rep["n_links_inserted"] == 2  # a and b; /private/p filtered
    assert rep["n_docs_indexed"] == 2
    assert rep["n_revisits"] == 1
    urls = {r.url for r in store.graph().links.collect()}
    assert urls == {"https://site.example/a", "https://site.example/b"}

    # the BM25 index serves (exact stats across the ensure-skeleton's
    # zero row + this batch) and never saw the disallowed page
    hits = S.bm25_from_index(spark, ti, ("alpha",), k=3).collect()
    assert len(hits) == 1
    assert not S.bm25_from_index(spark, ti, ("hidden",), k=3).collect()

    # frontier: new out-links only — not the pages themselves (in the
    # graph now), not the revisit target (dedup hint), not robots-
    # disallowed paths
    frontier = {r.url for r in rep["frontier"].collect()}
    assert frontier == {
        "https://site.example/new-target",
        "https://other.example/c",
    }

    g1 = _graph_state(store)
    i1 = _index_state(spark, ti, si)
    # replay: same archive, same deterministic batch id
    rep2 = W.crawl_round(
        spark, store, str(tmp_path / "crawl.warc"),
        rules=_rules(spark), text_index=ti, sq8_index=si,
    )
    assert rep2["batch"] == rep["batch"]
    assert rep2["n_links_inserted"] == 0
    assert _graph_state(store) == g1
    assert _index_state(spark, ti, si) == i1


def test_crawl_round_bin_index_tier(spark, tmp_path):
    """bin_index= adds the 32x packed-signature tier to the crawl
    loop's exactly-once appends: the at-rest signatures equal a live
    bin_encode over the same (shared) hash embedding, the SQ8 and bin
    stores carry the SAME vec_ids (one embedding pass feeds both), and
    a replay leaves the bin store row-identical."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import similarity as sim

    (tmp_path / "crawl.warc").write_bytes(W.build_warc(_crawl_records()))
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    si, bi = str(tmp_path / "si"), str(tmp_path / "bi")
    rep = W.crawl_round(
        spark, store, str(tmp_path / "crawl.warc"),
        rules=_rules(spark), sq8_index=si, bin_index=bi,
    )
    assert rep["n_docs_indexed"] == 2
    stored = spark.read.parquet(f"{bi}/bin.parquet").select(
        "vec_id", "words"
    )
    assert stored.count() == 2
    # same vec_ids in both vector tiers (one embedding pass)
    sq8_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{si}/sq8.parquet")
        .select("vec_id")
        .collect()
    }
    assert {r.vec_id for r in stored.collect()} == sq8_ids
    # signatures ≡ live encode of the same deterministic embedding
    docs = W.warc_documents(W.read_warc(spark, str(tmp_path / "crawl.warc")))
    from webpagesgraphdatabase_spark.operators.dedup import cdc_dedup

    cleaned = (
        docs.join(cdc_dedup(docs).select("doc_id", "clean_text"), "doc_id")
        .filter(F.col("clean_text") != "")
        .select("doc_id", F.col("clean_text").alias("text"), "url")
        .join(stored.select(F.col("vec_id").alias("doc_id")), "doc_id",
              "left_semi")
    )
    live = sim.bin_encode(sim.hash_embed(cleaned))
    assert sorted(
        (r.vec_id, tuple(r.words)) for r in stored.collect()
    ) == sorted((r.vec_id, tuple(r.words)) for r in live.collect())
    # replay leaves the store row-identical
    state = sorted(map(tuple, spark.read.parquet(f"{bi}/bin.parquet").collect()))
    W.crawl_round(
        spark, store, str(tmp_path / "crawl.warc"),
        rules=_rules(spark), sq8_index=si, bin_index=bi,
    )
    assert sorted(
        map(tuple, spark.read.parquet(f"{bi}/bin.parquet").collect())
    ) == state


def test_streaming_crawl_round_replay_identical(spark, tmp_path):
    """Streaming twin: a fresh checkpoint replays every micro-batch
    with the same ids — graph and indexes must come out row-identical
    to the first drain (exactly-once via batch-keyed overwrite + the
    preload's idempotent anti-join)."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.warc").write_bytes(W.build_warc(_crawl_records()))
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, si = str(tmp_path / "ti"), str(tmp_path / "si")

    def drain(ck):
        W.streaming_crawl_round(
            spark, store, str(land), str(tmp_path / ck),
            rules=_rules(spark), text_index=ti, sq8_index=si,
        )

    drain("ck1")
    g1, i1 = _graph_state(store), _index_state(spark, ti, si)
    assert g1["links"]
    drain("ck2")  # fresh checkpoint = full replay, same batch ids
    assert _graph_state(store) == g1
    assert _index_state(spark, ti, si) == i1


def test_crawl_round_two_archives_distinct_batches(spark, tmp_path):
    """Two DIFFERENT archives ingest under distinct deterministic batch
    ids: graph and indexes grow (no cross-archive clobbering), and
    replaying archive 1 after archive 2 landed still no-ops — the
    multi-round crawl schedule."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S

    def page_rec(rid, url, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": url,
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    (tmp_path / "a1.warc").write_bytes(
        W.build_warc([page_rec("x1", "https://s.example/x1",
                               "first archive unique words here")])
    )
    (tmp_path / "a2.warc").write_bytes(
        W.build_warc([page_rec("x2", "https://s.example/x2",
                               "second archive different vocabulary")])
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, si = str(tmp_path / "ti"), str(tmp_path / "si")
    r1 = W.crawl_round(spark, store, str(tmp_path / "a1.warc"),
                       text_index=ti, sq8_index=si)
    r2 = W.crawl_round(spark, store, str(tmp_path / "a2.warc"),
                       text_index=ti, sq8_index=si)
    assert r1["batch"] != r2["batch"]
    assert r1["n_links_inserted"] == 1 and r2["n_links_inserted"] == 1
    urls = {r.url for r in store.graph().links.collect()}
    assert urls == {"https://s.example/x1", "https://s.example/x2"}
    # both archives' docs are searchable from one index
    assert S.bm25_from_index(spark, ti, ("unique",), k=2).collect()
    assert S.bm25_from_index(spark, ti, ("vocabulary",), k=2).collect()
    sq8 = spark.read.parquet(f"{si}/sq8.parquet")
    assert sq8.count() == 2
    assert len({r.batch for r in sq8.select("batch").distinct().collect()}) == 2
    # replaying archive 1 AFTER archive 2 landed still no-ops
    state = sorted(map(tuple, sq8.collect()))
    r1b = W.crawl_round(spark, store, str(tmp_path / "a1.warc"),
                        text_index=ti, sq8_index=si)
    assert r1b["batch"] == r1["batch"] and r1b["n_links_inserted"] == 0
    assert sorted(
        map(tuple, spark.read.parquet(f"{si}/sq8.parquet").collect())
    ) == state


def test_crawl_round_compact_threshold_maintenance(spark, tmp_path):
    """compact_threshold folds fragmented indexes between rounds: after
    enough appends the stores collapse to segment 0, query results stay
    identical, the report carries the fold, and a replay of a
    pre-compaction archive still no-ops (watermark discipline)."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S

    def page_rec(rid, url, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": url,
            "warc_date": "2026-08-15T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    for i in range(3):
        (tmp_path / f"a{i}.warc").write_bytes(
            W.build_warc(
                [page_rec(f"p{i}", f"https://c.example/p{i}",
                          f"round{i} corpus tokenset{i} shared words")]
            )
        )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, si = str(tmp_path / "ti"), str(tmp_path / "si")
    reports = [
        W.crawl_round(
            spark, store, str(tmp_path / f"a{i}.warc"),
            text_index=ti, sq8_index=si, compact_threshold=2,
        )
        for i in range(3)
    ]
    # fragmentation crossed the bound at least once → a fold ran and
    # the report says so
    folded = [r for r in reports if "compacted" in r]
    assert folded, [sorted(r) for r in reports]
    assert any("text" in r.get("compacted", {}) for r in reports)
    # post-fold: every round's docs still searchable, exact-stats BM25
    for i in range(3):
        hits = S.bm25_from_index(spark, ti, (f"tokenset{i}",), k=3).collect()
        assert len(hits) == 1, i
    # the sq8 store either folded or stayed under the bound; row count
    # is exactly the three docs either way
    assert spark.read.parquet(f"{si}/sq8.parquet").count() == 3
    # replaying a pre-compaction archive no-ops via the watermark
    posts = spark.read.parquet(f"{ti}/postings.parquet").count()
    rb = W.crawl_round(
        spark, store, str(tmp_path / "a0.warc"),
        text_index=ti, sq8_index=si, compact_threshold=2,
    )
    assert rb["n_links_inserted"] == 0
    assert spark.read.parquet(f"{ti}/postings.parquet").count() == posts
    assert spark.read.parquet(f"{si}/sq8.parquet").count() == 3


def test_crawl_round_low_hash_archive_after_compaction(spark, tmp_path):
    """r11 regression: archive batch ids are CONTENT HASHES — unordered
    — so a new archive whose id lands BELOW a fold watermark must still
    index (the pre-r11 ≤-watermark replay check silently dropped its
    appends: graph row present, document unsearchable). Pinned with
    explicit ids in the hazard order; replay of the folded id still
    no-ops."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S

    def page_rec(rid, url, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": url,
            "warc_date": "2026-08-15T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    for i, _id in ((0, 500), (1, 100)):
        (tmp_path / f"h{i}.warc").write_bytes(
            W.build_warc(
                [page_rec(f"p{i}", f"https://lo.example/p{i}",
                          f"hazard{i} corpus words")]
            )
        )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti = str(tmp_path / "ti")
    # round 1 (id 500) then an immediate fold (threshold 0)
    W.crawl_round(spark, store, str(tmp_path / "h0.warc"),
                  text_index=ti, batch=500, compact_threshold=0)
    # round 2's id (100) sits below the fold watermark (500) — the
    # exact layout a content-hash id space produces ~half the time
    W.crawl_round(spark, store, str(tmp_path / "h1.warc"),
                  text_index=ti, batch=100)
    for i in range(2):
        hits = S.bm25_from_index(spark, ti, (f"hazard{i}",), k=3).collect()
        assert len(hits) == 1, f"archive {i} dropped from the index"
    # the folded id still adjudicates as a replay
    n = spark.read.parquet(f"{ti}/postings.parquet").count()
    W.crawl_round(spark, store, str(tmp_path / "h0.warc"),
                  text_index=ti, batch=500)
    assert spark.read.parquet(f"{ti}/postings.parquet").count() == n


def test_crawl_round_landing_mode_single_parse(spark, tmp_path):
    """landing= lands the records as Parquet keyed by batch id (the
    at-scale single-parse mode); results are identical to the direct
    mode, the landing dir holds the full records frame, and a replay
    overwrites the same landing dir."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    (tmp_path / "crawl.warc").write_bytes(W.build_warc(_crawl_records()))
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    land = str(tmp_path / "landing")
    rep = W.crawl_round(
        spark, store, str(tmp_path / "crawl.warc"),
        rules=_rules(spark), text_index=str(tmp_path / "ti"),
        sq8_index=str(tmp_path / "si"), landing=land,
    )
    assert rep["n_links_inserted"] == 2 and rep["n_docs_indexed"] == 2
    import os

    sub = os.listdir(land)
    assert len(sub) == 1 and sub[0] == f"b{rep['batch']:010d}"
    landed = spark.read.parquet(f"{land}/{sub[0]}")
    assert landed.count() == len(_crawl_records())
    frontier = {r.url for r in rep["frontier"].collect()}
    assert frontier == {
        "https://site.example/new-target",
        "https://other.example/c",
    }
    # replay: same batch id, same landing dir, graph unchanged
    g1 = _graph_state(store)
    rep2 = W.crawl_round(
        spark, store, str(tmp_path / "crawl.warc"),
        rules=_rules(spark), text_index=str(tmp_path / "ti"),
        sq8_index=str(tmp_path / "si"), landing=land,
    )
    assert rep2["batch"] == rep["batch"] and rep2["n_links_inserted"] == 0
    assert os.listdir(land) == sub
    assert _graph_state(store) == g1


def test_crawl_round_doc_filter_gates_indexing(spark, tmp_path):
    """A doc_filter (here: a textstats quality-score threshold over the
    CDC-cleaned text) gates what reaches the indexes — the graph still
    receives every allowed page, but junk documents never index; the
    gate composes with replay (same filter, same batch id → no-op)."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S
    from webpagesgraphdatabase_spark.operators import textstats

    def page(rid, path_, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": f"https://q.example{path_}",
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    long_body = " ".join(f"substantive token{i} content" for i in range(40))
    (tmp_path / "c.warc").write_bytes(
        W.build_warc([page("g", "/good", long_body), page("j", "/junk", "ok")])
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()

    def quality_gate(docs):
        scored = textstats.quality_score(docs).select("doc_id", "quality")
        return docs.join(
            scored.filter(F.col("quality") >= 0.5), "doc_id", "left_semi"
        )

    ti = str(tmp_path / "ti")
    rep = W.crawl_round(
        spark, store, str(tmp_path / "c.warc"),
        text_index=ti, doc_filter=quality_gate,
    )
    # both pages enter the graph; only the substantive one indexes
    assert rep["n_links_inserted"] == 2
    assert rep["n_docs_indexed"] == 1
    assert S.bm25_from_index(spark, ti, ("substantive",), k=2).collect()
    assert not S.bm25_from_index(spark, ti, ("ok",), k=2).collect()
    # replay with the same deterministic filter: exactly-once holds
    posts = spark.read.parquet(f"{ti}/postings.parquet").count()
    rep2 = W.crawl_round(
        spark, store, str(tmp_path / "c.warc"),
        text_index=ti, doc_filter=quality_gate,
    )
    assert rep2["batch"] == rep["batch"]
    assert spark.read.parquet(f"{ti}/postings.parquet").count() == posts


def test_crawl_round_cross_batch_content_dedup(spark, tmp_path):
    """fingerprints= closes the content-level dedup gap across rounds:
    an archive re-shipping an earlier round's document under a NEW url
    preloads the page (URLs differ) but never re-indexes the content;
    replays of either round stay exactly-once."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S

    def page(rid, url, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": url,
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    shared = "identical reshipped body with plenty of unique tokens"
    (tmp_path / "a1.warc").write_bytes(
        W.build_warc([page("x", "https://d.example/x1", shared)])
    )
    (tmp_path / "a2.warc").write_bytes(
        W.build_warc(
            [
                page("xcopy", "https://d.example/x2", shared),
                page("y", "https://d.example/y", "fresh other document words"),
            ]
        )
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, fpd = str(tmp_path / "ti"), str(tmp_path / "fp")
    r1 = W.crawl_round(spark, store, str(tmp_path / "a1.warc"),
                       text_index=ti, fingerprints=fpd)
    assert r1["n_docs_indexed"] == 1 and r1["n_cross_dup"] == 0
    r2 = W.crawl_round(spark, store, str(tmp_path / "a2.warc"),
                       text_index=ti, fingerprints=fpd)
    # the reshipped copy is dropped from indexing; the fresh doc lands
    assert r2["n_cross_dup"] == 1 and r2["n_docs_indexed"] == 1
    # both urls are in the graph regardless (page-level, not content)
    urls = {r.url for r in store.graph().links.collect()}
    assert urls == {
        "https://d.example/x1",
        "https://d.example/x2",
        "https://d.example/y",
    }
    # the shared content is indexed exactly once
    hits = S.bm25_from_index(spark, ti, ("reshipped",), k=5).collect()
    assert len(hits) == 1
    # fingerprint store: one hash per batch, survivors only
    fp = spark.read.parquet(f"{fpd}/fp.parquet")
    assert fp.count() == 2
    # replays of both rounds stay exactly-once
    posts = spark.read.parquet(f"{ti}/postings.parquet").count()
    fp_state = sorted(map(tuple, fp.collect()))
    r1b = W.crawl_round(spark, store, str(tmp_path / "a1.warc"),
                        text_index=ti, fingerprints=fpd)
    r2b = W.crawl_round(spark, store, str(tmp_path / "a2.warc"),
                        text_index=ti, fingerprints=fpd)
    assert r1b["n_cross_dup"] == 0 and r2b["n_cross_dup"] == 1
    assert spark.read.parquet(f"{ti}/postings.parquet").count() == posts
    assert sorted(
        map(tuple, spark.read.parquet(f"{fpd}/fp.parquet").collect())
    ) == fp_state


def test_crawl_round_near_dup_cross_batch(spark, tmp_path):
    """near_dup_bits extends the cross-round gate to NEAR duplicates:
    a later round's lightly-edited copy of an earlier round's document
    (one token changed) is dropped when its SimHash sits within the
    bound, while a genuinely different doc still lands."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import dedup as D

    def page(rid, url, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": url,
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    orig = " ".join(f"stable corpus token{i}" for i in range(30))
    edited = orig.replace("token7", "changed7")
    other = " ".join(f"unrelated vocabulary word{i}" for i in range(30))
    # derive the TRUE hamming distance between orig and edited so the
    # bound provably separates near (edited) from far (other)
    sigs = {
        r.doc_id: r.simhash
        for r in D.simhash(
            spark.createDataFrame(
                [(1, orig), (2, edited), (3, other)], ["doc_id", "text"]
            )
        ).collect()
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    near = ham(sigs[1], sigs[2])
    far = ham(sigs[1], sigs[3])
    assert near < far  # the premise of the test data
    bits = near  # bound that admits the edit but not the stranger
    if bits >= 4:  # keep pigeonhole completeness with default bands
        bits = 3
    if near > bits:
        import pytest

        pytest.skip("synthetic edit drifted too many bits on this corpus")

    (tmp_path / "a1.warc").write_bytes(
        W.build_warc([page("o", "https://n.example/orig", orig)])
    )
    (tmp_path / "a2.warc").write_bytes(
        W.build_warc(
            [
                page("e", "https://n.example/edited", edited),
                page("u", "https://n.example/other", other),
            ]
        )
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, fpd = str(tmp_path / "ti"), str(tmp_path / "fp")
    r1 = W.crawl_round(spark, store, str(tmp_path / "a1.warc"),
                       text_index=ti, fingerprints=fpd, near_dup_bits=bits)
    assert r1["n_docs_indexed"] == 1
    r2 = W.crawl_round(spark, store, str(tmp_path / "a2.warc"),
                       text_index=ti, fingerprints=fpd, near_dup_bits=bits)
    # the edited near-copy is dropped; the unrelated doc lands
    assert r2["n_cross_dup"] == 1 and r2["n_docs_indexed"] == 1
    fp = spark.read.parquet(f"{fpd}/fp.parquet")
    assert fp.count() == 2  # orig + other; edited never stored


def test_crawl_round_dsir_doc_filter(spark, tmp_path):
    """DSIR as the crawl loop's selection gate: the filter keeps pages
    whose hashed-ngram importance weight against a reference corpus is
    positive — 'looks like the data we want' — and stays deterministic,
    so the replay contract holds. The reference corpus rides the
    closure; the crawl batch supplies the raw side."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import sampling

    def page(rid, path_, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": f"https://d.example{path_}",
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    wanted = "spark shuffle partition broadcast join " * 10
    junk = "zzz qqq xxx vvv kkk " * 10
    (tmp_path / "d.warc").write_bytes(
        W.build_warc([page("w", "/wanted", wanted), page("x", "/junk", junk)])
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    # reference corpus: what good documents look like
    ref = spark.createDataFrame(
        [(10_000 + i, f"spark join broadcast shuffle partition text {i}")
         for i in range(8)],
        ["doc_id", "text"],
    )

    def dsir_gate(docs):
        # target = the reference corpus, raw = reference ∪ this batch;
        # keep batch docs that score more target-like than raw-like
        pool = docs.select("doc_id", "text").unionByName(ref)
        w = sampling.dsir_weights(pool, F.col("doc_id") >= 10_000)
        return docs.join(
            w.filter(F.col("dsir_keep")).select("doc_id"),
            "doc_id",
            "left_semi",
        )

    ti = str(tmp_path / "ti")
    rep = W.crawl_round(
        spark, store, str(tmp_path / "d.warc"),
        text_index=ti, doc_filter=dsir_gate,
    )
    assert rep["n_links_inserted"] == 2      # graph gets every page
    assert rep["n_docs_indexed"] == 1        # only the target-like one indexes
    from webpagesgraphdatabase_spark.operators import search as S

    assert S.bm25_from_index(spark, ti, ("shuffle",), k=2).collect()
    assert not S.bm25_from_index(spark, ti, ("zzz",), k=2).collect()
    # deterministic gate → replay exactly-once
    posts = spark.read.parquet(f"{ti}/postings.parquet").count()
    W.crawl_round(
        spark, store, str(tmp_path / "d.warc"),
        text_index=ti, doc_filter=dsir_gate,
    )
    assert spark.read.parquet(f"{ti}/postings.parquet").count() == posts


def test_crawl_multi_round_frontier_consumption(spark, tmp_path):
    """Three crawl rounds where round N+1's archive serves exactly the
    frontier round N returned — the composition test the single-archive
    replay pins can't see: the seen-set grows across rounds (no URL is
    ever fetched twice), the Crawl-delay budget caps EVERY round's
    frontier (not just the first), round 2 exercises the cross-round
    EXACT content gate and round 3 the NEAR-duplicate gate against
    round 1's stored fingerprints."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import dedup as D
    from webpagesgraphdatabase_spark.operators import search as S

    def rec(rid, uri, body, ctype="text/html; charset=utf-8"):
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": uri,
            "warc_date": "2026-08-15T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(body, content_type=ctype),
        }

    def page(rid, uri, text, hrefs=()):
        body = (
            "<html><head><title>t</title></head><body><p>"
            + text
            + "</p>"
            + "".join(f'<a href="{h}"></a>' for h in hrefs)
            + "</body></html>"
        ).encode()
        return rec(rid, uri, body)

    robots_txt = b"User-agent: *\nCrawl-delay: 5\n"
    root = "https://mr.example/"
    orig = " ".join(f"stable corpus token{i}" for i in range(30))
    edited = orig.replace("token7", "changed7")
    fresh = " ".join(f"unrelated vocabulary word{i}" for i in range(30))
    # bound that provably admits the edit but not the fresh doc (the
    # near-dup test's derivation discipline)
    sigs = {
        r.doc_id: r.simhash
        for r in D.simhash(
            spark.createDataFrame(
                [(1, orig), (2, edited), (3, fresh)], ["doc_id", "text"]
            )
        ).collect()
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    near = ham(sigs[1], sigs[2])
    bits = min(near, 3)  # pigeonhole completeness with default bands
    if near > bits or near >= ham(sigs[1], sigs[3]):
        pytest.skip("synthetic edit drifted too many bits on this corpus")

    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, fpd = str(tmp_path / "ti"), str(tmp_path / "fp")
    kw = dict(
        text_index=ti, fingerprints=fpd, near_dup_bits=bits,
        auto_politeness=True, round_seconds=10.0,
    )

    # ---- round 1: the root page links to 4 candidates
    p = [f"https://mr.example/p{i}" for i in range(4)]
    (tmp_path / "r1.warc").write_bytes(
        W.build_warc(
            [
                rec("rb1", "https://mr.example/robots.txt", robots_txt,
                    "text/plain"),
                page("root", root, orig, hrefs=p),
            ]
        )
    )
    r1 = W.crawl_round(spark, store, str(tmp_path / "r1.warc"), **kw)
    assert r1["n_docs_indexed"] == 1 and r1["n_cross_dup"] == 0
    f1 = sorted(r.url for r in r1["frontier"].collect())
    # Crawl-delay 5 at a 10 s round: at most 2 pages for this host
    assert len(f1) == 2 and set(f1) <= set(p) and root not in f1

    # ---- round 2: serve exactly frontier 1; the first page re-ships
    # round 1's content verbatim under its new URL (exact gate), the
    # second is fresh; both link onward and back to the root
    q = [f"https://mr.example/q{i}" for i in range(4)]
    r2_fresh = " ".join(f"second round vocabulary item{i}" for i in range(30))
    (tmp_path / "r2.warc").write_bytes(
        W.build_warc(
            [
                rec("rb2", "https://mr.example/robots.txt", robots_txt,
                    "text/plain"),
                page("f1a", f1[0], orig, hrefs=[root, q[0], q[1]]),
                page("f1b", f1[1], r2_fresh, hrefs=[root, q[2], q[3]]),
            ]
        )
    )
    r2 = W.crawl_round(spark, store, str(tmp_path / "r2.warc"), **kw)
    # exact cross-round dedup: the re-shipped copy never re-indexes
    assert r2["n_cross_dup"] == 1 and r2["n_docs_indexed"] == 1
    f2 = sorted(r.url for r in r2["frontier"].collect())
    fetched = {root, *f1}
    # budget holds on round 2 too; nothing already fetched reappears
    assert len(f2) == 2 and set(f2) <= set(q)
    assert not set(f2) & fetched

    # ---- round 3: serve exactly frontier 2; one page is a one-token
    # edit of round 1's content (near gate), the other genuinely new
    (tmp_path / "r3.warc").write_bytes(
        W.build_warc(
            [
                rec("rb3", "https://mr.example/robots.txt", robots_txt,
                    "text/plain"),
                page("f2a", f2[0], edited),
                page("f2b", f2[1], fresh),
            ]
        )
    )
    r3 = W.crawl_round(spark, store, str(tmp_path / "r3.warc"), **kw)
    # near-dup content from round 1 never re-indexes in round 3
    assert r3["n_cross_dup"] == 1 and r3["n_docs_indexed"] == 1
    f3 = {r.url for r in r3["frontier"].collect()}
    assert not f3 & (fetched | set(f2))  # nothing refetched, ever

    # every fetched URL entered the graph exactly once (the graph key
    # is the NORMALIZED form — the root's trailing slash strips)
    urls = [r.url for r in store.graph().links.collect()]
    assert sorted(urls) == sorted({root.rstrip("/"), *f1} | set(f2))
    assert len(urls) == len(set(urls))
    # round 1's content is indexed exactly once despite two re-ships
    assert len(S.bm25_from_index(spark, ti, ("token3",), k=10).collect()) == 1
    # the genuinely-new docs all landed
    assert S.bm25_from_index(spark, ti, ("item3",), k=10).collect()
    assert S.bm25_from_index(spark, ti, ("word3",), k=10).collect()


def test_crawl_round_dsir_quota_doc_filter(spark, tmp_path):
    """The quota form of DSIR selection (dsir_top_fraction — keep a
    fixed fraction by importance weight, the mixture-targeting
    pipeline's actual knob) wired as the crawl loop's doc_filter: the
    loop indexes exactly the batch docs the operator selects on the
    same pool, junk stays out of the index, and the deterministic
    threshold keeps the replay exactly-once."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import sampling
    from webpagesgraphdatabase_spark.operators import search as S

    def page(rid, path_, body):
        html_doc = (
            f"<html><head><title>t</title></head><body><p>{body}</p>"
            "</body></html>"
        ).encode()
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": f"https://q.example{path_}",
            "warc_date": "2026-08-15T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(html_doc),
        }

    wanted = [
        f"spark shuffle partition broadcast join plan{i} " * 8
        for i in range(2)
    ]
    junk = [f"zzz{i} qqq xxx vvv kkk " * 8 for i in range(2)]
    (tmp_path / "q.warc").write_bytes(
        W.build_warc(
            [page(f"w{i}", f"/wanted{i}", t) for i, t in enumerate(wanted)]
            + [page(f"j{i}", f"/junk{i}", t) for i, t in enumerate(junk)]
        )
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ref = spark.createDataFrame(
        [(10_000 + i, f"spark join broadcast shuffle partition text {i}")
         for i in range(4)],
        ["doc_id", "text"],
    )

    def dsir_gate(docs):
        pool = docs.select("doc_id", "text").unionByName(ref)
        sel = sampling.dsir_top_fraction(
            pool, F.col("doc_id") >= 10_000, frac=0.5
        )
        return docs.join(sel.select("doc_id"), "doc_id", "left_semi")

    ti = str(tmp_path / "ti")
    rep = W.crawl_round(
        spark, store, str(tmp_path / "q.warc"),
        text_index=ti, doc_filter=dsir_gate,
    )
    assert rep["n_links_inserted"] == 4  # the graph still gets every page

    # the loop's selection ≡ the operator run standalone on the same pool
    from webpagesgraphdatabase_spark.operators.dedup import cdc_dedup

    docs = W.warc_documents(W.read_warc(spark, str(tmp_path / "q.warc")))
    cleaned = (
        docs.join(cdc_dedup(docs).select("doc_id", "clean_text"), "doc_id")
        .filter(F.col("clean_text") != "")
        .select("doc_id", F.col("clean_text").alias("text"), "url")
    )
    want_ids = {
        r.doc_id
        for r in dsir_gate(cleaned).select("doc_id").collect()
    }
    assert rep["n_docs_indexed"] == len(want_ids)
    # the quota admits target-like pages and keeps junk out
    assert 0 < rep["n_docs_indexed"] < 4
    assert S.bm25_from_index(spark, ti, ("shuffle",), k=4).collect()
    assert not S.bm25_from_index(spark, ti, ("zzz0",), k=4).collect()

    # deterministic threshold → replay exactly-once
    posts = spark.read.parquet(f"{ti}/postings.parquet").count()
    W.crawl_round(
        spark, store, str(tmp_path / "q.warc"),
        text_index=ti, doc_filter=dsir_gate,
    )
    assert spark.read.parquet(f"{ti}/postings.parquet").count() == posts


def test_sitemap_entries_and_frontier_seeding(spark):
    """Sitemap XML parsing (urlset locs, sitemapindex flag, XML entity
    decode) and frontier seeding: sitemap-discovered URLs join the
    candidate pool and pass the same seen anti-join and robots filter
    as link-harvested ones."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark import robots as R

    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://s.example/page1 </loc></url>"
        "<url><loc>https://s.example/page2?a=1&amp;b=2</loc></url>"
        "<url><loc>https://s.example/private/x</loc></url>"
        "</urlset>"
    )
    index = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://s.example/more.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    pages = spark.createDataFrame(
        [("https://s.example/sitemap.xml", urlset),
         ("https://s.example/index.xml", index)],
        ["url", "text"],
    )
    ent = W.sitemap_entries(pages)
    got = {(r.loc, r.is_index) for r in ent.collect()}
    assert got == {
        ("https://s.example/page1", False),
        ("https://s.example/page2?a=1&b=2", False),
        ("https://s.example/private/x", False),
        ("https://s.example/more.xml", True),
    }
    # frontier: page1 already seen; /private disallowed by robots
    edges = spark.createDataFrame(
        [("https://s.example/", "https://s.example/linked")],
        ["src_url", "dst_url"],
    )
    seen = spark.createDataFrame([("https://s.example/page1",)], ["url"])
    rules = R.robots_rules(
        spark.createDataFrame(
            [("s.example", "User-agent: *\nDisallow: /private\n")],
            ["host", "body"],
        )
    )
    frontier = {
        r.url
        for r in W.crawl_frontier(
            edges, seen, rules=rules,
            sitemaps=ent.filter(~F.col("is_index")),
        ).collect()
    }
    assert frontier == {
        "https://s.example/linked",
        "https://s.example/page2?a=1&b=2",
    }


def test_crawl_frontier_delay_budget(spark):
    """A declared Crawl-delay tightens the per-host budget: at
    round_seconds=10 a 2-second delay admits 5 URLs, a 100-second
    delay still admits 1 (a delay slows a host, it never bans it),
    and hosts without a delay keep the flat cap."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark import robots as R

    edges = spark.createDataFrame(
        [("https://h.example/", f"https://slow.example/p{i}") for i in range(8)]
        + [("https://h.example/", f"https://crawl.example/p{i}") for i in range(8)]
        + [("https://h.example/", f"https://free.example/p{i}") for i in range(8)],
        ["src_url", "dst_url"],
    )
    seen = spark.createDataFrame([("none://",)], ["url"])
    delays = spark.createDataFrame(
        [("slow.example", 100.0), ("crawl.example", 2.0)],
        ["host", "crawl_delay"],
    )
    got = [
        r.url
        for r in W.crawl_frontier(
            edges, seen, delays=delays, limit_per_domain=6,
            round_seconds=10.0,
        ).collect()
    ]
    by_host = {}
    for u in got:
        by_host.setdefault(u.split("/")[2], []).append(u)
    assert len(by_host["slow.example"]) == 1
    assert len(by_host["crawl.example"]) == 5
    assert len(by_host["free.example"]) == 6  # flat cap only
    # no flat cap: only delayed hosts are budgeted
    got2 = [
        r.url
        for r in W.crawl_frontier(
            edges, seen, delays=delays, round_seconds=10.0
        ).collect()
    ]
    by2 = {}
    for u in got2:
        by2.setdefault(u.split("/")[2], []).append(u)
    assert len(by2["free.example"]) == 8
    assert len(by2["crawl.example"]) == 5


def test_crawl_frontier_prioritize_by_indegree(spark):
    """prioritize=True spends a scarce per-host budget on the
    most-linked candidates (in-degree over this round's harvest, md5
    tie-break) instead of md5-random; slash/query variants pool their
    in-links under one normal form; default behavior is unchanged."""
    edges = spark.createDataFrame(
        # hot: 3 in-links across slash variants; warm: 2; the rest: 1
        [("https://s.example/a", "https://pr.example/hot"),
         ("https://s.example/b", "https://pr.example/hot/"),
         ("https://s.example/c", "https://pr.example/hot?ref=1"),
         ("https://s.example/a", "https://pr.example/warm"),
         ("https://s.example/b", "https://pr.example/warm"),
         ("https://s.example/a", "https://pr.example/cold1"),
         ("https://s.example/b", "https://pr.example/cold2"),
         ("https://s.example/c", "https://pr.example/cold3")],
        ["src_url", "dst_url"],
    )
    seen = spark.createDataFrame([("none://",)], ["url"])
    got = {
        r.url
        for r in W.crawl_frontier(
            edges, seen, limit_per_domain=2, prioritize=True
        ).collect()
    }
    assert len(got) == 2
    # the hot page (under ONE of its variant spellings) and warm win
    assert any(u.startswith("https://pr.example/hot") for u in got)
    assert "https://pr.example/warm" in got
    # without a budget, prioritization changes nothing about the set
    all_f = {
        r.url for r in W.crawl_frontier(edges, seen, prioritize=True).collect()
    }
    assert len(all_f) == 5  # hot(1 of 3 variants) + warm + 3 cold


def test_crawl_frontier_duplicate_delay_rows_no_fanout(spark):
    """robots_bodies can emit several (host, body) rows per host
    (refetches, http+https twins) → several delay rows; the frontier
    join must not fan out URLs or let duplicates eat the budget, and
    the conservative (largest) delay wins."""
    edges = spark.createDataFrame(
        [("https://h.example/", f"https://dup.example/p{i}") for i in range(8)],
        ["src_url", "dst_url"],
    )
    seen = spark.createDataFrame([("none://",)], ["url"])
    delays = spark.createDataFrame(
        [("dup.example", 2.0), ("dup.example", 5.0), ("dup.example", 2.0)],
        ["host", "crawl_delay"],
    )
    got = [
        r.url
        for r in W.crawl_frontier(
            edges, seen, delays=delays, round_seconds=10.0
        ).collect()
    ]
    # no duplicate URLs from the join fan-out
    assert len(got) == len(set(got))
    # 5 s delay (conservative max) at 10 s round → 2 distinct pages
    assert len(got) == 2


def test_crawl_round_auto_politeness(spark, tmp_path):
    """auto_politeness=True derives the WHOLE politeness layer from
    the archive's own records: robots rules filter the frontier,
    Crawl-delay caps the per-host budget, and sitemap locs seed
    candidates nothing links to."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    def rec(rid, uri, body, ctype="text/html; charset=utf-8"):
        return {
            "record_id": f"<urn:uuid:{rid}>",
            "warc_type": "response",
            "target_uri": uri,
            "warc_date": "2026-08-15T00:00:00Z",
            "content_type": "application/http; msgtype=response",
            "block": W.http_response_block(body, content_type=ctype),
        }

    robots_txt = (
        b"User-agent: *\nDisallow: /private\nCrawl-delay: 5\n"
        b"Sitemap: https://ap.example/sitemap.xml\n"
    )
    sitemap_xml = (
        b'<?xml version="1.0"?><urlset>'
        b"<url><loc>https://ap.example/orphan1</loc></url>"
        b"<url><loc>https://ap.example/orphan2</loc></url>"
        b"<url><loc>https://ap.example/private/secret</loc></url>"
        b"</urlset>"
    )
    links = "".join(
        f'<a href="https://ap.example/linked{i}">x</a>' for i in range(6)
    )
    page = (
        "<html><head><title>t</title></head><body><p>"
        + ("crawl content word " * 30)
        + "</p>"
        + links
        + '<a href="https://ap.example/private/p">x</a></body></html>'
    ).encode()
    (tmp_path / "ap.warc").write_bytes(
        W.build_warc(
            [
                rec("r", "https://ap.example/robots.txt", robots_txt,
                    "text/plain"),
                rec("s", "https://ap.example/sitemap.xml", sitemap_xml,
                    "application/xml"),
                rec("p", "https://ap.example/", page),
            ]
        )
    )
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    rep = W.crawl_round(
        spark, store, str(tmp_path / "ap.warc"),
        auto_politeness=True, round_seconds=20.0,
    )
    frontier = [r.url for r in rep["frontier"].collect()]
    # delay 5s at a 20s round => at most 4 URLs for this host
    assert len(frontier) == 4
    assert all("/private" not in u for u in frontier)
    # sitemap orphans compete within the same budgeted pool
    candidates = {f"https://ap.example/linked{i}" for i in range(6)} | {
        "https://ap.example/orphan1",
        "https://ap.example/orphan2",
    }
    assert set(frontier) <= candidates
    # without the delay budget the orphans are definitely present
    rep2 = W.crawl_round(
        spark, store, str(tmp_path / "ap.warc"),
        auto_politeness=True, round_seconds=1e6,
        batch=rep["batch"],
    )
    f2 = {r.url for r in rep2["frontier"].collect()}
    assert {"https://ap.example/orphan1", "https://ap.example/orphan2"} <= f2
    assert all("/private" not in u for u in f2)


# ---------------------------------------------------------------------------
# persistent crawl state (r9 verdict item 4)
# ---------------------------------------------------------------------------


def _mk_rec(rid, uri, body, ctype="text/html; charset=utf-8"):
    return {
        "record_id": f"<urn:uuid:{rid}>",
        "warc_type": "response",
        "target_uri": uri,
        "warc_date": "2026-08-15T00:00:00Z",
        "content_type": "application/http; msgtype=response",
        "block": W.http_response_block(body, content_type=ctype),
    }


def _mk_page(rid, uri, text, hrefs=()):
    body = (
        "<html><head><title>t</title></head><body><p>"
        + text
        + "</p>"
        + "".join(f'<a href="{h}"></a>' for h in hrefs)
        + "</body></html>"
    ).encode()
    return _mk_rec(rid, uri, body)


def test_crawl_resumable_across_sessions(spark, tmp_path):
    """The 3-round frontier-consumption composition re-run as three
    separate GraphStore + CrawlState openings (process-restart
    simulation: fresh objects each round, state only on disk) produces
    the identical graph, text index, and frontier sequence as the
    in-process stateless loop — plus the state-only guarantees:
    replaying a completed archive is a recorded no-op, the ledger
    carries every round, and the cross-round backlog contains exactly
    the unfetched candidates."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S

    robots_txt = b"User-agent: *\nCrawl-delay: 5\n"
    root = "https://rs.example/"
    texts = {
        1: " ".join(f"resume corpus alpha{i}" for i in range(30)),
        2: " ".join(f"resume corpus beta{i}" for i in range(30)),
        3: " ".join(f"resume corpus gamma{i}" for i in range(30)),
    }
    p = [f"https://rs.example/p{i}" for i in range(4)]
    q = [f"https://rs.example/q{i}" for i in range(4)]

    archives = {}
    archives[1] = tmp_path / "r1.warc"
    archives[1].write_bytes(
        W.build_warc(
            [
                _mk_rec("rb1", "https://rs.example/robots.txt", robots_txt,
                        "text/plain"),
                _mk_page("root", root, texts[1], hrefs=p),
            ]
        )
    )

    def round2_archive(f1):
        a = tmp_path / "r2.warc"
        a.write_bytes(
            W.build_warc(
                [
                    _mk_rec("rb2", "https://rs.example/robots.txt",
                            robots_txt, "text/plain"),
                    _mk_page("f1a", f1[0], texts[2], hrefs=[root, q[0], q[1]]),
                    _mk_page("f1b", f1[1], texts[3], hrefs=[root, q[2], q[3]]),
                ]
            )
        )
        return a

    kw = dict(auto_politeness=True, round_seconds=10.0)

    # ---- reference: the stateless in-process loop -----------------------
    ref_store = GraphStore(spark, str(tmp_path / "ref_wh"))
    ref_store.init_schema()
    ref_ti = str(tmp_path / "ref_ti")
    r1 = W.crawl_round(spark, ref_store, str(archives[1]),
                       text_index=ref_ti, **kw)
    ref_f1 = sorted(r.url for r in r1["frontier"].collect())
    assert len(ref_f1) == 2  # Crawl-delay 5 at a 10 s round
    archives[2] = round2_archive(ref_f1)
    r2 = W.crawl_round(spark, ref_store, str(archives[2]),
                       text_index=ref_ti, **kw)
    ref_f2 = sorted(r.url for r in r2["frontier"].collect())
    assert len(ref_f2) == 2

    # ---- resumable: a fresh GraphStore + CrawlState per round -----------
    wh, ti, sd = (str(tmp_path / d) for d in ("res_wh", "res_ti", "res_state"))

    def session():
        st = GraphStore(spark, wh)
        st.init_schema()
        return st

    s1 = W.crawl_round_resumable(spark, session(), str(archives[1]), sd,
                                 text_index=ti, **kw)
    assert s1["replayed"] is False and s1["round_no"] == 1
    res_f1 = sorted(r.url for r in s1["frontier"].collect())
    assert res_f1 == ref_f1  # identical frontier sequence

    s2 = W.crawl_round_resumable(spark, session(), str(archives[2]), sd,
                                 text_index=ti, **kw)
    assert s2["round_no"] == 2
    res_f2 = sorted(r.url for r in s2["frontier"].collect())
    assert res_f2 == ref_f2

    # round 3 serves frontier 2 (fresh content, no onward links)
    archives[3] = tmp_path / "r3.warc"
    archives[3].write_bytes(
        W.build_warc(
            [
                _mk_rec("rb3", "https://rs.example/robots.txt", robots_txt,
                        "text/plain"),
                _mk_page("f2a", ref_f2[0],
                         " ".join(f"late vocabulary item{i}" for i in range(30))),
                _mk_page("f2b", ref_f2[1],
                         " ".join(f"other vocabulary word{i}" for i in range(30))),
            ]
        )
    )
    r3 = W.crawl_round(spark, ref_store, str(archives[3]),
                       text_index=ref_ti, **kw)
    s3 = W.crawl_round_resumable(spark, session(), str(archives[3]), sd,
                                 text_index=ti, **kw)
    assert sorted(r.url for r in s3["frontier"].collect()) == sorted(
        r.url for r in r3["frontier"].collect()
    )

    # identical graph and text index at the end of round 3
    ref_urls = sorted(r.url for r in ref_store.graph().links.collect())
    res_urls = sorted(r.url for r in session().graph().links.collect())
    assert res_urls == ref_urls
    for term in ("alpha3", "beta3", "item3"):
        ref_hit = [(r.doc_id,) for r in
                   S.bm25_from_index(spark, ref_ti, (term,), k=10).collect()]
        res_hit = [(r.doc_id,) for r in
                   S.bm25_from_index(spark, ti, (term,), k=10).collect()]
        assert res_hit == ref_hit and ref_hit

    # ---- state-only guarantees ------------------------------------------
    state = CrawlState(spark, sd)
    # ledger: one row per round, counts as reported
    led = {r.batch_id: r for r in state.ledger().collect()}
    assert len(led) == 3
    assert led[s1["batch"]].n_docs_indexed == 1

    # replaying a completed archive is a recorded no-op: stored counts,
    # stored frontier, graph and index untouched
    before = res_urls
    rep = W.crawl_round_resumable(spark, session(), str(archives[2]), sd,
                                  text_index=ti, **kw)
    assert rep["replayed"] is True
    assert rep["frontier_scoped"] is False  # no fold yet: exact rows
    assert rep["n_docs_indexed"] == s2["n_docs_indexed"]
    assert sorted(r.url for r in rep["frontier"].collect()) == res_f2
    assert sorted(r.url for r in session().graph().links.collect()) == before

    # backlog: every stored candidate not yet fetched = frontier 3 only
    # (f1 and f2 were consumed by rounds 2 and 3)
    backlog = [r.url for r in
               state.backlog(session().graph().links).collect()]
    assert sorted(backlog) == sorted(
        r.url for r in s3["frontier"].collect()
    )

    # politeness memory: the strictest delay each host declared
    d = {r.host: r.crawl_delay for r in state.delays().collect()}
    assert d.get("rs.example") == 5.0

    # compaction folds the round partitions; replay detection and the
    # per-round frontier reads survive (batch_id is a data column)
    repc = state.compact()
    assert repc["files_after"] <= repc["files_before"]
    assert state.has_round(s2["batch"])
    assert sorted(r.url for r in state.frontier_of(s2["batch"]).collect()) \
        == res_f2
    rep2 = W.crawl_round_resumable(spark, session(), str(archives[1]), sd,
                                   text_index=ti, **kw)
    assert rep2["replayed"] is True
    # ADVICE r13: a replay AFTER the fold flags its frontier read as
    # the backlog-canonical scoped one (a zero-frontier round reads
    # identically either way and stays unflagged)
    assert rep2["frontier_scoped"] is (rep2["n_frontier"] > 0)


def test_crawl_resumable_delay_carry_over(spark, tmp_path):
    """Per-host budget carry-over: round 2's archive carries NO robots
    response, but the state dir remembers round 1's Crawl-delay, so
    the budget still caps round 2's frontier (the stateless loop would
    let the whole frontier through)."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    robots_txt = b"User-agent: *\nCrawl-delay: 5\n"
    root = "https://co.example/"
    p = [f"https://co.example/p{i}" for i in range(4)]
    q = [f"https://co.example/q{i}" for i in range(6)]
    (tmp_path / "c1.warc").write_bytes(
        W.build_warc(
            [
                _mk_rec("rb1", "https://co.example/robots.txt", robots_txt,
                        "text/plain"),
                _mk_page("root", root,
                         " ".join(f"carry tok{i}" for i in range(30)),
                         hrefs=p),
            ]
        )
    )
    wh, sd = str(tmp_path / "wh"), str(tmp_path / "state")
    store = GraphStore(spark, wh)
    store.init_schema()
    kw = dict(auto_politeness=True, round_seconds=10.0)
    s1 = W.crawl_round_resumable(spark, store, str(tmp_path / "c1.warc"),
                                 sd, **kw)
    f1 = sorted(r.url for r in s1["frontier"].collect())
    assert len(f1) == 2  # floor(10 / 5)

    # round 2: robots-less archive serving f1, linking 6 new pages
    (tmp_path / "c2.warc").write_bytes(
        W.build_warc(
            [
                _mk_page("f1a", f1[0],
                         " ".join(f"carry second tok{i}" for i in range(30)),
                         hrefs=q[:3]),
                _mk_page("f1b", f1[1],
                         " ".join(f"carry third tok{i}" for i in range(30)),
                         hrefs=q[3:]),
            ]
        )
    )
    store2 = GraphStore(spark, wh)  # fresh opening
    s2 = W.crawl_round_resumable(spark, store2, str(tmp_path / "c2.warc"),
                                 sd, **kw)
    f2 = [r.url for r in s2["frontier"].collect()]
    # the remembered Crawl-delay 5 still budgets the host to 2/round
    assert len(f2) == 2 and set(f2) <= set(q)


def test_streaming_crawl_round_compacts_over_threshold(spark, tmp_path):
    """r9 verdict item 5: the streaming twin gets crawl_round's
    compact_threshold — a long-running stream no longer fragments its
    postings/SQ8 stores unboundedly. Micro-batches are driven by
    re-draining the SAME checkpoint as new archives land (ids stay
    monotonic); after the fold every store row sits in segment 0,
    query results are unchanged, and a replayed (fresh-checkpoint)
    drain over the already-folded content still no-ops."""
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S
    from webpagesgraphdatabase_spark.operators._util import (
        count_parquet_files,
    )

    land = tmp_path / "land"
    land.mkdir()
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    ti, si = str(tmp_path / "ti"), str(tmp_path / "si")
    vocab = {
        1: "alpha unique words first",
        2: "beta different vocabulary second",
        3: "gamma further terms third",
    }

    def add_archive(i):
        (land / f"a{i}.warc").write_bytes(
            W.build_warc(
                [
                    {
                        "record_id": f"<urn:uuid:s{i}>",
                        "warc_type": "response",
                        "target_uri": f"https://st.example/x{i}",
                        "warc_date": "2026-08-15T00:00:00Z",
                        "content_type": "application/http; msgtype=response",
                        "block": W.http_response_block(
                            (
                                "<html><head><title>t</title></head><body>"
                                f"<p>{vocab[i]}</p></body></html>"
                            ).encode()
                        ),
                    }
                ]
            )
        )

    def drain(ck):
        W.streaming_crawl_round(
            spark, store, str(land), str(tmp_path / ck),
            text_index=ti, sq8_index=si, compact_threshold=2,
        )

    for i in (1, 2, 3):
        add_archive(i)
        drain("ck1")  # same checkpoint: one new file = one micro-batch

    # the census crossed the threshold at least once: every surviving
    # row was folded into segment 0 (the last drain folds its own
    # append too)
    posts = spark.read.parquet(f"{ti}/postings.parquet")
    assert {r.batch for r in posts.select("batch").distinct().collect()} == {0}
    sq8 = spark.read.parquet(f"{si}/sq8.parquet")
    assert {r.batch for r in sq8.select("batch").distinct().collect()} == {0}

    # results row-identical to what three un-fragmented batches serve
    for term, n in (("alpha", 1), ("beta", 1), ("gamma", 1)):
        assert len(S.bm25_from_index(spark, ti, (term,), k=5).collect()) == n
    g1 = _graph_state(store)
    i1 = _index_state(spark, ti, si)
    files_before = count_parquet_files(f"{ti}/postings.parquet")

    # fresh checkpoint = full replay in one micro-batch whose id (1)
    # sits at/below the fold watermark: the index appends no-op, the
    # graph preload anti-joins to nothing — bit-identical stores
    drain("ck2")
    assert _graph_state(store) == g1
    assert _index_state(spark, ti, si) == i1
    assert count_parquet_files(f"{ti}/postings.parquet") == files_before


def test_streaming_crawl_round_stateful_equals_batch(spark, tmp_path):
    """r10 verdict item 3: with ``state_dir`` the streamed crawl is
    resumable like the batch loop — a 2-archive streamed run (both
    files in ONE micro-batch, exercising the per-file round
    decomposition) produces a state dir ledger/frontier/backlog/
    delays/rules-equal to ``crawl_round_resumable`` over the same
    archives, the same graph and text index, and a fresh-checkpoint
    replay of the drained landing dir is a per-file recorded no-op.
    The id spaces are ONE: the batch loop replay-detects rounds the
    stream committed."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S

    robots_txt = (
        b"User-agent: *\nCrawl-delay: 5\nDisallow: /private\n"
    )
    root = "https://se.example/"
    p = [f"{root}p{i}" for i in range(4)] + [f"{root}private/z"]

    a1 = tmp_path / "land" / "a1.warc"
    a1.parent.mkdir()
    a1.write_bytes(
        W.build_warc(
            [
                _mk_rec("rb1", f"{root}robots.txt", robots_txt,
                        "text/plain"),
                _mk_page("root", root,
                         " ".join(f"stream eq alpha{i}" for i in range(30)),
                         hrefs=p),
            ]
        )
    )
    kw = dict(auto_politeness=True, round_seconds=10.0)

    # ---- batch reference: the resumable loop ----------------------------
    wb = GraphStore(spark, str(tmp_path / "wh_b"))
    wb.init_schema()
    sdb, tib = str(tmp_path / "sd_b"), str(tmp_path / "ti_b")
    r1 = W.crawl_round_resumable(spark, wb, str(a1), sdb,
                                 text_index=tib, **kw)
    f1 = sorted(r.url for r in r1["frontier"].collect())
    assert len(f1) == 2  # delay 5 @ 10 s; /private/z robots-dropped
    a2 = tmp_path / "land" / "a2.warc"
    a2.write_bytes(
        W.build_warc(
            [
                _mk_page("f1a", f1[0],
                         " ".join(f"stream eq beta{i}" for i in range(30)),
                         hrefs=[f"{root}q0", f"{root}private/w"]),
            ]
        )
    )
    r2 = W.crawl_round_resumable(spark, wb, str(a2), sdb,
                                 text_index=tib, **kw)

    # ---- streamed twin: both archives in ONE availableNow drain ---------
    ws = GraphStore(spark, str(tmp_path / "wh_s"))
    ws.init_schema()
    sds, tis = str(tmp_path / "sd_s"), str(tmp_path / "ti_s")
    W.streaming_crawl_round(
        spark, ws, str(tmp_path / "land"), str(tmp_path / "ck1"),
        text_index=tis, state_dir=sds, **kw,
    )

    def ledger_rows(sd):
        return sorted(
            (r.batch_id, r.round_no, r.n_links_inserted, r.n_docs_indexed,
             r.n_cross_dup, r.n_revisits, r.n_frontier)
            for r in CrawlState(spark, sd).ledger().collect()
        )

    # ledger equal (minus the archive string: path vs file: URI)
    assert ledger_rows(sds) == ledger_rows(sdb)
    sb, ss = CrawlState(spark, sdb), CrawlState(spark, sds)
    for bid in (r1["batch"], r2["batch"]):
        assert sorted(
            (r.url, r.indeg) for r in ss.frontier_of(bid).collect()
        ) == sorted((r.url, r.indeg) for r in sb.frontier_of(bid).collect())
    assert sorted(
        (r.url, r.indeg) for r in ss.backlog().collect()
    ) == sorted((r.url, r.indeg) for r in sb.backlog().collect())
    assert {
        (r.host, r.crawl_delay) for r in ss.delays().collect()
    } == {(r.host, r.crawl_delay) for r in sb.delays().collect()}
    assert {
        (r.host, r.allow, r.pattern) for r in ss.rules().collect()
    } == {(r.host, r.allow, r.pattern) for r in sb.rules().collect()}
    # graph + index equal
    assert sorted(r.url for r in ws.graph().links.collect()) == sorted(
        r.url for r in wb.graph().links.collect()
    )
    for term in ("alpha3", "beta3"):
        assert [
            r.doc_id
            for r in S.bm25_from_index(spark, tis, (term,), k=5).collect()
        ] == [
            r.doc_id
            for r in S.bm25_from_index(spark, tib, (term,), k=5).collect()
        ]

    # fresh-checkpoint replay: every file adjudicates against its own
    # ledger row — nothing re-ingests, nothing re-records
    g1 = _graph_state(ws)
    led_before = ledger_rows(sds)
    posts = spark.read.parquet(f"{tis}/postings.parquet").count()
    W.streaming_crawl_round(
        spark, ws, str(tmp_path / "land"), str(tmp_path / "ck2"),
        text_index=tis, state_dir=sds, **kw,
    )
    assert ledger_rows(sds) == led_before
    assert _graph_state(ws) == g1
    assert spark.read.parquet(f"{tis}/postings.parquet").count() == posts

    # one id space: the BATCH loop sees the stream's rounds as done
    rep = W.crawl_round_resumable(spark, ws, str(a1), sds,
                                  text_index=tis, **kw)
    assert rep["replayed"] is True


def test_crawl_state_next_fetch_plan(spark, tmp_path):
    """The at-rest scheduler plan: backlog minus seen, robots-filtered,
    per-host budget from the STORED Crawl-delay — computable by a
    resumed process with no new archive (the operational pop the
    backlog diagnostic lacks)."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    sd = str(tmp_path / "state")
    state = CrawlState(spark, sd)
    # two recorded rounds: host a.example declared Crawl-delay 5, four
    # candidates with distinct in-degrees; host b.example no delay
    f1 = spark.createDataFrame(
        [("https://a.example/p1", 4), ("https://a.example/p2", 3),
         ("https://b.example/q1", 1)],
        "url string, indeg long",
    )
    rec1 = state.record_round(101, "r1.warc", {"n_docs_indexed": 1}, f1,
                              delays=spark.createDataFrame(
                                  [("a.example", 5.0)],
                                  "host string, crawl_delay double"))
    assert rec1["round_no"] == 1 and rec1["n_frontier"] == 3
    f2 = spark.createDataFrame(
        [("https://a.example/p3", 9), ("https://a.example/p2", 1),
         ("https://b.example/q2", 2)],
        "url string, indeg long",
    )
    assert state.record_round(
        102, "r2.warc", {"n_docs_indexed": 1}, f2
    )["round_no"] == 2

    # seen: p1 was fetched since
    seen = spark.createDataFrame([("https://a.example/p1",)], ["url"])
    # robots: q2 is disallowed
    rules = R.robots_rules(
        spark.createDataFrame(
            [("b.example", "User-agent: *\nDisallow: /q2\n")],
            ["host", "body"],
        )
    )
    plan = {
        r.url: r.indeg
        for r in state.next_fetch_plan(
            seen=seen, rules=rules, round_seconds=10.0
        ).collect()
    }
    # a.example budget floor(10/5)=2: p3 (indeg 9) and p2 (max-merged
    # indeg 3 across rounds) win; p1 is seen; q2 robots-dropped; q1
    # passes (no delay for b.example)
    assert plan == {
        "https://a.example/p3": 9,
        "https://a.example/p2": 3,
        "https://b.example/q1": 1,
    }
    # flat cap composes: 1 per domain keeps only the top candidate
    plan1 = {
        r.url
        for r in state.next_fetch_plan(
            seen=seen, rules=rules, limit_per_domain=1, round_seconds=10.0
        ).collect()
    }
    assert plan1 == {"https://a.example/p3", "https://b.example/q1"}


def test_crawl_resumable_state_compact_threshold(spark, tmp_path):
    """state_compact_threshold folds the state dir's own round
    partitions when they fragment; replay detection, frontier reads,
    and the next fetch plan survive the fold (batch_id is data)."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    root = "https://sc.example/"
    wh, sd = str(tmp_path / "wh"), str(tmp_path / "state")
    store = GraphStore(spark, wh)
    store.init_schema()
    reports = {}
    for i in (1, 2):
        (tmp_path / f"s{i}.warc").write_bytes(
            W.build_warc(
                [
                    _mk_page(
                        f"pg{i}", f"{root}v{i}",
                        " ".join(f"state round{i} tok{j}" for j in range(20)),
                        hrefs=[f"{root}n{i}a", f"{root}n{i}b"],
                    )
                ]
            )
        )
        reports[i] = W.crawl_round_resumable(
            spark, store, str(tmp_path / f"s{i}.warc"), sd,
            state_compact_threshold=1,
        )
    assert "state_compacted" in reports[2]
    rep = reports[2]["state_compacted"]
    assert rep["files_after"] <= rep["files_before"]
    state = CrawlState(spark, sd)
    # replay detection and per-round reads survive the fold
    assert state.has_round(reports[1]["batch"])
    assert sorted(r.url for r in
                  state.frontier_of(reports[1]["batch"]).collect()) == [
        f"{root}n1a", f"{root}n1b"
    ]
    replay = W.crawl_round_resumable(
        spark, store, str(tmp_path / "s1.warc"), sd,
        state_compact_threshold=1,
    )
    assert replay["replayed"] is True
    # the fetch plan still sees all four unfetched candidates
    plan = {r.url for r in
            state.next_fetch_plan(seen=store.graph().links).collect()}
    assert plan == {f"{root}n{i}{s}" for i in (1, 2) for s in "ab"}


def test_crawl_resumable_empty_frontier_and_no_robots(spark, tmp_path):
    """Review regressions: a terminal round (no out-links) and an
    archive with no robots responses must both COMMIT and leave the
    state dir fully readable — the empty-frame dynamic appends create
    file-less store dirs that every later read has to tolerate."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    wh, sd = str(tmp_path / "wh"), str(tmp_path / "state")
    store = GraphStore(spark, wh)
    store.init_schema()
    # round 1: a page with NO out-links and NO robots record, with
    # auto_politeness on (crawl_delays yields an EMPTY frame, not None)
    (tmp_path / "e1.warc").write_bytes(
        W.build_warc(
            [_mk_page("solo", "https://ef.example/only",
                      " ".join(f"terminal tok{i}" for i in range(20)))]
        )
    )
    s1 = W.crawl_round_resumable(
        spark, store, str(tmp_path / "e1.warc"), sd,
        auto_politeness=True, round_seconds=10.0,
    )
    assert s1["replayed"] is False and s1["n_frontier"] == 0
    state = CrawlState(spark, sd)
    assert state.has_round(s1["batch"])  # the round COMMITTED
    assert state.frontier_of(s1["batch"]).count() == 0
    assert state.delays().count() == 0
    assert state.backlog().count() == 0

    # round 2 still works end-to-end on the same state dir
    (tmp_path / "e2.warc").write_bytes(
        W.build_warc(
            [_mk_page("two", "https://ef.example/second",
                      " ".join(f"second tok{i}" for i in range(20)),
                      hrefs=["https://ef.example/n1"])]
        )
    )
    s2 = W.crawl_round_resumable(
        spark, store, str(tmp_path / "e2.warc"), sd,
        auto_politeness=True, round_seconds=10.0,
    )
    assert s2["n_frontier"] == 1
    # the replay of the terminal round stays a no-op and carries the
    # shape-compatible summary (round_no present on replays too)
    rep = W.crawl_round_resumable(
        spark, store, str(tmp_path / "e1.warc"), sd,
        auto_politeness=True, round_seconds=10.0,
    )
    assert rep["replayed"] is True and rep["round_no"] == 1
    # compaction tolerates the file-less hosts store
    out = state.compact()
    assert out["files_after"] <= out["files_before"]


def test_crawl_state_records_own_delays_only(spark, tmp_path):
    """Review regression: the hosts store records each archive's OWN
    robots declarations, not the merged history re-unioned every round
    (which would grow O(rounds x hosts))."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    robots_txt = b"User-agent: *\nCrawl-delay: 5\n"
    wh, sd = str(tmp_path / "wh"), str(tmp_path / "state")
    store = GraphStore(spark, wh)
    store.init_schema()
    (tmp_path / "d1.warc").write_bytes(
        W.build_warc(
            [
                _mk_rec("rb", "https://od.example/robots.txt", robots_txt,
                        "text/plain"),
                _mk_page("p1", "https://od.example/a", "own delays one"),
            ]
        )
    )
    (tmp_path / "d2.warc").write_bytes(
        W.build_warc(
            [_mk_page("p2", "https://od.example/b", "own delays two")]
        )
    )
    W.crawl_round_resumable(spark, store, str(tmp_path / "d1.warc"), sd,
                            auto_politeness=True)
    W.crawl_round_resumable(spark, store, str(tmp_path / "d2.warc"), sd,
                            auto_politeness=True)
    state = CrawlState(spark, sd)
    rows = spark.read.parquet(f"{sd}/hosts.parquet").collect()
    # one declaration from round 1; round 2's robots-less archive adds
    # nothing (the merged-history re-record would have duplicated it)
    assert len(rows) == 1 and rows[0].host == "od.example"
    assert {r.host: r.crawl_delay for r in state.delays().collect()} == {
        "od.example": 5.0
    }


def test_crawl_state_rules_memory(spark, tmp_path):
    """r10 verdict item 1: the state dir remembers allow/disallow
    rules and next_fetch_plan applies them BY DEFAULT — latest robots
    per host wins whole (a changed rule set replaces, a rule-less one
    clears), and a caller-supplied live table lays over the memory
    with whole-host precedence."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    state = CrawlState(spark, str(tmp_path / "state"))
    cand = spark.createDataFrame(
        [("https://rm.example/private/x", 5), ("https://rm.example/ok", 2)],
        "url string, indeg long",
    )
    r1_rules = R.robots_rules(
        spark.createDataFrame(
            [("rm.example", "User-agent: *\nDisallow: /private\n")],
            ["host", "body"],
        )
    )
    state.record_round(
        401, "r1.warc", {"n_docs_indexed": 1}, cand, rules=r1_rules
    )
    # the stored rules filter the plan with NO rule table passed
    plan = {r.url for r in state.next_fetch_plan().collect()}
    assert plan == {"https://rm.example/ok"}
    # the diagnostic backlog stays unfiltered (it reports what is
    # stored; the plan is the operational, adjudicated read)
    assert state.backlog().count() == 2

    # round 2: the host's robots.txt emptied — the NULL-pattern marker
    # row (what crawl_round records for a rule-less robots body)
    # CLEARS the memory; the old Disallow must not fossilize
    marker = spark.createDataFrame(
        [("rm.example", None, None, None, None)],
        "host string, allow boolean, pattern string, rx string, plen int",
    )
    state.record_round(
        402, "r2.warc", {"n_docs_indexed": 1},
        cand.filter("indeg < 0"), rules=marker,
    )
    plan = {r.url for r in state.next_fetch_plan().collect()}
    assert plan == {"https://rm.example/ok", "https://rm.example/private/x"}

    # round 3: the rules change again — only the LATEST set applies
    r3_rules = R.robots_rules(
        spark.createDataFrame(
            [("rm.example", "User-agent: *\nDisallow: /ok\n")],
            ["host", "body"],
        )
    )
    state.record_round(
        403, "r3.warc", {"n_docs_indexed": 1},
        cand.filter("indeg < 0"), rules=r3_rules,
    )
    assert {r.url for r in state.next_fetch_plan().collect()} == {
        "https://rm.example/private/x"
    }
    # rules survive state compaction (round_no rides as data)
    state.compact()
    assert {r.url for r in state.next_fetch_plan().collect()} == {
        "https://rm.example/private/x"
    }
    # a caller-supplied live table wins whole-host over the memory
    live = R.robots_rules(
        spark.createDataFrame(
            [("rm.example", "User-agent: *\nDisallow: /nothing\n")],
            ["host", "body"],
        )
    )
    assert {r.url for r in state.next_fetch_plan(rules=live).collect()} == {
        "https://rm.example/ok", "https://rm.example/private/x"
    }


def test_crawl_resumable_rules_carry_over(spark, tmp_path):
    """The r10 verdict's done criterion: a frontier candidate recorded
    BEFORE its host's robots body was ever fetched is re-adjudicated
    by the rule memory on resume — round 1 (no robots) stores a
    /private candidate; round 2's archive carries the Disallow; a
    LATER session's next_fetch_plan (and the ops route's plan) never
    surfaces it, with no archive re-read."""
    from webpagesgraphdatabase_spark.app import create_app
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    root = "https://rc.example/"
    wh, sd = str(tmp_path / "wh"), str(tmp_path / "state")
    store = GraphStore(spark, wh)
    store.init_schema()
    kw = dict(auto_politeness=True, round_seconds=10.0)

    # round 1: NO robots response; the root links /private/x and /pub
    (tmp_path / "rc1.warc").write_bytes(
        W.build_warc(
            [_mk_page("root", root,
                      " ".join(f"carry rule tok{i}" for i in range(20)),
                      hrefs=[f"{root}private/x", f"{root}pub"])]
        )
    )
    s1 = W.crawl_round_resumable(spark, store, str(tmp_path / "rc1.warc"),
                                 sd, **kw)
    f1 = sorted(r.url for r in s1["frontier"].collect())
    assert f1 == [f"{root}private/x", f"{root}pub"]  # nothing known yet

    # round 2: the robots body arrives (Disallow /private) + /pub is
    # fetched, linking one more page
    (tmp_path / "rc2.warc").write_bytes(
        W.build_warc(
            [
                _mk_rec("rb", f"{root}robots.txt",
                        b"User-agent: *\nDisallow: /private\n",
                        "text/plain"),
                _mk_page("pub", f"{root}pub",
                         " ".join(f"pub page tok{i}" for i in range(20)),
                         hrefs=[f"{root}more", f"{root}private/y"]),
            ]
        )
    )
    s2 = W.crawl_round_resumable(spark, store, str(tmp_path / "rc2.warc"),
                                 sd, **kw)
    # round 2's own frontier already drops its own /private link
    assert sorted(r.url for r in s2["frontier"].collect()) == [f"{root}more"]

    # a FRESH session: the backlog still holds /private/x, but the
    # plan re-adjudicates it against the remembered rules
    store2 = GraphStore(spark, wh)
    state = CrawlState(spark, sd)
    assert f"{root}private/x" in {
        r.url for r in state.backlog(store2.graph().links).collect()
    }
    plan = {
        r.url
        for r in state.next_fetch_plan(seen=store2.graph().links).collect()
    }
    assert plan == {f"{root}more"}
    # and through the ops route (which passes no rule table)
    app = create_app(store2, crawl_state_path=sd)
    body = app.test_client().get(
        "/crawl/state?plan=1&round_seconds=10"
    ).get_json()
    assert {p["url"] for p in body["plan"]} == {f"{root}more"}


def test_crawl_state_compact_preserves_mid_crash_round(spark, tmp_path):
    """ADVICE r10: a compact() that runs BETWEEN a crashed round's
    frontier append and its retry must not fold the uncommitted
    partition into segment 0 — the retry re-allocates the same round
    number and dynamic-overwrites its own partition, which can never
    reach rows a fold froze at batch 0. Fold only committed rounds."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.operators.store_lifecycle import (
        allocate_batch,
        dynamic_append,
    )

    state = CrawlState(spark, str(tmp_path / "state"))
    f1 = spark.createDataFrame(
        [("https://mc.example/a", 1)], "url string, indeg long"
    )
    assert state.record_round(301, "r1.warc", {"n_docs_indexed": 1}, f1)[
        "round_no"
    ] == 1

    # round 2 crashes between the frontier append and the ledger row:
    # replicate record_round's write order up to the crash point
    rno = allocate_batch(
        spark, state.root, state._ledger, None, allow_missing=True
    )
    assert rno == 2
    stale = spark.createDataFrame(
        [("https://mc.example/x", 9), ("https://mc.example/y", 9)],
        "url string, indeg long",
    ).select(
        F.col("url"),
        F.col("indeg"),
        F.lit(302).alias("batch_id"),
        F.lit(int(rno)).alias("batch"),
    )
    dynamic_append(stale, state._frontier, ("batch",))
    assert not state.has_round(302)  # never committed

    # compact BEFORE the retry: committed round 1 folds, the crashed
    # partition stays at batch 2
    rep = state.compact()
    assert rep["watermark"] == 1
    left = {
        (r.url, r.batch)
        for r in spark.read.parquet(state._frontier).collect()
    }
    assert left == {
        ("https://mc.example/a", 0),
        ("https://mc.example/x", 2),
        ("https://mc.example/y", 2),
    }

    # the retry (same archive, DIFFERENT frontier content — e.g. a
    # doc_filter change between attempts) re-allocates round 2 and its
    # overwrite replaces the stale rows: no duplication, no inflation
    retry = spark.createDataFrame(
        [("https://mc.example/z", 3)], "url string, indeg long"
    )
    out = state.record_round(302, "r2.warc", {"n_docs_indexed": 1}, retry)
    assert out is not None and out["round_no"] == 2
    assert out["n_frontier"] == 1
    got = sorted(
        (r.url, r.indeg) for r in state.frontier_of(302).collect()
    )
    assert got == [("https://mc.example/z", 3)]
    # a later compact folds the now-committed round too
    state.compact()
    assert sorted(
        (r.url, r.indeg) for r in state.frontier_of(302).collect()
    ) == [("https://mc.example/z", 3)]
    assert state.has_round(302) and state.has_round(301)


def test_crawl_state_model_based_sequence(spark, tmp_path):
    """Model-based pin of the scheduler-state discipline: a scripted
    interleaving of record / replay / compact steps must always agree
    with a pure-Python model on ledger membership, per-round frontier
    content, backlog candidates (max-indeg per url), delay memory, and
    rule memory (latest-per-host replace, NULL-marker clears — r10
    verdict item 1) — compaction and replays at ANY point never change
    what a reader sees."""
    import random

    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    rng = random.Random(1009)
    state = CrawlState(spark, str(tmp_path / "state"))
    model_rounds: dict[int, list[tuple[str, int]]] = {}
    model_delays: dict[str, float] = {}
    model_rules: dict[str, set[tuple]] = {}
    hosts = ["h1.example", "h2.example", "h3.example"]

    def check():
        led = {r.batch_id for r in state.ledger().collect()}
        assert led == set(model_rounds)
        for bid, rows in model_rounds.items():
            assert state.has_round(bid)
            got = sorted(
                (r.url, r.indeg)
                for r in state.frontier_of(bid).collect()
            )
            assert got == sorted(rows)
        # backlog: max indeg per url across rounds (urls here are
        # already normal forms, distinct per round)
        expect: dict[str, int] = {}
        for rows in model_rounds.values():
            for u, d in rows:
                expect[u] = max(expect.get(u, 0), d)
        got_b = {r.url: r.indeg for r in state.backlog().collect()}
        assert got_b == expect
        got_d = {r.host: r.crawl_delay for r in state.delays().collect()}
        assert got_d == model_delays
        got_r = {
            (r.host, r.allow, r.pattern, r.rx, r.plen)
            for r in state.rules().collect()
        }
        assert got_r == {t for s in model_rules.values() for t in s}

    next_bid = 500
    recorded_bids: list[int] = []
    for step in range(8):
        op = ("record" if step in (0, 1, 3, 5, 7)
              else ("compact" if step in (2, 6) else "replay"))
        if op == "record":
            bid = next_bid
            next_bid += 1
            rows = [
                (f"https://{rng.choice(hosts)}/r{bid}/p{i}",
                 rng.randint(1, 9))
                for i in range(rng.randint(0, 3))
            ]
            f = spark.createDataFrame(
                rows or [("x", 0)], "url string, indeg long"
            )
            if not rows:
                f = f.filter("indeg < 0")  # genuinely empty frame
            d = None
            if rng.random() < 0.7:
                h = rng.choice(hosts)
                dv = float(rng.randint(1, 6))
                d = spark.createDataFrame(
                    [(h, dv)], "host string, crawl_delay double"
                )
                model_delays[h] = max(model_delays.get(h, 0.0), dv)
            ru = None
            if rng.random() < 0.7:
                # this archive's robots knowledge: 1-2 hosts, each
                # either declaring rules or a NULL marker (rule-less
                # robots body) — the model REPLACES per host
                rule_rows = []
                for h in rng.sample(hosts, rng.randint(1, 2)):
                    if rng.random() < 0.3:
                        rule_rows.append((h, None, None, None, None))
                        model_rules[h] = set()
                    else:
                        rows_h = set()
                        for j in range(rng.randint(1, 2)):
                            pat = f"/r{bid}p{j}"
                            rows_h.add(
                                (h, bool(j % 2), pat, f"^{pat}", len(pat))
                            )
                        rule_rows.extend(sorted(rows_h))
                        model_rules[h] = rows_h
                ru = spark.createDataFrame(
                    rule_rows,
                    "host string, allow boolean, pattern string, "
                    "rx string, plen int",
                )
            out = state.record_round(
                bid, f"a{bid}.warc", {"n_docs_indexed": 1}, f,
                delays=d, rules=ru,
            )
            assert out is not None and out["n_frontier"] == len(rows)
            model_rounds[bid] = rows
            recorded_bids.append(bid)
        elif op == "replay":
            bid = rng.choice(recorded_bids)
            f = spark.createDataFrame(
                [("https://evil.example/should-not-append", 99)],
                "url string, indeg long",
            )
            assert state.record_round(
                bid, "replay.warc", {"n_docs_indexed": 9}, f
            ) is None  # replay writes NOTHING
        else:
            rep = state.compact()
            assert rep["files_after"] <= rep["files_before"]
        check()


def _wide_rules(spark, n_hosts=5, pattern="/private"):
    from webpagesgraphdatabase_spark import robots as R

    return R.robots_rules(
        spark.createDataFrame(
            [
                (f"h{i}.example", f"User-agent: *\nDisallow: {pattern}\n")
                for i in range(n_hosts)
            ],
            ["host", "body"],
        )
    )


def test_crawl_frontier_auto_shuffles_oversize_rules(spark, monkeypatch):
    """r11 verdict item 1, call site 1 (crawl_frontier): with no
    explicit choice, a rule table past the broadcast budget
    adjudicates via the shuffled equi-join (no broadcast hint in the
    plan); within the budget the hint stays — identical results."""
    from webpagesgraphdatabase_spark import robots as R

    edges = spark.createDataFrame(
        [
            ("https://h0.example/a", "https://h0.example/private/x"),
            ("https://h0.example/a", "https://h0.example/new"),
            ("https://h1.example/a", "https://h9.example/other"),
        ],
        ["src_url", "dst_url"],
    )
    seen = spark.createDataFrame([("https://h0.example/a",)], ["url"])
    rules = _wide_rules(spark)
    want = {
        r.url for r in W.crawl_frontier(edges, seen, rules=rules).collect()
    }
    assert want == {"https://h0.example/new", "https://h9.example/other"}

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    over = W.crawl_frontier(edges, seen, rules=rules)
    assert "broadcast" not in (
        over._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert {r.url for r in over.collect()} == want

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100)
    under = W.crawl_frontier(edges, seen, rules=rules)
    assert "broadcast" in (
        under._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert {r.url for r in under.collect()} == want


def _spy_robots_filter(monkeypatch):
    """Record the broadcast choice each robots_filter call receives
    (the gates pass their RESOLVED bool, never None), delegating to
    the real adjudication so results stay real."""
    from webpagesgraphdatabase_spark import robots as R

    seen = []
    real = R.robots_filter

    def spy(urls, rules, url_col="url", broadcast=True):
        seen.append(broadcast)
        return real(urls, rules, url_col=url_col, broadcast=broadcast)

    monkeypatch.setattr(R, "robots_filter", spy)
    return seen


def test_crawl_round_both_gates_pick_scale_safe_join(
    spark, tmp_path, monkeypatch
):
    """r11 verdict item 1, call sites 2+3 (_crawl_ingest's politeness
    gate and the frontier gate inside crawl_round): with caller rules
    past the budget, BOTH gates resolve to the shuffled join
    (broadcast=False reaches robots_filter — whose non-broadcast plan
    shape is pinned in test_robots.py); within the budget both stay
    broadcast. Results identical either way."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    (tmp_path / "crawl.warc").write_bytes(W.build_warc(_crawl_records()))
    rules = _rules(spark).unionByName(_wide_rules(spark, n_hosts=4))

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    seen = _spy_robots_filter(monkeypatch)
    store = GraphStore(spark, str(tmp_path / "wh1"))
    store.init_schema()
    rep = W.crawl_round(spark, store, str(tmp_path / "crawl.warc"), rules=rules)
    f_over = {r.url for r in rep["frontier"].collect()}
    assert seen == [False, False]  # ingest gate, then frontier gate
    # the resolved shapes ride the report (r12 verdict item 6)
    assert rep["broadcast"] == {
        "rules_ingest": False, "rules_frontier": False, "delays": True,
    }
    urls_over = {r.url for r in store.graph().links.collect()}

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100_000)
    seen.clear()
    store2 = GraphStore(spark, str(tmp_path / "wh2"))
    store2.init_schema()
    rep2 = W.crawl_round(
        spark, store2, str(tmp_path / "crawl.warc"), rules=rules
    )
    assert seen == [True, True]
    assert rep2["broadcast"] == {
        "rules_ingest": True, "rules_frontier": True, "delays": True,
    }
    assert {r.url for r in rep2["frontier"].collect()} == f_over
    assert {r.url for r in store2.graph().links.collect()} == urls_over == {
        "https://site.example/a", "https://site.example/b"
    }


def test_resumable_rule_memory_over_budget_goes_shuffled(
    spark, tmp_path, monkeypatch
):
    """r11 verdict item 1, the scale case the defect was about: a
    STORED rule memory past the broadcast budget makes the resumable
    round's frontier gate pick the shuffled join automatically (the
    raw-store probe), and next_fetch_plan's own adjudication plan
    carries no broadcast hint; with a small memory both stay
    broadcast. An explicit broadcast_rules= overrides."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    (tmp_path / "crawl.warc").write_bytes(W.build_warc(_crawl_records()))
    state_dir = str(tmp_path / "state")
    state = CrawlState(spark, state_dir)
    # seed the memory: one prior round with a 5-host rule table
    state.record_round(
        7,
        "seed.warc",
        {"n_docs_indexed": 0},
        spark.createDataFrame(
            [("https://h0.example/seeded", 1)], "url string, indeg long"
        ),
        rules=_wide_rules(spark),
    )

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    assert not state.rules_fit_broadcast()
    # next_fetch_plan auto: shuffled adjudication, no broadcast hint
    plan = state.next_fetch_plan()
    assert "broadcast" not in (
        plan._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    seen = _spy_robots_filter(monkeypatch)
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    W.crawl_round_resumable(
        spark, store, str(tmp_path / "crawl.warc"), state_dir
    )
    assert seen and all(b is False for b in seen)

    # small memory (threshold back up): broadcast everywhere, and the
    # explicit override still wins
    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100_000)
    assert state.rules_fit_broadcast()
    plan_small = state.next_fetch_plan()
    assert "broadcast" in (
        plan_small._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    forced = state.next_fetch_plan(broadcast_rules=False)
    assert "broadcast" not in (
        forced._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert sorted(map(tuple, forced.collect())) == sorted(
        map(tuple, plan_small.collect())
    )


def test_resumable_over_budget_passthrough_rules_goes_shuffled(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12 medium: the resumable wrapper's resolved
    broadcast_rules overrides crawl_round's own auto-probe, so the
    conjunction must also cover a pass-through ``rules=`` table in
    **kw — an over-budget ingest-gate table must reach BOTH gates as
    the shuffled join even when the stored memory is empty and no
    extra_rules were given (the combination that used to resolve
    True and force-broadcast it)."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    (tmp_path / "crawl.warc").write_bytes(W.build_warc(_crawl_records()))
    rules = _rules(spark).unionByName(_wide_rules(spark, n_hosts=4))

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    seen = _spy_robots_filter(monkeypatch)
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    rep = W.crawl_round_resumable(
        spark,
        store,
        str(tmp_path / "crawl.warc"),
        str(tmp_path / "state"),
        rules=rules,
    )
    assert seen and all(b is False for b in seen)
    f_over = {r.url for r in rep["frontier"].collect()}

    # same round within the budget: broadcast at both gates, results
    # identical either side of the flip
    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100_000)
    seen.clear()
    store2 = GraphStore(spark, str(tmp_path / "wh2"))
    store2.init_schema()
    rep2 = W.crawl_round_resumable(
        spark,
        store2,
        str(tmp_path / "crawl.warc"),
        str(tmp_path / "state2"),
        rules=rules,
    )
    assert seen and all(b is True for b in seen)
    assert {r.url for r in rep2["frontier"].collect()} == f_over


def test_effective_rules_fold_threads_resolved_choice_no_reprobe(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12 low: once a gate resolves its broadcast choice, the
    effective_rules fold must not re-probe — fits_broadcast runs for
    the gate decision (caller tables) only, never again inside
    merge_rules_per_host. Counts probe calls across next_fetch_plan
    with a caller table laid over a stored memory."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    state = CrawlState(spark, str(tmp_path / "state"))
    state.record_round(
        3,
        "seed.warc",
        {"n_docs_indexed": 0},
        spark.createDataFrame(
            [("https://h0.example/seeded", 1)], "url string, indeg long"
        ),
        rules=_wide_rules(spark),
    )
    caller = _wide_rules(spark, n_hosts=2, pattern="/tmp")
    probes = []
    real = R.fits_broadcast

    def spy(rules, max_rows=None):
        probes.append(rules)
        return real(rules, max_rows)

    monkeypatch.setattr(R, "fits_broadcast", spy)
    plan = state.next_fetch_plan(rules=caller)
    plan.collect()
    # exactly ONE bounded probe: the caller table at the gate. The
    # stored memory goes through the raw-store count
    # (rules_fit_broadcast), and the merge itself never probes.
    assert len(probes) == 1 and probes[0] is caller


def test_store_fits_broadcast_probes_run_zero_spark_jobs(
    spark, tmp_path, monkeypatch
):
    """r12 verdict item 7: the stored-memory budget probes read the
    parquet FOOTERS driver-side — no DataFrame action, no Spark job.
    Denies every action on the concrete DataFrame class while probing,
    checks both thresholds flip the answer, and pins the footer count
    exact against a real read."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.operators._util import (
        count_parquet_rows,
    )

    state = CrawlState(spark, str(tmp_path / "state"))
    state.record_round(
        9,
        "seed.warc",
        {},
        spark.createDataFrame(
            [("https://h0.example/x", 1)], "url string, indeg long"
        ),
        delays=spark.createDataFrame(
            [("h0.example", 2.0)], "host string, crawl_delay double"
        ),
        rules=_wide_rules(spark),
    )
    n_rules = spark.read.parquet(state._rules).count()
    assert count_parquet_rows(state._rules) == n_rules
    assert count_parquet_rows(state._rules, stop_at=2) >= 3  # short-circuit

    try:
        from pyspark.sql.classic.dataframe import DataFrame as CDF
    except ImportError:
        from pyspark.sql import DataFrame as CDF

    def boom(self, *a, **k):
        raise AssertionError("probe ran a Spark action")

    for m in ("count", "collect", "first", "take", "toPandas"):
        monkeypatch.setattr(CDF, m, boom)
    assert state.rules_fit_broadcast() is True
    assert state.hosts_fit_broadcast() is True
    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    assert state.rules_fit_broadcast() is False  # 5 hosts' rules
    assert state.hosts_fit_broadcast() is True  # 1 delay row
    assert state.hosts_fit_broadcast(max_rows=0) is False
    # a store that never existed reads as fitting (nothing to shuffle)
    empty = CrawlState(spark, str(tmp_path / "none"))
    assert empty.rules_fit_broadcast() is True


def test_crawl_state_compact_prunes_hosts_and_frontier(spark, tmp_path):
    """r12 verdict item 2: compact() applies the rules store's prune
    discipline to the OTHER history-bearing stores. hosts.parquet
    folds to ONE row per host (the max-delay winner — the only row
    delays() can pick); frontier.parquet folds to ONE
    backlog-canonical row per normalized url (min url, max indeg,
    attributed to the norm's latest committed round). Checks: reads
    equal before/after, post-fold row counts equal the read-semantics
    minimum, a mid-crash (uncommitted) partition survives
    byte-identically, and frontier_of is exact for the latest round
    and scoped for superseded ones."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.operators.store_lifecycle import (
        allocate_batch,
        dynamic_append,
    )

    state = CrawlState(spark, str(tmp_path / "state"))

    def fdf(rows):
        return spark.createDataFrame(rows, "url string, indeg long")

    def ddf(rows):
        return spark.createDataFrame(rows, "host string, crawl_delay double")

    # round 1: a norm that round 2 re-surfaces (slash variant — same
    # normal form), plus a round-1-only url; two hosts' delays
    state.record_round(
        601, "r1.warc", {},
        fdf([("https://pf.example/shared", 2),
             ("https://pf.example/only1", 5)]),
        delays=ddf([("pf.example", 3.0), ("qf.example", 2.0)]),
    )
    # round 2: the shared norm again (higher indeg, slash-variant
    # url), a round-2-only url; pf.example tightens its delay
    state.record_round(
        602, "r2.warc", {},
        fdf([("https://pf.example/shared/", 7),
             ("https://pf.example/only2", 1)]),
        delays=ddf([("pf.example", 5.0)]),
    )
    before_backlog = sorted(map(tuple, state.backlog().collect()))
    before_delays = sorted(map(tuple, state.delays().collect()))

    # a mid-crash round: frontier + hosts appended, NO ledger row
    rno = allocate_batch(
        spark, state.root, state._ledger, None, allow_missing=True
    )
    dynamic_append(
        spark.createDataFrame(
            [("https://pf.example/crash", 9, 603, rno)],
            "url string, indeg long, batch_id int, batch int",
        ),
        state._frontier, ("batch",),
    )
    dynamic_append(
        spark.createDataFrame(
            [("crash.example", 8.0, 603, rno)],
            "host string, crawl_delay double, batch_id int, batch int",
        ),
        state._hosts, ("batch",),
    )

    state.compact()

    # reads equal before/after the fold — the uncommitted crash rows
    # legitimately join the backlog/delay reads (recorded knowledge is
    # visible regardless of commit state), so the expectation is the
    # pre-fold capture plus exactly them
    assert sorted(map(tuple, state.backlog().collect())) == sorted(
        before_backlog + [("https://pf.example/crash", 9)]
    )
    assert sorted(map(tuple, state.delays().collect())) == sorted(
        before_delays + [("crash.example", 8.0)]
    )

    # post-fold row counts = read-semantics minimum + the untouched
    # crash partition
    fr = spark.read.parquet(state._frontier)
    assert fr.filter(F.col("batch") == 0).count() == 3  # 3 norms
    crash_f = fr.filter(F.col("batch") != 0).collect()
    assert [(r.url, r.indeg, r.batch_id, r.batch) for r in crash_f] == [
        ("https://pf.example/crash", 9, 603, rno)
    ]
    ho = spark.read.parquet(state._hosts)
    assert ho.filter(F.col("batch") == 0).count() == 2  # 2 hosts
    crash_h = ho.filter(F.col("batch") != 0).collect()
    assert [
        (r.host, r.crawl_delay, r.batch_id, r.batch) for r in crash_h
    ] == [("crash.example", 8.0, 603, rno)]

    # the folded frontier row carries the backlog-canonical values:
    # min url across the committed slash variants, max indeg
    assert sorted(
        (r.url, r.indeg) for r in state.frontier_of(602).collect()
    ) == [
        ("https://pf.example/only2", 1),
        ("https://pf.example/shared", 7),
    ]
    # the superseded round reads scoped: its own norms only
    assert sorted(
        (r.url, r.indeg) for r in state.frontier_of(601).collect()
    ) == [("https://pf.example/only1", 5)]

    # a second compact is a fixpoint on the committed segment
    state.compact()
    assert spark.read.parquet(state._frontier).filter(
        F.col("batch") == 0
    ).count() == 3
    assert spark.read.parquet(state._hosts).filter(
        F.col("batch") == 0
    ).count() == 2
    assert sorted(map(tuple, state.delays().collect())) == sorted(
        before_delays + [("crash.example", 8.0)]
    )


def test_crawl_state_compact_prunes_superseded_rules(spark, tmp_path):
    """r11 verdict item 2: compact() folds the rules store down to the
    latest committed round per host — superseded rule rows and stale
    CLEAR markers drop (lossless: the latest-per-host read can never
    pick them), an uncommitted crash partition stays in place for its
    retry, and rules() reads identically before and after."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.operators.store_lifecycle import (
        allocate_batch,
        dynamic_append,
    )

    RULE_DDL = "host string, allow boolean, pattern string, rx string, plen int"

    def rules_df(*rows):
        return spark.createDataFrame(list(rows), RULE_DDL)

    state = CrawlState(spark, str(tmp_path / "state"))
    f = spark.createDataFrame(
        [("https://pr.example/seed", 1)], "url string, indeg long"
    )
    # round 1: hostA one rule, hostB one rule
    state.record_round(
        401, "r1.warc", {}, f,
        rules=rules_df(
            ("a.example", False, "/a1", "^/a1", 3),
            ("b.example", False, "/b1", "^/b1", 3),
        ),
    )
    # round 2: hostA REPLACED with two rules, hostB CLEARED (marker)
    state.record_round(
        402, "r2.warc", {}, f,
        rules=rules_df(
            ("a.example", False, "/a2a", "^/a2a", 4),
            ("a.example", True, "/a2b", "^/a2b", 4),
            ("b.example", None, None, None, None),
        ),
    )
    # round 3: hostC appears
    state.record_round(
        403, "r3.warc", {}, f,
        rules=rules_df(("c.example", False, "/c3", "^/c3", 3)),
    )
    # round 4 CRASHES between the rules append and the ledger row
    rno = allocate_batch(
        spark, state.root, state._ledger, None, allow_missing=True
    )
    assert rno == 4
    crash = rules_df(("d.example", False, "/d4", "^/d4", 3)).select(
        "*",
        F.lit(int(rno)).alias("round_no"),
        F.lit(404).alias("batch_id"),
        F.lit(int(rno)).alias("batch"),
    )
    dynamic_append(crash, state._rules, ("batch",))
    assert not state.has_round(404)

    def read_rules():
        return sorted(
            (r.host, r.allow, r.pattern)
            for r in state.rules().collect()
        )

    before = read_rules()
    # b.example cleared; d.example's uncommitted round is visible (the
    # read's pre-existing semantics — its retry will commit the round)
    assert before == [
        ("a.example", False, "/a2a"),
        ("a.example", True, "/a2b"),
        ("c.example", False, "/c3"),
        ("d.example", False, "/d4"),
    ]
    state.compact()
    assert read_rules() == before  # read-equal across the fold
    raw = spark.read.parquet(state._rules)
    # post-fold store == latest committed round per host (a2a, a2b,
    # b-marker, c3) + the untouched uncommitted partition (d4):
    # round-1 rows and nothing else dropped
    assert raw.count() == 5
    assert sorted(
        (r.host, r.pattern, int(r.round_no), int(r.batch))
        for r in raw.collect()
    ) == [
        ("a.example", "/a2a", 2, 0),
        ("a.example", "/a2b", 2, 0),
        ("b.example", None, 2, 0),
        ("c.example", "/c3", 3, 0),
        ("d.example", "/d4", 4, 4),  # crash partition: in place
    ]

    # the retry commits round 4 with DIFFERENT rules — its dynamic
    # overwrite replaces the stale partition; a second compact then
    # prunes the now-superseded history down to one round per host
    state.record_round(
        404, "r4.warc", {}, f,
        rules=rules_df(("d.example", False, "/d4new", "^/d4new", 6)),
    )
    assert read_rules() == [
        ("a.example", False, "/a2a"),
        ("a.example", True, "/a2b"),
        ("c.example", False, "/c3"),
        ("d.example", False, "/d4new"),
    ]
    state.compact()
    assert read_rules()[-1] == ("d.example", False, "/d4new")
    assert spark.read.parquet(state._rules).count() == 5
    assert {
        int(r.batch) for r in spark.read.parquet(state._rules).collect()
    } == {0}


def test_streaming_crawl_round_landing_parse_once(spark, tmp_path):
    """r11 verdict item 3: landing= on the stateful stream lands each
    micro-batch's uncommitted archives ONCE as per-file parquet
    partitions; ingest + frontier then read the columnar landing with
    partition pruning (plan-pinned: FileScan parquet with a warc_file
    partition filter, no second byte parse), results stay equal to the
    batch resumable loop, and a fresh-checkpoint replay neither
    re-lands nor re-records."""
    import os

    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    robots_txt = b"User-agent: *\nDisallow: /private\n"
    root = "https://lp.example/"
    land = tmp_path / "land"
    land.mkdir()
    (land / "a1.warc").write_bytes(
        W.build_warc(
            [
                _mk_rec("rb", f"{root}robots.txt", robots_txt, "text/plain"),
                _mk_page("r", root, "landing parse once alpha",
                         hrefs=[f"{root}p1", f"{root}private/x"]),
            ]
        )
    )
    (land / "a2.warc").write_bytes(
        W.build_warc(
            [_mk_page("p1", f"{root}p1", "landing parse once beta",
                      hrefs=[f"{root}p2"])]
        )
    )
    kw = dict(auto_politeness=True)

    # batch reference over the same archives
    wb = GraphStore(spark, str(tmp_path / "wh_b"))
    wb.init_schema()
    sdb = str(tmp_path / "sd_b")
    W.crawl_round_resumable(spark, wb, str(land / "a1.warc"), sdb, **kw)
    W.crawl_round_resumable(spark, wb, str(land / "a2.warc"), sdb, **kw)

    ws = GraphStore(spark, str(tmp_path / "wh_s"))
    ws.init_schema()
    sds, ldir = str(tmp_path / "sd_s"), str(tmp_path / "landing")
    W.streaming_crawl_round(
        spark, ws, str(land), str(tmp_path / "ck1"),
        state_dir=sds, landing=ldir, **kw,
    )

    def ledger_rows(sd):
        return sorted(
            (r.batch_id, r.round_no, r.n_links_inserted, r.n_frontier)
            for r in CrawlState(spark, sd).ledger().collect()
        )

    assert ledger_rows(sds) == ledger_rows(sdb)
    assert sorted(r.url for r in ws.graph().links.collect()) == sorted(
        r.url for r in wb.graph().links.collect()
    )
    sb, ss = CrawlState(spark, sdb), CrawlState(spark, sds)
    assert sorted(
        (r.url, r.indeg) for r in ss.backlog().collect()
    ) == sorted((r.url, r.indeg) for r in sb.backlog().collect())
    assert {
        (r.host, r.allow, r.pattern) for r in ss.rules().collect()
    } == {(r.host, r.allow, r.pattern) for r in sb.rules().collect()}

    # the landing holds one partition per archive file, and the
    # per-file read — what ingest and frontier consume — plans as a
    # partition-pruned parquet FileScan, not a byte re-parse
    parts = sorted(
        d for d in os.listdir(f"{ldir}/stream.parquet")
        if d.startswith("warc_part=")
    )
    assert len(parts) == 2
    # fixed-width digest keys, never raw path values (ADVICE r12)
    assert all(len(p) == len("warc_part=") + 33 for p in parts)
    assert all(p.split("=", 1)[1].startswith("h") for p in parts)
    recs = W._stream_landed_records(
        spark, ldir, spark.read.parquet(f"{ldir}/stream.parquet")
        .select("warc_file").first()[0]
    )
    plan = recs._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()
    assert "warc_file" in plan
    assert "binaryfile" not in plan.lower()
    assert "mapinpandas" not in plan.lower()
    assert recs.count() > 0

    # fresh-checkpoint replay: per-file recorded no-op, landing intact
    mtimes = {
        p: os.path.getmtime(f"{ldir}/stream.parquet/{p}") for p in parts
    }
    led = ledger_rows(sds)
    W.streaming_crawl_round(
        spark, ws, str(land), str(tmp_path / "ck2"),
        state_dir=sds, landing=ldir, **kw,
    )
    assert ledger_rows(sds) == led
    assert {
        p: os.path.getmtime(f"{ldir}/stream.parquet/{p}") for p in parts
    } == mtimes


def test_model_based_budget_flip_mid_history(spark, tmp_path, monkeypatch):
    """r12 verdict item 8: the same 3-round crawl history run far
    UNDER the broadcast budget and run with a threshold that the rule
    memory CROSSES mid-history (with a compact interleaved right at
    the flip) must be indistinguishable to every reader — ledger,
    graph links, backlog, rule memory, delay memory, next_fetch_plan —
    while the round reports prove BOTH join shapes actually ran."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    def mk_archive(i):
        """Round i: robots bodies for TWO new hosts (each two rules —
        the memory grows 4 rows per round: 4 → 8 → 12), one page on
        the first new host linking two fresh candidates."""
        h1, h2 = f"bf{2 * i}.example", f"bf{2 * i + 1}.example"
        robots = (
            b"User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
            b"Crawl-delay: 2\n"
        )
        recs = [
            _mk_rec(f"rb{i}a", f"https://{h1}/robots.txt", robots,
                    "text/plain"),
            _mk_rec(f"rb{i}b", f"https://{h2}/robots.txt", robots,
                    "text/plain"),
            _mk_page(
                f"pg{i}", f"https://{h1}/", f"budget flip corpus{i}",
                hrefs=[f"https://{h1}/next{i}",
                       f"https://{h2}/private/x",
                       f"https://{h2}/private/ok/y"],
            ),
        ]
        p = tmp_path / f"bf{i}.warc"
        p.write_bytes(W.build_warc(recs))
        return str(p)

    archives = [mk_archive(i) for i in range(3)]

    def run(tag, threshold):
        monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", threshold)
        store = GraphStore(spark, str(tmp_path / f"wh_{tag}"))
        store.init_schema()
        sd = str(tmp_path / f"sd_{tag}")
        state = CrawlState(spark, sd)
        shapes = []
        for i, a in enumerate(archives):
            rep = W.crawl_round_resumable(
                spark, store, a, sd, auto_politeness=True,
                round_seconds=10.0,
            )
            shapes.append(rep["broadcast"]["rules_frontier"])
            if i == 1:
                # compact exactly at the flip boundary: the prune
                # folds run under the same threshold the gates use
                state.compact()
        plan = sorted(
            map(tuple, state.next_fetch_plan(
                seen=store.graph().links, round_seconds=10.0
            ).collect())
        )
        snap = {
            "ledger": sorted(
                (r.batch_id, r.round_no, r.n_frontier)
                for r in state.ledger().collect()
            ),
            "links": sorted(
                r.url for r in store.graph().links.collect()
            ),
            "backlog": sorted(map(tuple, state.backlog().collect())),
            "rules": sorted(
                (r.host, r.allow, r.pattern, r.plen)
                for r in state.rules().collect()
            ),
            "delays": sorted(map(tuple, state.delays().collect())),
            "plan": plan,
        }
        return snap, shapes

    base, base_shapes = run("base", 100_000)
    assert base_shapes == [True, True, True]
    flip, flip_shapes = run("flip", 6)
    # memory: 0 rows at round 0 (fits), 4+NULL-free... grows past 6
    # after round 1 — the later rounds adjudicate shuffled
    assert flip_shapes[0] is True and flip_shapes[-1] is False
    assert flip == base


def test_model_based_stream_batch_interleaving(spark, tmp_path):
    """r11 verdict item 5: one scripted sequence mixing BATCH resumable
    rounds, STREAMED micro-batch drains (fresh checkpoint each time —
    the ledger, not the checkpoint, adjudicates), a simulated crash
    (ingest + frontier append, NO ledger row), the crashed round's
    retry arriving through the OTHER loop (the stream commits what the
    batch loop crashed), and state+index compaction — checked against
    a pure-Python model after EVERY step for ledger membership,
    per-round frontier content, backlog (stale crash rows included
    until the retry's overwrite), graph links, and per-archive visible
    docs in the BM25 index (exactly-once across replays and folds)."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators import search as S
    from webpagesgraphdatabase_spark.operators.store_lifecycle import (
        allocate_batch,
        dynamic_append,
    )

    land = tmp_path / "land"
    land.mkdir()
    ck = [0]

    def archive(i, n_pages):
        """Archive i: n_pages unique pages, each linking the global
        /shared URL and its own /a<i>/out<j> — so the model's frontier
        for round i is {shared: n_pages} ∪ {out<j>: 1}."""
        pages, urls = [], set()
        outlinks = {"https://mb.example/shared": n_pages}
        for j in range(n_pages):
            url = f"https://mb.example/a{i}/p{j}"
            urls.add(url)
            out = f"https://mb.example/a{i}/out{j}"
            outlinks[out] = 1
            text = f"tokarch{i} " + " ".join(
                f"w{i}x{j}x{t}" for t in range(25)
            )
            pages.append(_mk_page(
                f"a{i}p{j}", url, text,
                hrefs=["https://mb.example/shared", out],
            ))
        (land / f"a{i}.warc").write_bytes(W.build_warc(pages))
        return {
            "file": str(land / f"a{i}.warc"),
            "pages": urls,
            "outlinks": outlinks,
            "token": f"tokarch{i}",
            "n_pages": n_pages,
        }

    A, B, C, D, E = (archive(i, n) for i, n in
                     ((1, 2), (2, 1), (3, 2), (4, 2), (5, 3)))
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    sd, ti = str(tmp_path / "state"), str(tmp_path / "ti")
    state = CrawlState(spark, sd)

    committed: dict[int, dict] = {}   # bid -> archive model
    stale: dict[int, dict] = {}       # crashed frontier partitions
    ingested: dict[int, dict] = {}    # graph/index content landed
    rounds_no: dict[int, int] = {}    # bid -> allocated round number
    # the frontier store's fold state (r12 verdict item 2): after a
    # compact, committed rows keep ONE backlog-canonical row per
    # normalized url, attributed to the norm's latest committed round
    folded: dict[str, tuple[int, int]] = {}   # norm -> (indeg, bid)
    folded_bids: set[int] = set()

    def commit(bid, m):
        committed[bid] = m
        rounds_no[bid] = state.round_summary(bid)["round_no"]

    def model_compact():
        best: dict[str, tuple[int, int]] = {}  # norm -> (order, bid)
        vals: dict[str, int] = {}
        for u, (d, bid) in folded.items():
            vals[u] = max(vals.get(u, 0), d)
            best[u] = (-1, bid)  # segment 0 loses to any real round
        for bid, m in committed.items():
            if bid in folded_bids:
                continue
            o = rounds_no[bid]
            for u, d in m["outlinks"].items():
                vals[u] = max(vals.get(u, 0), d)
                if u not in best or o > best[u][0]:
                    best[u] = (o, bid)
        folded.clear()
        folded.update(
            {u: (vals[u], best[u][1]) for u in vals}
        )
        folded_bids.update(committed)

    def drain():
        ck[0] += 1
        W.streaming_crawl_round(
            spark, store, str(land), str(tmp_path / f"ck{ck[0]}"),
            text_index=ti, state_dir=sd,
        )

    def check():
        led = {
            int(r.batch_id): int(r.n_frontier)
            for r in state.ledger().collect()
        }
        assert led == {
            b: len(m["outlinks"]) for b, m in committed.items()
        }
        for bid, m in committed.items():
            got = sorted(
                (r.url, r.indeg)
                for r in state.frontier_of(bid).collect()
            )
            if bid in folded_bids:
                # scoped read of a FOLDED round: the norms whose
                # latest committed appearance it was, in their
                # backlog-canonical (max indeg) form
                want = sorted(
                    (u, d) for u, (d, b) in folded.items() if b == bid
                )
            else:
                want = sorted(m["outlinks"].items())
            assert got == want, bid
        expect: dict[str, int] = {}
        for m in list(committed.values()) + list(stale.values()):
            for u, d in m["outlinks"].items():
                expect[u] = max(expect.get(u, 0), d)
        for u, (d, _b) in folded.items():
            expect[u] = max(expect.get(u, 0), d)
        assert {
            r.url: r.indeg for r in state.backlog().collect()
        } == expect
        want_pages = set()
        for m in ingested.values():
            want_pages |= m["pages"]
        assert {
            r.url for r in store.graph().links.collect()
        } == want_pages
        for m in ingested.values():
            hits = S.bm25_from_index(spark, ti, (m["token"],), k=10)
            assert len(hits.collect()) == m["n_pages"], m["token"]

    bids = {m["file"]: W._archive_batch_id(spark, m["file"])
            for m in (A, B, C, D, E)}

    # 1. batch resumable round over A
    r = W.crawl_round_resumable(spark, store, A["file"], sd, text_index=ti)
    assert r["replayed"] is False
    commit(bids[A["file"]], A)
    ingested[bids[A["file"]]] = A
    check()

    # 2. stream drain: B and C commit, A is skipped (one id space)
    #    — remove D and E from the landing first (they arrive later)
    import os

    os.rename(D["file"], str(tmp_path / "a4.hold"))
    os.rename(E["file"], str(tmp_path / "a5.hold"))
    drain()
    for m in (B, C):
        commit(bids[m["file"]], m)
        ingested[bids[m["file"]]] = m
    check()

    # 3. simulated crash on D: full ingest + frontier append, NO ledger
    #    row — and the stale partition carries a row the real retry
    #    will NOT produce (a doc_filter change between attempts)
    os.rename(str(tmp_path / "a4.hold"), D["file"])
    bid_d = bids[D["file"]]
    W.crawl_round(spark, store, D["file"], text_index=ti, batch=bid_d)
    rno = allocate_batch(
        spark, state.root, state._ledger, None, allow_missing=True
    )
    stale_model = dict(D["outlinks"])
    stale_model["https://mb.example/stale-d"] = 9
    dynamic_append(
        spark.createDataFrame(
            [(u, d, bid_d, rno) for u, d in stale_model.items()],
            "url string, indeg long, batch_id int, batch int",
        ),
        state._frontier,
        ("batch",),
    )
    ingested[bid_d] = D
    stale[bid_d] = {"outlinks": stale_model}
    assert not state.has_round(bid_d)
    check()

    # 4. the STREAM retries the batch-crashed round: D commits through
    #    the other loop, its overwrite replaces the stale rows
    drain()
    commit(bid_d, D)
    del stale[bid_d]
    check()

    # 5. state + index compaction: reads survive the folds (the
    #    frontier store pruning to one row per norm — r12 item 2)
    state.compact()
    model_compact()
    S.compact_text_index(spark, ti)
    check()

    # 6. batch replays of a batch-committed AND a stream-committed
    #    round: recorded no-ops with the stored summaries
    for m in (A, B):
        rep = W.crawl_round_resumable(
            spark, store, m["file"], sd, text_index=ti
        )
        assert rep["replayed"] is True
        assert rep["n_frontier"] == len(m["outlinks"])
    check()

    # 7. a late archive through the batch loop
    os.rename(str(tmp_path / "a5.hold"), E["file"])
    W.crawl_round_resumable(spark, store, E["file"], sd, text_index=ti)
    commit(bids[E["file"]], E)
    ingested[bids[E["file"]]] = E
    check()

    # 8. final fresh-checkpoint drain over the full landing: everything
    #    adjudicates committed — nothing re-ingests, nothing re-records
    drain()
    check()


def test_budget_cap_auto_shuffles_oversize_delay_memory(spark, monkeypatch):
    """r12: the DELAY memory gets the rule-memory broadcast discipline
    — a stored politeness table past the budget joins the frontier via
    a shuffled equi-join (no broadcast hint), within it the hint stays;
    budgets identical either way."""
    from webpagesgraphdatabase_spark import robots as R

    edges = spark.createDataFrame(
        [(f"https://h{i}.example/a", f"https://h{i}.example/p{j}")
         for i in range(4) for j in range(5)],
        ["src_url", "dst_url"],
    )
    seen = spark.createDataFrame([("https://zz.example/x",)], ["url"])
    delays = spark.createDataFrame(
        [(f"h{i}.example", 5.0) for i in range(4)],
        "host string, crawl_delay double",
    )
    want = sorted(
        r.url for r in W.crawl_frontier(
            edges, seen, delays=delays, round_seconds=10.0
        ).collect()
    )
    assert len(want) == 8  # 2 per host at delay 5 / 10 s

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    over = W.crawl_frontier(edges, seen, delays=delays, round_seconds=10.0)
    assert "broadcast" not in (
        over._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert sorted(r.url for r in over.collect()) == want

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100)
    under = W.crawl_frontier(edges, seen, delays=delays, round_seconds=10.0)
    assert "broadcast" in (
        under._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert sorted(r.url for r in under.collect()) == want


def test_next_fetch_plan_delay_memory_over_budget_goes_shuffled(
    spark, tmp_path, monkeypatch
):
    """r12: next_fetch_plan's politeness budget auto-picks the join
    from the raw hosts-store count — a delay memory past the budget
    plans without a broadcast hint; explicit override still wins."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    state = CrawlState(spark, str(tmp_path / "state"))
    state.record_round(
        601, "r1.warc", {},
        spark.createDataFrame(
            [(f"https://h{i}.example/c{j}", 1)
             for i in range(5) for j in range(3)],
            "url string, indeg long",
        ),
        delays=spark.createDataFrame(
            [(f"h{i}.example", 5.0) for i in range(5)],
            "host string, crawl_delay double",
        ),
    )
    want = sorted(map(tuple, state.next_fetch_plan(
        round_seconds=10.0
    ).collect()))
    assert len(want) == 10  # 2 per host

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 3)
    assert not state.hosts_fit_broadcast()
    over = state.next_fetch_plan(round_seconds=10.0)
    assert "broadcast" not in (
        over._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert sorted(map(tuple, over.collect())) == want

    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 100)
    under = state.next_fetch_plan(round_seconds=10.0)
    assert "broadcast" in (
        under._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    forced = state.next_fetch_plan(round_seconds=10.0, broadcast_delays=False)
    assert "broadcast" not in (
        forced._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert sorted(map(tuple, forced.collect())) == want


def test_streaming_landing_old_layout_migrates(spark, tmp_path):
    """ADVICE r13: a landing dir written by the pre-digest version was
    partitioned by raw ``warc_file=``. Resuming a stream against it
    must neither AnalysisException on the now-missing ``warc_part``
    column nor write a second, conflicting partition layout into the
    same dir — the landing is derived (a parse-once cache of
    uncommitted archives), so the old layout is dropped wholesale and
    this run re-lands its own partitions under ``warc_part=``."""
    import os

    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.warc").write_bytes(W.build_warc(_crawl_records()))
    ldir = tmp_path / "landing"
    # fabricate the OLD layout the previous version wrote
    spark.createDataFrame(
        [("stale", str(land / "a.warc"))],
        "record_id string, warc_file string",
    ).write.partitionBy("warc_file").parquet(f"{ldir}/stream.parquet")
    assert any(
        e.startswith("warc_file=")
        for e in os.listdir(f"{ldir}/stream.parquet")
    )

    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    W.streaming_crawl_round(
        spark, store, str(land), str(tmp_path / "ck"),
        state_dir=str(tmp_path / "sd"), landing=str(ldir),
    )
    parts = os.listdir(f"{ldir}/stream.parquet")
    assert not any(e.startswith("warc_file=") for e in parts)
    assert any(e.startswith("warc_part=") for e in parts)
    assert _graph_state(store)["links"]  # the round itself committed


def test_count_parquet_rows_skips_staging_and_hidden(spark, tmp_path):
    """ADVICE r13: the footer walk must only see COMMITTED data files —
    Spark staging subtrees (``_temporary``, ``.hive-staging``) and
    hidden task-attempt leftovers from a crashed or concurrent write
    can hold real parquet bytes that are NOT part of the store, and
    counting them inflated ``broadcast_status``'s ``rows_exact``
    report."""
    import os
    import shutil

    from webpagesgraphdatabase_spark.operators._util import (
        count_parquet_files,
        count_parquet_rows,
    )

    d = str(tmp_path / "store")
    spark.range(7).coalesce(1).write.parquet(d)
    n_files = count_parquet_files(d)
    assert count_parquet_rows(d) == 7

    # a crashed concurrent writer left staging dirs with real bytes
    committed = next(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )
    for sub in ("_temporary/0/task-1", ".hive-staging/x"):
        os.makedirs(f"{d}/{sub}", exist_ok=True)
        shutil.copy(f"{d}/{committed}", f"{d}/{sub}/part-stale.parquet")
    shutil.copy(f"{d}/{committed}", f"{d}/.part-crc-like.parquet")

    assert count_parquet_rows(d) == 7
    assert count_parquet_files(d) == n_files
    # short-circuit still bounded by the budget, not the junk
    assert count_parquet_rows(d, stop_at=3) == 7


def test_state_store_boundedness_thirty_rounds(spark, tmp_path):
    """r14 verdict item 6: the operational end-to-end pin on
    state-store boundedness. A ~30-round resumable loop with a small
    ``state_compact_threshold`` must keep the hosts and frontier
    stores at their READ-SEMANTICS minimum plus the unfolded tail at
    EVERY round — row counts (one struct-max row per host / one
    backlog-canonical row per normalized url for the folded part, plus
    only the rows appended since the last fold) AND parquet file
    counts (a constant ceiling, never O(rounds)), which is what keeps
    the zero-job footer-probe walk O(budget) as the crawl history
    grows."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators._util import (
        count_parquet_files,
        count_parquet_rows,
    )

    n_rounds, threshold = 30, 4
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    sd = str(tmp_path / "sd")
    state = CrawlState(spark, sd)

    hosts_seen: set = set()        # hosts that ever declared a delay
    norms_seen: set = set()        # frontier urls ever stored
    tail_hosts = tail_frontier = 0  # appends since the last fold
    # constant file ceiling: a fold REBALANCEs each store to one file
    # per batch dir (steady state: 4 files total), and one round
    # appends <= ~2 per store before the next threshold check —
    # independent of round count, which is the claim. The first
    # version of this pin caught the ledger growing one file per round
    # (no prune fold -> narrow relabel preserved the input layout).
    file_cap = threshold + 10
    files_by_round: list[int] = []

    for i in range(n_rounds):
        host = f"b{i % 4}.example"
        robots = (
            f"User-agent: *\nDisallow: /private\nCrawl-delay: {2 + i % 3}\n"
        ).encode()
        page = f"https://{host}/p{i}"
        out1, out2 = f"https://{host}/next{i}", f"https://{host}/shared"
        recs = [
            _mk_rec(f"rb{i}", f"https://{host}/robots.txt", robots,
                    "text/plain"),
            _mk_page(f"pg{i}", page, f"bounded corpus round {i}",
                     hrefs=[out1, out2]),
        ]
        arch = tmp_path / f"b{i}.warc"
        arch.write_bytes(W.build_warc(recs))
        rep = W.crawl_round_resumable(
            spark, store, str(arch), sd,
            auto_politeness=True, round_seconds=10.0,
            state_compact_threshold=threshold,
        )
        hosts_seen.add(host)
        frontier_urls = {r.url for r in rep["frontier"].collect()}
        norms_seen |= frontier_urls
        if "state_compacted" in rep:
            tail_hosts = tail_frontier = 0
        else:
            tail_hosts += 1  # one delay row per archive host
            tail_frontier += rep["n_frontier"]

        # ROW boundedness: folded minimum + unfolded tail, never
        # O(rounds x keys)
        h_rows = count_parquet_rows(state._hosts)
        f_rows = count_parquet_rows(state._frontier)
        assert h_rows <= len(hosts_seen) + tail_hosts, (i, h_rows)
        assert f_rows <= len(norms_seen) + tail_frontier, (i, f_rows)

        # FILE boundedness: the probe walk's cost — a constant ceiling
        # (threshold-triggered folds), not files O(rounds)
        n_files = sum(
            count_parquet_files(s)
            for s in (state._hosts, state._frontier, state._rules,
                      state._ledger)
        )
        files_by_round.append(n_files)
        assert n_files <= file_cap, (i, n_files)

    # the loop really exercised the fold path and ran full length
    assert len(state.ledger().collect()) == n_rounds
    # no growth trend: the second half of the run never needs more
    # files than the first half had already reached (+ jitter of one
    # store's append) — the O(rounds) shape this test exists to forbid
    assert max(files_by_round[15:]) <= max(files_by_round[:15]) + 4
    # the footer probe short-circuits at the budget even mid-history
    assert count_parquet_rows(state._frontier, stop_at=1) >= 2
    # every host's delay read still resolves to its max declared value
    delays = {r.host: r.crawl_delay for r in state.delays().collect()}
    assert set(delays) == hosts_seen
    assert all(v == 4.0 for v in delays.values())  # max of 2,3,4 per host


def test_state_store_boundedness_streaming(spark, tmp_path):
    """r14 verdict item 6, streaming twin: the same boundedness holds
    when the rounds arrive through ``streaming_crawl_round`` micro-
    batches (one new archive per drain, fold threshold crossing inside
    the stream's foreachBatch)."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.operators._util import (
        count_parquet_files,
        count_parquet_rows,
    )

    n_rounds, threshold = 10, 4
    land = tmp_path / "land"
    land.mkdir()
    store = GraphStore(spark, str(tmp_path / "wh"))
    store.init_schema()
    sd = str(tmp_path / "sd")
    state = CrawlState(spark, sd)
    hosts_seen: set = set()
    norms_seen: set = set()

    for i in range(n_rounds):
        host = f"sb{i % 3}.example"
        robots = f"User-agent: *\nCrawl-delay: {1 + i % 2}\n".encode()
        recs = [
            _mk_rec(f"srb{i}", f"https://{host}/robots.txt", robots,
                    "text/plain"),
            _mk_page(f"spg{i}", f"https://{host}/p{i}",
                     f"stream bounded {i}",
                     hrefs=[f"https://{host}/next{i}"]),
        ]
        (land / f"s{i}.warc").write_bytes(W.build_warc(recs))
        W.streaming_crawl_round(
            spark, store, str(land), str(tmp_path / f"ck{i}"),
            state_dir=sd, auto_politeness=True, round_seconds=10.0,
            state_compact_threshold=threshold,
        )
        hosts_seen.add(host)
        bid = W._archive_batch_id(spark, str(land / f"s{i}.warc"))
        norms_seen |= {
            r.url for r in state.frontier_of(bid).collect()
        }
        # rows: folded minimum + at most the rounds-since-fold tail
        # (<= threshold rounds can accumulate before the fold fires)
        h_rows = count_parquet_rows(state._hosts)
        f_rows = count_parquet_rows(state._frontier)
        assert h_rows <= len(hosts_seen) + threshold + 1, (i, h_rows)
        assert f_rows <= len(norms_seen) + threshold + 1, (i, f_rows)
        n_files = sum(
            count_parquet_files(s)
            for s in (state._hosts, state._frontier, state._rules,
                      state._ledger)
        )
        assert n_files <= threshold + 10, (i, n_files)

    assert len(state.ledger().collect()) == n_rounds
