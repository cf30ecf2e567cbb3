"""Tests for the Flask serving shell (route parity with the reference
app ``main.py:181-507``), driven through Flask's test client with the
deterministic fetch/LLM stubs — no network, no templates."""

from __future__ import annotations

import io

import pytest

from webpagesgraphdatabase_spark.app import create_app


@pytest.fixture()
def client(store):
    app = create_app(store)
    app.config["TESTING"] = True
    return app.test_client()


def _add(client, url):
    return client.post("/add_link", data={"url": url})


def test_add_link_normalizes_and_stores(client, store):
    r = _add(client, "site-a.example/x/")
    body = r.get_json()
    assert r.status_code == 200 and body["status"] == "added"
    assert body["url"] == "https://site-a.example/x"  # F1 normalization
    assert store.link_exists("https://site-a.example/x")


def test_add_link_duplicate_is_skipped(client):
    _add(client, "dup.example/p")
    r = _add(client, "https://dup.example/p/")  # same after normalize
    assert r.get_json()["status"] == "duplicate"


def test_add_link_requires_url(client):
    assert client.post("/add_link", data={}).status_code == 400


def test_index_lists_links_and_interconnections(client):
    # two links sharing a keyword across categories would interconnect;
    # the stub categorizer keys on content, so just assert the shape
    _add(client, "one.example/a")
    _add(client, "two.example/b")
    body = client.get("/index").get_json()
    assert {"links", "interconnections", "interconnection_counts"} <= set(body)
    assert len(body["links"]) == 2
    row = body["links"][0]
    # the 10-column reference projection with P9 defaults applied
    assert {
        "url",
        "title",
        "category",
        "raw_category",
        "suggested_category",
        "raw_content",
        "cleaned_content",
        "keywords",
        "category_explanation",
        "keyword_explanation",
    } <= set(row)
    assert row["category_explanation"] == "None"  # add_link omits it (M1 drift)


def test_index_interconnections_are_bounded(client, store, monkeypatch):
    """No public request can trigger an unbounded driver materialization
    (the reference's one scale-killer, main.py:199-211): the listing is
    capped at DEFAULT_INDEX_LIMIT even when the client asks for more,
    honors smaller limits, and the plan is a top-k
    (TakeOrderedAndProject), never a full-collect of the pair set."""
    from webpagesgraphdatabase_spark import app as app_mod
    from webpagesgraphdatabase_spark.graph import queries

    # Build a graph whose symmetric pair set exceeds the cap we'll test:
    # 2 categories × 6 links each, all sharing one keyword →
    # 2·6·6 = 72 symmetric cross-category pairs.
    csv_text = (
        "url,title,content,category,keyword,"
        "category_explanation,keyword_explanation\n"
        + "\n".join(
            f"b{i}.example/p,T{i},{'z' * 120},"
            f"{'Database' if i % 2 else 'News'},shared,,"
            for i in range(12)
        )
        + "\n"
    )
    client.post(
        "/upload_csv",
        data={
            "file": (io.BytesIO(csv_text.encode()), "links.csv"),
            "batch_size": "12",
        },
        content_type="multipart/form-data",
    )

    body = client.get("/index?limit=10").get_json()
    assert len(body["interconnections"]) == 10
    # limit is clamped to the cap — a huge client limit can't blow it open
    monkeypatch.setattr(app_mod, "DEFAULT_INDEX_LIMIT", 25)
    body = client.get("/index?limit=999999").get_json()
    assert len(body["interconnections"]) == 25
    # keyword/category filters push into the query (P3/P7 route params)
    body = client.get("/index?keyword=nope").get_json()
    assert body["interconnections"] == []
    # the summary covers the FULL pair set without expansion
    counts = {
        (r["category1"], r["category2"]): r["count"]
        for r in body["interconnection_counts"]
    }
    assert counts[("Database", "News")] == 36
    assert counts[("News", "Database")] == 36
    # plan shape: sort+limit compiles to a top-k, not a global sort
    plan = (
        queries.interconnections_symmetric(store.graph())
        .orderBy("keyword", "category_1", "category_2", "url_1", "url_2")
        .limit(25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_upload_csv_metadata_path(client, store):
    csv_text = (
        "url,title,content,category,keyword,"
        "category_explanation,keyword_explanation\n"
        f"m1.example/a,T1,{'x' * 150},Database,\"alpha, beta\",exp,kex\n"
        f"m2.example/b,T2,{'y' * 150},News,gamma,,\n"
    )
    r = client.post(
        "/upload_csv",
        data={"file": (io.BytesIO(csv_text.encode()), "links.csv")},
        content_type="multipart/form-data",
    )
    body = r.get_json()
    assert body == {"status": "ok", "mode": "metadata", "added": 2}
    assert store.link_exists("https://m1.example/a")


def test_upload_csv_bare_url_path_respects_batch_size(client):
    csv_text = "url\n" + "\n".join(f"u{i}.example/p" for i in range(8)) + "\n"
    r = client.post(
        "/upload_csv",
        data={
            "file": (io.BytesIO(csv_text.encode()), "urls.csv"),
            "batch_size": "3",
        },
        content_type="multipart/form-data",
    )
    assert r.get_json()["added"] == 3  # O3 cap, main.py:229


def test_upload_csv_rejects_non_csv(client):
    r = client.post(
        "/upload_csv",
        data={"file": (io.BytesIO(b"url\nx.example"), "urls.txt")},
        content_type="multipart/form-data",
    )
    assert r.status_code == 400  # F9 extension check


def test_graph_data_and_delete_roundtrip(client, store):
    _add(client, "del.example/q")
    g1 = client.get("/graph_data").get_json()
    assert any(n["id"] == "Link:https://del.example/q" for n in g1["nodes"])
    assert g1["duplicate_ids"] == []
    client.post("/delete_link", data={"url": "https://del.example/q"})
    g2 = client.get("/graph_data").get_json()
    assert not any(n["id"] == "Link:https://del.example/q" for n in g2["nodes"])
    # M4: no dangling edges reference the deleted link
    assert not any("del.example" in e["from"] for e in g2["edges"])


def test_instructions_static(client):
    assert client.get("/instructions").status_code == 200


def test_index_html_mode_renders_tables(client):
    _add(client, "html-a.example/x")
    r = client.get("/?format=html")
    assert r.status_code == 200
    assert r.content_type.startswith("text/html")
    page = r.get_data(as_text=True)
    # the reference template's structural blocks (index.html:49-118):
    # add-link form, CSV upload form, 10-column links table,
    # interconnections table — plus the pair-count summary
    assert 'action="/add_link"' in page and 'action="/upload_csv"' in page
    for header in ("URL", "Title", "Category", "Suggested Category",
                   "Keywords", "Raw Content", "Shared Keyword",
                   "Pair Counts"):
        assert header in page
    assert "https://html-a.example/x" in page
    # per-row delete form, as in the reference listing
    assert 'action="/delete_link"' in page
    # graph canvas block (reference index.html graph tab parity):
    # vis-network over /graph_data, with an offline fallback summary
    assert 'id="network"' in page
    assert "/graph_data" in page and "vis-network" in page


def test_index_accept_header_negotiates_html(client):
    r = client.get("/", headers={"Accept": "text/html"})
    assert r.content_type.startswith("text/html")
    # JSON stays the default without the header
    assert client.get("/").content_type.startswith("application/json")


def test_index_wildcard_accept_stays_json(client):
    # curl / python-requests send Accept: */* by default — API clients
    # must keep getting JSON; only an explicit html preference flips.
    for accept in ("*/*", "application/json", "application/json, */*"):
        r = client.get("/", headers={"Accept": accept})
        assert r.content_type.startswith("application/json"), accept
    # browser-style header: html explicitly preferred over json
    r = client.get(
        "/",
        headers={"Accept": "text/html,application/xhtml+xml,*/*;q=0.8"},
    )
    assert r.content_type.startswith("text/html")


def test_instructions_html_mode(client):
    r = client.get("/instructions?format=html")
    assert r.content_type.startswith("text/html")
    assert "/add_link" in r.get_data(as_text=True)
    assert client.get("/instructions").get_json()["instructions"]


def test_cypher_route_runs_reference_query(client):
    """POST /cypher executes the reference's 1-hop query against the
    stored graph and returns Kùzu-style columns."""
    client.post("/add_link", data={"url": "https://example.com/x"})
    r = client.post(
        "/cypher",
        json={
            "query": "MATCH (l:Link)-[:BELONGS_TO]->(c:Category) "
            "RETURN l.url, c.name"
        },
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["columns"] == ["l.url", "c.name"]
    ours = [row for row in body["rows"] if row[0] == "https://example.com/x"]
    assert ours and all(isinstance(row[1], str) and row[1] for row in ours)
    assert body["truncated"] is False


def test_cypher_route_rejects_bad_query_and_missing(client):
    assert client.post("/cypher", json={}).status_code == 400
    r = client.post("/cypher", json={"query": "FOO BAR"})
    assert r.status_code == 400
    assert "error" in r.get_json()


def test_cypher_route_rejects_unbound_cross_join_and_bad_limit(client):
    """r5 advice: the row cap bounds the response, not the compute — a
    disconnected multi-chain pattern must 400 before execution, and a
    non-numeric limit must 400, not 500."""
    r = client.post(
        "/cypher",
        json={"query": "MATCH (a:Link), (b:Link), (c:Link) RETURN COUNT(*)"},
    )
    assert r.status_code == 400
    assert "cross-join" in r.get_json()["error"]
    r2 = client.post(
        "/cypher",
        json={"query": "MATCH (l:Link) RETURN l.url", "limit": "lots"},
    )
    assert r2.status_code == 400
    assert "limit" in r2.get_json()["error"]


def test_cypher_route_caps_rows(client):
    client.post("/add_link", data={"url": "https://example.com/y"})
    r = client.post(
        "/cypher",
        json={"query": "MATCH (l:Link) RETURN l.url", "limit": 1},
    )
    body = r.get_json()
    assert len(body["rows"]) == 1 and body["truncated"] is True


def test_cypher_route_explain_returns_plan(client):
    r = client.post(
        "/cypher",
        json={
            "query": "MATCH (l:Link)-[:BELONGS_TO]->(c:Category) RETURN l.url, c.name",
            "explain": True,
        },
    )
    body = r.get_json()
    assert r.status_code == 200
    assert "Physical Plan" in body["plan"]
    assert "rows" not in body  # explain does not execute


# --- /similar: ANN serving over the at-rest IVF index ----------------


def test_similar_route_serves_vector_search(store, spark, tmp_path):
    """A stored corpus vector queried as itself must come back as its
    own nearest neighbor with cosine ~1; per-request work probes only
    n_probe lists (reported in the response)."""
    from webpagesgraphdatabase_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = similarity.build_ivf_index(
        emb, str(tmp_path / "ivf"), corpus_count=emb.count()
    )
    app = create_app(store, ann_index_path=idx)
    app.config["TESTING"] = True
    c = app.test_client()

    target = emb.filter("vec_id = 7").first()
    r = c.post("/similar", json={"vector": list(target["embedding"]), "k": 3})
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    assert body["neighbors"][0]["vec_id"] == 7
    assert body["neighbors"][0]["cos"] == pytest.approx(1.0, abs=1e-6)
    assert 1 <= len(body["probed_lists"]) <= 4


def test_similar_route_filtered_search(store, spark, tmp_path):
    """allowed_ids narrows the CANDIDATE scan (filtered vector search,
    the ann_ivf_from_index allowed= discipline over HTTP): every
    neighbor is allowed, k fills from the subset, and an oversized or
    non-integer list refuses."""
    from webpagesgraphdatabase_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = similarity.build_ivf_index(
        emb, str(tmp_path / "ivf_f"), corpus_count=emb.count()
    )
    app = create_app(store, ann_index_path=idx)
    app.config["TESTING"] = True
    c = app.test_client()

    target = emb.filter("vec_id = 7").first()
    allowed = [2, 4, 6, 8, 10, 12, 14, 16]
    r = c.post(
        "/similar",
        json={
            "vector": list(target["embedding"]),
            "k": 3,
            "n_probe": 64,
            "allowed_ids": allowed,
        },
    )
    assert r.status_code == 200, r.get_json()
    got = [n["vec_id"] for n in r.get_json()["neighbors"]]
    assert got and all(v in allowed for v in got)
    # vec 7 itself is disallowed — the subset's winners fill k anyway
    assert 7 not in got and len(got) == 3
    bad = c.post(
        "/similar",
        json={"vector": list(target["embedding"]), "allowed_ids": ["x"]},
    )
    assert bad.status_code == 400
    huge = c.post(
        "/similar",
        json={
            "vector": list(target["embedding"]),
            "allowed_ids": list(range(10_001)),
        },
    )
    assert huge.status_code == 400


def test_similar_route_validates_input(store, spark, tmp_path):
    from webpagesgraphdatabase_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = similarity.build_ivf_index(
        emb, str(tmp_path / "ivf2"), corpus_count=500
    )
    app = create_app(store, ann_index_path=idx)
    app.config["TESTING"] = True
    c = app.test_client()
    assert c.post("/similar", json={}).status_code == 400
    assert c.post("/similar", json={"vector": ["x"]}).status_code == 400
    r = c.post("/similar", json={"vector": [1.0, 2.0]})  # wrong dim
    assert r.status_code == 400 and "dim" in r.get_json()["error"]


def test_similar_route_unconfigured_is_503(client):
    assert client.post("/similar", json={"vector": [1.0]}).status_code == 503


def test_cypher_route_varlen_reach(client, store):
    """POST /cypher with a variable-length reach statement compiles to
    bounded_reach and agrees with the API on the stored graph."""
    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach

    client.post("/add_link", data={"url": "https://reach.example/a"})
    r = client.post(
        "/cypher",
        json={
            "query": "MATCH (n:Link)-[*1..2]-(m) "
            "RETURN n.url AS url, COUNT(DISTINCT m) AS reach"
        },
    )
    assert r.status_code == 200
    body = r.get_json()
    assert body["columns"] == ["url", "reach"]
    want = {
        (row.node_id.removeprefix("Link:"), row.n_reach_2)
        for row in bounded_reach(store.graph(), max_hops=2).collect()
        if row.node_id.startswith("Link:")
    }
    assert {tuple(row) for row in body["rows"]} == want and want
    r2 = client.post(
        "/cypher",
        json={"query": "MATCH (n:Link)-[*]-(m) RETURN n.url, COUNT(DISTINCT m)"},
    )
    assert r2.status_code == 400 and "unbounded" in r2.get_json()["error"]


def test_search_route_serves_from_at_rest_index(store, spark, tmp_path):
    """With text_index_path configured, /search serves from the
    bucketed at-rest index (partition-pruned postings scan) — the
    ranking a live corpus scan of the same docs produces, without
    re-tokenizing the corpus per request."""
    from pyspark.sql import functions as F

    import webpagesgraphdatabase_spark.serving as serving
    from webpagesgraphdatabase_spark.operators import search as S

    rows = spark.createDataFrame(
        [
            ("https://i.example/both", "T", "spark hash spark join", "", "", "", ""),
            ("https://i.example/one", "T", "hash table scan", "", "", "", ""),
            ("https://i.example/none", "T", "window data", "", "", "", ""),
        ],
        ["url", "title", "content", "category", "keyword",
         "category_explanation", "keyword_explanation"],
    )
    serving.preload_csv(store, rows)
    corpus = store.graph().links.select(
        F.col("url").alias("doc_id"),
        F.lower(F.coalesce(F.col("raw_content"), F.lit(""))).alias("text"),
    )
    ti = str(tmp_path / "ti")
    S.build_text_index(corpus, ti, n_buckets=8)
    app = create_app(store, text_index_path=ti)
    app.config["TESTING"] = True
    c = app.test_client()
    r = c.post("/search", json={"terms": "Spark, hash", "k": 5})
    assert r.status_code == 200
    got = r.get_json()["results"]
    urls = [x["url"] for x in got]
    assert urls[0] == "https://i.example/both"
    assert "https://i.example/one" in urls
    assert "https://i.example/none" not in urls
    # index path ≡ the live path's ranking on the same corpus
    live = S.bm25_topk(corpus, ("spark", "hash"), k=5).collect()
    assert [(x["rank"], x["url"]) for x in got] == [
        (r2["rank"], r2["doc_id"]) for r2 in live
    ]


def test_search_route_bm25(client, store):
    """/search ranks stored pages by BM25 over their content; the
    doc containing both terms outranks the single-term doc."""
    import webpagesgraphdatabase_spark.serving as serving
    from pyspark.sql import functions as F

    spark = store.spark
    rows = spark.createDataFrame(
        [
            ("https://s.example/both", "T", "spark hash spark join", "", "", "", ""),
            ("https://s.example/one", "T", "hash table scan", "", "", "", ""),
            ("https://s.example/none", "T", "window data", "", "", "", ""),
        ],
        ["url", "title", "content", "category", "keyword",
         "category_explanation", "keyword_explanation"],
    )
    serving.preload_csv(store, rows)
    r = client.post("/search", json={"terms": "Spark, hash", "k": 5})
    assert r.status_code == 200
    got = r.get_json()["results"]
    urls = [x["url"] for x in got]
    assert urls[0] == "https://s.example/both"
    assert "https://s.example/one" in urls
    assert "https://s.example/none" not in urls
    assert got[0]["rank"] == 1 and got[0]["score"] > 0

    # validation
    assert client.post("/search", json={}).status_code == 400
    assert client.post("/search", json={"terms": []}).status_code == 400
    assert (
        client.post("/search", json={"terms": "x", "k": "y"}).status_code == 400
    )


# --- /hybrid: RRF fusion of the text and vector indexes ---------------


def _hybrid_app(store, spark, tmp_path):
    """Both indexes over a shared integer key space: text doc_id =
    embedding vec_id (stringified at fusion time by the route)."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.operators import search as S
    from webpagesgraphdatabase_spark.operators import similarity

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 50)
    )
    ivf = similarity.build_ivf_index(
        emb, str(tmp_path / "ivf"), corpus_count=emb.count()
    )
    # doc 7 is the only strong text match for 'alpha beta'; docs 11/12
    # are weaker single-term matches
    corpus = spark.createDataFrame(
        [(7, "alpha beta alpha beta"), (11, "alpha noise words here"),
         (12, "beta other tokens live"), (13, "unrelated text entirely")],
        ["doc_id", "text"],
    )
    ti = str(tmp_path / "ti")
    S.build_text_index(corpus, ti, n_buckets=4)
    app = create_app(store, ann_index_path=ivf, text_index_path=ti)
    app.config["TESTING"] = True
    return app.test_client(), emb


def test_hybrid_route_fuses_both_legs(store, spark, tmp_path):
    """Query = doc 7's own vector + its own terms: id '7' must win
    (top text rank AND top vector rank), every reported rrf_score must
    equal 1/(60+text_rank) + 1/(60+vector_rank) over the provenance
    ranks the route itself reports, and single-leg docs carry null for
    the missing leg."""
    c, emb = _hybrid_app(store, spark, tmp_path)
    target = emb.filter("vec_id = 7").first()
    r = c.post(
        "/hybrid",
        json={"terms": "alpha beta", "vector": list(target["embedding"]), "k": 5},
    )
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    results = body["results"]
    assert results[0]["id"] == "7"
    assert results[0]["text_rank"] == 1 and results[0]["vector_rank"] == 1
    for e in results:
        want = 0.0
        if e["text_rank"] is not None:
            want += 1.0 / (60 + e["text_rank"])
        if e["vector_rank"] is not None:
            want += 1.0 / (60 + e["vector_rank"])
        assert e["rrf_score"] == pytest.approx(want, abs=1e-6)
    # ranks are 1..n and scores non-increasing
    assert [e["rank"] for e in results] == list(range(1, len(results) + 1))
    scores = [e["rrf_score"] for e in results]
    assert scores == sorted(scores, reverse=True)
    # the text-only doc 13 never retrieved; 11/12 appear via text leg
    ids = {e["id"] for e in results}
    assert "13" not in ids or results[-1]["id"] == "13"


def test_hybrid_route_leg_parity(store, spark, tmp_path):
    """The per-leg provenance ranks must equal what /search and
    /similar return for the same inputs at the same depth."""
    c, emb = _hybrid_app(store, spark, tmp_path)
    target = emb.filter("vec_id = 7").first()
    vec = list(target["embedding"])
    r = c.post("/hybrid", json={"terms": "alpha beta", "vector": vec, "k": 5})
    results = r.get_json()["results"]
    s = c.post("/search", json={"terms": "alpha beta", "k": 20}).get_json()
    text_ranks = {x["url"]: x["rank"] for x in s["results"]}
    v = c.post("/similar", json={"vector": vec, "k": 20}).get_json()
    vec_ranks = {
        str(x["vec_id"]): i for i, x in enumerate(v["neighbors"], start=1)
    }
    for e in results:
        if e["text_rank"] is not None:
            assert text_ranks[_as_doc(e["id"])] == e["text_rank"]
        if e["vector_rank"] is not None:
            assert vec_ranks[e["id"]] == e["vector_rank"]


def _as_doc(s):
    # the test corpus keys text docs by int; /search echoes them as ints
    return int(s)


def test_hybrid_route_unconfigured_is_503(store, spark, tmp_path):
    from webpagesgraphdatabase_spark.operators import search as S

    corpus = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    ti = str(tmp_path / "ti")
    S.build_text_index(corpus, ti, n_buckets=2)
    # text index only — still 503, both are required
    app = create_app(store, text_index_path=ti)
    app.config["TESTING"] = True
    r = app.test_client().post(
        "/hybrid", json={"terms": "a", "vector": [1.0]}
    )
    assert r.status_code == 503


def test_hybrid_route_validates_input(store, spark, tmp_path):
    c, emb = _hybrid_app(store, spark, tmp_path)
    dim = len(emb.first()["embedding"])
    assert c.post("/hybrid", json={"vector": [1.0] * dim}).status_code == 400
    assert c.post("/hybrid", json={"terms": "a"}).status_code == 400
    assert (
        c.post("/hybrid", json={"terms": "a", "vector": ["x"]}).status_code
        == 400
    )
    assert (
        c.post("/hybrid", json={"terms": "a", "vector": [1.0]}).status_code
        == 400
    )  # dim mismatch


def test_hybrid_route_filtered(store, spark, tmp_path):
    """allowed_ids narrows BOTH legs: every fused result id is
    allowed, and the per-leg provenance ranks renumber within the
    subset (candidate narrowing, not post-filtering)."""
    c, emb = _hybrid_app(store, spark, tmp_path)
    target = emb.filter("vec_id = 7").first()
    r = c.post(
        "/hybrid",
        json={
            "terms": "alpha beta",
            "vector": list(target["embedding"]),
            "k": 5,
            "allowed_ids": [11, 12, 13, 20, 22, 24],
        },
    )
    assert r.status_code == 200, r.get_json()
    results = r.get_json()["results"]
    assert results, "filtered hybrid returned nothing"
    assert {e["id"] for e in results} <= {"11", "12", "13", "20", "22", "24"}
    # text leg ranks renumber within the allowed docs: doc 11 is the
    # best allowed text match for 'alpha', so its text_rank is 1
    by_id = {e["id"]: e for e in results}
    assert by_id["11"]["text_rank"] == 1
    # validation: oversized / non-int lists refused
    bad = c.post(
        "/hybrid",
        json={"terms": "a", "vector": list(target["embedding"]),
              "allowed_ids": ["x"]},
    )
    assert bad.status_code == 400


def test_similar_route_more_like_this_and_mmr(store, spark, tmp_path):
    """vec_id runs 'more like this' (stored vector looked up, its own
    row excluded); mmr_lambda=1.0 returns the plain top-k; a missing
    vec_id is a 404; a bad mmr_lambda is a 400."""
    from webpagesgraphdatabase_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = similarity.build_ivf_index(
        emb, str(tmp_path / "ivf"), corpus_count=emb.count()
    )
    app = create_app(store, ann_index_path=idx)
    app.config["TESTING"] = True
    c = app.test_client()

    r = c.post("/similar", json={"vec_id": 7, "k": 3})
    assert r.status_code == 200, r.get_json()
    ids = [n["vec_id"] for n in r.get_json()["neighbors"]]
    assert 7 not in ids and len(ids) == 3
    # parity: the same search by explicit vector, self-row dropped
    target = emb.filter("vec_id = 7").first()
    rv = c.post("/similar", json={"vector": list(target["embedding"]), "k": 4})
    want = [n["vec_id"] for n in rv.get_json()["neighbors"] if n["vec_id"] != 7][:3]
    assert ids == want

    # mmr_lambda=1.0 == relevance order (same ids, same order)
    r1 = c.post(
        "/similar",
        json={"vector": list(target["embedding"]), "k": 3, "mmr_lambda": 1.0},
    )
    plain = c.post(
        "/similar", json={"vector": list(target["embedding"]), "k": 3}
    )
    assert [n["vec_id"] for n in r1.get_json()["neighbors"]] == [
        n["vec_id"] for n in plain.get_json()["neighbors"]
    ]
    assert c.post("/similar", json={"vec_id": 10**9}).status_code == 404
    assert (
        c.post(
            "/similar", json={"vec_id": 7, "mmr_lambda": 2.0}
        ).status_code
        == 400
    )
    # vector + vec_id together is ambiguous (vec_id would silently
    # drive self-exclusion without validation) — rejected outright
    both = c.post(
        "/similar",
        json={"vector": list(target["embedding"]), "vec_id": 7, "k": 3},
    )
    assert both.status_code == 400
    assert "not both" in both.get_json()["error"]


def test_cypher_route_shortest_path(client, store):
    """shortestPath works over HTTP: two stored links that share an
    enrichment keyword read hop distance 2 on the bipartite graph."""
    from pyspark.sql import functions as F

    import webpagesgraphdatabase_spark.serving as serving

    rows = store.spark.createDataFrame(
        [
            ("https://sp.example/a", "TA", "x" * 150, "Database", "shared", "", ""),
            ("https://sp.example/b", "TB", "y" * 150, "News", "shared", "", ""),
        ],
        ["url", "title", "content", "category", "keyword",
         "category_explanation", "keyword_explanation"],
    )
    serving.preload_csv(store, rows)
    r = client.post(
        "/cypher",
        json={
            "query": "MATCH p = shortestPath((n:Link {url: "
            "'https://sp.example/a'})-[*1..4]-(m:Link {url: "
            "'https://sp.example/b'})) RETURN length(p) AS hops"
        },
    )
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    assert body["columns"] == ["hops"]
    assert body["rows"] == [[2]]
    # free endpoint over HTTP: distances from a to every Link
    r2 = client.post(
        "/cypher",
        json={
            "query": "MATCH p = shortestPath((n:Link {url: "
            "'https://sp.example/a'})-[*1..4]-(m)) "
            "RETURN m.url AS url, length(p) AS hops"
        },
    )
    assert r2.status_code == 200, r2.get_json()
    b2 = r2.get_json()
    assert b2["columns"] == ["url", "hops"]
    assert ["https://sp.example/b", 2] in b2["rows"]
    assert all(row[0] != "https://sp.example/a" for row in b2["rows"])


def test_crawl_state_route(spark, store, tmp_path):
    """/crawl/state: the scheduler ops view — ledger rows, politeness
    memory, and the budgeted fetch plan; 503 when unconfigured (the
    /similar discipline)."""
    from webpagesgraphdatabase_spark import warc as W

    # unconfigured -> 503
    app0 = create_app(store)
    assert (
        app0.test_client().get("/crawl/state").status_code == 503
    )

    robots_txt = b"User-agent: *\nCrawl-delay: 5\n"
    cands = [f"https://ops.example/p{i}" for i in range(4)]
    payload = W.build_warc(
        [
            {
                "record_id": "<urn:uuid:rb>",
                "warc_type": "response",
                "target_uri": "https://ops.example/robots.txt",
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "block": W.http_response_block(
                    robots_txt, content_type="text/plain"
                ),
            },
            {
                "record_id": "<urn:uuid:root>",
                "warc_type": "response",
                "target_uri": "https://ops.example/",
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "block": W.http_response_block(
                    (
                        "<html><head><title>t</title></head><body>"
                        "<p>route corpus</p>"
                        + "".join(f'<a href="{h}"></a>' for h in cands)
                        + "</body></html>"
                    ).encode()
                ),
            },
        ]
    )
    (tmp_path / "r1.warc").write_bytes(payload)
    sd = str(tmp_path / "state")
    rep = W.crawl_round_resumable(
        store.spark, store, str(tmp_path / "r1.warc"), sd,
        auto_politeness=True, round_seconds=10.0,
    )
    app = create_app(store, crawl_state_path=sd)
    c = app.test_client()
    body = c.get("/crawl/state").get_json()
    assert len(body["rounds"]) == 1 and body["n_rounds_total"] == 1
    assert body["rounds"][0]["batch_id"] == rep["batch"]
    assert body["rounds"][0]["n_frontier"] == 2  # delay 5 @ 10 s
    assert body["delays"] == {"ops.example": 5.0}
    assert body["n_hosts_total"] == 1
    # the robots body declared no allow/disallow rules — the rule
    # memory holds its NULL marker only, so zero rule-bearing hosts
    assert body["n_rule_hosts_total"] == 0
    # the plan: remaining budgeted candidates, capped by k
    body2 = c.get("/crawl/state?plan=1&round_seconds=10&k=1").get_json()
    assert len(body2["plan"]) == 1
    assert body2["plan"][0]["url"] in cands
    # explicit flag contract (ADVICE r10): 0/false do NOT compute a plan
    assert "plan" not in c.get("/crawl/state?plan=0").get_json()
    assert "plan" not in c.get("/crawl/state?plan=false").get_json()
    # bad numerics -> 400
    assert c.get("/crawl/state?plan=1&k=zz").status_code == 400
    assert c.get("/crawl/state?rounds=zz").status_code == 400

    # r10 verdict: the ledger and delay lists are CAPPED with totals
    # alongside — a second round on a second (stricter-delay) host,
    # then caps of 1 must bound the payload and keep the newest round
    # and the strictest host
    payload2 = W.build_warc(
        [
            {
                "record_id": "<urn:uuid:rb2>",
                "warc_type": "response",
                "target_uri": "https://ops2.example/robots.txt",
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "block": W.http_response_block(
                    b"User-agent: *\nCrawl-delay: 9\n",
                    content_type="text/plain",
                ),
            },
            {
                "record_id": "<urn:uuid:root2>",
                "warc_type": "response",
                "target_uri": "https://ops2.example/",
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "block": W.http_response_block(
                    (
                        "<html><head><title>t</title></head><body>"
                        "<p>second corpus</p></body></html>"
                    ).encode()
                ),
            },
        ]
    )
    (tmp_path / "r2.warc").write_bytes(payload2)
    rep2 = W.crawl_round_resumable(
        store.spark, store, str(tmp_path / "r2.warc"), sd,
        auto_politeness=True, round_seconds=10.0,
    )
    capped = c.get("/crawl/state?rounds=1&delays=1").get_json()
    assert capped["n_rounds_total"] == 2 and len(capped["rounds"]) == 1
    assert capped["rounds"][0]["batch_id"] == rep2["batch"]  # newest
    assert capped["n_hosts_total"] == 2
    assert capped["delays"] == {"ops2.example": 9.0}  # strictest


def test_crawl_state_route_broadcast_rules_param(
    spark, store, tmp_path, monkeypatch
):
    """r11 verdict item 1 + r12 item 6: /crawl/state?plan=1 reaches
    the robots join-strategy choice — ?broadcast_rules=0/1 passes an
    explicit bool through to next_fetch_plan; absent, the route
    RESOLVES the store-size probe itself (an empty store fits →
    True) and passes the resolved bool down, so the reported
    ``plan_broadcast`` is by construction what the plan executed
    with."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    seen = []

    def spy(self, seen_df=None, rules=None, limit_per_domain=None,
            round_seconds=300.0, broadcast_rules=None, **kw):
        seen.append(broadcast_rules)
        return spark.createDataFrame(
            [("https://x.example/a", 1)], "url string, indeg long"
        )

    monkeypatch.setattr(CrawlState, "next_fetch_plan", spy)
    app = create_app(store, crawl_state_path=str(tmp_path / "state"))
    c = app.test_client()
    b0 = c.get("/crawl/state?plan=1")
    assert b0.status_code == 200
    assert b0.get_json()["plan_broadcast"]["rules"] is True
    b1 = c.get("/crawl/state?plan=1&broadcast_rules=0")
    assert b1.status_code == 200
    assert b1.get_json()["plan_broadcast"]["rules"] is False
    assert c.get("/crawl/state?plan=1&broadcast_rules=1").status_code == 200
    assert seen == [True, False, True]


def test_crawl_state_route_budget_surfacing(
    spark, store, tmp_path, monkeypatch
):
    """r12 verdict item 6: every /crawl/state response reports raw
    store rows vs the broadcast budget and the join shape the next
    stored-memory round will take; the reported choice flips EXACTLY
    at the threshold, and ?plan=1's plan_broadcast echoes the choices
    the plan actually executed with."""
    from webpagesgraphdatabase_spark import robots as R
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    sd = str(tmp_path / "state")
    state = CrawlState(spark, sd)
    rules = R.robots_rules(
        spark.createDataFrame(
            [
                (f"b{i}.example", "User-agent: *\nDisallow: /private\n")
                for i in range(5)
            ],
            ["host", "body"],
        )
    )
    state.record_round(
        41,
        "r1.warc",
        {},
        spark.createDataFrame(
            [("https://b0.example/x", 1)], "url string, indeg long"
        ),
        delays=spark.createDataFrame(
            [("b0.example", 2.0)], "host string, crawl_delay double"
        ),
        rules=rules,
    )
    app = create_app(store, crawl_state_path=sd)
    c = app.test_client()

    body = c.get("/crawl/state?plan=1").get_json()
    bb = body["broadcast_budget"]
    assert bb["budget_rows"] == R.BROADCAST_RULES_MAX_ROWS
    assert bb["rules"] == {"rows": 5, "rows_exact": True, "join": "broadcast"}
    assert bb["hosts"] == {"rows": 1, "rows_exact": True, "join": "broadcast"}
    assert body["plan_broadcast"] == {"rules": True, "delays": True}

    # exactly AT the threshold: 5 rule rows fit a budget of 5
    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 5)
    body = c.get("/crawl/state?plan=1").get_json()
    assert body["broadcast_budget"]["rules"]["join"] == "broadcast"
    assert body["plan_broadcast"]["rules"] is True

    # one past: the reported choice flips to shuffled, and the row
    # count becomes an honest lower bound (the probe short-circuits)
    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 4)
    body = c.get("/crawl/state?plan=1").get_json()
    assert body["broadcast_budget"]["rules"]["join"] == "shuffled"
    assert body["broadcast_budget"]["rules"]["rows_exact"] is False
    assert body["broadcast_budget"]["rules"]["rows"] >= 5
    assert body["plan_broadcast"] == {"rules": False, "delays": True}

    # explicit override wins and is reported as what actually ran
    body = c.get("/crawl/state?plan=1&broadcast_rules=1").get_json()
    assert body["plan_broadcast"]["rules"] is True

    # the delay memory flips independently under its own gate
    monkeypatch.setattr(R, "BROADCAST_RULES_MAX_ROWS", 0)
    body = c.get("/crawl/state?plan=1").get_json()
    assert body["broadcast_budget"]["hosts"]["join"] == "shuffled"
    assert body["plan_broadcast"] == {"rules": False, "delays": False}


def test_crawl_state_route_host_point_lookup(spark, store, tmp_path):
    """r11 verdict item 6: /crawl/state?host= returns one host's
    governing state — latest rule set (k-capped with the total
    alongside), strictest stored delay, backlog candidate count — and
    a host whose newest robots.txt cleared its rules (NULL marker)
    reads RULELESS."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    sd = str(tmp_path / "state")
    state = CrawlState(spark, sd)
    RULE_DDL = (
        "host string, allow boolean, pattern string, rx string, plen int"
    )
    state.record_round(
        501, "r1.warc", {},
        spark.createDataFrame(
            [
                ("https://a.example/c1", 3),
                ("https://a.example/c2", 1),
                ("https://b.example/c3", 2),
            ],
            "url string, indeg long",
        ),
        delays=spark.createDataFrame(
            [("a.example", 5.0)], "host string, crawl_delay double"
        ),
        rules=spark.createDataFrame(
            [
                ("a.example", False, "/private", "^/private", 8),
                ("a.example", True, "/private/ok", "^/private/ok", 11),
                ("b.example", False, "/b1", "^/b1", 3),
            ],
            RULE_DDL,
        ),
    )
    # round 2: b.example's robots emptied — NULL marker CLEARS it
    state.record_round(
        502, "r2.warc", {},
        spark.createDataFrame([], "url string, indeg long"),
        rules=spark.createDataFrame(
            [("b.example", None, None, None, None)], RULE_DDL
        ),
    )

    c = create_app(store, crawl_state_path=sd).test_client()
    a = c.get("/crawl/state?host=a.example").get_json()
    assert a["host"] == "a.example"
    assert a["crawl_delay"] == 5.0
    assert a["n_rules_total"] == 2
    # longest pattern first — the adjudication's consult order
    assert [r["pattern"] for r in a["rules"]] == ["/private/ok", "/private"]
    assert a["backlog_count"] == 2

    # k caps the rule list, total stays
    a1 = c.get("/crawl/state?host=a.example&k=1").get_json()
    assert len(a1["rules"]) == 1 and a1["n_rules_total"] == 2

    # the cleared host: ruleless, no delay, its candidate still queued
    b = c.get("/crawl/state?host=b.example").get_json()
    assert b["rules"] == [] and b["n_rules_total"] == 0
    assert b["crawl_delay"] is None
    assert b["backlog_count"] == 1

    # unknown host: all-empty scalars, still a 200 (bounded response)
    z = c.get("/crawl/state?host=zz.example").get_json()
    assert z["rules"] == [] and z["backlog_count"] == 0
