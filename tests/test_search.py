"""BM25 retrieval: hand-checked scores, batch/literal agreement, the
bucketed index-at-rest serving path."""

from __future__ import annotations

import math

import pytest

from webpagesgraphdatabase_spark.operators import search

DOCS = [
    (1, "spark hash spark"),
    (2, "hash table scan"),
    (3, "window data"),
    (4, "spark"),
]


def _expected(query_terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        score = 0.0
        for term in query_terms:
            tf = t.count(term)
            if not tf:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if score:
            out[d] = score
    return out


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_bm25_scores_hand_checked(spark, docs):
    got = {
        r.doc_id: r.score
        for r in search.bm25_scores(docs, ("spark", "hash")).collect()
    }
    want = _expected(("spark", "hash"))
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d


def test_bm25_topk_total_order(spark, docs):
    rows = search.bm25_topk(docs, ("spark", "hash"), k=2).collect()
    want = sorted(
        _expected(("spark", "hash")).items(), key=lambda kv: (-kv[1], kv[0])
    )[:2]
    assert [(r.rank, r.doc_id) for r in rows] == [
        (i + 1, d) for i, (d, _) in enumerate(want)
    ]


def test_bm25_search_batch_matches_literal(spark, docs):
    queries = spark.createDataFrame(
        [("q1", "spark"), ("q1", "hash"), ("q2", "data")],
        ["query_id", "term"],
    )
    got = search.bm25_search(docs, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.score
    lit1 = {
        r.doc_id: r.score
        for r in search.bm25_topk(docs, ("spark", "hash"), k=10).collect()
    }
    lit2 = {
        r.doc_id: r.score
        for r in search.bm25_topk(docs, ("data",), k=10).collect()
    }
    assert set(by_q["q1"]) == set(lit1)
    for d, s in lit1.items():
        assert by_q["q1"][d] == pytest.approx(s, rel=1e-12)
    assert set(by_q["q2"]) == set(lit2)


def test_index_at_rest_matches_and_prunes(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    search.build_text_index(docs, path, n_buckets=8)
    served = search.bm25_from_index(spark, path, ("spark", "hash"), k=4)
    live = search.bm25_topk(docs, ("spark", "hash"), k=4)
    assert [(r.rank, r.doc_id) for r in served.collect()] == [
        (r.rank, r.doc_id) for r in live.collect()
    ]
    for a, b in zip(served.collect(), live.collect()):
        assert a.score == pytest.approx(b.score, rel=1e-12)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruned scan must not enumerate every bucket
    assert "bucket#" in plan or "bucket IN" in plan or "isin" not in plan


def test_empty_query_raises(docs):
    with pytest.raises(ValueError):
        search.bm25_scores(docs, ())


def test_text_index_append_exactly_once(spark, docs, tmp_path):
    """Incremental indexing: base build + one appended batch serve
    identical results to a one-shot index of the union corpus (stats
    merge by integer addition, so even avgdl is bit-equal); replaying
    the same batch id does not duplicate postings or stats."""
    more = spark.createDataFrame(
        [(10, "spark spark table"), (11, "hash window hash")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "idx")
    search.build_text_index(docs, path, n_buckets=8)
    search.text_index_append(more, path)
    union = spark.createDataFrame(DOCS, ["doc_id", "text"]).unionByName(more)
    full = str(tmp_path / "full")
    search.build_text_index(union, full, n_buckets=8)

    got = search.bm25_from_index(spark, path, ("spark", "hash"), k=6).collect()
    want = search.bm25_from_index(spark, full, ("spark", "hash"), k=6).collect()
    assert [(r.rank, r.doc_id) for r in got] == [(r.rank, r.doc_id) for r in want]
    for a, b in zip(got, want):
        assert a.score == b.score  # bit-equal: same integer-sum division

    # replay batch 1: dynamic overwrite of its own partitions only
    search.text_index_append(more, path, batch=1)
    stats = spark.read.parquet(f"{path}/stats.parquet")
    assert stats.count() == 2
    n_post = spark.read.parquet(f"{path}/postings.parquet").count()
    n_full = spark.read.parquet(f"{full}/postings.parquet").count()
    assert n_post == n_full


def test_compact_text_index_identical_scores_and_replay_noop(
    spark, docs, tmp_path
):
    """Compaction folds the three stores to one segment with
    bit-identical query scores; the watermark makes a replayed
    pre-compaction batch a no-op (re-appending would double postings
    AND corpus stats — scores would silently drift)."""
    more = spark.createDataFrame(
        [(10, "spark spark table"), (11, "hash window hash")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "idx")
    search.build_text_index(docs, path, n_buckets=8)
    search.text_index_append(more, path, batch=1)
    before = search.bm25_from_index(spark, path, ("spark", "hash"), k=6).collect()
    report = search.compact_text_index(spark, path)
    assert report["watermark"] == 1
    assert report["files_after"] <= report["files_before"]
    stats = spark.read.parquet(f"{path}/stats.parquet")
    assert stats.count() == 1  # folded to one batch-0 row
    row = stats.first()
    assert row["n_docs"] == 6.0 and row["batch"] == 0
    after = search.bm25_from_index(spark, path, ("spark", "hash"), k=6).collect()
    assert [(r.rank, r.doc_id) for r in after] == [
        (r.rank, r.doc_id) for r in before
    ]
    for a, b in zip(after, before):
        assert a.score == b.score
    # checkpoint replay of the folded batch: must no-op entirely
    n_post = spark.read.parquet(f"{path}/postings.parquet").count()
    search.text_index_append(more, path, batch=1)
    assert spark.read.parquet(f"{path}/postings.parquet").count() == n_post
    assert spark.read.parquet(f"{path}/stats.parquet").count() == 1
    # fresh data allocates ABOVE the watermark
    search.text_index_append(
        spark.createDataFrame([(20, "spark anew")], ["doc_id", "text"]), path
    )
    batches = {
        r.batch
        for r in spark.read.parquet(f"{path}/stats.parquet")
        .select("batch").distinct().collect()
    }
    assert batches == {0, 2}


def test_bm25_from_index_allowed_filter(spark, tmp_path):
    """Filtered index retrieval keeps CORPUS statistics (idf/avgdl) and
    narrows candidates: the filtered top-k equals the allowed-only
    prefix of the unfiltered full ranking; int and string filter key
    types both work against the int-keyed index."""
    from webpagesgraphdatabase_spark.operators import search as S

    corpus = spark.createDataFrame(
        [(i, f"spark hash {'spark ' * (i % 4)}tail{i}") for i in range(12)],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "ti")
    S.build_text_index(corpus, path, n_buckets=4)
    full = S.bm25_from_index(spark, path, ("spark", "hash"), k=12).collect()
    allowed_ids = [0, 3, 5, 6, 9]
    allowed = spark.createDataFrame(
        [(i,) for i in allowed_ids], ["doc_id"]
    )
    got = S.bm25_from_index(
        spark, path, ("spark", "hash"), k=3, allowed=allowed
    ).collect()
    want = [r["doc_id"] for r in full if r["doc_id"] in set(allowed_ids)][:3]
    assert [r["doc_id"] for r in got] == want
    # scores equal the unfiltered scores (corpus stats preserved)
    full_scores = {r["doc_id"]: r["score"] for r in full}
    for r in got:
        assert r["score"] == full_scores[r["doc_id"]]
    # string-typed filter keys match the int-keyed index identically
    allowed_s = spark.createDataFrame(
        [(str(i),) for i in allowed_ids], ["doc_id"]
    )
    got_s = S.bm25_from_index(
        spark, path, ("spark", "hash"), k=3, allowed=allowed_s
    ).collect()
    assert [r["doc_id"] for r in got_s] == want
