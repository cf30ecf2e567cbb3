"""Tests for the scalar function library (SURVEY §2.8 F1-F7) and the
staged ETL pipeline (§3.3), including reference-derived parser cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark import functions as fn
from webpagesgraphdatabase_spark import pipeline as pl


# --- F1: URL normalization (reference main.py:100-104) -------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("example.com", "https://example.com"),
        ("example.com/", "https://example.com"),
        ("http://example.com/a/b/", "http://example.com/a/b"),
        ("https://example.com/p?q=1#frag", "https://example.com/p"),  # query+frag dropped
        ("example.com/a b", "https://example.com/a%20b"),  # quote step
        ("", ""),
    ],
)
def test_normalize_url_py(raw, expected):
    assert fn.normalize_url_py(raw) == expected


def test_normalize_url_udf(spark):
    df = spark.createDataFrame([("example.com/x/",)], ["url"])
    assert df.select(fn.normalize_url("url").alias("u")).first().u == (
        "https://example.com/x"
    )


# --- F2: category/keyword parser (reference main.py:53-80) ---------------


def test_parse_allowlist_exact_hit():
    cat, sug, kws = fn.parse_category_and_keywords_py(
        "Category: Database Keywords: indexing, sharding."
    )
    assert cat == "Database" and sug == "Database"
    assert kws == ["indexing", "sharding"]


def test_parse_allowlist_case_insensitive():
    cat, sug, _ = fn.parse_category_and_keywords_py("Category: database Keywords: x.")
    assert cat == "Database" and sug == "database"


def test_parse_substring_match_beats_suggested():
    # allowlist entry appearing anywhere in the response wins
    cat, sug, _ = fn.parse_category_and_keywords_py(
        "Category: Something Else Keywords: graph technologies rock."
    )
    assert cat == "graph technologies" and sug == "Something Else"


def test_parse_miss_is_uncategorized():
    cat, sug, kws = fn.parse_category_and_keywords_py(
        "Category: Quantum Baking Keywords: flour, qubits."
    )
    assert cat == "Uncategorized" and sug == "Quantum Baking"
    assert kws == ["flour", "qubits"]


def test_parse_keyword_cap_at_three():
    _, _, kws = fn.parse_category_and_keywords_py(
        "Category: Quantum Baking Keywords: a, b, c, d, e."
    )
    assert kws == ["a", "b", "c"]


def test_parse_fallback_capitalized_phrases():
    cat, sug, kws = fn.parse_category_and_keywords_py(
        "This mentions Knowledge Graphs and Semantic Search extensively."
    )
    assert cat == "Uncategorized"
    assert kws and all(len(k.split()) <= 2 for k in kws)
    assert all("uncategorized" not in k.lower() for k in kws)


def test_parse_empty_response():
    assert fn.parse_category_and_keywords_py("") == (
        "Uncategorized",
        "Uncategorized",
        ["none"],
    )


def test_parse_enrichment_udf(spark):
    df = spark.createDataFrame(
        [("Category: News Keywords: one, two.",)], ["resp"]
    ).select(fn.parse_enrichment("resp").alias("p"))
    row = df.select("p.category", "p.keywords").first()
    assert row.category == "News" and row.keywords == ["one", "two"]


# --- F3: fenced JSON -----------------------------------------------------


def test_parse_fenced_json_column(spark):
    fenced = '```json\n{"category": "c", "keywords": ["k"], ' \
             '"category_explanation": "e", "keyword_explanations": ["x"]}\n```'
    df = spark.createDataFrame([(fenced,), ("not json",)], ["raw"])
    rows = df.select(fn.parse_fenced_json(F.col("raw")).alias("p")).collect()
    assert rows[0].p.category == "c" and rows[0].p.keywords == ["k"]
    assert rows[1].p is None or rows[1].p.category is None


def test_split_join_keywords_roundtrip(spark):
    df = spark.createDataFrame([("a, b , ,c, d",), ("none",)], ["kw"])
    out = df.select(
        fn.join_keywords(fn.split_keywords(F.col("kw"))).alias("j")
    ).collect()
    assert out[0].j == "a, b, c"  # trimmed, empties dropped, capped at 3
    assert out[1].j == "none"


# --- S7 fetch retry fidelity (reference c4:9-27) -------------------------


def test_fetch_stage_retries_transient_and_degrades_permanent(spark):
    attempts: dict[str, int] = {}

    def flaky(url: str) -> tuple[str, str]:
        n = attempts.get(url, 0)
        attempts[url] = n + 1
        if url.endswith("/transient") and n == 0:
            raise RuntimeError("flaky once")  # succeeds on attempt 2
        if url.endswith("/permanent"):
            raise RuntimeError("always down")
        return "Title", "c" * 200

    urls = spark.createDataFrame(
        [("http://x/transient",), ("http://x/permanent",), ("http://x/ok",)],
        ["url"],
    ).coalesce(1)
    out = {r.url: (r.title, r.content) for r in pl.fetch_stage(urls, flaky).collect()}
    # transient failure retried within the task (c4:10 retries=2)
    assert out["http://x/transient"] == ("Title", "c" * 200)
    # exhausted retries degrade to (title=url, content='') (c4:24-26),
    # never a task failure
    assert out["http://x/permanent"] == ("http://x/permanent", "")
    assert out["http://x/ok"] == ("Title", "c" * 200)


# --- pipeline end-to-end -------------------------------------------------


@pytest.fixture(scope="module")
def pipeline_result(spark, tmp_path_factory):
    urls = spark.createDataFrame(
        [(f"site{i}.example/page/{i}",) for i in range(40)], ["url"]
    )
    p = pl.Pipeline(spark, str(tmp_path_factory.mktemp("wh")))
    return p.run(urls), urls


def test_pipeline_conservation(pipeline_result):
    """Every input url lands in exactly one of: metadata, review, failed."""
    res, urls = pipeline_result
    n = urls.count()
    n_meta, n_review, n_failed = (
        res.metadata.count(),
        res.review.count(),
        res.failed.count(),
    )
    assert n_meta + n_review + n_failed == n
    assert n_review > 0  # stub fetcher makes ~1/5 fail the gate
    assert n_meta > 0


def test_pipeline_gate_reason(pipeline_result):
    res, _ = pipeline_result
    reasons = {r.reason for r in res.review.collect()}
    assert reasons == {"Insufficient content after cleaning"}


def test_pipeline_metadata_invariants(pipeline_result):
    res, _ = pipeline_result
    rows = res.metadata.collect()
    # uncategorized-count invariant "should be 0" (c10:94-98)
    assert all(r.category != "uncategorized" for r in rows)
    assert all(r.keyword != "none" for r in rows)
    assert all(1 <= len(r.keyword.split(",")) <= 3 for r in rows)
    assert all(len(r.content.strip()) >= pl.MIN_CONTENT for r in rows)


def test_pipeline_cleaning_log_covers_all(pipeline_result):
    res, urls = pipeline_result
    assert res.cleaning_log.count() == urls.count()


def test_pipeline_deterministic_rerun(spark, tmp_path):
    urls = spark.createDataFrame([(f"u{i}.example",) for i in range(10)], ["url"])
    a = pl.Pipeline(spark, str(tmp_path / "a")).run(urls)
    b = pl.Pipeline(spark, str(tmp_path / "b")).run(urls)
    assert sorted(map(tuple, a.metadata.collect())) == sorted(
        map(tuple, b.metadata.collect())
    )


def test_pipeline_failing_categorizer_side_output(spark, tmp_path):
    urls = spark.createDataFrame([("ok1.example/long/path",)], ["url"])
    p = pl.Pipeline(
        spark, str(tmp_path / "wh"), categorizer=pl.failing_categorizer
    )
    res = p.run(urls)
    assert res.metadata.count() == 0
    reasons = {r.reason for r in res.failed.collect()}
    assert reasons <= {"Failed to generate meaningful category or keywords"}
