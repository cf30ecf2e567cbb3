"""Adversarial-skew test for the flagship interconnection query: one
keyword shared by every link (the worst case the salted, limit-pushdown
plan exists for) must stay correct — and never expand the quadratic
pair space (guarded by comparing against the algebraic pair total)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.graph import queries as Q
from webpagesgraphdatabase_spark.graph.model import PropertyGraph

N_LINKS = 400  # one hot keyword over 400 links -> 79,800 raw pairs


@pytest.fixture(scope="module")
def skewed_graph(spark):
    cats = ["C0", "C1", "C2", "C3"]
    urls = [f"u{i:04d}" for i in range(N_LINKS)]
    links = spark.createDataFrame(
        [(u, u, None, None, None, None, "none", None, None) for u in urls],
        "url string, title string, raw_category string, suggested_category string,"
        "raw_content string, cleaned_content string, keywords string,"
        "category_explanation string, keyword_explanation string",
    )
    belongs_to = spark.createDataFrame(
        [(u, cats[i % len(cats)]) for i, u in enumerate(urls)],
        ["src_url", "dst_category"],
    )
    has_keyword = spark.createDataFrame(
        [(u, "hot") for u in urls] + [(urls[0], "cold"), (urls[1], "cold")],
        ["src_url", "dst_keyword"],
    )
    return PropertyGraph(
        links=links,
        categories=spark.createDataFrame([(c,) for c in cats], ["name"]),
        keywords=spark.createDataFrame([("hot",), ("cold",)], ["name"]),
        belongs_to=belongs_to,
        has_keyword=has_keyword,
    )


def test_skewed_canonical_matches_naive(skewed_graph):
    for lim in (10, 100):
        fast = Q.interconnections_canonical(skewed_graph, lim).collect()
        naive = Q.interconnections_canonical_naive(skewed_graph, lim).collect()
        assert fast == naive
        assert len(fast) == lim


def test_skewed_pair_counts_algebraic(skewed_graph):
    """Algebraic pair counts must equal the expanded-join ground truth."""
    got = {
        (r.category_1, r.category_2): r.cnt
        for r in Q.interconnection_pair_counts(skewed_graph).collect()
    }
    # ground truth on the hot keyword: symmetric ordered pairs across the
    # 4 round-robin categories of 400 links (100 each) + the cold keyword
    # pair (u0 in C0, u1 in C1, both directions)
    expect_hot = 100 * 100
    for a in range(4):
        for b in range(4):
            if a != b:
                expected = expect_hot + (1 if {a, b} == {0, 1} else 0)
                assert got[(f"C{a}", f"C{b}")] == expected
