"""Tests for the chain-motif pattern matcher (Cypher-shaped surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.graph import queries as Q
from webpagesgraphdatabase_spark.graph.model import PropertyGraph
from webpagesgraphdatabase_spark.graph.motif import MotifSyntaxError, match


@pytest.fixture(scope="module")
def g(spark):
    links = spark.createDataFrame(
        [(u, f"t{u}", None, None, None, None, "none", None, None)
         for u in ("a", "b", "c")],
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
        [("a", "k1"), ("b", "k1"), ("c", "k2")], ["src_url", "dst_keyword"]
    )
    return PropertyGraph(links, categories, keywords, belongs_to, has_keyword)


def test_single_hop_forward(g):
    rows = {(r.l, r.c) for r in match(g, "(l:Link)-[:BELONGS_TO]->(c:Category)").collect()}
    assert rows == {("a", "X"), ("b", "Y"), ("c", "Y")}


def test_single_hop_reverse_arrow(g):
    rows = {(r.c, r.l) for r in match(g, "(c:Category)<-[:BELONGS_TO]-(l:Link)").collect()}
    assert rows == {("X", "a"), ("Y", "b"), ("Y", "c")}


def test_shared_keyword_two_hop(g):
    df = match(g, "(l1:Link)-[:HAS_KEYWORD]->(k)<-[:HAS_KEYWORD]-(l2:Link)")
    rows = {(r.l1, r.k, r.l2) for r in df.filter(F.col("l1") < F.col("l2")).collect()}
    assert rows == {("a", "k1", "b")}


def test_flagship_four_way_matches_query_layer(g):
    """The flagship interconnection expressed as a motif must agree with
    the hand-written (optimized) query plan."""
    df = match(
        g,
        "(c1:Category)<-[:BELONGS_TO]-(l1:Link)-[:HAS_KEYWORD]->(k)"
        "<-[:HAS_KEYWORD]-(l2:Link)-[:BELONGS_TO]->(c2:Category)",
    )
    via_motif = (
        df.filter((F.col("l1") < F.col("l2")) & (F.col("c1") != F.col("c2")))
        .select(
            F.col("k").alias("keyword"),
            F.col("c1").alias("category_1"),
            F.col("c2").alias("category_2"),
            F.col("l1").alias("url_1"),
            F.col("l2").alias("url_2"),
        )
        .orderBy("keyword", "category_1", "category_2", "url_1", "url_2")
        .collect()
    )
    via_query = Q.interconnections_canonical(g).collect()
    assert via_motif == via_query


def test_repeated_variable_is_equality_constraint(g):
    # (l)-[:HAS_KEYWORD]->(k)<-[:HAS_KEYWORD]-(l): same link both ends
    df = match(g, "(l:Link)-[:HAS_KEYWORD]->(k)<-[:HAS_KEYWORD]-(l)")
    rows = {(r.l, r.k) for r in df.collect()}
    assert rows == {("a", "k1"), ("b", "k1"), ("c", "k2")}


def test_label_inference_from_rel(g):
    # no labels given: inferred from BELONGS_TO endpoints
    rows = match(g, "(l)-[:BELONGS_TO]->(c)").collect()
    assert len(rows) == 3


@pytest.mark.parametrize(
    "bad",
    [
        "(l:Link)-[:NOPE]->(c)",  # unknown rel
        "(l:Link)->(c)",  # missing rel block
        "(l:Category)-[:BELONGS_TO]->(c)",  # label conflict: src must be Link
        "(l:Link)-[:BELONGS_TO]->(c:Keyword)",  # label conflict on dst
        "(x)",  # unconstrained single var
        "(l:Link)-[:BELONGS_TO]<-(c)",  # malformed arrows
    ],
)
def test_syntax_and_type_errors(g, bad):
    with pytest.raises(MotifSyntaxError):
        match(g, bad)
