"""SQL-surface tests: registered graph views + flagship query in SQL."""

from __future__ import annotations

import pytest

from webpagesgraphdatabase_spark.graph import queries as Q
from webpagesgraphdatabase_spark.graph import sql as gsql
from webpagesgraphdatabase_spark.graph.tpch_adapter import graph_from_tpch

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def g(spark):
    return graph_from_tpch(spark, SF_DIR)


def test_views_registered_and_queryable(spark, g):
    gsql.register_views(g)
    assert spark.sql("SELECT count(*) AS n FROM links").first().n == g.links.count()
    assert (
        spark.sql("SELECT count(*) AS n FROM has_keyword").first().n
        == g.has_keyword.count()
    )


def test_flagship_sql_equals_optimized_plan(spark, g):
    via_sql = gsql.sql(spark, g, gsql.FLAGSHIP_SQL).collect()
    via_fn = Q.interconnections_canonical(g).collect()
    assert via_sql == via_fn


def test_one_hop_sql(spark, g):
    rows = gsql.sql(
        spark,
        g,
        """
        SELECT c.name AS category, count(*) AS cnt
        FROM links l
        JOIN belongs_to b ON l.url = b.src_url
        JOIN categories c ON b.dst_category = c.name
        GROUP BY c.name
        """,
    ).collect()
    want = {(r.category, r.cnt) for r in Q.links_per_category(g).collect()}
    assert {(r.category, r.cnt) for r in rows} == want
