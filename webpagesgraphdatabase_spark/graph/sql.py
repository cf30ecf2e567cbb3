"""SQL surface over the property graph — SURVEY surface A, third form.

Reference users query the graph three ways in this engine: Python query
functions (:mod:`.queries`), Cypher-shaped motifs (:mod:`.motif`), and —
here — plain Spark SQL over registered views. ``register_views`` exposes
the five graph tables as temp views; every reference query is then one
SQL statement away, planned by the same Catalyst pipeline as the
DataFrame forms (views are zero-copy aliases of the lazy DataFrames).

``FLAGSHIP_SQL`` is the canonical interconnection query in SQL form —
the exact statement a Kùzu user would port their Cypher to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .model import PropertyGraph

VIEW_NAMES = ("links", "categories", "keywords", "belongs_to", "has_keyword")

FLAGSHIP_SQL = """
SELECT hk1.dst_keyword AS keyword,
       b1.dst_category AS category_1, b2.dst_category AS category_2,
       hk1.src_url AS url_1, hk2.src_url AS url_2
FROM has_keyword hk1
JOIN has_keyword hk2
  ON hk1.dst_keyword = hk2.dst_keyword AND hk1.src_url < hk2.src_url
JOIN belongs_to b1 ON hk1.src_url = b1.src_url
JOIN belongs_to b2 ON hk2.src_url = b2.src_url
WHERE b1.dst_category <> b2.dst_category
ORDER BY keyword, category_1, category_2, url_1, url_2
LIMIT 100
"""


def register_views(g: PropertyGraph, prefix: str = "") -> None:
    """Register the graph tables as temp views (``<prefix><table>``)."""
    for name in VIEW_NAMES:
        getattr(g, name).createOrReplaceTempView(f"{prefix}{name}")


def sql(spark: SparkSession, g: PropertyGraph, statement: str) -> DataFrame:
    """Run a SQL statement against the graph's views (registers them
    first — cheap, they are lazy aliases)."""
    register_views(g)
    return spark.sql(statement)
