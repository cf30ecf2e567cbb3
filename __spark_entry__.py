"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interconnection query (SURVEY.md §2
J3, reference ``Edits.ipynb c11:28-36``) on the sf0.001 graph built from
the TPC-H-ish tables. ``queries()`` / ``oracle_sql()`` expose the full
operator registry (see ``webpagesgraphdatabase_spark/registry.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from webpagesgraphdatabase_spark import registry
from webpagesgraphdatabase_spark.graph import graph_from_tpch
from webpagesgraphdatabase_spark.graph import queries as graph_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    g = graph_from_tpch(spark, SMOKE_SF_DIR)
    return graph_queries.interconnections_canonical(g)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
