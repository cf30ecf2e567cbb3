"""Property-graph data model as plain DataFrames.

Reference schema (``main.py:20-24`` in the reference repo):

- node ``Link(url PK, title, raw_category, suggested_category, raw_content,
  cleaned_content, keywords, category_explanation, keyword_explanation)``
  — all STRING
- node ``Category(name PK)``, node ``Keyword(name PK)``
- rel ``BELONGS_TO(FROM Link TO Category)``, rel ``HAS_KEYWORD(FROM Link
  TO Keyword)`` — no properties

Spark realization: five DataFrames. Primary keys are a *discipline*, not
a constraint — maintained by anti-join inserts (see ``mutations.py``) and
assertable via ``duplicate_key_report``. Edges are 2-column DataFrames
``(src_url, dst_*)``; traversal is equi-joins, which lets Catalyst pick
broadcast vs shuffled hash vs sort-merge per side. At 100 TB the node and
edge tables would be stored as Parquet bucketed by their join key
(``url`` / ``name``) so repeated traversals avoid re-shuffling.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINK_COLUMNS = (
    "url",
    "title",
    "raw_category",
    "suggested_category",
    "raw_content",
    "cleaned_content",
    "keywords",
    "category_explanation",
    "keyword_explanation",
)

LINK_SCHEMA = T.StructType([T.StructField(c, T.StringType()) for c in LINK_COLUMNS])
NAME_SCHEMA = T.StructType([T.StructField("name", T.StringType())])
BELONGS_TO_SCHEMA = T.StructType(
    [T.StructField("src_url", T.StringType()), T.StructField("dst_category", T.StringType())]
)
HAS_KEYWORD_SCHEMA = T.StructType(
    [T.StructField("src_url", T.StringType()), T.StructField("dst_keyword", T.StringType())]
)


@dataclass
class PropertyGraph:
    """Three node tables + two edge tables (reference ``main.py:20-24``)."""

    links: DataFrame
    categories: DataFrame
    keywords: DataFrame
    belongs_to: DataFrame
    has_keyword: DataFrame
    #: Tri-state constraint witness: True = the one-category-per-link
    #: invariant is known to hold (verified, or guaranteed by the
    #: builder's construction), False = known violated, None = unknown —
    #: consumers that rely on it (the algebraic flagship plan) probe.
    #: Kept at the graph/store level, where a DBMS would keep a
    #: constraint, so per-query plans don't re-pay the check.
    single_category_verified: bool | None = None

    def cache(self) -> "PropertyGraph":
        """Cache hot tables for a serving layer (reference re-runs full
        queries per HTTP GET, ``main.py:185-204``; we cache instead)."""
        for df in (self.links, self.categories, self.keywords, self.belongs_to, self.has_keyword):
            df.cache()
        return self

    def node_counts(self) -> dict[str, int]:
        return {
            "Link": self.links.count(),
            "Category": self.categories.count(),
            "Keyword": self.keywords.count(),
        }

    def edge_counts(self) -> dict[str, int]:
        return {
            "BELONGS_TO": self.belongs_to.count(),
            "HAS_KEYWORD": self.has_keyword.count(),
        }

    def duplicate_key_report(self) -> DataFrame:
        """PK-uniqueness invariant check (reference ``main.py:475-478``
        warns on duplicate node ids). Returns offending (table, key, cnt)."""
        reports = []
        for name, df, key in (
            ("Link", self.links, "url"),
            ("Category", self.categories, "name"),
            ("Keyword", self.keywords, "name"),
        ):
            reports.append(
                df.groupBy(F.col(key).alias("key"))
                .agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") > 1)
                .select(F.lit(name).alias("table"), "key", "cnt")
            )
        out = reports[0]
        for r in reports[1:]:
            out = out.unionByName(r)
        return out
