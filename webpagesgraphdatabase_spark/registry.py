"""Driver-facing registry: named queries + matching DuckDB oracle SQL.

Every entry in :data:`QUERIES` is a callable ``(spark, sf_dir) ->
DataFrame``; :data:`ORACLES` holds the equivalent ANSI SQL that DuckDB
runs on the same parquet tables (views pre-registered by the driver:
region nation customer supplier part orders lineitem events documents
embeddings). Column names are aliased identically on both sides — the
driver sorts columns by name before hashing values.

Graph queries share :data:`~.graph.tpch_adapter.GRAPH_ORACLE_CTE` as
their SQL prefix so the graph definition cannot drift between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import registry_fn, registry_ops
from .graph import queries as Q
from .graph.algorithms import connected_components, pagerank
from .graph.motif import match as motif_match
from .graph.tpch_adapter import GRAPH_ORACLE_CTE, graph_from_tpch

LOOKUP_URL = "https://customer.example/1"
# Bounds for the row-level symmetric interconnection (the unconstrained
# pair set is quadratic — see graph/queries.py); present at every sf.
SYM_KEYWORD = "blue rod"
SYM_CATEGORY = "NATION_0"

# ---------------------------------------------------------------------------
# Graph surface (SURVEY §2.2-§2.6)
# ---------------------------------------------------------------------------


def _g(fn: Callable, *args) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(graph_from_tpch(spark, sf_dir), *args)

    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "g_links_with_categories": _g(Q.links_with_categories),
    "g_links_with_keywords": _g(Q.links_with_keywords),
    "g_interconnect_canonical": _g(Q.interconnections_canonical),
    "g_interconnect_symmetric": _g(Q.interconnections_symmetric, SYM_KEYWORD, SYM_CATEGORY),
    "g_interconnect_pair_counts": _g(Q.interconnection_pair_counts),
    "g_count_links": _g(Q.count_links),
    "g_links_per_category": _g(Q.links_per_category),
    "g_orphan_keywords": _g(Q.orphan_keywords),
    "g_orphan_categories": _g(Q.orphan_categories),
    "g_export_nodes": _g(Q.export_nodes),
    "g_export_edges": _g(Q.export_edges),
    "g_top_keywords": _g(Q.top_keywords),
    "g_distinct_categories": _g(Q.distinct_categories),
    "g_point_lookup": _g(Q.point_lookup, LOOKUP_URL),
    "g_sample_links": _g(Q.sample_links),
    "g_viz_slice": _g(Q.viz_slice),
    "g_duplicate_ids": _g(Q.duplicate_node_ids),
    "g_motif_two_hop": _g(
        lambda g: motif_match(
            g, "(c:Category)<-[:BELONGS_TO]-(l:Link)-[:HAS_KEYWORD]->(k)"
        )
    ),
    # iterative algorithms — genuinely non-SQL-expressible, so no oracle
    # entry (driver records the rows-only check); correctness is pinned
    # by tests/test_algorithms.py on hand-checkable graphs
    "g_pagerank": _g(pagerank),
    "g_components": _g(connected_components),
}

ORACLES: dict[str, str] = {
    "g_links_with_categories": GRAPH_ORACLE_CTE
    + """
SELECT l.url, l.title, l.keywords,
       coalesce(l.category_explanation, 'None') AS category_explanation,
       coalesce(l.keyword_explanation, 'None') AS keyword_explanation,
       c.name AS category
FROM links l
JOIN belongs_to b ON l.url = b.src_url
JOIN categories c ON b.dst_category = c.name
""",
    "g_links_with_keywords": GRAPH_ORACLE_CTE
    + """
SELECT l.url, l.title, hk.dst_keyword AS keyword
FROM links l JOIN has_keyword hk ON l.url = hk.src_url
""",
    "g_interconnect_canonical": GRAPH_ORACLE_CTE
    + """
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
""",
    "g_interconnect_symmetric": GRAPH_ORACLE_CTE
    + """
SELECT hk1.src_url AS url_1, b1.dst_category AS category_1,
       hk1.dst_keyword AS keyword,
       hk2.src_url AS url_2, b2.dst_category AS category_2
FROM has_keyword hk1
JOIN has_keyword hk2
  ON hk1.dst_keyword = hk2.dst_keyword AND hk1.src_url <> hk2.src_url
JOIN belongs_to b1 ON hk1.src_url = b1.src_url
JOIN belongs_to b2 ON hk2.src_url = b2.src_url
WHERE b1.dst_category <> b2.dst_category
  AND hk1.dst_keyword = '{SYM_KEYWORD}'
  AND b1.dst_category = '{SYM_CATEGORY}'
""".replace("{SYM_KEYWORD}", SYM_KEYWORD).replace("{SYM_CATEGORY}", SYM_CATEGORY),
    "g_interconnect_pair_counts": GRAPH_ORACLE_CTE
    + """
SELECT b1.dst_category AS category_1, b2.dst_category AS category_2,
       count(*) AS cnt
FROM has_keyword hk1
JOIN has_keyword hk2
  ON hk1.dst_keyword = hk2.dst_keyword AND hk1.src_url <> hk2.src_url
JOIN belongs_to b1 ON hk1.src_url = b1.src_url
JOIN belongs_to b2 ON hk2.src_url = b2.src_url
WHERE b1.dst_category <> b2.dst_category
GROUP BY b1.dst_category, b2.dst_category
""",
    "g_count_links": GRAPH_ORACLE_CTE + "SELECT count(*) AS cnt FROM links",
    "g_links_per_category": GRAPH_ORACLE_CTE
    + """
SELECT dst_category AS category, count(*) AS cnt
FROM belongs_to GROUP BY dst_category
""",
    "g_orphan_keywords": GRAPH_ORACLE_CTE
    + """
SELECT k.name AS name FROM keywords k
WHERE NOT EXISTS (SELECT 1 FROM has_keyword hk WHERE hk.dst_keyword = k.name)
""",
    "g_orphan_categories": GRAPH_ORACLE_CTE
    + """
SELECT c.name AS name FROM categories c
WHERE NOT EXISTS (SELECT 1 FROM belongs_to b WHERE b.dst_category = c.name)
""",
    "g_export_nodes": GRAPH_ORACLE_CTE
    + """
SELECT 'Link:' || url AS id, title AS label, 'Link' AS "group"
FROM links WHERE title IS NOT NULL
UNION ALL
SELECT 'Category:' || name AS id, name AS label, 'Category' AS "group"
FROM categories WHERE name IS NOT NULL
UNION ALL
SELECT 'Keyword:' || name AS id, name AS label, 'Keyword' AS "group"
FROM keywords WHERE name IS NOT NULL
""",
    "g_export_edges": GRAPH_ORACLE_CTE
    + """
SELECT 'Link:' || src_url AS src, 'Category:' || dst_category AS dst,
       'BELONGS_TO' AS rel
FROM belongs_to
UNION ALL
SELECT 'Link:' || src_url AS src, 'Keyword:' || dst_keyword AS dst,
       'HAS_KEYWORD' AS rel
FROM has_keyword
""",
    "g_top_keywords": GRAPH_ORACLE_CTE
    + """
SELECT keyword, count(*) AS cnt FROM (
  SELECT unnest(string_split(keywords, ', ')) AS keyword
  FROM links WHERE keywords <> 'none'
) t
WHERE keyword <> ''
GROUP BY keyword
ORDER BY cnt DESC, keyword ASC
LIMIT 20
""",
    "g_distinct_categories": GRAPH_ORACLE_CTE
    + "SELECT DISTINCT dst_category AS category FROM belongs_to",
    "g_point_lookup": GRAPH_ORACLE_CTE
    + f"""
SELECT url, title, suggested_category FROM links
WHERE url = '{LOOKUP_URL}'
""",
    "g_sample_links": GRAPH_ORACLE_CTE
    + """
SELECT url, title, suggested_category FROM links
ORDER BY md5(url) LIMIT 5
""",
    "g_viz_slice": GRAPH_ORACLE_CTE
    + """
SELECT url, title, keywords, suggested_category FROM links
ORDER BY url LIMIT 50
""",
    "g_duplicate_ids": GRAPH_ORACLE_CTE
    + """
SELECT id, count(*) AS n FROM (
  SELECT 'Link:' || url AS id FROM links WHERE title IS NOT NULL
  UNION ALL
  SELECT 'Category:' || name FROM categories WHERE name IS NOT NULL
  UNION ALL
  SELECT 'Keyword:' || name FROM keywords WHERE name IS NOT NULL
)
GROUP BY id HAVING count(*) > 1
""",
    "g_motif_two_hop": GRAPH_ORACLE_CTE
    + """
SELECT b.dst_category AS c, hk.dst_keyword AS k, b.src_url AS l
FROM belongs_to b JOIN has_keyword hk ON b.src_url = hk.src_url
""",
}

# Beyond-reference operator sections (dedup / similarity / text analysis /
# multimodal / event analytics) — see registry_ops.py — and the scalar
# function library (F1-F7, UDF fidelity checks) — see registry_fn.py.
QUERIES.update(registry_ops.QUERIES)
ORACLES.update(registry_ops.ORACLES)
QUERIES.update(registry_fn.QUERIES)
ORACLES.update(registry_fn.ORACLES)
