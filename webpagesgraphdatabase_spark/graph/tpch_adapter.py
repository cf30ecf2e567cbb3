"""Build the reference's property graph from the TPC-H-ish test tables.

Mapping (SURVEY.md §7 milestone 0):

- ``customer``  → Link nodes   (url = ``https://customer.example/<c_custkey>``)
- ``nation``    → Category nodes (name = n_name)
- ``part``      → Keyword nodes  (name = p_name; *all* parts, so parts
  never ordered are orphan keywords — exercises the reference's orphan
  cleanup J5, ``Edits.ipynb c12:31-32``)
- BELONGS_TO    → customer-[:BELONGS_TO]->nation via c_nationkey
- HAS_KEYWORD   → distinct customer-[:HAS_KEYWORD]->part via
  orders ⋈ lineitem ⋈ part

The denormalized ``keywords`` Link property (comma-separated, capped at 3
— reference ``main.py:116-118``, ``c7:11``) is the 3 alphabetically-first
keywords per link, or the sentinel ``'none'``.

``GRAPH_ORACLE_CTE`` is the DuckDB-SQL definition of the *same* graph;
every graph query's oracle SQL is ``GRAPH_ORACLE_CTE + <query body>``.
Keeping both definitions in this module is what keeps Spark and oracle
semantics in lock-step.

Scale notes (100 TB): the only wide shuffle here is the
orders ⋈ lineitem join (both huge, co-keyed on orderkey — at scale both
would be bucketed by orderkey so this is shuffle-free); part and nation
are broadcast dims; the per-link top-3 keyword aggregation is a single
partial-aggregatable groupBy on url.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..io_tpch import load_table
from .model import PropertyGraph

URL_PREFIX = "https://customer.example/"


def _link_base(spark: SparkSession, sf_dir: str):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    url = F.concat(F.lit(URL_PREFIX), F.col("c_custkey").cast("string"))
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            url.alias("url"),
            F.col("c_name").alias("title"),
            F.col("c_mktsegment").alias("raw_category"),
            F.col("n_name").alias("suggested_category"),
        )
    )


def _has_keyword(spark: SparkSession, sf_dir: str):
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # Distinct on (custkey int, name) — the url string is built *after*
    # dedup so the shuffle carries a narrow int key, not a ~30-byte URL
    # (url is bijective with custkey, so the distinct sets are identical).
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("custkey"), F.col("p_name").alias("dst_keyword"))
        .distinct()
        .select(
            F.concat(F.lit(URL_PREFIX), F.col("custkey").cast("string")).alias("src_url"),
            "dst_keyword",
        )
    )


def _links(link_base, has_keyword):
    # Denormalized keywords property: 3 alphabetically-first keywords per
    # link (cap mirrors reference max_items=3), sentinel 'none' if absent.
    link_kw = has_keyword.groupBy(F.col("src_url").alias("url")).agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_set("dst_keyword")), 1, 3), ", "
        ).alias("keywords")
    )
    return (
        link_base.join(link_kw, "url", "left")
        .select(
            "url",
            "title",
            "raw_category",
            "suggested_category",
            F.col("title").alias("raw_content"),
            F.col("title").alias("cleaned_content"),
            F.coalesce(F.col("keywords"), F.lit("none")).alias("keywords"),
            F.col("raw_category").alias("category_explanation"),
            F.lit("none").alias("keyword_explanation"),
        )
    )


def graph_from_tpch(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    link_base = _link_base(spark, sf_dir)
    has_keyword = _has_keyword(spark, sf_dir)
    return PropertyGraph(
        links=_links(link_base, has_keyword),
        categories=nation.select(F.col("n_name").alias("name")).distinct(),
        keywords=part.select(F.col("p_name").alias("name")).distinct(),
        belongs_to=link_base.select(
            F.col("url").alias("src_url"),
            F.col("suggested_category").alias("dst_category"),
        ),
        has_keyword=has_keyword,
        # one category per link by construction: belongs_to projects
        # customer ⋈ nation on the PK'd nation key — exactly one row
        # per customer url
        single_category_verified=True,
    )


def materialize_graph(spark: SparkSession, sf_dir: str, store) -> None:
    """Load the TPC-H-derived graph into a warehouse-backed GraphStore.
    This is the database-build step the reference performs implicitly by
    owning a materialized Kùzu store.

    Two orderings keep the build at ~max(table) instead of Σ(tables):

    - **stage order**: the orders⋈lineitem edge join is written first
      and the links table's denormalized keyword property is rebuilt
      from the *stored* edges (otherwise that lineage recomputes the
      big join — 2× the load cost);
    - **concurrent independent writes**: tables with no data dependency
      run as simultaneous Spark jobs from a small thread pool (the
      scheduler interleaves their stages across idle slots — the
      standard multi-job pattern a load pipeline uses on a cluster):
      dims alongside the edge join, then links alongside belongs_to
      (both project link_base; the 2-column belongs_to recompute hides
      entirely under the wider links write). Measured 5.6 s → 3.2 s at
      sf0.1 warm.
    """
    from concurrent.futures import ThreadPoolExecutor

    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    with ThreadPoolExecutor(max_workers=3) as pool:
        jobs = [
            pool.submit(
                store.wh.overwrite, "has_keyword", _has_keyword(spark, sf_dir)
            ),
            pool.submit(
                store.wh.overwrite,
                "categories",
                nation.select(F.col("n_name").alias("name")).distinct(),
            ),
            pool.submit(
                store.wh.overwrite,
                "keywords",
                part.select(F.col("p_name").alias("name")).distinct(),
            ),
        ]
        for j in jobs:
            j.result()

        link_base = _link_base(spark, sf_dir)
        hk = store.wh.read("has_keyword")
        jobs = [
            pool.submit(store.wh.overwrite, "links", _links(link_base, hk)),
            pool.submit(
                store.wh.overwrite,
                "belongs_to",
                link_base.select(
                    F.col("url").alias("src_url"),
                    F.col("suggested_category").alias("dst_category"),
                ),
            ),
        ]
        for j in jobs:
            j.result()


# DuckDB-SQL definition of the identical graph, used as the prefix of every
# graph query's oracle. DuckDB implicitly casts BIGINT in `||` concat.
GRAPH_ORACLE_CTE = """
WITH link_base AS (
  SELECT 'https://customer.example/' || c_custkey AS url,
         c_name AS title,
         c_mktsegment AS raw_category,
         n_name AS suggested_category
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
has_keyword AS (
  SELECT DISTINCT 'https://customer.example/' || o_custkey AS src_url,
         p_name AS dst_keyword
  FROM orders
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN part ON p_partkey = l_partkey
),
belongs_to AS (
  SELECT url AS src_url, suggested_category AS dst_category FROM link_base
),
categories AS (SELECT DISTINCT n_name AS name FROM nation),
keywords AS (SELECT DISTINCT p_name AS name FROM part),
link_kw AS (
  SELECT src_url AS url,
         string_agg(dst_keyword, ', ' ORDER BY dst_keyword) AS keywords
  FROM (
    SELECT src_url, dst_keyword,
           row_number() OVER (PARTITION BY src_url ORDER BY dst_keyword) AS rn
    FROM has_keyword
  ) t
  WHERE rn <= 3
  GROUP BY src_url
),
links AS (
  SELECT lb.url, lb.title, lb.raw_category, lb.suggested_category,
         lb.title AS raw_content, lb.title AS cleaned_content,
         coalesce(lk.keywords, 'none') AS keywords,
         lb.raw_category AS category_explanation,
         'none' AS keyword_explanation
  FROM link_base lb LEFT JOIN link_kw lk ON lb.url = lk.url
)
"""
