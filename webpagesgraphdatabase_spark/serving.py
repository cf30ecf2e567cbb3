"""Serving/export layer — SURVEY.md §7 milestone 4 (S5, S6, S9).

The reference's three serving surfaces, re-expressed as set-based jobs:

- :func:`export_graph_json` — full graph → vis-network-shaped
  ``{nodes: [{id,label,group}], edges: [{from,to}]}`` with the
  duplicate-node-id diagnostic (S9 + A4, ``main.py:435-484``).
- :func:`save_snapshot_csv` — Link table → 7-column CSV snapshot
  (S5, ``main.py:157-178``).
- :func:`preload_csv` — metadata CSV → graph, idempotent: URL
  normalization, skip-existing anti-join, batched MERGE of all five
  tables (S6, ``main.py:82-155``) — one upsert job per table instead
  of the reference's per-row ``conn.execute`` loop.

Scale notes: exports stream straight from the node/edge tables
(projection + unionByName; no Python); the preload path's only wide
operation is the anti-join on url, an equi-join Catalyst broadcasts
when the incoming batch is small (it always is — reference batches are
5 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import functions as fn
from .functions import html
from .graph.mutations import GraphStore
from .graph.queries import export_edges, export_nodes


#: Driver-side collect budget for the viz export. The reference ships
#: its whole (63-link) graph to the browser; at warehouse scale an
#: uncapped collect is a driver OOM, so the cap is enforced here — not
#: "upstream if needed".
EXPORT_MAX_NODES = 10_000
EXPORT_MAX_EDGES = 50_000


def export_graph_json(
    store: GraphStore,
    max_nodes: int = EXPORT_MAX_NODES,
    max_edges: int = EXPORT_MAX_EDGES,
) -> dict:
    """S9: collect the graph as vis-network dicts, bounded by an
    enforced cap. Nodes/edges beyond the cap are dropped along a
    *deterministic* total order (sort by id / (src, dst)), and the
    result says so via ``truncated`` + full ``node_count``/``edge_count``
    aggregates — the viz stays a bounded driver artifact no matter how
    big the stored graph is. Duplicate-id check A4 (``main.py:475-478``)
    runs as an aggregate over the *full* node set, not the capped slice.
    """
    g = store.graph()
    nodes_df = export_nodes(g)
    edges_df = export_edges(g)
    dup = (
        nodes_df.groupBy("id").agg(F.count("*").alias("n")).filter(F.col("n") > 1)
    )
    dup_ids = [r["id"] for r in dup.collect()]
    node_count = nodes_df.count()
    edge_count = edges_df.count()
    nodes = [
        {"id": r["id"], "label": r["label"], "group": r["group"]}
        for r in nodes_df.orderBy("id").limit(max_nodes).collect()
    ]
    edges = [
        {"from": r["src"], "to": r["dst"]}
        for r in edges_df.orderBy("src", "dst").limit(max_edges).collect()
    ]
    return {
        "nodes": nodes,
        "edges": edges,
        "duplicate_ids": dup_ids,
        "node_count": node_count,
        "edge_count": edge_count,
        "truncated": node_count > max_nodes or edge_count > max_edges,
    }


SNAPSHOT_COLUMNS = (
    "url",
    "title",
    "raw_content",
    "raw_category",
    "keywords",
    "category_explanation",
    "keyword_explanation",
)


def save_snapshot_csv(store: GraphStore, path: str) -> None:
    """S5: Link scan → 7-col CSV (column set of ``main.py:160``),
    null-coalesced with the reference defaults (P9)."""
    links = store.graph().links
    snap = links.select(
        "url",
        F.coalesce("title", F.col("url")).alias("title"),
        F.coalesce("raw_content", F.lit("")).alias("raw_content"),
        F.coalesce("raw_category", F.lit(fn.UNCATEGORIZED_APP)).alias("raw_category"),
        F.coalesce("keywords", F.lit(fn.SENTINEL_NONE)).alias("keywords"),
        F.coalesce("category_explanation", F.lit(fn.SENTINEL_NONE_TITLE)).alias(
            "category_explanation"
        ),
        F.coalesce("keyword_explanation", F.lit(fn.SENTINEL_NONE_TITLE)).alias(
            "keyword_explanation"
        ),
    )
    snap.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


PRELOAD_REQUIRED = (
    "url",
    "title",
    "content",
    "category",
    "keyword",
    "category_explanation",
    "keyword_explanation",
)


def preload_csv(store: GraphStore, csv_df: DataFrame, batch_size: int | None = None) -> int:
    """S6: idempotent metadata-CSV preload (``main.py:82-155``), as four
    set-based upserts. Returns the number of links inserted.

    Reference semantics preserved: required-column validation (S2),
    URL normalization F1, skip-existing (J4 anti-join), truncations F4,
    keyword split/cap F7, category re-parse through the allowlist
    (``main.py:133``), sentinel defaults P9. ``batch_size`` mirrors the
    app's ingestion cap O3.
    """
    missing = [c for c in PRELOAD_REQUIRED if c not in csv_df.columns]
    if missing:
        raise ValueError(f"CSV missing required columns: {missing}")

    rows = csv_df
    if batch_size is not None:
        rows = rows.limit(batch_size)

    normalized = (
        rows.filter(F.trim(F.col("url")) != "")
        .withColumn("url", fn.normalize_url(F.col("url")))
        .dropDuplicates(["url"])
    )
    fresh = store.filter_new_urls(normalized)

    parsed = fresh.select(
        "url",
        F.coalesce(
            F.when(F.trim(F.col("title")) != "", F.trim(F.col("title"))),
            F.col("url"),
        ).alias("title"),
        fn.truncate_content(F.coalesce(F.col("content"), F.lit(""))).alias(
            "raw_content"
        ),
        F.coalesce(
            F.when(F.trim(F.col("category")) != "", F.trim(F.col("category"))),
            F.lit(fn.UNCATEGORIZED_APP),
        ).alias("raw_category"),
        F.coalesce(
            F.when(
                F.trim(F.col("category_explanation")) != "",
                F.trim(F.col("category_explanation")),
            ),
            F.lit(fn.SENTINEL_NONE_TITLE),
        ).alias("category_explanation"),
        F.coalesce(
            F.when(
                F.trim(F.col("keyword_explanation")) != "",
                F.trim(F.col("keyword_explanation")),
            ),
            F.lit(fn.SENTINEL_NONE_TITLE),
        ).alias("keyword_explanation"),
        fn.split_keywords(F.coalesce(F.col("keyword"), F.lit(""))).alias("kw_arr"),
        fn.parse_enrichment(
            F.concat(F.lit("Category: "), F.coalesce(F.col("category"), F.lit("")))
        )["category"].alias("parsed_category"),
    )

    # The five merge jobs below all branch off `parsed`; persist so the
    # UDF/anti-join lineage runs once, not per branch. (The versioned
    # warehouse pins reads to the snapshot current at plan-build time,
    # so later merges can't feed back into this lineage either way.)
    parsed = parsed.persist()

    links = parsed.select(
        "url",
        "title",
        "raw_category",
        F.col("raw_category").alias("suggested_category"),
        "raw_content",
        fn.truncate_cleaned(F.col("raw_content")).alias("cleaned_content"),
        fn.join_keywords(F.col("kw_arr")).alias("keywords"),
        "category_explanation",
        "keyword_explanation",
    )
    n_new = links.count()

    categories = parsed.select(F.col("parsed_category").alias("name")).distinct()
    kw = parsed.select(
        F.col("url").alias("src_url"), F.explode("kw_arr").alias("dst_keyword")
    ).filter(F.col("dst_keyword") != fn.SENTINEL_NONE)

    # The five merges write five DIFFERENT tables, so they only order
    # by referential dependency (merge_edges endpoint-checks against
    # the COMMITTED links + name tables): links/categories/keywords
    # first, then both edge tables. Within a round the jobs are
    # independent — submit them concurrently so the scheduler
    # back-fills the tail of one merge with the next one's tasks (the
    # materialize_graph thread-pool discipline); 5 serial write jobs
    # become 2 rounds.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        for job in [
            pool.submit(store.merge_links, links, update=False),
            pool.submit(store.merge_names, "categories", categories),
            pool.submit(
                store.merge_names,
                "keywords",
                kw.select(F.col("dst_keyword").alias("name")),
            ),
        ]:
            job.result()
        for job in [
            pool.submit(
                store.merge_edges,
                "belongs_to",
                parsed.select(
                    F.col("url").alias("src_url"),
                    F.col("parsed_category").alias("dst_category"),
                ),
            ),
            pool.submit(store.merge_edges, "has_keyword", kw),
        ]:
            job.result()
    parsed.unpersist()
    return n_new


def preload_warc(spark, store: GraphStore, warc_path: str, batch_size: int | None = None) -> int:
    """Crawl → graph: land WARC/WET archives through the SAME
    idempotent preload machinery as the metadata CSV (S6) — the
    at-scale replacement for the reference's one-URL-at-a-time fetch
    loop (``main.py:85-98``). 2xx HTML responses contribute
    (url = WARC-Target-URI, title = <title>, content = extracted
    visible text); categories/keywords stay at their sentinel defaults
    for the enrichment pipeline to fill, exactly as a bare /add_url
    does. Returns the number of links actually inserted (idempotent:
    re-preloading the same archive inserts 0)."""
    from . import warc as W

    recs = W.read_warc(spark, warc_path)
    pages = recs.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") >= 200)
        & (F.col("http_status") < 300)
        & F.col("http_content_type").startswith("text/html")
        & F.col("target_uri").isNotNull()
        & F.col("body_text").isNotNull()
    )
    rows = pages.select(
        F.col("target_uri").alias("url"),
        html.html_title(F.col("body_text")).alias("title"),
        html.html_text(F.col("body_text")).alias("content"),
        F.lit("").alias("category"),
        F.lit("").alias("keyword"),
        F.lit("").alias("category_explanation"),
        F.lit("").alias("keyword_explanation"),
    )
    return preload_csv(store, rows, batch_size=batch_size)
