"""Read-query layer over :class:`PropertyGraph` — SURVEY.md §2 read ops.

Each function mirrors a reference query (cited) and returns a DataFrame
with explicitly-aliased columns so driver oracle comparison is stable.

Determinism note: wherever the reference pairs ORDER BY with LIMIT on a
non-unique prefix (``c11:34-35``), we extend the sort key to a *total*
order over the projected columns — otherwise LIMIT at a tie boundary is
engine-dependent and no oracle could match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .model import PropertyGraph


def links_with_categories(g: PropertyGraph) -> DataFrame:
    """J1 (reference ``main.py:185``): 1-hop (l:Link)-[:BELONGS_TO]->(c).

    Null-coalescing projection P9 (``main.py:186-196``) included: missing
    explanations default to 'None'.
    """
    return (
        g.links.join(g.belongs_to, g.links.url == g.belongs_to.src_url)
        .join(g.categories, g.belongs_to.dst_category == g.categories.name)
        .select(
            g.links.url.alias("url"),
            F.col("title").alias("title"),
            F.col("keywords").alias("keywords"),
            F.coalesce(F.col("category_explanation"), F.lit("None")).alias(
                "category_explanation"
            ),
            F.coalesce(F.col("keyword_explanation"), F.lit("None")).alias(
                "keyword_explanation"
            ),
            F.col("name").alias("category"),
        )
    )


def links_with_keywords(g: PropertyGraph) -> DataFrame:
    """J2 (reference ``main.py:468``, ``c11:22``): (l)-[:HAS_KEYWORD]->(k)."""
    return (
        g.links.join(g.has_keyword, g.links.url == g.has_keyword.src_url)
        .select(
            g.links.url.alias("url"),
            F.col("title").alias("title"),
            F.col("dst_keyword").alias("keyword"),
        )
    )


def _annotated_edges(g: PropertyGraph) -> DataFrame:
    """has_keyword edges annotated with the source link's category:
    (keyword, url, category). One |E|-sized join, the building block of
    every interconnection variant."""
    return (
        g.has_keyword.join(g.belongs_to, "src_url")
        .select(
            F.col("dst_keyword").alias("keyword"),
            F.col("src_url").alias("url"),
            F.col("dst_category").alias("category"),
        )
    )


def interconnections_canonical(g: PropertyGraph, limit: int = 100) -> DataFrame:
    """J3 flagship, notebook variant (``Edits.ipynb c11:28-36``).

    Pairs of links in *different* categories sharing a keyword, canonical
    ``l1.url < l2.url``, ORDER BY + LIMIT. Sort key extended to a total
    order (keyword, cat1, cat2, url1, url2) for determinism.

    **Limit pushdown through the join.** The naive plan self-joins
    ``has_keyword`` on keyword, which is quadratic in links-per-keyword
    (billions of intermediate rows at sf0.1 with hot keywords) — then
    throws all but 100 rows away. Because the output is sorted by
    ``keyword`` *first*, only the alphabetically-first keywords whose
    cumulative pair count reaches ``limit`` can contribute. So:

    1. count cross-category pairs per keyword *algebraically* from
       per-(keyword, category) link counts — pairs_k = (S_k² − Σ_c n_kc²)/2
       — an |E|-sized aggregation, no pair expansion;
    2. take keywords in output order until cumulative pairs ≥ limit (a
       tiny driver-side loop over at most ``limit`` rows — each kept
       keyword contributes ≥1 pair, so ``orderBy().limit()`` bounds it;
       TakeOrdered, no global window);
    3. within that keyword prefix, push the limit one level further —
       into the *(category_1, category_2)* structure. Output order is
       (keyword, cat1, cat2, …) and cat1 is the category of the smaller
       url, so the exact ordered-pair count cnt(k, A, B) =
       #{u1<u2, u1∈A, u2∈B} is computed **without expansion** by a
       running-count window: replicate each edge row per category
       (|E_k|·|C| narrow rows), cumulative-sum prior edges of category A
       in url order, and sum those at rows of category B. Take the
       (keyword, A, B) prefix covering ``limit``;
    4. expand pairs only for those category pairs — the candidate set is
       n_A·n_B for the chosen pairs, no longer quadratic in the hot
       keyword's whole edge list — then sort, limit. The IN-list /
       equality predicates push down to the stored-table scans.

    Three bounded driver-side jobs instead of one quadratic plan
    (driver-side adaptivity, same idea as AQE). At sf0.1 (64 keywords ×
    ~6.8k links each, one hot keyword ≈ 23M raw pairs) this takes the
    materialized-graph query from 5.7 s to well under 1 s; the naive
    single-plan form on the unmaterialized graph was 44 s.

    Result is identical to the naive join (cross-checked in tests and by
    the DuckDB oracle, which *is* the naive form).
    """
    edges = _annotated_edges(g)

    # Precondition of the algebraic phases: one category per link, so
    # each (url, keyword) edge row is unique. merge_edges permits
    # multi-category links, under which the pair algebra counts
    # same-url cross-category row pairs and phase 2's url ordering has
    # ties — fall back to the naive spec plan if violated. The check
    # consults the graph's constraint witness first (set by builders
    # that guarantee it, version-cached by GraphStore) and only probes
    # (one narrow aggregate over belongs_to, per-link sized ≪ |E|)
    # when the witness is unknown.
    single = g.single_category_verified
    if single is None:
        single = (
            g.belongs_to.groupBy("src_url")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
            == 0
        )
    if not single:
        return interconnections_canonical_naive(g, limit)

    # -- phase 1: keyword prefix (algebraic pair counts) ------------------
    per_kc = edges.groupBy("keyword", "category").agg(F.count("*").alias("n"))
    per_k = per_kc.groupBy("keyword").agg(
        ((F.sum("n") * F.sum("n") - F.sum(F.col("n") * F.col("n"))) / 2).alias("pairs")
    )
    head = (
        per_k.filter(F.col("pairs") > 0).orderBy("keyword").limit(limit).collect()
    )
    needed: list[str] = []
    cum = 0.0
    for row in head:
        needed.append(row["keyword"])
        cum += row["pairs"]
        if cum >= limit:
            break
    if not needed:
        return interconnections_canonical_naive(g, limit).filter(F.lit(False))

    # the pruned edge set (≲ a few hot keywords) feeds phases 2 and 3
    # five times over; persist so the upstream lineage (on an
    # unmaterialized graph: the full construction joins) runs once.
    # Small by construction — bounded by the keyword prefix, not |E|.
    kw_edges = edges.filter(F.col("keyword").isin(needed)).persist()

    # -- phase 2: category-pair prefix via running-count windows ----------
    # replicate each edge once per *global* category (tiny dim, broadcast
    # cross-join — no distinct/shuffle); categories absent from a keyword
    # just yield cnt=0 rows that the >0 filter drops
    cats = F.broadcast(g.categories.select(F.col("name").alias("cat_1")))
    replicated = kw_edges.crossJoin(cats).select(
        "keyword", "url", "category", "cat_1"
    )
    w = (
        Window.partitionBy("keyword", "cat_1")
        .orderBy("url")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = replicated.withColumn(
        "prior",
        F.coalesce(
            F.sum(F.when(F.col("category") == F.col("cat_1"), 1).otherwise(0)).over(w),
            F.lit(0),
        ),
    )
    pair_counts = (
        prior.filter(F.col("category") != F.col("cat_1"))
        .groupBy("keyword", "cat_1", F.col("category").alias("cat_2"))
        .agg(F.sum("prior").alias("cnt"))
        .filter(F.col("cnt") > 0)
        .orderBy("keyword", "cat_1", "cat_2")
        .limit(limit)
        .collect()
    )
    chosen: list[tuple[str, str, str]] = []
    cum = 0
    for r in pair_counts:
        chosen.append((r["keyword"], r["cat_1"], r["cat_2"]))
        cum += r["cnt"]
        if cum >= limit:
            break
    if not chosen:
        return interconnections_canonical_naive(g, limit).filter(F.lit(False))

    # -- phase 3: expand only the chosen (keyword, cat1, cat2) triples ----
    # Salted: a chosen triple's candidate set is n_A·n_B — bounded by
    # the limit's coverage here, but a single huge category pair at
    # cluster scale would land on one task (the join keys are
    # low-cardinality). Salt e1 by hash(url), replicate e2 per salt:
    # every (u1, u2) still meets exactly once, work spreads B ways.
    n_salt = 32
    spark = edges.sparkSession
    chosen_df = F.broadcast(
        spark.createDataFrame(chosen, ["keyword", "cat_1", "cat_2"])
    )
    e1 = kw_edges.withColumn(
        "salt", F.pmod(F.hash("url"), F.lit(n_salt))
    ).alias("e1")
    e2 = kw_edges.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).alias("e2")
    return (
        chosen_df.join(
            e1,
            (F.col("e1.keyword") == chosen_df["keyword"])
            & (F.col("e1.category") == chosen_df["cat_1"]),
        )
        .join(
            e2,
            (F.col("e2.keyword") == chosen_df["keyword"])
            & (F.col("e2.category") == chosen_df["cat_2"])
            & (F.col("e1.salt") == F.col("e2.salt"))
            & (F.col("e1.url") < F.col("e2.url")),
        )
        .select(
            chosen_df["keyword"].alias("keyword"),
            F.col("e1.category").alias("category_1"),
            F.col("e2.category").alias("category_2"),
            F.col("e1.url").alias("url_1"),
            F.col("e2.url").alias("url_2"),
        )
        .orderBy("keyword", "category_1", "category_2", "url_1", "url_2")
        .limit(limit)
    )


def interconnections_canonical_naive(g: PropertyGraph, limit: int = 100) -> DataFrame:
    """Direct transcription of the reference Cypher (``c11:28-36``):
    full self-join then sort+limit. Kept as the semantic spec for
    cross-checking the pruned plan; do not run at scale."""
    hk1 = g.has_keyword.alias("hk1")
    hk2 = g.has_keyword.alias("hk2")
    b1 = g.belongs_to.alias("b1")
    b2 = g.belongs_to.alias("b2")
    return (
        hk1.join(
            hk2,
            (F.col("hk1.dst_keyword") == F.col("hk2.dst_keyword"))
            & (F.col("hk1.src_url") < F.col("hk2.src_url")),
        )
        .join(b1, F.col("hk1.src_url") == F.col("b1.src_url"))
        .join(b2, F.col("hk2.src_url") == F.col("b2.src_url"))
        .filter(F.col("b1.dst_category") != F.col("b2.dst_category"))
        .select(
            F.col("hk1.dst_keyword").alias("keyword"),
            F.col("b1.dst_category").alias("category_1"),
            F.col("b2.dst_category").alias("category_2"),
            F.col("hk1.src_url").alias("url_1"),
            F.col("hk2.src_url").alias("url_2"),
        )
        .orderBy("keyword", "category_1", "category_2", "url_1", "url_2")
        .limit(limit)
    )


def interconnections_symmetric(
    g: PropertyGraph,
    keyword: str | None = None,
    category_1: str | None = None,
) -> DataFrame:
    """J3 flagship, app variant (``main.py:199-204``): symmetric (both
    orientations), no sort/limit — the app renders all rows.

    Optional equality filters (P3/P7 compound-filter semantics) bound the
    output: with ~64 distinct keywords shared by every link, the
    unconstrained pair set is quadratic (28M rows at sf0.01) — row-level
    materialization of that is wrong at any scale; use
    :func:`interconnection_pair_counts` for the full join.
    """
    hk1 = g.has_keyword.alias("hk1")
    hk2 = g.has_keyword.alias("hk2")
    b1 = g.belongs_to.alias("b1")
    b2 = g.belongs_to.alias("b2")
    out = (
        hk1.join(
            hk2,
            (F.col("hk1.dst_keyword") == F.col("hk2.dst_keyword"))
            & (F.col("hk1.src_url") != F.col("hk2.src_url")),
        )
        .join(b1, F.col("hk1.src_url") == F.col("b1.src_url"))
        .join(b2, F.col("hk2.src_url") == F.col("b2.src_url"))
        .filter(F.col("b1.dst_category") != F.col("b2.dst_category"))
        .select(
            F.col("hk1.src_url").alias("url_1"),
            F.col("b1.dst_category").alias("category_1"),
            F.col("hk1.dst_keyword").alias("keyword"),
            F.col("hk2.src_url").alias("url_2"),
            F.col("b2.dst_category").alias("category_2"),
        )
    )
    if keyword is not None:
        out = out.filter(F.col("keyword") == F.lit(keyword))
    if category_1 is not None:
        out = out.filter(F.col("category_1") == F.lit(category_1))
    return out


def interconnection_pair_counts(g: PropertyGraph) -> DataFrame:
    """Scale-honest full interconnection: count of symmetric
    cross-category link pairs per (category_1, category_2), plus the
    pairs' total Resource-Allocation link-prediction strength (Zhou et
    al. 2009 — Σ over shared keywords of 1/deg(keyword); rare shared
    keywords predict links, ubiquitous ones don't). RA is the
    integer-exact member of the common-neighbor index family
    (Adamic-Adar's 1/log(deg) can't hash-match across engines;
    1e9 div deg can), summed per category pair as ``ra_score``.

    Computed **without expanding pairs**: cnt(c1,c2) = Σ_k n_k(c1)·n_k(c2)
    and ra(c1,c2) = Σ_k w_k·n_k(c1)·n_k(c2), with n_k(c) = links in
    category c carrying keyword k and w_k = 1e9 div deg_k. That turns a
    join quadratic in links-per-keyword (≈2×10⁹ intermediate rows at
    sf0.1) into one |E|-sized aggregation plus a self-join of the tiny
    (keyword, category, n) table — the only form that survives 100 TB;
    the degree weight joins on the same keyword key, adding no new
    shuffle shape. The DuckDB oracle remains the naive quadratic join,
    so equivalence is machine-checked at sf0.01.
    """
    per_kc = _annotated_edges(g).groupBy("keyword", "category").agg(
        F.count("*").alias("n")
    )
    w = per_kc.groupBy("keyword").agg(
        F.expr("1000000000 DIV sum(n)").alias("w")
    )
    a = per_kc.alias("a")
    b = per_kc.alias("b")
    return (
        a.join(b, F.col("a.keyword") == F.col("b.keyword"))
        .filter(F.col("a.category") != F.col("b.category"))
        .join(w.alias("w"), F.col("a.keyword") == F.col("w.keyword"))
        .groupBy(
            F.col("a.category").alias("category_1"),
            F.col("b.category").alias("category_2"),
        )
        .agg(
            F.sum(F.col("a.n") * F.col("b.n")).alias("cnt"),
            F.sum(F.col("w.w") * F.col("a.n") * F.col("b.n")).alias(
                "ra_score"
            ),
        )
    )


def count_links(g: PropertyGraph) -> DataFrame:
    """A1 (``main.py:25,220,348``): MATCH (l:Link) RETURN COUNT(l)."""
    return g.links.agg(F.count("*").alias("cnt"))


def links_per_category(g: PropertyGraph) -> DataFrame:
    """A1-over-pattern + group: count of links per category (1-hop join
    then groupBy; partial aggregation map-side, broadcast-able dim)."""
    return (
        g.belongs_to.groupBy(F.col("dst_category").alias("category"))
        .agg(F.count("*").alias("cnt"))
    )


def orphan_keywords(g: PropertyGraph) -> DataFrame:
    """J5 read-form (``c12:31-32``): Keyword nodes with no incoming
    HAS_KEYWORD edge — left-anti join."""
    return g.keywords.join(
        g.has_keyword, g.keywords.name == g.has_keyword.dst_keyword, "left_anti"
    ).select(F.col("name").alias("name"))


def orphan_categories(g: PropertyGraph) -> DataFrame:
    """J5 read-form for Category (``c12:31``)."""
    return g.categories.join(
        g.belongs_to, g.categories.name == g.belongs_to.dst_category, "left_anti"
    ).select(F.col("name").alias("name"))


def export_nodes(g: PropertyGraph) -> DataFrame:
    """S9/U1 (``main.py:435-473``): union of typed node scans with
    type-prefixed ids and group tags, null-guarded (P4)."""
    link_nodes = g.links.filter(F.col("title").isNotNull()).select(
        F.concat(F.lit("Link:"), F.col("url")).alias("id"),
        F.col("title").alias("label"),
        F.lit("Link").alias("group"),
    )
    cat_nodes = g.categories.filter(F.col("name").isNotNull()).select(
        F.concat(F.lit("Category:"), F.col("name")).alias("id"),
        F.col("name").alias("label"),
        F.lit("Category").alias("group"),
    )
    kw_nodes = g.keywords.filter(F.col("name").isNotNull()).select(
        F.concat(F.lit("Keyword:"), F.col("name")).alias("id"),
        F.col("name").alias("label"),
        F.lit("Keyword").alias("group"),
    )
    return link_nodes.unionByName(cat_nodes).unionByName(kw_nodes)


def export_edges(g: PropertyGraph) -> DataFrame:
    """S9/U1 edge half (``main.py:458-473``): BELONGS_TO ∪ HAS_KEYWORD
    with type-prefixed endpoints."""
    bt = g.belongs_to.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Category:"), F.col("dst_category")).alias("dst"),
        F.lit("BELONGS_TO").alias("rel"),
    )
    hk = g.has_keyword.select(
        F.concat(F.lit("Link:"), F.col("src_url")).alias("src"),
        F.concat(F.lit("Keyword:"), F.col("dst_keyword")).alias("dst"),
        F.lit("HAS_KEYWORD").alias("rel"),
    )
    return bt.unionByName(hk)


def top_keywords(g: PropertyGraph, limit: int = 20) -> DataFrame:
    """A3 value_counts (``c7:95-99``): split the denormalized comma-
    separated ``keywords`` property, explode, count desc. Total-order
    tiebreak on keyword for deterministic LIMIT."""
    return (
        g.links.filter(F.col("keywords") != "none")
        .select(F.explode(F.split(F.col("keywords"), ",\\s*")).alias("keyword"))
        .filter(F.col("keyword") != "")
        .groupBy("keyword")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("keyword"))
        .limit(limit)
    )


def distinct_categories(g: PropertyGraph) -> DataFrame:
    """A2 (``c7:93``, ``c10:45``): distinct category values in use."""
    return g.belongs_to.select(F.col("dst_category").alias("category")).distinct()


def point_lookup(g: PropertyGraph, url: str) -> DataFrame:
    """P2 (``main.py:105,257,367``): PK point lookup / existence probe.
    On a parquet-backed table this prunes to a filter pushed into the
    scan; at scale a bucketed/Z-ordered layout makes it near-O(1)."""
    return g.links.filter(F.col("url") == F.lit(url)).select(
        "url", "title", "suggested_category"
    )


def sample_links(g: PropertyGraph, n: int = 5) -> DataFrame:
    """O4 (``c7:102``): random sample — made deterministic and
    engine-portable by ordering on md5(url) (stable across Spark/DuckDB)."""
    return (
        g.links.orderBy(F.md5(F.col("url")))
        .limit(n)
        .select("url", "title", "suggested_category")
    )


def viz_slice(g: PropertyGraph, limit: int = 50) -> DataFrame:
    """O2 (``c12:53``): capped link scan for visualization; total-order
    by url for deterministic LIMIT."""
    return (
        g.links.select("url", "title", "keywords", "suggested_category")
        .orderBy("url")
        .limit(limit)
    )


def duplicate_node_ids(g: PropertyGraph) -> DataFrame:
    """A4 (``main.py:475-478``): duplicate node-id diagnostic over the
    typed-id export — empty iff PK discipline held. Aggregate + filter,
    not the reference's Python set-scan."""
    return (
        export_nodes(g)
        .groupBy("id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
