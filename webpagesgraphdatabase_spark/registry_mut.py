"""Driver-visible correctness gate for the graph WRITE path (M1-M6).

The reference's most-used surface is the mutation API (MERGE nodes/
relationships, DETACH DELETE, orphan cleanup — ``main.py:312-339,490``,
``c10:61-91``, ``c12:31-32``); in round 1 it was pinned by pytest only.
This registry entry runs a deterministic mutation scenario end-to-end in
a throwaway warehouse and returns the final table counts, which a plain
SQL oracle recomputes from the same source tables:

1. M6/S12  re-init schema (fresh temp warehouse).
2. M1      MERGE insert-if-absent: links for customers with
           ``c_custkey % 3 == 0``; all categories (nations) and
           keywords (parts).
3. M2      MERGE+SET upsert: links for even custkeys with a rewritten
           ``'UPD:'``-prefixed title (evens already present from step 2
           are replaced; new evens inserted).
3b. M2-SET per-property assignment (``merge_set_links``, the Cypher
           ``MERGE … SET`` the notebook populate emits, c10:69-76):
           custkeys %7 get ``suggested_category = 'SET:'+nation`` —
           fresh rows insert with NULL titles, already-present rows
           KEEP their titles (whole-row replacement would NULL them;
           ``n_set_preserved`` catches exactly that).
4. M3      MERGE relationships with endpoint MATCH semantics: BELONGS_TO
           offered for *all* customers (only stored links survive the
           endpoint check), HAS_KEYWORD for ``custkey % 5 == 0`` via the
           orders⋈lineitem⋈part join.
5. M4      DETACH DELETE of the link for custkey 6 (node + both edge
           types).
6. M5      orphan cleanup: categories/keywords with no remaining edge.
7. CDC     keyed snapshot diff (``catalog.diff``) of the links table
           between the post-M1 version and the final version — the
           insert/update/delete op counts join the result row, putting
           the warehouse-maintenance surface under the same oracle.

Every step is a set-based anti-join/union job (no driver row loops); the
six final counts are collected (bounded: 6 scalars) and returned as a
1-row DataFrame so the temp warehouse can be deleted before returning.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph.mutations import GraphStore
from .graph.tpch_adapter import URL_PREFIX
from .io_tpch import load_table

_RESULT_SCHEMA = (
    "n_links bigint, n_upd_titles bigint, n_set_links bigint, "
    "n_set_preserved bigint, n_categories bigint, "
    "n_keywords bigint, n_belongs_to bigint, n_has_keyword bigint, "
    "n_cdc_insert bigint, n_cdc_update bigint, n_cdc_delete bigint"
)


def _q_mutation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    url = F.concat(F.lit(URL_PREFIX), F.col("c_custkey").cast("string"))
    base = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(
        url.alias("url"),
        F.col("c_name").alias("title"),
        F.col("n_name").alias("cat"),
        "c_custkey",
    )

    root = tempfile.mkdtemp(prefix="mutation_gate_")
    try:
        store = GraphStore(spark, root)
        store.init_schema()
        # M1: insert-if-absent (multiples of 3) + all category/keyword nodes
        store.merge_links(
            base.filter(F.col("c_custkey") % 3 == 0).select("url", "title"),
            update=False,
        )
        store.merge_names("categories", nation.select("n_name"))
        store.merge_names("keywords", part.select("p_name"))
        # M2: upsert evens with a rewritten title (SET semantics: the
        # incoming row replaces the stored one for even multiples of 3)
        store.merge_links(
            base.filter(F.col("c_custkey") % 2 == 0).select(
                "url", F.concat(F.lit("UPD:"), F.col("title")).alias("title")
            ),
            update=True,
        )
        # M2-SET (r10): per-property assignment — multiples of 7 get a
        # suggested_category; titles of already-present rows survive
        store.merge_set_links(
            base.filter(F.col("c_custkey") % 7 == 0).select(
                "url",
                F.concat(F.lit("SET:"), F.col("cat")).alias(
                    "suggested_category"
                ),
            ),
            ("suggested_category",),
        )
        # M3: edges — endpoint MATCH drops rows whose src link is absent
        store.merge_edges("belongs_to", base.select("url", "cat"))
        hk = (
            orders.filter(F.col("o_custkey") % 5 == 0)
            .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
            .select(
                F.concat(
                    F.lit(URL_PREFIX), F.col("o_custkey").cast("string")
                ).alias("src_url"),
                F.col("p_name").alias("dst_keyword"),
            )
        )
        store.merge_edges("has_keyword", hk)
        # M4 + M5
        store.detach_delete_link(URL_PREFIX + "6")
        store.cleanup_orphans()

        g = store.graph()
        # CDC leg (r5 verdict item 5): keyed snapshot diff of the links
        # table between the post-M1 version and the final version —
        # inserts are the evens M2 added, the single update-set member
        # is every even multiple of 3 (title rewritten), the delete is
        # custkey 6. Pure relational algebra (full-outer join + struct
        # compare, catalog.py:diff), so the SQL oracle replays it.
        versions = store.wh.list_versions("links")
        cdc = (
            store.wh.diff("links", versions[1], versions[-1], key="url")
            .groupBy("op")
            .count()
        )
        ops = {r["op"]: r["count"] for r in cdc.collect()}
        set_rows = g.links.filter(
            F.col("suggested_category").startswith("SET:")
        )
        row = (
            g.links.count(),
            g.links.filter(F.col("title").startswith("UPD:")).count(),
            set_rows.count(),
            set_rows.filter(F.col("title").isNotNull()).count(),
            g.categories.count(),
            g.keywords.count(),
            g.belongs_to.count(),
            g.has_keyword.count(),
            ops.get("insert", 0),
            ops.get("update", 0),
            ops.get("delete", 0),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame([row], _RESULT_SCHEMA)


# The oracle replays the scenario algebraically: the surviving link set
# is {k : k%3=0 or k%2=0 or k%7=0} \ {6}; updated titles are the surviving evens;
# belongs_to has one edge per surviving link; has_keyword is the
# distinct (custkey, part-name) set for custkey%5=0 restricted to
# surviving links; the orphan cleanup keeps exactly the referenced
# category/keyword names.
_MUTATION_ORACLE = """
WITH s AS (
  SELECT c_custkey AS k, c_nationkey FROM customer
  WHERE (c_custkey % 3 = 0 OR c_custkey % 2 = 0 OR c_custkey % 7 = 0)
    AND c_custkey <> 6
),
hk AS (
  SELECT DISTINCT o_custkey AS k, p_name
  FROM orders
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN part ON p_partkey = l_partkey
  WHERE o_custkey % 5 = 0
    AND (o_custkey % 3 = 0 OR o_custkey % 2 = 0 OR o_custkey % 7 = 0)
    AND o_custkey <> 6
)
SELECT
  (SELECT count(*) FROM s) AS n_links,
  (SELECT count(*) FROM s WHERE k % 2 = 0) AS n_upd_titles,
  -- M2-SET rows: every %7 custkey got suggested_category = 'SET:...'
  (SELECT count(*) FROM s WHERE k % 7 = 0) AS n_set_links,
  -- ...and the ones that already existed (M1/M2 members) must have
  -- KEPT their titles — per-property SET, not whole-row replacement
  (SELECT count(*) FROM s
     WHERE k % 7 = 0 AND (k % 3 = 0 OR k % 2 = 0)) AS n_set_preserved,
  (SELECT count(DISTINCT c_nationkey) FROM s) AS n_categories,
  (SELECT count(DISTINCT p_name) FROM hk) AS n_keywords,
  (SELECT count(*) FROM s) AS n_belongs_to,
  (SELECT count(*) FROM hk) AS n_has_keyword,
  -- CDC of links between the post-M1 snapshot {k%3=0} and the final
  -- {k%3=0 or k%2=0}\\{6}: inserts are evens not already present,
  -- updates are surviving members of both snapshots whose title M2
  -- rewrote (even multiples of 3), the delete is custkey 6
  (SELECT count(*) FROM customer
     WHERE (c_custkey % 2 = 0 OR c_custkey % 7 = 0)
       AND c_custkey % 3 <> 0) AS n_cdc_insert,
  (SELECT count(*) FROM customer
     WHERE c_custkey % 3 = 0
       AND (c_custkey % 2 = 0 OR c_custkey % 7 = 0)
       AND c_custkey <> 6) AS n_cdc_update,
  (SELECT count(*) FROM customer WHERE c_custkey = 6) AS n_cdc_delete
"""

def _q_rule_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 verdict item 8: the crawl tier's rule-memory semantics
    (latest-per-host REPLACE, NULL-marker CLEAR, compaction-proof
    reads) under the hash gate. A deterministic 3-round rules history
    derives from ``nation`` (hosts = lowercased nation names), runs
    through the REAL :class:`~.crawl_state.CrawlState` machinery —
    ``record_round`` ×3 with a state-store ``compact()`` (the r12
    superseded-rules prune included) BETWEEN rounds 2 and 3, so the
    read provably survives the fold — and the final
    :meth:`~.crawl_state.CrawlState.rules` table returns whole. The
    DuckDB oracle recomputes the same history with a plain
    latest-per-host window over the same ``nation`` rows:

    - round 1: every host gets ``/r1/<nationkey>`` (disallow);
    - round 2: hosts with key %3==0 get TWO rules (replace proves
      whole-set, not row-wise, supersession), key %3==1 hosts get the
      NULL CLEAR marker;
    - round 3: key %5==0 hosts get ``/r3`` (allow) plus a deliberate
      equal-length allow/disallow PAIR on ``/tie``.

    The second leg (r12 verdict item 5) puts
    :func:`~.robots.robots_filter`'s adjudication itself under the
    gate: five derived URLs per host (a round-1 pattern, a round-2
    pattern, the round-3 allow, the tie path, and a rule-free path)
    filter through the SURVIVING memory via the real operator —
    longest match wins, allow wins the length tie, CLEAR-marker and
    ruleless hosts pass — and the oracle adjudicates the same rows
    with a ``max(struct(plen, allow))`` per URL, the exact winner
    ordering ``robots_filter`` aggregates with
    (``robots.py:robots_filter``)."""
    import shutil as _sh
    import tempfile as _tmp

    from .crawl_state import CrawlState

    nation = load_table(spark, sf_dir, "nation").select(
        F.lower(F.col("n_name")).alias("host"),
        F.col("n_nationkey").alias("k"),
    )

    def rule_rows(df: DataFrame, allow, pattern_col) -> DataFrame:
        return df.select(
            "host",
            F.lit(allow).cast("boolean").alias("allow"),
            pattern_col.alias("pattern"),
            F.concat(F.lit("^"), pattern_col).alias("rx"),
            F.length(pattern_col).cast("int").alias("plen"),
        )

    r1 = rule_rows(
        nation, False, F.concat(F.lit("/r1/"), F.col("k").cast("string"))
    )
    r2 = rule_rows(
        nation.filter(F.col("k") % 3 == 0), False, F.lit("/r2a")
    ).unionByName(
        rule_rows(nation.filter(F.col("k") % 3 == 0), False, F.lit("/r2b"))
    ).unionByName(
        # the CLEAR marker: a robots-bearing host whose body declared
        # no rules — must erase round 1's knowledge for these hosts
        nation.filter(F.col("k") % 3 == 1).select(
            "host",
            F.lit(None).cast("boolean").alias("allow"),
            F.lit(None).cast("string").alias("pattern"),
            F.lit(None).cast("string").alias("rx"),
            F.lit(None).cast("int").alias("plen"),
        )
    )
    fives = nation.filter(F.col("k") % 5 == 0)
    r3 = (
        rule_rows(fives, True, F.lit("/r3"))
        .unionByName(rule_rows(fives, True, F.lit("/tie")))
        .unionByName(rule_rows(fives, False, F.lit("/tie")))
    )

    empty_frontier = spark.createDataFrame([], "url string, indeg long")
    root = _tmp.mkdtemp(prefix="rule_memory_gate_")
    try:
        state = CrawlState(spark, root)
        state.record_round(9001, "r1.warc", {}, empty_frontier, rules=r1)
        state.record_round(9002, "r2.warc", {}, empty_frontier, rules=r2)
        state.compact()  # the fold + superseded-rules prune mid-history
        state.record_round(9003, "r3.warc", {}, empty_frontier, rules=r3)
        rows = [
            (r.host, bool(r.allow), r.pattern, r.rx, int(r.plen))
            for r in state.rules().collect()
        ]  # bounded: ≤ 3 rules per nation host
    finally:
        _sh.rmtree(root, ignore_errors=True)
    mem = spark.createDataFrame(
        rows,
        "host string, allow boolean, pattern string, rx string, plen int",
    )
    rules_leg = mem.select(
        F.lit("rules").alias("leg"),
        "host",
        "allow",
        "pattern",
        "plen",
        F.lit(None).cast("string").alias("url"),
    )
    # leg 2 (r12 verdict item 5): the adjudication itself — five
    # derived URLs per host through the REAL robots_filter against
    # the surviving memory
    from . import robots as R

    urls = nation.select(
        F.explode(
            F.array(
                F.concat(
                    F.lit("https://"), F.col("host"), F.lit("/r1/"),
                    F.col("k").cast("string"),
                ),
                F.concat(F.lit("https://"), F.col("host"), F.lit("/r2a/x")),
                F.concat(F.lit("https://"), F.col("host"), F.lit("/r3/z")),
                F.concat(F.lit("https://"), F.col("host"), F.lit("/tie/q")),
                F.concat(F.lit("https://"), F.col("host"), F.lit("/free")),
            )
        ).alias("url")
    )
    allowed_leg = R.robots_filter(urls, mem).select(
        F.lit("allowed").alias("leg"),
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("boolean").alias("allow"),
        F.lit(None).cast("string").alias("pattern"),
        F.lit(None).cast("int").alias("plen"),
        "url",
    )
    return rules_leg.unionByName(allowed_leg)


_RULE_MEMORY_ORACLE = """
WITH h AS (SELECT lower(n_name) AS host, n_nationkey AS k FROM nation),
hist AS (
  SELECT host, false AS allow, '/r1/' || CAST(k AS VARCHAR) AS pattern,
         1 AS rno FROM h
  UNION ALL SELECT host, false, '/r2a', 2 FROM h WHERE k % 3 = 0
  UNION ALL SELECT host, false, '/r2b', 2 FROM h WHERE k % 3 = 0
  UNION ALL SELECT host, NULL, NULL, 2 FROM h WHERE k % 3 = 1
  UNION ALL SELECT host, true, '/r3', 3 FROM h WHERE k % 5 = 0
  UNION ALL SELECT host, true, '/tie', 3 FROM h WHERE k % 5 = 0
  UNION ALL SELECT host, false, '/tie', 3 FROM h WHERE k % 5 = 0
),
latest AS (SELECT host, max(rno) AS rno FROM hist GROUP BY host),
mem AS (
  SELECT hist.host AS host, hist.allow AS allow, hist.pattern AS pattern,
         '^' || hist.pattern AS rx,
         CAST(length(hist.pattern) AS INT) AS plen
  FROM hist JOIN latest ON hist.host = latest.host AND hist.rno = latest.rno
  WHERE hist.pattern IS NOT NULL
),
urls AS (
  SELECT host, 'https://' || host || '/r1/' || CAST(k AS VARCHAR) AS url FROM h
  UNION ALL SELECT host, 'https://' || host || '/r2a/x' FROM h
  UNION ALL SELECT host, 'https://' || host || '/r3/z' FROM h
  UNION ALL SELECT host, 'https://' || host || '/tie/q' FROM h
  UNION ALL SELECT host, 'https://' || host || '/free' FROM h
),
scored AS (
  SELECT u.url AS url,
         max(CASE WHEN r.rx IS NOT NULL AND regexp_matches(
                       regexp_extract(u.url, '^[a-z]+://[^/]*(/.*)$', 1),
                       r.rx)
                  THEN {'plen': r.plen, 'allow_i': CAST(r.allow AS INT)}
             END) AS winner
  FROM urls u LEFT JOIN mem r ON u.host = r.host
  GROUP BY u.url
)
SELECT 'rules' AS leg, host, allow, pattern, plen,
       CAST(NULL AS VARCHAR) AS url
FROM mem
UNION ALL
SELECT 'allowed' AS leg, CAST(NULL AS VARCHAR) AS host,
       CAST(NULL AS BOOLEAN) AS allow, CAST(NULL AS VARCHAR) AS pattern,
       CAST(NULL AS INT) AS plen, url
FROM scored WHERE winner IS NULL OR winner.allow_i = 1
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "m_mutation_counts": _q_mutation_counts,
    "w_rule_memory": _q_rule_memory,
}

ORACLES: dict[str, str] = {
    "m_mutation_counts": _MUTATION_ORACLE,
    "w_rule_memory": _RULE_MEMORY_ORACLE,
}
