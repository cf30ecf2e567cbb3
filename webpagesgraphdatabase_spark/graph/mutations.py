"""Graph write path: MERGE / DELETE semantics over the Parquet warehouse.

Spark DataFrames are immutable, so every reference mutation becomes a
set-based table-rewrite job (SURVEY.md §2.7). This is the single biggest
semantic-preserving redesign vs the reference, which MERGEs row-at-a-time
in per-row ``conn.execute`` loops (``main.py:244-339``, ``c10:61-91``) —
an N+1 anti-pattern our engine replaces with one upsert job per table.

Semantics preserved exactly:

- M1 MERGE node = insert-if-absent by PK (``main.py:119-134, 411-424``)
- M2 MERGE+SET  = full-row upsert, new row wins (``c10:69-76``)
- M3 MERGE rel  = idempotent edge insert keyed (src, dst)
  (``main.py:136-146``, ``c10:78-91``)
- M4 DETACH DELETE = remove node + incident edges (``main.py:490``)
- M5 orphan DELETE = anti-join cleanup (``c12:31-32``)
- M6 re-init = drop + recreate schema (``c9:11-17``)

All upserts are anti-join/union jobs: one shuffle on the key, partial-
aggregatable, no driver-side loops — at 100 TB each is a normal
distributed join against the current table snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Warehouse
from .model import (
    BELONGS_TO_SCHEMA,
    HAS_KEYWORD_SCHEMA,
    LINK_SCHEMA,
    NAME_SCHEMA,
    PropertyGraph,
)

NODE_TABLES = {"links": LINK_SCHEMA, "categories": NAME_SCHEMA, "keywords": NAME_SCHEMA}
EDGE_TABLES = {"belongs_to": BELONGS_TO_SCHEMA, "has_keyword": HAS_KEYWORD_SCHEMA}


class GraphStore:
    """Warehouse-backed mutable property graph (reference DB-dir analog)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.wh = Warehouse(spark, root)

    # -- lifecycle ---------------------------------------------------------
    # belongs_to is hive-partitioned by category: category-scoped
    # traversals (the symmetric interconnection filter, per-category
    # exports) prune to one directory; cardinality is bounded (|C| is
    # small by the data model), so no small-file explosion.
    PARTITION_SPECS: dict[str, tuple[str, ...]] = {"belongs_to": ("dst_category",)}

    def init_schema(self) -> None:
        """S12: CREATE ... IF NOT EXISTS for all five tables."""
        for name, schema in {**NODE_TABLES, **EDGE_TABLES}.items():
            self.wh.create_table(
                name, schema, partition_by=self.PARTITION_SPECS.get(name, ())
            )

    def reinit(self) -> None:
        """M6: destructive re-init (``c9:11-17``)."""
        self.wh.drop_all()
        self.init_schema()

    def graph(self) -> PropertyGraph:
        belongs_to = self.wh.read("belongs_to")
        return PropertyGraph(
            links=self.wh.read("links"),
            categories=self.wh.read("categories"),
            keywords=self.wh.read("keywords"),
            belongs_to=belongs_to,
            has_keyword=self.wh.read("has_keyword"),
            single_category_verified=self._single_category(belongs_to),
        )

    def _single_category(self, belongs_to) -> bool:
        """One-category-per-link constraint witness, checked once per
        belongs_to *version* (immutable — every write is a new version,
        so the memo can never go stale) and cached; downstream plans
        (the algebraic flagship) then skip their per-query probe."""
        ver = self.wh.list_versions("belongs_to")[-1]
        cache = getattr(self, "_single_cat_cache", None)
        if cache is None:
            cache = self._single_cat_cache = {}
        if ver not in cache:
            cache[ver] = (
                belongs_to.groupBy("src_url")
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") > 1)
                .limit(1)
                .count()
                == 0
            )
        return cache[ver]

    # -- M1/M2: node upserts -------------------------------------------------
    def merge_nodes(self, table: str, new: DataFrame, key: str, update: bool = False) -> None:
        """M1 (``update=False``): insert-if-absent — existing rows win,
        matching the reference MERGE-without-SET which leaves existing
        nodes untouched. M2 (``update=True``): MERGE+SET — the incoming
        row replaces the stored one (``c10:69-76``).

        Incoming batches are deduplicated on the key first (last-writer
        within a batch is arbitrary in the reference's row loop; we take
        an arbitrary-but-deterministic one via dropDuplicates).
        """
        if table not in NODE_TABLES:
            raise KeyError(table)
        new = new.dropDuplicates([key])
        existing = self.wh.read(table)
        if update:
            survivors = existing.join(new.select(key), key, "left_anti")
            merged = survivors.unionByName(new)
        else:
            fresh = new.join(existing.select(key), key, "left_anti")
            merged = existing.unionByName(fresh)
        self.wh.overwrite(table, merged)

    def merge_links(self, new: DataFrame, update: bool = True) -> None:
        """Upsert Link rows. Null-tolerant: missing Link columns (the
        reference's add_link omits the explanation props, ``main.py:412-424``)
        are filled with NULL so projection defaults (P9) apply on read."""
        for col in LINK_SCHEMA.fieldNames():
            if col not in new.columns:
                new = new.withColumn(col, F.lit(None).cast("string"))
        self.merge_nodes("links", new.select(*LINK_SCHEMA.fieldNames()), "url", update)

    def merge_set_links(self, new: DataFrame, set_cols: tuple[str, ...]) -> None:
        """M2 as Cypher ``MERGE … SET`` actually behaves (the notebook's
        populate shape, ``Edits.ipynb c10:69-76``): insert-if-absent,
        then assign ONLY the SET properties — a property outside
        ``set_cols`` keeps its stored value on an existing row (and is
        NULL on a fresh one, or takes the MERGE map's value when the
        incoming frame carries it). ``merge_links(update=True)`` is
        whole-row replacement; this is per-property assignment, so
        replaying the notebook's MERGE+SET over rows the app already
        enriched cannot NULL out ``raw_content``/``cleaned_content``."""
        cols = list(LINK_SCHEMA.fieldNames())
        for c in cols:
            if c not in new.columns:
                new = new.withColumn(c, F.lit(None).cast("string"))
        new = new.select(*cols).dropDuplicates(["url"])
        bad = [c for c in set_cols if c not in cols or c == "url"]
        if bad:
            raise KeyError(f"SET targets outside the Link schema: {bad}")
        existing = self.wh.read("links")
        ex = existing.select(*[F.col(c).alias(f"__ex_{c}") for c in cols])
        upserts = new.join(ex, new["url"] == F.col("__ex_url"), "left").select(
            F.col("url"),
            *[
                (
                    F.col(c)
                    if c in set_cols
                    else F.coalesce(F.col(f"__ex_{c}"), F.col(c))
                ).alias(c)
                for c in cols
                if c != "url"
            ],
        )
        survivors = existing.join(new.select("url"), "url", "left_anti")
        self.wh.overwrite("links", survivors.unionByName(upserts))

    def merge_names(self, table: str, names: DataFrame) -> None:
        """MERGE Category/Keyword nodes from a 1-col DataFrame (M1)."""
        self.merge_nodes(table, names.select(F.col(names.columns[0]).alias("name")), "name")

    # -- M3: edge upsert -------------------------------------------------------
    def merge_edges(self, table: str, new: DataFrame) -> None:
        """Idempotent edge insert keyed on (src, dst) (``main.py:136-146``).

        Endpoint fidelity check mirrors the reference's MATCH-before-MERGE
        (``main.py:329-332``: the edge is only created for existing
        endpoints): incoming edges are inner-joined to both endpoint
        tables before the union.
        """
        if table not in EDGE_TABLES:
            raise KeyError(table)
        src_col, dst_col = EDGE_TABLES[table].fieldNames()
        new = new.toDF(src_col, dst_col).dropDuplicates([src_col, dst_col])

        links = self.wh.read("links").select(F.col("url"))
        node_table = "categories" if table == "belongs_to" else "keywords"
        dsts = self.wh.read(node_table).select(F.col("name"))
        new = (
            new.join(links, new[src_col] == links.url, "left_semi")
            .join(dsts, new[dst_col] == dsts.name, "left_semi")
        )

        existing = self.wh.read(table)
        fresh = new.join(existing, [src_col, dst_col], "left_anti")
        self.wh.overwrite(table, existing.unionByName(fresh))

    # -- M4: DETACH DELETE ------------------------------------------------------
    def detach_delete_link(self, url: str) -> None:
        """M4 (``main.py:490``): remove the Link node and all incident
        edges in one logical operation."""
        self.wh.overwrite("links", self.wh.read("links").filter(F.col("url") != url))
        for table in EDGE_TABLES:
            self.wh.overwrite(
                table, self.wh.read(table).filter(F.col("src_url") != url)
            )

    # -- M5: orphan cleanup -----------------------------------------------------
    def cleanup_orphans(self, only: str | None = None) -> dict[str, int]:
        """M5 (``c12:31-32``): delete Category/Keyword nodes with no
        incoming edge. Returns per-table deleted counts. Idempotent —
        a second run is a fixpoint (property-tested). ``only`` restricts
        to one node table (the per-statement semantics of the
        notebook's two separate orphan-DELETE Cyphers)."""
        deleted = {}
        for node_table, edge_table, dst_col in (
            ("categories", "belongs_to", "dst_category"),
            ("keywords", "has_keyword", "dst_keyword"),
        ):
            if only is not None and node_table != only:
                continue
            nodes = self.wh.read(node_table)
            edges = self.wh.read(edge_table).select(F.col(dst_col).alias("name"))
            kept = nodes.join(edges, "name", "left_semi")
            n_before, n_after = nodes.count(), kept.count()
            if n_before != n_after:
                self.wh.overwrite(node_table, kept)
            deleted[node_table] = n_before - n_after
        return deleted

    # -- J4/P2 helpers -----------------------------------------------------------
    def link_exists(self, url: str) -> bool:
        """P2 existence probe (``main.py:105,257,367``)."""
        return bool(self.wh.read("links").filter(F.col("url") == url).take(1))

    def filter_new_urls(self, candidates: DataFrame) -> DataFrame:
        """J4 dup-check semi-join, set-based: keep candidate rows whose
        url is not yet stored (``main.py:257-261`` per-row, batched here)."""
        return candidates.join(self.wh.read("links").select("url"), "url", "left_anti")
