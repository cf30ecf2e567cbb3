"""Tune the r14 BENCH_SCALE multipliers (VERDICT r13 item 1).

For every entry in ``bench.BENCH_SCALE``, builds the SAME scaled input
``bench.main`` builds (via ``bench.ScaledInputs``) and reports a warm
median-of-3 — the number the bench's own median would read. The de-noise
goal is every scaled entry >= ~3 s; edit ``BENCH_SCALE`` in bench.py and
re-run until the table lands in the 3-6 s band. Usage:

    python tools/tune_bench_scale.py [entry ...]   # default: all scaled
"""

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from webpagesgraphdatabase_spark import registry  # noqa: E402
from webpagesgraphdatabase_spark.graph import queries as Q  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402


def main():
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tune-scale")
    scaled = bench.ScaledInputs(spark, sf_dir)
    S = dict(bench.BENCH_SCALE)
    if os.environ.get("SPARK_GRAFT_TUNE_K"):
        k_all = int(os.environ["SPARK_GRAFT_TUNE_K"])
        S = {name: k_all for name in S}

    import shutil

    from pyspark.sql import functions as SF

    from webpagesgraphdatabase_spark.catalog import Warehouse
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore
    from webpagesgraphdatabase_spark.graph.tpch_adapter import (
        materialize_graph,
    )
    from webpagesgraphdatabase_spark.operators import (
        dedup,
        sketches,
        textstats,
        tokenize,
    )

    cleanup: list[str] = []
    thunks: dict[str, object] = {}

    def want(*names):
        return not only or any(n in only for n in names)

    # --- graph entries -------------------------------------------------
    if want(
        "g_top_keywords", "g_links_with_categories", "g_links_per_category",
        "g_export_edges", "g_interconnect_pair_counts",
    ):
        wh = tempfile.mkdtemp(prefix="tune_graph_")
        cleanup.append(wh)
        store = GraphStore(spark, wh)
        store.init_schema()
        materialize_graph(spark, sf_dir, store)
        gfn = {
            "g_top_keywords": Q.top_keywords,
            "g_links_with_categories": Q.links_with_categories,
            "g_links_per_category": Q.links_per_category,
            "g_export_edges": Q.export_edges,
            "g_interconnect_pair_counts": Q.interconnection_pair_counts,
        }
        graph_inputs = bench.build_graph_inputs(scaled, store)
        for name, fn in gfn.items():
            st = graph_inputs[name]
            thunks[name] = (
                lambda fn=fn, st=st: bench._force(fn(st.graph()))
            )

    # --- registry rows on scaled dirs ---------------------------------
    for name, tables in (
        ("mm_byte_histogram", ("documents",)),
        ("t_repetition", ("documents",)),
        ("e_sessionize", ("events",)),
        ("e_user_rollup", ("events",)),
    ):
        if want(name):
            d = scaled.dir_for(S[name], tables)
            thunks[name] = lambda name=name, d=d: bench._force(
                registry.QUERIES[name](spark, d)
            )

    # --- direct docs/events entries -----------------------------------
    if want("t_quality_lr_score"):
        docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet")
        model = textstats.train_quality_classifier(docs1)
        dlr = scaled.table("documents", S["t_quality_lr_score"])
        thunks["t_quality_lr_score"] = lambda: bench._force(
            textstats.quality_lr_score(dlr, model)
        )
    if want("u_heavy_hitters"):
        tok = scaled.table("documents", S["u_heavy_hitters"]).select(
            SF.explode(tokenize.whitespace_tokens("text")).alias("t")
        )
        thunks["u_heavy_hitters"] = lambda: bench._force(
            sketches.heavy_hitters(tok, "t", k=64)
        )
    if want("t_cdc_segments"):
        dcdc = scaled.table("documents", S["t_cdc_segments"])
        thunks["t_cdc_segments"] = lambda: bench._force(
            textstats.cdc_segments(dcdc)
        )
    if want("d_paragraph_dedup_hot"):
        hot = scaled.table("documents", S["d_paragraph_dedup_hot"]).select(
            "doc_id",
            SF.lit(
                ("boilerplate navigation footer terms " * 24).strip()
            ).alias("text"),
        )
        thunks["d_paragraph_dedup_hot"] = lambda: bench._force(
            dedup.paragraph_dedup(hot)
        )
    if want("u_bottomk_quantiles"):
        evb = scaled.table("events", S["u_bottomk_quantiles"])
        thunks["u_bottomk_quantiles"] = lambda: bench._force(
            sketches.bottomk_sample_quantiles(
                evb, "event_type", "event_id", "value"
            )
        )

    # --- warehouse entries --------------------------------------------
    if want("w_compact", "w_zonemap_write", "w_read_pruned"):
        whd = tempfile.mkdtemp(prefix="tune_wh_")
        cleanup.append(whd)
        wh2 = Warehouse(spark, whd)
        ev1 = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev_c = scaled.table("events", S["w_compact"])
        ev_zp = scaled.table("events", S["w_read_pruned"])
        setups = bench._wh_retime_setups(wh2, ev1, ev_c=ev_c, ev_zp=ev_zp)
        if want("w_compact"):
            # compaction mutates: rebuild the fragmented table per pass
            def w_compact():
                setups["w_compact"]()
                t0 = time.time()
                wh2.compact("events_c")
                return time.time() - t0

            thunks["w_compact"] = ("presetup", w_compact)
        if want("w_zonemap_write", "w_read_pruned"):
            setups["w_read_pruned"]()  # range-laid + zone-mapped
            thunks["w_zonemap_write"] = lambda: wh2.write_zonemap(
                "events_zp", ("event_type", "ts")
            )
            lo = ev1.agg(SF.min("event_type").alias("lo")).first()["lo"]
            thunks["w_read_pruned"] = lambda: bench._force(
                wh2.read_pruned("events_zp", {"event_type": (lo, lo)})
            )

    # --- embeddings entries -------------------------------------------
    sim = bench._similarity()
    if want("s_pca_model"):
        e8 = scaled.table("embeddings", S["s_pca_model"])
        thunks["s_pca_model"] = lambda: sim.pca_model(e8)
    if want("s_pca_whiten"):
        e16 = scaled.table("embeddings", S["s_pca_whiten"])
        e8b = scaled.table("embeddings", S["s_pca_model"])
        pca = sim.pca_model(e8b)
        thunks["s_pca_whiten"] = lambda: bench._force(
            sim.pca_project(e16, pca, whiten=True)
        )
    if want("s_cosine_neardup"):
        e3 = scaled.table("embeddings", S["s_cosine_neardup"])
        thunks["s_cosine_neardup"] = lambda: bench._force(
            sim.cosine_neardup(e3)
        )
    if want("s_ann_lsh"):
        n1 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        k = S["s_ann_lsh"]
        e4 = scaled.table("embeddings", k)
        dim = len(e4.select("embedding").first()["embedding"])
        thunks["s_ann_lsh"] = lambda: bench._force(
            sim.ann_lsh(e4, 10, 5, corpus_count=n1 * k, dim=dim)
        )

    try:
        for name in sorted(thunks):
            fn = thunks[name]
            if isinstance(fn, tuple):  # presetup style: fn times itself
                fn = fn[1]
                fn()  # warm
                samples = [round(fn(), 3) for _ in range(3)]
            else:
                fn()  # warm
                samples = []
                for _ in range(3):
                    t0 = time.time()
                    fn()
                    samples.append(round(time.time() - t0, 3))
            print(
                f"{name:28s} k={S[name]:3d} samples={samples} "
                f"median={statistics.median(samples):.2f}"
            )
    finally:
        scaled.close()
        for d in cleanup:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
