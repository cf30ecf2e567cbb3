"""Plan-shape assertions for the round-4 operators: the scale claims in
the docstrings (pure codegen, no Python UDF, window not join, no
cartesian product) pinned against the optimized plan so a regression
shows up as a test failure, not a 100× slowdown at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.operators import dedup, packing, tokenize


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=50):
    return spark.createDataFrame(
        [(i, f"some text number {i} with words repeated {i % 7} times") for i in range(n)],
        ["doc_id", "text"],
    )


def test_regex_tokens_stays_jvm_side(spark):
    # the BPE-ish pre-tokenizer must not introduce a Python worker
    df = _docs(spark).select(F.size(tokenize.regex_tokens()).alias("n"))
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_regex_mode_stays_jvm_side(spark):
    df = packing.pack_sequences(_docs(spark), tokenizer=tokenize.regex_tokens)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the window partitions on shard — never a single global sort
    assert "Window" in plan and "shard" in plan


def test_wordpiece_mode_is_arrow_batched(spark):
    tok = lambda c: tokenize.wordpiece_tokens(["some", "##text"], c)
    df = packing.pack_sequences(_docs(spark), tokenizer=tok)
    plan = _plan(df)
    # vectorized Arrow transfer, not row-at-a-time pickling
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_lsh_bucket_guard_is_window_not_join(spark):
    sh = dedup.shingles(_docs(spark))
    df = dedup.lsh_candidates_from_shingles(sh, max_bucket=100)
    plan = _plan(df)
    assert "Window" in plan
    # exactly one self-join for the candidate pairs; the guard itself
    # must not add a second join of the bands against bucket sizes
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") <= 1


def test_bounded_reach_has_no_cartesian(spark):
    from webpagesgraphdatabase_spark.graph.algorithms import bounded_reach
    from webpagesgraphdatabase_spark.graph.model import PropertyGraph

    hk = spark.createDataFrame(
        [("a", "K1"), ("b", "K1"), ("b", "K2")], ["src_url", "dst_keyword"]
    )
    empty = spark.createDataFrame([], "name string")
    g = PropertyGraph(
        links=spark.createDataFrame([], "url string"),
        categories=empty,
        keywords=empty,
        belongs_to=spark.createDataFrame([], "src_url string, dst_category string"),
        has_keyword=hk,
    )
    plan = _plan(bounded_reach(g, max_hops=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pii_scrub_is_pure_codegen_no_shuffle(spark):
    # the PII scrub claims "pure map stage": no Python worker, no
    # exchange — it must fuse into whatever reads the text
    from webpagesgraphdatabase_spark.operators import pii

    df = pii.pii_scrub(_docs(spark))
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_pii_scan_and_redact_are_shuffle_free_too(spark):
    from webpagesgraphdatabase_spark.operators import pii

    for df in (pii.pii_scan(_docs(spark)), pii.pii_redact(_docs(spark))):
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


def test_paragraph_dedup_first_occurrence_is_partial_agg_not_window(spark):
    """r6 (r5 verdict item 2): the first-occurrence decision must be a
    partial-aggregatable hash aggregate keyed on xxhash64(seg) — NOT a
    row_number window over raw segment text, which would rank every copy
    of a mega-duplicated boilerplate segment on a single task. A
    HashAggregate gets map-side combine (and AQE skew handling on the
    exchange); a window gets neither."""
    df = dedup.paragraph_dedup(_docs(spark).filter(F.col("doc_id") < 40))
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan  # no window anywhere — least of all on seg
    assert "xxhash64" in plan
    # map-side combine: a partial-mode aggregate over the segment key
    assert "partial_min" in plan or "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_candidate_join_is_equi_on_cluster(spark):
    """r5: SemDeDup's within-cluster compare must plan as an equi-join
    on the cluster id (hash-partitionable at scale), with the centroid
    assignment a broadcast — never a nested-loop pair enumeration."""
    from webpagesgraphdatabase_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    df = similarity.semantic_dedup(emb, threshold=0.99, n_centroids=4)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the candidate pair join is an equi-join keyed on cluster_id
    import re

    assert re.search(r"(SortMergeJoin|ShuffledHashJoin) \[cluster_id", plan), plan
    # the only nested-loop nodes are the deliberate broadcast-centroid
    # argmax crosses (tiny build side, the ivf_assign pattern) — never
    # a corpus-x-corpus loop
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_train_bpe_superstep_tables_stay_jvm_side(spark):
    """r5: one training iteration's pair-count and merge-apply plans
    contain no Python workers — the whole trainer is codegen over the
    vocab-bounded table."""
    from webpagesgraphdatabase_spark.operators import tokenize as tk

    docs = _docs(spark)
    merges = tk.train_bpe_merges(docs, n_merges=2, min_freq=1)
    assert merges  # learned something on this corpus
    # the observable artifact of the per-iteration plan: re-run the
    # vocab build + one pair-count explosion and pin its plan
    vocab = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(tk.BPE_SPLIT_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .count()
    )
    assert "BatchEvalPython" not in _plan(vocab)
    assert "ArrowEvalPython" not in _plan(vocab)


def test_lsh_buckets_are_shuffle_free_codegen(spark):
    """r6: the LSH signature is a pure projection — plane signs inline
    as literals and every bit is a codegen fold, so bucketing shuffles
    nothing and never explodes corpus×dim rows (the former shape paid
    two exchanges per table). Multi-table adds a posexplode, still no
    exchange."""
    from webpagesgraphdatabase_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(i, [float(i % 7) - 3.0] * 8) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    single = _plan(sim.lsh_buckets(emb, n_planes=4, dim=8))
    multi = _plan(sim.lsh_buckets_multi(emb, n_planes=4, n_tables=3, dim=8))
    for plan in (single, multi):
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_and_sq8_encode_are_zero_shuffle(spark):
    """r7: the sliding-window chunker and the SQ8 encoder are pure
    row-local array algebra — no Exchange, no Python — so both are
    stream-safe and scale as map-only passes."""
    from webpagesgraphdatabase_spark.operators import similarity as sim

    docs = _docs(spark)
    chunk = packing.chunk_documents(docs, chunk_tokens=8, overlap=2)
    stats = packing.chunk_stats(docs, chunk_tokens=8, overlap=2)
    emb = spark.createDataFrame(
        [(i, [float(i % 5)] * 8) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    enc = sim.sq8_encode(emb)
    for df in (chunk, stats, enc):
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_literal_path_single_stats_shuffle(spark):
    """r7: the literal-query BM25 scorer pays exactly the one-row
    stats aggregate (a single-partition exchange pair) — no join
    shuffle, no Python, no cartesian beyond the 1-row broadcast."""
    from webpagesgraphdatabase_spark.operators import search

    plan = _plan(search.bm25_scores(_docs(spark), ("fast", "slow")))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only exchanges are the stats aggregate's partial/final pair
    import re as _re

    assert len(_re.findall(r"\bExchange\b", plan)) <= 2, plan


def test_cdc_segments_doc_bounded_shuffles(spark):
    """r7: CDC segmentation shuffles narrow (doc_id, pos, th) rows
    keyed by doc — no Python, no cartesian; windows partition by
    doc_id (never unpartitioned)."""
    from webpagesgraphdatabase_spark.operators import textstats

    plan = _plan(textstats.cdc_segments(_docs(spark)))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re as _re

    specs = _re.findall(r"windowspecdefinition\(([^,]+)", plan)
    assert specs and all("doc_id" in spec for spec in specs), specs


def test_robots_filter_broadcasts_rules(spark):
    """r7: the politeness adjudication joins against a BROADCAST rule
    table and aggregates with a struct-max — no sort-merge join, no
    per-host window."""
    from webpagesgraphdatabase_spark import robots as R

    rules = R.robots_rules(
        spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /x")], ["host", "body"]
        )
    )
    urls = spark.createDataFrame(
        [(f"https://h.example/p{i}",) for i in range(10)], ["url"]
    )
    plan = _plan(R.robots_filter(urls, rules))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" not in plan.lower()


def test_crawl_state_fetch_plan_shape(spark, tmp_path):
    """The PLANS.md r10 claim, pinned mechanically: the at-rest fetch
    plan's delay table BROADCASTS, the only shuffle is the per-host
    hash partition the budget window needs (plus the candidate groupBy
    and the broadcast builds), and no cartesian product or row-wise
    Python appears anywhere in the plan."""
    from webpagesgraphdatabase_spark.crawl_state import CrawlState

    state = CrawlState(spark, str(tmp_path / "state"))
    f1 = spark.createDataFrame(
        [("https://a.example/p1", 4), ("https://b.example/q1", 1)],
        "url string, indeg long",
    )
    state.record_round(
        7, "r1", {"n_docs_indexed": 1}, f1,
        delays=spark.createDataFrame(
            [("a.example", 5.0)], "host string, crawl_delay double"
        ),
    )
    seen = spark.createDataFrame([("https://a.example/p0",)], ["url"])
    plan = _plan(state.next_fetch_plan(seen=seen, round_seconds=10.0))
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    # delay budget join broadcasts its per-host table
    assert "BroadcastHashJoin" in plan
    # the budget window partitions by host — never a global sort
    assert "Window" in plan and "_host" in plan


def test_ivf_assign_is_partial_agg_not_window(spark):
    """r11: the single-assignment centroid argmax is a struct-max
    aggregation with a map-side partial (the exchange after it carries
    one row per vector), never a row_number window whose sort would
    shuffle |corpus|·n_centroids scored rows. Multi-assignment (an
    encode-time lever) keeps its top-k window — also pinned, so a
    future refactor collapsing the two paths shows up here."""
    from webpagesgraphdatabase_spark.operators import similarity

    vecs = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0, 0.5]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    plan = _plan(similarity.ivf_assign(vecs, n_centroids=4))
    assert "Window" not in plan, plan
    # the partial level collapses map-side BEFORE the exchange (struct
    # buffers plan as SortAggregate — the sort is per-partition local;
    # the exchange still carries one row per vector)
    assert "partial_max" in plan, plan
    assert "Exchange hashpartitioning(vec_id" in plan, plan
    plan_multi = _plan(similarity.ivf_assign(vecs, n_centroids=4, mult=2))
    assert "Window" in plan_multi, plan_multi
