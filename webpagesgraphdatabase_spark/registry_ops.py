"""Registry section for the beyond-reference operators (SURVEY.md §7
milestone 5): dedup, similarity search, text analysis, multimodal
plumbing, event-stream analytics.

Merged into the driver contract by :mod:`.registry`. Every entry has a
DuckDB oracle that recomputes the operator from first principles (md5
arithmetic and all) — including the ``mapInPandas`` multimodal stages,
whose byte-level features the oracle reproduces with string functions
(the synthetic corpus is pure ASCII, so text chars == payload bytes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .io_tpch import load_table
from .operators import (
    curation,
    dedup,
    events,
    multimodal,
    packing,
    sampling,
    similarity,
    textstats,
)

COSINE_THRESHOLD = 0.42  # corpus max pair cosine ~0.51 (near-random vectors)
ANN_QUERIES = 10
ANN_K = 5

# Hybrid-retrieval (RRF) fixed query set: query q's text leg is this
# literal term triple, its vector leg is embedding vec_id = q (the doc
# and vector id spaces are aligned in the synthetic corpus). All terms
# occur in the corpus vocabulary.
RRF_QUERY_TERMS: tuple[tuple[str, str, str], ...] = (
    ("spark", "hash", "window"),
    ("join", "merge", "sort"),
    ("stream", "batch", "vector"),
)


def _on(table: str, fn: Callable, *args) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, table), *args)

    return run


# The driver's correctness gate records at most ~50 registry rows (r01
# checked exactly the first 50 of 54, in dict order; r12 recorded 50 of
# 51 and the 51st went driver-unchecked — the r13 lesson: KEEP
# len(queries()) <= 50), so related operators share one registry query
# where their outputs join naturally — every operator still runs, every
# column is still hash-checked, and the registry stays within the
# checked window. Currently exactly 50.


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both document fingerprints (min-shingle + Rabin-Karp rolling)
    plus the exact duplicated-span counts (Lee et al. window dedup,
    dedup.duplicated_window_stats) AND the span-strip rewrite itself
    (dedup.strip_duplicated_spans, hashed — r7: the strip output was
    previously unit-pinned only) in one row per doc; each operator
    runs unchanged and joins on doc_id (spans left-joined — docs
    shorter than the window have no span windows). Also carries the
    BM25 top-10 for a fixed query (search.bm25_topk, r7) left-joined
    on doc_id — rank/score null off the top-k — and the content-
    defined-chunking layout fingerprint (textstats.cdc_stats, r7)."""
    from pyspark.sql import functions as F

    from .operators import dedup, search

    docs = load_table(spark, sf_dir, "documents")
    fp = textstats.fingerprint(docs)
    rfp = textstats.rolling_fingerprint(docs)
    spans = dedup.duplicated_window_stats(docs)
    strip = dedup.strip_duplicated_spans(docs).select(
        "doc_id", F.md5("deduped_text").alias("strip_md5")
    )
    joined = (
        fp.join(rfp, "doc_id")
        .join(spans, "doc_id", "left")
        .join(strip, "doc_id", "left")
        .select(
            "doc_id",
            "fp",
            "n_shingles",
            "rolling_fp",
            "n_windows",
            F.coalesce("n_spanwin", F.lit(0)).cast("long").alias("n_spanwin"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce("n_foreign_dup", F.lit(0))
            .cast("long")
            .alias("n_foreign_dup"),
            F.coalesce(F.col("strip_md5"), F.md5(F.lit(""))).alias(
                "strip_md5"
            ),
        )
    )
    bm = search.bm25_topk(docs, ("spark", "hash", "window"), k=10).select(
        "doc_id",
        F.col("rank").alias("bm25_rank"),
        F.round("score", 6).alias("bm25_score"),
    )
    cdc = textstats.cdc_stats(docs)
    return (
        joined.withColumn(
            "dup_fraction",
            F.round(
                F.col("n_dup_windows")
                * F.lit(1.0)
                / F.greatest(F.col("n_spanwin"), F.lit(1)),
                6,
            ),
        )
        .join(bm, "doc_id", "left")
        .join(cdc, "doc_id", "left")
        .withColumn(
            "n_cdc_segments",
            F.coalesce("n_cdc_segments", F.lit(0)).cast("long"),
        )
        .withColumn("cdc_fp", F.coalesce("cdc_fp", F.md5(F.lit(""))))
    )


def _q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document text classifications in one row (joined on
    doc_id): language ID + quality features + token counts + PII scrub
    + trigram/bigram LM fluency + (r8) DSIR importance weights against
    the English target subset. Inner join on all sides — empty
    documents (filtered by quality_score) drop identically. Each
    operator runs unchanged; the join keeps them all hash-checked
    within the ~50-row gate window.

    The PII leg plants deterministic doc_id-derived PII (the synthetic
    corpus has none naturally — see :func:`..operators.pii.plant_pii`),
    then scans and redacts it; the oracle plants the identical suffix
    and recomputes counts + redaction with RE2."""
    from pyspark.sql import functions as F

    from .operators import pii

    docs = load_table(spark, sf_dir, "documents")
    # Composition measured and deliberately KEPT as the per-leg join
    # shape (r15, guide §1.1/§1.3): fusing the four row-local legs
    # (language argmax + quality stats + token counts + PII scrub) into
    # one projection over one scan — value-identical, oracle-verified —
    # measured consistently SLOWER at sf0.1 in load-gated interleaved
    # A/B (fused min 4.34 / med 4.77 vs joined min 3.51 / med 4.58 over
    # 6 quiet pairs): the independent leg subtrees give the scheduler
    # concurrent stages that fill the cores, and the broadcast joins
    # stream the probe side, while the fused block serializes all the
    # regex/argmax work behind one exchange on the critical path. The
    # legs themselves carry this round's wins (lang_id's window
    # removal, DSIR's single-explode feature pass).
    pii_cols = pii.pii_scrub(pii.plant_pii(docs), "text_pii")
    # DSIR importance weights (r8): target = the English subset —
    # "which documents look like the data we want more of"
    dsir = sampling.dsir_weights(docs, F.col("lang") == "en")
    return (
        textstats.lang_id(docs)
        .join(textstats.quality_score(docs), "doc_id")
        .join(textstats.token_counts(docs), "doc_id")
        .join(pii_cols, "doc_id")
        .join(textstats.trigram_score(docs), "doc_id")
        # bigram-LM fluency (left: docs with <2 tokens have no bigrams)
        .join(textstats.bigram_lm_scores(docs), "doc_id", "left")
        .join(dsir, "doc_id")
        .select(
            "doc_id",
            "pred_lang",
            "score",
            "n_tokens",
            "mean_token_len",
            "stopword_ratio",
            "quality",
            "ws_tokens",
            "re_tokens",
            "n_chars",
            "n_email",
            "n_ip",
            "n_phone",
            "n_id",
            "clean_text",
            "n_tri",
            "tri_score",
            F.coalesce("lm_logp", F.lit(0.0)).alias("lm_logp"),
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            "dsir_logw",
            "dsir_keep",
        )
    )


def _q_pack_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing under BOTH oracle-expressible tokenizers in one
    row (joined on doc_id): whitespace (default) and the BPE-ish regex
    pre-tokenizer. The shard column is tokenizer-independent (md5 of
    doc_id), so the join pins that swapping tokenizers changes only the
    token counts and the derived layout — never the shuffle shape.
    Also carries the sliding-window chunk layout's fingerprint (r7,
    packing.chunk_stats — the RAG chunker, row-local array algebra)."""
    from pyspark.sql import functions as F

    from .operators import tokenize

    docs = load_table(spark, sf_dir, "documents")
    ws = packing.pack_sequences(docs)
    rx = packing.pack_sequences(docs, tokenizer=tokenize.regex_tokens).select(
        "doc_id",
        F.col("n_tokens").alias("re_n_tokens"),
        F.col("seq_id").alias("re_seq_id"),
        F.col("seq_offset").alias("re_seq_offset"),
    )
    ch = packing.chunk_stats(docs)
    return ws.join(rx, "doc_id").join(ch, "doc_id")


def _q_ann_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six retrieval strategies in one registry row (method,
    query_id, rank, neighbor_id, recall_hits): exact brute force (the
    correctness baseline), hyperplane-LSH, IVF, SQ8 (int8 scalar
    quantization with exact re-rank, r7), binary sign quantization
    (1 bit/dim packed to words, asymmetric float-vs-±1 scoring, r8),
    and hybrid BM25+vector reciprocal-rank fusion (r8) — LSH planes
    and IVF lists auto-sized from the corpus count (floor(log2(N/64))
    / floor(sqrt(N)), reproduced in the oracle from count(*)).
    ``recall_hits`` is the recall@k diagnostic: per (method, query),
    how many of that method's top-k are in the exact top-k (= ANN_K
    for the exact rows; for the rrf leg it reads as "how much of the
    fused list the text signal moved away from pure-cosine"). Each
    operator runs unchanged; the union keeps all six hash-checked
    within the ~50-row gate window."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    # one corpus probe for both auto-sized methods (the oracle derives
    # the same integers from count(*)); without this each method would
    # re-run its own count()/first() sizing jobs
    n = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    from .operators import search

    # hybrid RRF leg (r8): per fixed query, BM25 top-4k over documents
    # (fixed-order scoring — the oracle-exact bm25_topk shape) fused
    # with the exact-cosine top-4k for the aligned query vector via
    # reciprocal-rank fusion; the fused sum is two doubles, order-free
    docs = load_table(spark, sf_dir, "documents")
    text_legs = None
    for qid, terms in enumerate(RRF_QUERY_TERMS):
        leg = search.bm25_topk(docs, terms, k=ANN_K * 4).select(
            F.lit(qid).alias("query_id"), "doc_id", "rank"
        )
        text_legs = leg if text_legs is None else text_legs.unionByName(leg)
    vec_leg = similarity.ann_bruteforce(
        emb, len(RRF_QUERY_TERMS), ANN_K * 4
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    rrf = search.rrf_fuse([text_legs, vec_leg], topk=ANN_K).select(
        "query_id", "rank", F.col("doc_id").alias("neighbor_id")
    )

    parts = [
        ("exact", similarity.ann_bruteforce(emb, ANN_QUERIES, ANN_K)),
        ("lsh", similarity.ann_lsh(emb, ANN_QUERIES, ANN_K, corpus_count=n, dim=dim)),
        ("ivf", similarity.ann_ivf(emb, ANN_QUERIES, ANN_K, corpus_count=n)),
        ("sq8", similarity.ann_sq8(emb, ANN_QUERIES, ANN_K)),
        # binary sign quantization, asymmetric (float-query) scoring
        ("bin", similarity.ann_bin(emb, ANN_QUERIES, ANN_K, dim=dim)),
        ("rrf", rrf),
    ]
    out = None
    for method, df in parts:
        tagged = df.select(
            F.lit(method).alias("method"), "query_id", "rank", "neighbor_id"
        )
        out = tagged if out is None else out.unionByName(tagged)

    # fresh plan (not parts[0][1]) so the hits join isn't an ambiguous
    # self-join on shared attribute ids
    exact = similarity.ann_bruteforce(emb, ANN_QUERIES, ANN_K).select(
        "query_id", F.col("neighbor_id").alias("exact_nid")
    )
    hits = (
        out.withColumnRenamed("query_id", "u_qid")
        .withColumnRenamed("method", "u_method")
        .join(
            exact,
            (F.col("u_qid") == F.col("query_id"))
            & (F.col("neighbor_id") == F.col("exact_nid")),
        )
        .groupBy("u_method", "u_qid")
        .agg(F.count("*").alias("recall_hits"))
        .select(
            F.col("u_method").alias("h_method"),
            F.col("u_qid").alias("h_qid"),
            "recall_hits",
        )
    )
    return (
        out.join(
            hits,
            (F.col("method") == F.col("h_method")) & (F.col("query_id") == F.col("h_qid")),
            "left",
        )
        .select(
            "method",
            "query_id",
            "rank",
            "neighbor_id",
            F.coalesce(F.col("recall_hits"), F.lit(0)).cast("long").alias("recall_hits"),
        )
    )


def _q_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decode image metadata + resize arithmetic + fake-decode
    audio features joined on doc_id (the three mapInPandas media twins
    share one gate row; their real codecs — png/jpeg/wav — are
    unit+property-tested). The array<int> features column is serialized
    to a '|'-joined string: the driver's canonicalizer cannot sort/hash
    list cells (CORRECTNESS_r01 mm_decode_fake err)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    dec = multimodal.decode_image(docs, True)
    rs = multimodal.resize_image(docs, multimodal.MAX_SIDE, True).select(
        "doc_id", "new_width", "new_height"
    )
    au = multimodal.decode_audio(docs, True).select(
        "doc_id", "n_channels", "sample_rate", "n_frames", "rms", "zero_crossings"
    )
    return (
        dec.join(rs, "doc_id")
        .join(au, "doc_id")
        .select(
            "doc_id",
            "width",
            "height",
            "channels",
            F.array_join(F.col("features").cast("array<string>"), "|").alias(
                "features"
            ),
            "new_width",
            "new_height",
            "n_channels",
            "sample_rate",
            "n_frames",
            "rms",
            "zero_crossings",
        )
    )


def _q_windowed_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window counts + concurrent-session annotation in one
    row: each (window_start, event_type) aggregate carries
    ``n_active_sessions`` — how many gap-sessions' [start, end]
    intervals contain the window boundary. The interval containment
    runs through :func:`..operators.events.range_join` (bucketized
    equi-join rewrite); the oracle recomputes it as DuckDB's plain
    inequality join, so the rewrite is hash-checked equivalent."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    wc = events.windowed_counts(ev)
    sess = events.sessionize(ev).select("session_start", "session_end")
    pts = wc.select("window_start").distinct()
    act = (
        events.range_join(
            pts, sess, "window_start", "session_start", "session_end"
        )
        .groupBy("window_start")
        .agg(F.count("*").alias("n_active_sessions"))
    )
    return wc.join(act, "window_start", "left").withColumn(
        "n_active_sessions",
        F.coalesce(F.col("n_active_sessions"), F.lit(0)).cast("long"),
    )


def _q_props_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction + as-of join in one per-event row: each
    event's parsed ``k`` plus the id/value of the user's latest
    *strictly-prior* click (null when none). The reference stream is
    deduped to one click per (user_id, ts) by max event_id so the
    carried row is engine-deterministic; the oracle recomputes with
    DuckDB's native ASOF LEFT JOIN — two independent as-of
    implementations (union+window here, sort-probe there) must agree
    on every event."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("ref_id"),
            F.expr("max_by(value, event_id)").alias("ref_value"),
        )
    )
    probe = ev.select("event_id", "user_id", "ts")
    asof = events.asof_join(probe, ref).select(
        "event_id",
        F.col("ref_id").alias("asof_click_id"),
        F.col("ref_value").alias("asof_click_value"),
    )
    return events.props_extract(ev).join(asof, "event_id")


def _q_sampling_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both deterministic samplers in one row: uniform k-per-stratum
    (mode='uniform', quota=k) and the weighted data mixture
    (mode='weighted', per-lang quotas) — each operator runs unchanged."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    uniform = sampling.stratified_sample(docs).select(
        F.lit("uniform").alias("mode"),
        "doc_id",
        "lang",
        "stratum_rank",
        F.lit(20).cast("long").alias("quota"),
    )
    weighted = sampling.mixture_sample(docs).select(
        F.lit("weighted").alias("mode"),
        "doc_id",
        "lang",
        "stratum_rank",
        F.col("quota").cast("long").alias("quota"),
    )
    return uniform.unionByName(weighted)


def _q_dedup_exact_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact whole-document dedup joined with CCNet-style paragraph-level
    dedup in one row per distinct text (keyed by the exact-dedup keeper):
    both operators run unchanged over the full corpus; the segment-level
    columns (n_segs / n_dropped / clean text after boilerplate removal)
    are hash-checked alongside the exact-dup counts.

    Also carries the CDC shifted-duplicate keep-set (dedup.cdc_dedup,
    r7 — its keep-set composition was the one operator without an
    oracle row, r7 verdict item 4): per keeper doc, the content-defined
    segment count, how many segments a global keep-first pass dropped,
    and the md5 of the reassembled kept text — which pins exactly WHICH
    segments survived, not just how many."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    ex = dedup.dedup_exact(docs)
    para = dedup.paragraph_dedup(docs)
    cdc = dedup.cdc_dedup(docs).select(
        F.col("doc_id").alias("cdc_doc_id"),
        F.col("n_segs").alias("n_cdc_segs"),
        F.col("n_dropped").alias("n_cdc_dropped"),
        F.md5(F.col("clean_text")).alias("clean_cdc_md5"),
    )
    return (
        ex.join(para, ex.keep_id == para.doc_id)
        .join(cdc, ex.keep_id == cdc.cdc_doc_id)
        .select(
            "text_hash",
            "keep_id",
            "n_copies",
            "n_segs",
            "n_dropped",
            para.clean_text.alias("clean_text_pd"),
            "n_cdc_segs",
            "n_cdc_dropped",
            "clean_cdc_md5",
        )
    )


def _q_user_rollup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity rollup joined with the ordered view→click→
    purchase funnel in one row per user: both operators run unchanged;
    users who never viewed carry NULL stage timestamps and depth 0.
    Also carries the cohort/retention basis (events.user_cohort, r7):
    first-activity week, distinct active weeks, last-week offset — the
    user-keyed frame the retention triangle aggregates."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    roll = events.user_rollup(ev)
    fun = events.funnel(ev)
    coh = events.user_cohort(ev)
    return (
        roll.join(fun, "user_id", "left")
        .select(
            roll["*"],
            "ts_view",
            "ts_click",
            "ts_purchase",
            F.coalesce(F.col("funnel_depth"), F.lit(0)).alias("funnel_depth"),
        )
        .join(coh, "user_id")
    )


def _q_cosine_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive cosine near-dup pairs AND SemDeDup's cluster-bucketed
    per-vector verdicts in one tagged union: ``part='pair'`` rows are
    :func:`similarity.cosine_neardup`'s exact pair output unchanged
    (bit-identical to the pre-r5 row); ``part='semdedup'`` rows carry
    one verdict per vector (cluster id, smallest same-cluster near-dup,
    keep flag) — so the gate checks both the exhaustive baseline and
    the scale path, and their disagreement (cross-cluster pairs
    SemDeDup misses) is visible in the same row."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_neardup(emb, COSINE_THRESHOLD).select(
        F.lit("pair").alias("part"),
        F.col("vec_a").alias("a_id"),
        F.col("vec_b").alias("b_id"),
        F.lit(-1).cast("long").alias("cluster_id"),
        F.lit(-1).alias("keep"),
    )
    sd = similarity.semantic_dedup(emb, COSINE_THRESHOLD).select(
        F.lit("semdedup").alias("part"),
        F.col("vec_id").alias("a_id"),
        F.col("dup_of").alias("b_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "keep",
    )
    return pairs.unionByName(sd)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- dedup (documents) ---
    "d_dedup_exact": _q_dedup_exact_paragraph,
    "d_minhash_signatures": _on("documents", dedup.minhash_signatures),
    "d_lsh_candidates": _on("documents", dedup.lsh_candidates),
    "d_neardup_jaccard": _on("documents", dedup.neardup_jaccard),
    "d_simhash": _on("documents", dedup.simhash),
    "d_dedup_clusters": _on("documents", dedup.dedup_clusters),
    "d_contamination": _on("documents", dedup.contamination),
    # --- similarity (embeddings) ---
    "s_cosine_neardup": _q_cosine_semdedup,
    "s_ann_methods": _q_ann_methods,
    # --- text analysis (documents) ---
    "t_lang_quality": _q_lang_quality,
    "t_fingerprints": _q_fingerprints,
    "t_top_terms": _on("documents", textstats.top_terms),
    "t_repetition": _on("documents", textstats.repetition),
    "t_curation": _on("documents", curation.curation_report),
    "t_pack": _q_pack_modes,
    "t_stratified_sample": _q_sampling_modes,
    # --- multimodal plumbing (documents → binary payloads) ---
    "mm_byte_histogram": _on("documents", multimodal.byte_histogram),
    "mm_frame_sample": _on("documents", multimodal.frame_sample),
    "mm_decode_resize": _q_decode_resize,
    # --- event analytics (events) ---
    "e_user_rollup": lambda spark, sf_dir: _q_user_rollup_funnel(spark, sf_dir),
    "e_top_events_per_user": _on("events", events.top_events_per_user),
    "e_sessionize": _on("events", events.sessionize),
    "e_windowed_counts": lambda spark, sf_dir: _q_windowed_active(spark, sf_dir),
    "e_props_extract": lambda spark, sf_dir: _q_props_asof(spark, sf_dir),
}


# --- grouping-sets aggregates (SURVEY §2.4 "absent in reference" rows,
# demonstrated here): ROLLUP over lineitem, CUBE over events. Sums go
# through decimal(18,2) — exact, order-independent addition, so the
# hash matches DuckDB regardless of aggregation order (double sums over
# 600k rows would differ in the last bits and poison the value hash).
# The *final* sum is cast to string on both sides: the driver harness
# canonicalizes through pandas, where Spark decimals arrive as Decimal
# ('253942.00') but DuckDB decimals arrive as float64 ('253942.0') —
# identical values, different rendering (CORRECTNESS_r01 hash-fails).
# A string column renders identically in both engines by construction.


def _q_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(dec("l_quantity")).cast("string").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("string").alias("sum_price"),
        )
        .select("l_returnflag", "l_linestatus", "n_rows", "sum_qty", "sum_price")
    )


def _q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.to_date("ts"))
        .cube("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("string")
            .alias("sum_value"),
        )
        .select("event_type", "day", "n_events", "sum_value")
    )


QUERIES["a_lineitem_rollup"] = _q_lineitem_rollup
QUERIES["a_events_cube"] = _q_events_cube


def _q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (sort-based agg;
    SURVEY §2.4 breadth). Spark's ``percentile`` == ANSI
    ``percentile_cont``; rounded to 6 dp like the other float aggs."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


def _segment_parts(spark: SparkSession, sf_dir: str, segment: str) -> DataFrame:
    """Distinct part keys ordered by customers of one market segment.
    The filter pushes to the customer scan; the orders⋈lineitem join is
    the co-keyed big join (bucketed at cluster scale)."""
    from pyspark.sql import functions as F

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("l_partkey").alias("partkey"))
        .distinct()
    )


def _q_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT (SURVEY §2.6 'absent in reference',
    demonstrated) in one registry row: parts ordered by BOTH BUILDING
    and MACHINERY customers (op='intersect') and parts ordered by
    BUILDING but never MACHINERY (op='except')."""
    from pyspark.sql import functions as F

    building = _segment_parts(spark, sf_dir, "BUILDING")
    machinery = _segment_parts(spark, sf_dir, "MACHINERY")
    return (
        building.intersect(machinery)
        .withColumn("op", F.lit("intersect"))
        .unionByName(
            building.subtract(machinery).withColumn("op", F.lit("except"))
        )
    )


KMV_K = 32


def _q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type —
    a deterministic, *mergeable* cardinality sketch (the md5 analog of
    HyperLogLog): estimate = (k-1) / h_k where h_k is the k-th smallest
    md5(user_id) mapped to (0,1). Deterministic by construction, so
    unlike HLL it is exactly oracle-checkable; alongside the exact
    count, the sketch's error is visible in the result itself.

    Scale shape: the (type, user) distinct is partial-aggregatable;
    the per-type k-smallest is a TakeOrdered-style window over distinct
    hashes, never the raw events; sketches merge across partitions by
    keeping the union's k smallest (associative), which is why KMV
    works as a distributed accumulator.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    hashes = (
        ev.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("h_k"), F.count("*").alias("k_used"))
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    # h/16^13 from the first 13 hex chars: uniform (0,1) in exact int64
    frac = F.expr("cast(conv(substr(h_k, 1, 13), 16, 10) as bigint)") / F.lit(
        float(16**13)
    )
    return (
        kth.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            "k_used",
            F.when(
                F.col("k_used") < KMV_K, F.col("n_exact").cast("double")
            )
            .otherwise(F.round((KMV_K - 1) / frac, 6))
            .alias("kmv_estimate"),
        )
    )


def _q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join over all dimension layers: discounted
    revenue of local supply chains (customer and supplier in the same
    nation) rolled up by region. Demonstrates the multi-join star plan:
    both fact tables join co-keyed, every dimension broadcasts, revenue
    sums in decimal for order-independent exactness."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # operands cast to decimal(18,2); the product keeps natural scale 4
    # with no rounding anywhere, so the sum is bit-identical in any
    # engine; the final cast to string pins the rendering too (the
    # harness reads DuckDB decimals as float64 — see rollup note above)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev).cast("string").alias("revenue"),
        )
    )


def _q_events_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type summary aggregates in one row (joined on
    event_type): exact interpolated percentiles + the KMV
    distinct-count sketch + the theta-style sketched audience overlap
    (:func:`..operators.sketches.kmv_pair_overlap`) — each type
    carries its highest-estimated-overlap partner with the sketched
    union/intersection estimates and the exact intersection beside
    them, so the sketch's error is hash-checked in the row itself.
    Merged to stay inside the driver gate's ~50-row window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .operators import sketches

    ev = load_table(spark, sf_dir, "events")
    ov = sketches.kmv_pair_overlap(ev, "event_type", "user_id", KMV_K)
    sym = ov.select(
        F.col("key_a").alias("event_type"),
        F.col("key_b").alias("partner"),
        "union_est",
        "inter_est",
    ).unionByName(
        ov.select(
            F.col("key_b").alias("event_type"),
            F.col("key_a").alias("partner"),
            "union_est",
            "inter_est",
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("inter_est").desc(), F.col("partner").asc()
    )
    best = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("partner").alias("top_overlap_partner"),
            F.col("union_est").alias("ov_union_est"),
            F.col("inter_est").alias("ov_inter_est"),
        )
    )
    du = ev.select("event_type", "user_id").distinct()
    exact_pairs = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("b.event_type").alias("top_overlap_partner"),
        )
        .agg(F.count("*").alias("ov_inter_exact"))
    )
    best_exact = best.join(
        exact_pairs, ["event_type", "top_overlap_partner"], "left"
    ).withColumn(
        "ov_inter_exact",
        F.coalesce(F.col("ov_inter_exact"), F.lit(0)).cast("long"),
    )
    return (
        _q_events_quantiles(spark, sf_dir)
        .join(_q_kmv_distinct(spark, sf_dir), "event_type")
        .join(best_exact, "event_type")
        # mergeable bottom-k quantile sketch beside the exact
        # percentiles it approximates — the sketch's rank error is
        # hash-checked in the row (same discipline as KMV/overlap)
        .join(
            sketches.bottomk_sample_quantiles(
                ev, "event_type", "event_id", "value"
            ),
            "event_type",
        )
    )


def _q_region_revenue_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q5-shaped star rollup PLUS the INTERSECT/EXCEPT
    demonstration as a tagged union in one registry row
    (leg, key, n_items, revenue): ``leg='region_revenue'`` carries the
    per-region revenue rollup; ``leg='intersect'``/``'except'`` carry
    the segment set-ops part keys (n_items/revenue NULL). Merged so
    every operator stays inside the driver gate's ~50-row hash window
    (r12 verdict item 1 — ``u_segment_setops`` was the first
    driver-unchecked registry row since round 1; the merged-row
    pattern is the same one ``g_links_per_category`` and
    ``g_integrity_checks`` use)."""
    from pyspark.sql import functions as F

    rev = _q_region_revenue(spark, sf_dir).select(
        F.lit("region_revenue").alias("leg"),
        F.col("region").alias("key"),
        "n_items",
        "revenue",
    )
    ops = _q_segment_setops(spark, sf_dir).select(
        F.col("op").alias("leg"),
        F.col("partkey").cast("string").alias("key"),
        F.lit(None).cast("long").alias("n_items"),
        F.lit(None).cast("string").alias("revenue"),
    )
    return rev.unionByName(ops)


QUERIES["a_region_revenue"] = _q_region_revenue_setops
QUERIES["a_events_sketch"] = _q_events_sketch


# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB). Tokenization/shingling/minhash mirror
# operators/dedup.py exactly — md5 over the same strings.
# ---------------------------------------------------------------------------

_TOKS = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
)"""

_SHINGLES3 = (
    _TOKS
    + r""",
shingle_lists AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [array_to_string(toks, ' ')] END AS shl
  FROM toks
),
shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest(shl) AS shingle FROM shingle_lists)
)"""
)

# Kirsch-Mitzenmacher double hashing, mirroring operators/dedup.py:
# one md5 per shingle, 56-bit halves, (h1 + i*h2) mod (2^61-1).
_MINHASH = (
    _SHINGLES3
    + r""",
halves AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 14))::BIGINT AS h1,
         ('0x' || substr(md5(shingle), 15, 14))::BIGINT AS h2
  FROM shingles
),
minhash AS (
  SELECT doc_id, p.perm,
         min((h1 + p.perm * h2) % 2305843009213693951) AS minhash
  FROM halves CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS perm) p
  GROUP BY doc_id, p.perm
)"""
)

_BANDS = (
    _MINHASH
    + r""",
bands AS (
  SELECT doc_id, perm // 4 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY perm)) AS band_key
  FROM minhash GROUP BY doc_id, perm // 4
)"""
)

# Mirrors dedup.DEFAULT_MAX_BUCKET: buckets larger than the cap are
# dropped from the candidate join on the Spark side, so the oracle
# reproduces the same guard (no-op on the testdata, whose buckets are
# far smaller — asserted by tests/test_operators.py's capped fixtures).
_CANDS = (
    _BANDS
    + f""",
bsizes AS (
  SELECT band, band_key, count(*) AS bsz FROM bands GROUP BY band, band_key
),
kept AS (
  SELECT b.doc_id, b.band, b.band_key
  FROM bands b JOIN bsizes s ON b.band = s.band AND b.band_key = s.band_key
  WHERE s.bsz <= {dedup.DEFAULT_MAX_BUCKET}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a
  JOIN kept b ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
)"""
)

_EMB = r"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v)"""

# LSH plane count mirrors similarity.auto_n_planes: floor(log2(N/64))
# clamped to [2, 16], computed from count(*) so both engines derive the
# identical integer (IEEE-double log2/floor in both).
_PLANES = r"""
sizing AS (
  SELECT GREATEST(2, LEAST(16,
           CAST(floor(log2(count(*) / 64.0)) AS INT))) AS np
  FROM embeddings
),
planes AS (
  SELECT p.plane, d.d,
         CASE WHEN strpos('13579bdf', substr(md5(p.plane || '|' || d.d), 32, 1)) > 0
              THEN 1 ELSE -1 END AS sign
  FROM (SELECT unnest(generate_series(0, (SELECT np - 1 FROM sizing)))
          AS plane) p
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS d) d
),
comps AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
proj AS (
  SELECT c.vec_id, p.plane, sum(c.val * p.sign) AS proj
  FROM comps c JOIN planes p ON c.d = p.d
  GROUP BY c.vec_id, p.plane
),
buckets AS (
  SELECT vec_id,
         string_agg(CASE WHEN proj > 0 THEN '1' ELSE '0' END, '' ORDER BY plane)
           AS bucket
  FROM proj GROUP BY vec_id
)"""

ORACLES: dict[str, str] = {
    # --- dedup ---
    "d_dedup_exact": _TOKS
    + f""",
ex AS (
  SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
  FROM documents GROUP BY md5(text)
),
seg_lists AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           list_transform(generate_series(1, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
             i -> array_to_string(list_slice(toks, (i - 1) * 10 + 1, (i - 1) * 10 + 10), ' '))
         ELSE [] END AS segl
  FROM toks
),
segd AS (
  SELECT doc_id, generate_subscripts(segl, 1) - 1 AS seg_idx, unnest(segl) AS seg
  FROM seg_lists
),
flagged AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segd
),
perdoc AS (
  SELECT doc_id,
         count(*) AS n_segs,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx) AS clean_text
  FROM flagged GROUP BY doc_id
),
-- cdc_dedup keep-set (r8): the same keep-first pass over CONTENT-
-- DEFINED segments (boundary after token e when the 4-token rolling
-- hash ending at e is 0 mod 16 — the t_fingerprints cdc chain), so the
-- shifted-duplicate keep-set composition is hash-checked, not just the
-- segment fingerprints (r7 verdict item 4)
ctok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS token
  FROM toks
),
ccdct AS (
  SELECT doc_id, pos, token,
         ('0x' || substr(md5(token), 1, 7))::BIGINT AS th
  FROM ctok
),
ccdcf AS (
  SELECT doc_id, pos, token,
         CASE WHEN pos >= 3 AND
              ((lag(th, 3) OVER w * {textstats.RK_B3}
                + lag(th, 2) OVER w * {textstats.RK_B2}
                + lag(th, 1) OVER w * {textstats.RK_B}
                + th) % {textstats.RK_P}) % 16 = 0
              THEN 1 ELSE 0 END AS cut
  FROM ccdct
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
ccdcseg AS (
  SELECT doc_id, pos, token,
         COALESCE(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg_idx
  FROM ccdcf
),
cdcsegtext AS (
  SELECT doc_id, seg_idx, string_agg(token, ' ' ORDER BY pos) AS seg
  FROM ccdcseg GROUP BY doc_id, seg_idx
),
cdcflag AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM cdcsegtext
),
cdcperdoc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_cdc_segs,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cdc_dropped,
         md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                                 ORDER BY seg_idx), '')) AS clean_cdc_md5
  FROM cdcflag GROUP BY doc_id
)
SELECT ex.text_hash, ex.keep_id, ex.n_copies,
       COALESCE(p.n_segs, 0) AS n_segs,
       COALESCE(p.n_dropped, 0) AS n_dropped,
       COALESCE(p.clean_text, '') AS clean_text_pd,
       COALESCE(c.n_cdc_segs, 0) AS n_cdc_segs,
       COALESCE(c.n_cdc_dropped, 0) AS n_cdc_dropped,
       COALESCE(c.clean_cdc_md5, md5('')) AS clean_cdc_md5
FROM ex LEFT JOIN perdoc p ON p.doc_id = ex.keep_id
LEFT JOIN cdcperdoc c ON c.doc_id = ex.keep_id
""",
    "d_minhash_signatures": _MINHASH + "\nSELECT doc_id, perm, minhash FROM minhash",
    "d_lsh_candidates": _CANDS + "\nSELECT doc_a, doc_b FROM cands",
    "d_neardup_jaccard": _CANDS
    + r""",
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cands c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b, i.inter,
       na.n_sh + nb.n_sh - i.inter AS uni
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE i.inter * 2 >= (na.n_sh + nb.n_sh - i.inter) * 1
""",
    "d_simhash": _TOKS
    + r""",
doc_tokens AS (
  SELECT doc_id, token, count(*) AS cnt
  FROM (SELECT doc_id, unnest(toks) AS token FROM toks)
  GROUP BY doc_id, token
),
vocab AS (SELECT DISTINCT token FROM doc_tokens),
bits AS (
  SELECT token, bb.b,
         (((strpos('0123456789abcdef', substr(md5(token), bb.b // 4 + 1, 1)) - 1
            >> (bb.b % 4)) & 1) * 2 - 1) AS sign
  FROM vocab CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
),
votes AS (
  SELECT doc_id, b, sum(cnt * sign) AS v
  FROM doc_tokens JOIN bits USING (token)
  GROUP BY doc_id, b
)
SELECT doc_id,
       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
FROM votes GROUP BY doc_id
""",
    # --- similarity ---
    "s_cosine_neardup": _EMB
    + f""",
csizing AS (
  SELECT GREATEST(4, LEAST(256, CAST(floor(sqrt(count(*))) AS INT))) AS nc
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT (SELECT nc FROM csizing)
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT x.vec_id, c.cid,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY list_dot_product(x.e, c.ce) / (x.nrm * c.cnrm) DESC,
                      c.cid ASC) AS rn
    FROM n x CROSS JOIN cents c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= {COSINE_THRESHOLD}
),
sd_dup AS (
  SELECT bb.vec_id, min(aa.vec_id) AS dup_of
  FROM n aa
  JOIN assign ia ON ia.vec_id = aa.vec_id
  JOIN n bb ON aa.vec_id < bb.vec_id
  JOIN assign ib ON ib.vec_id = bb.vec_id AND ib.cid = ia.cid
  WHERE list_dot_product(aa.e, bb.e) / (aa.nrm * bb.nrm) >= {COSINE_THRESHOLD}
  GROUP BY bb.vec_id
)
SELECT 'pair' AS part, vec_a AS a_id, vec_b AS b_id,
       CAST(-1 AS BIGINT) AS cluster_id, CAST(-1 AS INT) AS keep
FROM pairs
UNION ALL
SELECT 'semdedup', n.vec_id, COALESCE(s.dup_of, -1),
       CAST(a.cid AS BIGINT),
       CAST(CASE WHEN s.vec_id IS NULL THEN 1 ELSE 0 END AS INT)
FROM n
JOIN assign a ON a.vec_id = n.vec_id
LEFT JOIN sd_dup s ON s.vec_id = n.vec_id
""",
    "s_ann_bruteforce": _EMB
    + f""",
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e) / (q.nrm * c.nrm) AS cos
  FROM n q JOIN n c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {ANN_QUERIES}
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
    "s_ann_lsh": "WITH "
    + _PLANES.strip()
    + f""",
vv AS (
  SELECT e.vec_id, b.bucket, CAST(e.embedding AS DOUBLE[]) AS emb
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
),
nn AS (SELECT vec_id, bucket, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM vv),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS cos
  FROM nn q JOIN nn c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {ANN_QUERIES}
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
    # centroid count mirrors similarity.auto_n_centroids:
    # floor(sqrt(N)) clamped to [4, 256], from count(*)
    "s_ann_ivf": _EMB
    + f""",
csizing AS (
  SELECT nc, GREATEST(2, LEAST(32, CAST(floor(sqrt(nc)) AS INT))) AS nprobe
  FROM (
    SELECT GREATEST(4, LEAST(256,
             CAST(floor(sqrt(count(*))) AS INT))) AS nc
    FROM embeddings
  )
),
cents AS (
  SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT (SELECT nc FROM csizing)
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT x.vec_id, c.cid,
           row_number() OVER (PARTITION BY x.vec_id
             ORDER BY list_dot_product(x.e, c.ce) / (x.nrm * c.cnrm) DESC,
                      c.cid ASC) AS rn
    FROM n x CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.e, c.ce) / (q.nrm * c.cnrm) DESC,
                      c.cid ASC) AS rn
    FROM n q CROSS JOIN cents c WHERE q.vec_id < {ANN_QUERIES}
  ) WHERE rn <= (SELECT nprobe FROM csizing)
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS cos
  FROM probes p
  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN n q ON q.vec_id = p.query_id
  JOIN n x ON x.vec_id = a.vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {ANN_K}
""",
    # SQ8 scalar quantization (similarity.sq8_encode/ann_sq8): codes =
    # round(x / (max|x|/127)); the per-vector scale cancels out of the
    # cosine, so the approximate score is dot(q, codes)/(|q|·|codes|);
    # k·refine shortlist, exact re-rank
    "s_ann_sq8": _EMB
    + f""",
sqc AS (
  SELECT vec_id, e, nrm, list_max(list_transform(e, x -> abs(x))) AS mx
  FROM n
),
sq8codes AS (
  SELECT vec_id,
         CASE WHEN mx > 0
              THEN list_transform(e, x -> round(x / (mx / 127.0)))
              ELSE list_transform(e, x -> 0.0) END AS cd
  FROM sqc
),
sq8n AS (
  SELECT vec_id, cd, sqrt(list_dot_product(cd, cd)) AS cnrm FROM sq8codes
),
sq8approx AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.cd) / (q.nrm * c.cnrm) AS acos_
  FROM n q JOIN sq8n c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {ANN_QUERIES}
),
sq8short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY acos_ DESC, neighbor_id ASC) AS rn
    FROM sq8approx
  ) WHERE rn <= {ANN_K * 4}
),
sq8rr AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS cos
  FROM sq8short s
  JOIN n q ON q.vec_id = s.query_id
  JOIN n x ON x.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM sq8rr
) WHERE rank <= {ANN_K}
""",
    # --- text analysis ---
    "t_lang_id": _TOKS
    + r""",
scored AS (
  SELECT doc_id, 'de' AS lang,
         len(list_filter(toks, t -> t IN ('der','und','das','ein','nicht'))) AS score
  FROM toks
  UNION ALL
  SELECT doc_id, 'en',
         len(list_filter(toks, t -> t IN ('the','a','and','of','fast'))) FROM toks
  UNION ALL
  SELECT doc_id, 'es',
         len(list_filter(toks, t -> t IN ('el','la','los','de','una'))) FROM toks
  UNION ALL
  SELECT doc_id, 'fr',
         len(list_filter(toks, t -> t IN ('le','les','et','une','dans'))) FROM toks
)
SELECT doc_id, lang AS pred_lang, score FROM (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM scored
) WHERE rn = 1
""",
    "t_quality_score": _TOKS
    + r""",
stats AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         list_sum(list_transform(toks, t -> length(t))) AS sum_len,
         len(list_filter(toks, t -> t IN ('the','a','and','of','to'))) AS n_stop
  FROM toks
)
SELECT doc_id, n_tokens,
       round(sum_len / n_tokens, 6) AS mean_token_len,
       round(n_stop / n_tokens, 6) AS stopword_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.5
             + (1.0 - n_stop / n_tokens) * 0.3
             + least((sum_len / n_tokens) / 10.0, 1.0) * 0.2, 6) AS quality
FROM stats WHERE n_tokens > 0
""",
    "t_token_counts": r"""
SELECT doc_id,
       len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))
         AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS re_tokens,
       length(text) AS n_chars
FROM documents
""",
    "t_fingerprints": _TOKS
    + f""",
shingle_lists AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 5
              THEN list_transform(generate_series(1, len(toks) - 4),
                                  i -> array_to_string(toks[i:i+4], ' '))
              ELSE [array_to_string(toks, ' ')] END AS shl
  FROM toks
),
shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest(shl) AS shingle FROM shingle_lists)
),
minshingle AS (
  SELECT doc_id, min(md5(shingle)) AS fp, count(*) AS n_shingles
  FROM shingles GROUP BY doc_id
),
tok AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS token,
         len(toks) AS n
  FROM toks
),
th AS (
  SELECT doc_id, pos, n, ('0x' || substr(md5(token), 1, 7))::BIGINT AS th
  FROM tok
),
fullw AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, pos, n,
           (th * {textstats.RK_B3} + lead(th, 1) OVER w * {textstats.RK_B2}
            + lead(th, 2) OVER w * {textstats.RK_B} + lead(th, 3) OVER w)
             % {textstats.RK_P} AS h
    FROM th
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE pos <= n - 4
),
shortw AS (
  SELECT doc_id,
         sum(th * CASE n - 1 - pos WHEN 0 THEN 1 WHEN 1 THEN {textstats.RK_B}
                  ELSE {textstats.RK_B2} END) % {textstats.RK_P} AS h
  FROM th WHERE n < 4 GROUP BY doc_id
),
rolling AS (
  SELECT doc_id, CAST(min(h) AS BIGINT) AS rolling_fp, count(*) AS n_windows
  FROM (SELECT * FROM fullw UNION ALL SELECT * FROM shortw)
  GROUP BY doc_id
),
-- exact duplicated-span counts (dedup.duplicated_window_stats):
-- 4-token windows keyed by md5 of their space-joined text
span_lists AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - 3),
                        i -> md5(array_to_string(toks[i:i+3], ' '))) AS wks
  FROM toks WHERE len(toks) >= 4
),
spanw AS (SELECT doc_id, unnest(wks) AS wk FROM span_lists),
spanglob AS (
  SELECT wk, count(*) AS n_occ, min(doc_id) AS first_doc
  FROM spanw GROUP BY wk
),
spandoc AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_spanwin,
         CAST(sum(CASE WHEN g.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_windows,
         CAST(sum(CASE WHEN g.n_occ > 1 AND g.first_doc <> s.doc_id
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_foreign_dup
  FROM spanw s JOIN spanglob g ON s.wk = g.wk
  GROUP BY s.doc_id
),
-- span-strip rewrite (dedup.strip_duplicated_spans): drop tokens
-- covered by any window whose first corpus occurrence is a different
-- doc, rejoin the survivors with single spaces, hash the result
spanp AS (
  SELECT doc_id, generate_subscripts(wks, 1) - 1 AS pos, unnest(wks) AS wk
  FROM span_lists
),
covered AS (
  SELECT DISTINCT p.doc_id, p.pos + o.k AS cpos
  FROM spanp p
  JOIN spanglob g ON p.wk = g.wk
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) o
  WHERE g.n_occ > 1 AND g.first_doc <> p.doc_id
),
keptt AS (
  SELECT t.doc_id, t.pos, t.token
  FROM tok t
  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
  WHERE c.doc_id IS NULL
),
strip AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS deduped_text
  FROM keptt GROUP BY doc_id
),
-- BM25 top-10 for the fixed query (spark, hash, window) — search.py
-- bm25_topk: row-local tf/dl, one corpus-stats row, Lucene idf form,
-- fixed-order term sum, (score desc, doc_id) total order
bmper AS (
  SELECT doc_id, len(toks) AS dl,
         len(list_filter(toks, t -> t = 'spark')) AS tf0,
         len(list_filter(toks, t -> t = 'hash')) AS tf1,
         len(list_filter(toks, t -> t = 'window')) AS tf2
  FROM toks
),
bmstats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
  FROM bmper
),
bmscored AS (
  SELECT doc_id,
         (CASE WHEN tf0 > 0 THEN ln(1.0 + (n_docs - df0 + 0.5)/(df0 + 0.5))
               * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               ELSE 0.0 END)
         + (CASE WHEN tf1 > 0 THEN ln(1.0 + (n_docs - df1 + 0.5)/(df1 + 0.5))
               * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               ELSE 0.0 END)
         + (CASE WHEN tf2 > 0 THEN ln(1.0 + (n_docs - df2 + 0.5)/(df2 + 0.5))
               * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
               ELSE 0.0 END) AS score
  FROM bmper, bmstats
  WHERE tf0 + tf1 + tf2 > 0
),
bmtop AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS bm25_rank,
         round(score, 6) AS bm25_score
  FROM bmscored ORDER BY score DESC, doc_id LIMIT 10
),
-- content-defined chunking (textstats.cdc_segments, r7): a boundary
-- falls after token e when the 4-token rolling hash ending at e is
-- 0 mod 16; segments reassemble in order and hash per doc
cdct AS (
  SELECT t.doc_id, t.pos, t.token,
         ('0x' || substr(md5(t.token), 1, 7))::BIGINT AS th
  FROM tok t
),
cdcf AS (
  SELECT doc_id, pos, token,
         CASE WHEN pos >= 3 AND
              ((lag(th, 3) OVER w * {textstats.RK_B3}
                + lag(th, 2) OVER w * {textstats.RK_B2}
                + lag(th, 1) OVER w * {textstats.RK_B}
                + th) % {textstats.RK_P}) % 16 = 0
              THEN 1 ELSE 0 END AS cut
  FROM cdct
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
cdcsegid AS (
  SELECT doc_id, pos, token,
         COALESCE(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
  FROM cdcf
),
cdcsegs AS (
  SELECT doc_id, seg, md5(string_agg(token, ' ' ORDER BY pos)) AS seg_hash
  FROM cdcsegid GROUP BY doc_id, seg
),
cdcstat AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cdc_segments,
         md5(string_agg(seg_hash, '|' ORDER BY seg)) AS cdc_fp
  FROM cdcsegs GROUP BY doc_id
)
SELECT m.doc_id, m.fp, m.n_shingles, r.rolling_fp, r.n_windows,
       COALESCE(d.n_spanwin, 0) AS n_spanwin,
       COALESCE(d.n_dup_windows, 0) AS n_dup_windows,
       COALESCE(d.n_foreign_dup, 0) AS n_foreign_dup,
       md5(COALESCE(st.deduped_text, '')) AS strip_md5,
       round(COALESCE(d.n_dup_windows, 0) * 1.0
             / GREATEST(COALESCE(d.n_spanwin, 0), 1), 6) AS dup_fraction,
       bm.bm25_rank, bm.bm25_score,
       COALESCE(cd.n_cdc_segments, 0) AS n_cdc_segments,
       COALESCE(cd.cdc_fp, md5('')) AS cdc_fp
FROM minshingle m JOIN rolling r ON m.doc_id = r.doc_id
LEFT JOIN spandoc d ON m.doc_id = d.doc_id
LEFT JOIN strip st ON m.doc_id = st.doc_id
LEFT JOIN bmtop bm ON m.doc_id = bm.doc_id
LEFT JOIN cdcstat cd ON m.doc_id = cd.doc_id
""",
    # --- multimodal (payload bytes == text chars: corpus is pure ASCII) ---
    "mm_byte_histogram": r"""
WITH pos AS (
  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
  FROM documents
)
SELECT doc_id, ascii(substr(text, i, 1)) % 16 AS bin, count(*) AS cnt
FROM pos GROUP BY doc_id, bin
""",
    "mm_frame_sample": r"""
WITH f AS (
  SELECT doc_id, unnest(generate_series(0, (length(text) + 63) // 64 - 1)) AS i,
         text
  FROM documents
)
SELECT doc_id, i AS frame_idx, md5(substr(text, i * 64 + 1, 64)) AS frame_md5
FROM f WHERE i % 2 = 0
""",
    "mm_decode_resize": f"""
WITH h AS (SELECT doc_id, md5(text) AS x FROM documents),
b AS (
  SELECT doc_id,
         (strpos('0123456789abcdef', substr(x, 1, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 2, 1)) - 1 AS b0,
         (strpos('0123456789abcdef', substr(x, 3, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 4, 1)) - 1 AS b1,
         (strpos('0123456789abcdef', substr(x, 5, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 6, 1)) - 1 AS b2,
         (strpos('0123456789abcdef', substr(x, 7, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 8, 1)) - 1 AS b3,
         (strpos('0123456789abcdef', substr(x, 9, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 10, 1)) - 1 AS b4,
         (strpos('0123456789abcdef', substr(x, 11, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 12, 1)) - 1 AS b5,
         (strpos('0123456789abcdef', substr(x, 13, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 14, 1)) - 1 AS b6,
         (strpos('0123456789abcdef', substr(x, 15, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 16, 1)) - 1 AS b7,
         (strpos('0123456789abcdef', substr(x, 17, 1)) - 1) * 16
           + strpos('0123456789abcdef', substr(x, 18, 1)) - 1 AS b8
  FROM h
),
dims AS (
  SELECT doc_id, b0, b1, b2, b3, b4, b5, b6, b7, b8,
         16 + b0 % 64 AS width, 16 + b1 % 64 AS height
  FROM b
)
SELECT doc_id, width, height, 1 + b2 % 4 AS channels,
       b0 || '|' || b1 || '|' || b2 || '|' || b3 AS features,
       greatest(1, width * {multimodal.MAX_SIDE} // greatest(width, height))
         AS new_width,
       greatest(1, height * {multimodal.MAX_SIDE} // greatest(width, height))
         AS new_height,
       1 + b4 % 2 AS n_channels,
       CASE b5 % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                   WHEN 2 THEN 22050 ELSE 44100 END AS sample_rate,
       256 + 16 * b6 AS n_frames,
       b7 AS rms,
       4 * b8 AS zero_crossings
FROM dims
""",
    # --- event analytics ---
    "e_user_rollup": """
WITH roll AS (
  SELECT user_id, count(*) AS n_events,
         count(DISTINCT event_type) AS n_types,
         round(sum(value), 6) AS total_value,
         min(ts) AS first_ts, max(ts) AS last_ts
  FROM events GROUP BY user_id
),
s1 AS (
  SELECT user_id, min(ts) AS ts_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS ts_click
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.ts_view
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS ts_purchase
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.ts_click
  GROUP BY e.user_id
)
, coh AS (
  -- DuckDB date_trunc('week') yields DATE; Spark yields TIMESTAMP
  SELECT user_id, CAST(min(p) AS TIMESTAMP) AS cohort_week,
         CAST(count(*) AS BIGINT) AS n_active_weeks,
         CAST(floor(date_diff('day', min(p), max(p)) / 7.0) AS BIGINT)
           AS last_week_offset
  FROM (SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events)
  GROUP BY user_id
)
SELECT r.user_id, r.n_events, r.n_types, r.total_value, r.first_ts, r.last_ts,
       s1.ts_view, s2.ts_click, s3.ts_purchase,
       CAST(
         (CASE WHEN s1.ts_view IS NOT NULL THEN 1 ELSE 0 END)
         + (CASE WHEN s2.ts_click IS NOT NULL THEN 1 ELSE 0 END)
         + (CASE WHEN s3.ts_purchase IS NOT NULL THEN 1 ELSE 0 END) AS INT
       ) AS funnel_depth,
       c.cohort_week, c.n_active_weeks, c.last_week_offset
FROM roll r
LEFT JOIN s1 ON s1.user_id = r.user_id
LEFT JOIN s2 ON s2.user_id = r.user_id
LEFT JOIN s3 ON s3.user_id = r.user_id
JOIN coh c ON c.user_id = r.user_id
""",
    "e_top_events_per_user": """
SELECT user_id, rank, event_id, value FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rank
  FROM events
) WHERE rank <= 3
""",
    "e_sessionize": """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         -- BIGINT: DuckDB's windowed sum widens to HUGEINT, which the
         -- harness reads as float64 ('1.0' vs Spark's '1')
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM numbered GROUP BY user_id, session_id
""",
    # windows + concurrent sessions (see _q_windowed_active): the
    # Spark side's bucketized range_join rewrite is checked against
    # this plain inequality join (DuckDB IEJoin handles it natively).
    "e_windowed_counts": """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked
),
sess AS (
  SELECT min(ts) AS session_start, max(ts) AS session_end
  FROM numbered GROUP BY user_id, session_id
),
wc AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
         count(*) AS n_events, round(sum(value), 6) AS total_value
  FROM events GROUP BY 1, 2
),
act AS (
  SELECT w.window_start, count(*) AS n_active_sessions
  FROM (SELECT DISTINCT window_start FROM wc) w
  JOIN sess s ON s.session_start <= w.window_start
             AND w.window_start <= s.session_end
  GROUP BY 1
)
SELECT wc.window_start, wc.event_type, wc.n_events, wc.total_value,
       CAST(COALESCE(act.n_active_sessions, 0) AS BIGINT) AS n_active_sessions
FROM wc LEFT JOIN act ON wc.window_start = act.window_start
""",
    # props + as-of (see _q_props_asof): DuckDB's *native* ASOF JOIN is
    # the oracle for the Spark union+window implementation — strict
    # (>) semantics, reference deduped identically on both sides.
    "e_props_extract": """
WITH ref AS (
  SELECT user_id, ts, max(event_id) AS ref_id,
         arg_max(value, event_id) AS ref_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT e.event_id,
       CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS k,
       r.ref_id AS asof_click_id,
       r.ref_value AS asof_click_value
FROM events e
ASOF LEFT JOIN ref r ON e.user_id = r.user_id AND e.ts > r.ts
""",
    "a_region_revenue": """
WITH rev AS (
  SELECT r_name AS region, count(*) AS n_items,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
              AS VARCHAR) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE c_nationkey = s_nationkey
  GROUP BY r_name
),
building AS (
  SELECT DISTINCT l_partkey AS partkey FROM customer
  JOIN orders ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
),
machinery AS (
  SELECT DISTINCT l_partkey AS partkey FROM customer
  JOIN orders ON o_custkey = c_custkey JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'MACHINERY'
)
SELECT 'region_revenue' AS leg, region AS key, n_items, revenue FROM rev
UNION ALL
SELECT 'intersect' AS leg, CAST(partkey AS VARCHAR) AS key,
       CAST(NULL AS BIGINT) AS n_items, CAST(NULL AS VARCHAR) AS revenue
FROM (SELECT * FROM building INTERSECT SELECT * FROM machinery)
UNION ALL
SELECT 'except' AS leg, CAST(partkey AS VARCHAR) AS key,
       CAST(NULL AS BIGINT) AS n_items, CAST(NULL AS VARCHAR) AS revenue
FROM (SELECT * FROM building EXCEPT SELECT * FROM machinery)
""",
    "_kmv_part": f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM d),
kth AS (
  SELECT event_type, max(h) AS h_k, count(*) AS k_used FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM h
  ) WHERE rn <= {KMV_K} GROUP BY event_type
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type
)
SELECT k.event_type, e.n_exact, k.k_used,
       CASE WHEN k.k_used < {KMV_K} THEN CAST(e.n_exact AS DOUBLE)
            ELSE round({KMV_K - 1} / (('0x' || substr(k.h_k, 1, 13))::BIGINT
                                      / {float(16**13)}), 6) END AS kmv_estimate
FROM kth k JOIN exact e ON k.event_type = e.event_type
""",
    # theta-style sketched overlap (see operators/sketches.py): per
    # type, the highest-inter_est partner with sketch estimates and
    # the exact intersection beside them — identical md5 arithmetic.
    "_overlap_part": f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
hh AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM du),
mins AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hh) WHERE rn <= {KMV_K}
),
ks AS (SELECT DISTINCT event_type FROM mins),
pairs AS (
  SELECT a.event_type AS ka, b.event_type AS kb
  FROM ks a, ks b WHERE a.event_type < b.event_type
),
per_hash AS (
  SELECT ka, kb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT p.ka, p.kb, m.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN mins m ON m.event_type = p.ka
    UNION ALL
    SELECT p.ka, p.kb, m.h, 0, 1
    FROM pairs p JOIN mins m ON m.event_type = p.kb
  ) GROUP BY ka, kb, h
),
us AS (
  SELECT * FROM (
    SELECT ka, kb, h, in_a, in_b,
           row_number() OVER (PARTITION BY ka, kb ORDER BY h) AS rn
    FROM per_hash) WHERE rn <= {KMV_K}
),
agg AS (
  SELECT ka, kb, count(*) AS k_used, max(h) AS h_k,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS common
  FROM us GROUP BY ka, kb
),
est AS (
  SELECT ka, kb, common, k_used,
         CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
              ELSE round({KMV_K - 1} / (('0x' || substr(h_k, 1, 13))::BIGINT
                                        / {float(16**13)}), 6) END AS union_est
  FROM agg
),
est2 AS (
  SELECT ka, kb, union_est,
         round(common * union_est / k_used, 6) AS inter_est
  FROM est
),
sym AS (
  SELECT ka AS event_type, kb AS partner, union_est, inter_est FROM est2
  UNION ALL
  SELECT kb, ka, union_est, inter_est FROM est2
),
best AS (
  SELECT * FROM (
    SELECT event_type, partner, union_est, inter_est,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY inter_est DESC, partner ASC) AS rn
    FROM sym) WHERE rn = 1
),
exact_pairs AS (
  SELECT a.event_type, b.event_type AS partner,
         CAST(count(*) AS BIGINT) AS inter_exact
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2
)
SELECT best.event_type, best.partner AS top_overlap_partner,
       best.union_est AS ov_union_est, best.inter_est AS ov_inter_est,
       CAST(COALESCE(x.inter_exact, 0) AS BIGINT) AS ov_inter_exact
FROM best LEFT JOIN exact_pairs x
  ON best.event_type = x.event_type AND best.partner = x.partner
""",
    "_quantiles_part": """
SELECT event_type, count(*) AS n_events,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90
FROM events GROUP BY event_type
""",
    # bottom-k-by-hash quantile sketch (sketches.bottomk_sample_quantiles
    # with k=256, safety=4): the hash-threshold prefilter is part of
    # the sketch definition and replicated here verbatim
    "_bq_part": """
WITH nk AS (SELECT event_type, count(*) AS bq_n FROM events GROUP BY event_type),
hv AS (
  SELECT event_type, event_id, value,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 13))::BIGINT AS bq_hv
  FROM events
),
filt AS (
  SELECT hv.* FROM hv JOIN nk USING (event_type)
  WHERE hv.bq_hv <= CAST(floor(
          LEAST(1.0, 1024.0 / nk.bq_n) * 4503599627370496.0) AS BIGINT)
),
samp AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY bq_hv, event_id) AS bq_rn
    FROM filt
  ) WHERE bq_rn <= 256
)
SELECT event_type, count(*) AS bq_n_sample,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS bq_p50,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6) AS bq_p90
FROM samp GROUP BY event_type
""",
    # --- grouping-sets aggregates ---
    "a_lineitem_rollup": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "a_events_cube": """
SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS sum_value
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
""",
}

# Binary sign quantization (similarity.bin_encode/ann_bin, r8): the
# signature is sign(x > 0) packed to 64-bit words on the Spark side;
# the oracle scores the identical semantics from the unpacked ±1 list
# (the packed-word round trip is pinned in test_operators). Asymmetric
# scoring: the float query against the candidate's ±1 vector, then
# k·refine shortlist and exact re-rank — the ADC analogue for 1 bit.
ORACLES["s_ann_bin"] = (
    _EMB
    + f""",
bins AS (
  SELECT vec_id,
         list_transform(e, x -> CASE WHEN x > 0 THEN 1.0 ELSE -1.0 END) AS s
  FROM n
),
binapprox AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.s) AS ascore
  FROM n q JOIN bins c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {ANN_QUERIES}
),
binshort AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ascore DESC, neighbor_id ASC) AS rn
    FROM binapprox
  ) WHERE rn <= {ANN_K * similarity.BIN_REFINE}
),
binrr AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(q.e, x.e) / (q.nrm * x.nrm) AS cos
  FROM binshort s
  JOIN n q ON q.vec_id = s.query_id
  JOIN n x ON x.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM binrr
) WHERE rank <= {ANN_K}
"""
)


def _rrf_text_leg_sql(qid: int, terms: tuple[str, str, str]) -> str:
    """One fixed query's BM25 top-(4k) leg — the bmper/bmstats/bmscored
    shape of the t_fingerprints oracle (fixed-order 3-term sum, Lucene
    idf), nested so each query carries its own stats."""
    t0, t1, t2 = terms
    return f"""
  SELECT {qid} AS query_id, doc_id, rank FROM (
    WITH rtoks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    rper AS (
      SELECT doc_id, len(toks) AS dl,
             len(list_filter(toks, t -> t = '{t0}')) AS tf0,
             len(list_filter(toks, t -> t = '{t1}')) AS tf1,
             len(list_filter(toks, t -> t = '{t2}')) AS tf2
      FROM rtoks
    ),
    rstats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      FROM rper
    ),
    rscored AS (
      SELECT doc_id,
             (CASE WHEN tf0 > 0 THEN ln(1.0 + (n_docs - df0 + 0.5)/(df0 + 0.5))
                   * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   ELSE 0.0 END)
           + (CASE WHEN tf1 > 0 THEN ln(1.0 + (n_docs - df1 + 0.5)/(df1 + 0.5))
                   * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   ELSE 0.0 END)
           + (CASE WHEN tf2 > 0 THEN ln(1.0 + (n_docs - df2 + 0.5)/(df2 + 0.5))
                   * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   ELSE 0.0 END) AS score
      FROM rper, rstats
      WHERE tf0 + tf1 + tf2 > 0
    )
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM rscored ORDER BY score DESC, doc_id LIMIT {ANN_K * 4}
  )"""


# Hybrid retrieval (search.rrf_fuse, r8): reciprocal-rank fusion of the
# per-query BM25 top-4k (fixed literal term triples) and the exact-
# cosine top-4k for the aligned query vector; fused score = sum of two
# 1/(60+rank) doubles (order-insensitive), top-k by (score desc, doc).
ORACLES["s_ann_rrf"] = (
    _EMB
    + f""",
rtext AS ({"  UNION ALL".join(_rrf_text_leg_sql(q, t) for q, t in enumerate(RRF_QUERY_TERMS))}
),
rvec AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_dot_product(q.e, c.e) / (q.nrm * c.nrm) DESC,
                      c.vec_id ASC) AS rank
    FROM n q JOIN n c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {len(RRF_QUERY_TERMS)}
  ) WHERE rank <= {ANN_K * 4}
),
ru AS (
  SELECT query_id, doc_id, 1.0 / (60 + rank) AS contrib FROM rtext
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id, 1.0 / (60 + rank) FROM rvec
),
rf AS (
  SELECT query_id, doc_id, sum(contrib) AS rrf_score
  FROM ru GROUP BY query_id, doc_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, doc_id AS neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM rf
) WHERE rank <= {ANN_K}
"""
)

# The six retrieval strategies share one registry row (see
# _q_ann_methods): each keeps its full standalone SQL, tagged and
# unioned. DuckDB allows a WITH inside a parenthesized subquery, so the
# bodies nest unchanged.
_ANN_UNION = "\nUNION ALL\n".join(
    f"SELECT '{method}' AS method, t.* FROM (" + ORACLES.pop(key) + ") t"
    for method, key in (
        ("exact", "s_ann_bruteforce"),
        ("lsh", "s_ann_lsh"),
        ("ivf", "s_ann_ivf"),
        ("sq8", "s_ann_sq8"),
        ("bin", "s_ann_bin"),
        ("rrf", "s_ann_rrf"),
    )
)
# recall@k diagnostic: per (method, query), how many of the method's
# top-k appear in the exact top-k (= k for the exact rows themselves)
ORACLES["s_ann_methods"] = f"""
WITH u AS ({_ANN_UNION}),
ex AS (SELECT query_id, neighbor_id FROM u WHERE method = 'exact'),
h AS (
  SELECT u.method, u.query_id, CAST(count(*) AS BIGINT) AS recall_hits
  FROM u JOIN ex ON u.query_id = ex.query_id AND u.neighbor_id = ex.neighbor_id
  GROUP BY u.method, u.query_id
)
SELECT u.method, u.query_id, u.rank, u.neighbor_id,
       COALESCE(h.recall_hits, 0) AS recall_hits
FROM u LEFT JOIN h ON u.method = h.method AND u.query_id = h.query_id
"""

# Per-event-type summary aggregates share one row (see _q_events_sketch).
ORACLES["a_events_sketch"] = (
    "SELECT q.event_type, q.n_events, q.p50, q.p90,\n"
    "       k.n_exact, k.k_used, k.kmv_estimate,\n"
    "       o.top_overlap_partner, o.ov_union_est, o.ov_inter_est,\n"
    "       o.ov_inter_exact,\n"
    "       b.bq_n_sample, b.bq_p50, b.bq_p90\n"
    "FROM (" + ORACLES.pop("_quantiles_part") + ") q\n"
    "JOIN (" + ORACLES.pop("_kmv_part") + ") k ON q.event_type = k.event_type\n"
    "JOIN (" + ORACLES.pop("_overlap_part") + ") o ON q.event_type = o.event_type\n"
    "JOIN (" + ORACLES.pop("_bq_part") + ") b ON q.event_type = b.event_type"
)

# Training-sequence packing: md5 shuffle → hash shards → per-shard
# running token count → (seq_id, seq_offset) by integer div/mod. The
# window is partitioned by shard (never a global sort) in both engines.
ORACLES["t_pack"] = r"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))
              AS BIGINT) AS re_n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
sharded AS (
  SELECT doc_id, n_tokens, re_n_tokens, k,
         CAST(('0x' || substr(k, 1, 7))::BIGINT % 8 AS INT) AS shard
  FROM base
),
packed AS (
  SELECT doc_id, n_tokens, re_n_tokens, shard,
         sum(n_tokens) OVER w - n_tokens AS start,
         sum(re_n_tokens) OVER w - re_n_tokens AS re_start
  FROM sharded
  WINDOW w AS (PARTITION BY shard ORDER BY k, doc_id
               ROWS UNBOUNDED PRECEDING)
),
-- sliding-window chunk layout (packing.chunk_stats): 64-token windows
-- every 48 positions; a tail start adding no tokens beyond the
-- previous window's coverage (s + 16 >= n) is dropped
chtok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     t -> t <> '') AS toks
  FROM documents
),
chstarts AS (
  SELECT doc_id, toks,
         list_filter(generate_series(0, greatest(len(toks) - 1, 0), 48),
                     s -> len(toks) > 0 AND (s = 0 OR s + 16 < len(toks)))
           AS starts
  FROM chtok
),
chfp AS (
  SELECT doc_id,
         CAST(len(starts) AS BIGINT) AS n_chunks,
         md5(array_to_string(
             list_transform(starts,
               s -> array_to_string(array_slice(toks, s + 1, s + 64), ' ')),
             '|')) AS chunk_fp
  FROM chstarts
)
SELECT p.doc_id, p.n_tokens, p.shard,
       CAST(p.start // 512 AS BIGINT) AS seq_id,
       CAST(p.start % 512 AS BIGINT) AS seq_offset,
       p.re_n_tokens,
       CAST(p.re_start // 512 AS BIGINT) AS re_seq_id,
       CAST(p.re_start % 512 AS BIGINT) AS re_seq_offset,
       c.n_chunks, c.chunk_fp
FROM packed p JOIN chfp c ON p.doc_id = c.doc_id
"""

# PII scrub fragment (see operators/pii.py): deterministic planted
# suffix, RE2 recount + redaction in PII_RULES order (emails first).
# Patterns are string-duplicated from PII_RULES rather than
# interpolated so a pattern edit that breaks Java/RE2 portability
# fails the gate instead of silently following along.
_PII_PART = r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com node 10.0.'
              || CAST(doc_id % 200 AS VARCHAR)
              || '.7 ref 123-45-6789 call +1415555'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') AS text_pii
  FROM documents
)
, s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text_pii,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         regexp_replace(text_pii,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t1
  FROM planted
), s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ip,
         regexp_replace(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t2
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ip,
         len(regexp_extract_all(t2, '\+\d{7,15}')) AS n_phone,
         regexp_replace(t2, '\+\d{7,15}', '<PHONE>', 'g') AS t3
  FROM s2
)
SELECT doc_id, n_email, n_ip, n_phone,
       len(regexp_extract_all(t3, '\b\d{3}-\d{2}-\d{4}\b')) AS n_id,
       regexp_replace(t3, '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS clean_text
FROM s3
"""

# Corpus-trained char-trigram frequency score (see textstats.trigram_score):
# the trigram "model" is counted corpus-wide, each occurrence scores
# floor(scale·cnt/total), the doc mean floors again — all integer
# division, identical expressions both engines.
_TRIGRAM_PART = r"""
WITH occ AS (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, greatest(length(text) - 2, 0)),
           i -> substr(text, i, 3))) AS tri
  FROM documents WHERE length(text) >= 3
),
model AS (SELECT tri, count(*) AS cnt FROM occ GROUP BY tri),
tot AS (SELECT sum(cnt) AS total FROM model),
scored AS (
  SELECT occ.doc_id, (1000000000 * model.cnt) // tot.total AS s
  FROM occ JOIN model ON occ.tri = model.tri CROSS JOIN tot
),
per_doc AS (
  SELECT doc_id, count(*) AS n_tri, sum(s) // count(*) AS tri_score
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(COALESCE(p.tri_score, 0) AS BIGINT) AS tri_score
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""

# Per-document text classifications share one row (see _q_lang_quality).
# bigram-LM fluency (textstats.bigram_lm_scores): add-1-smoothed
# mean ln P(w2|w1) under in-corpus bigram counts; vocab = distinct
# tokens corpus-wide. Same _TOKS tokenization as every text leg.
_LM_PART = (
    _TOKS
    + r""",
big AS (
  SELECT doc_id, toks[i] AS w, toks[i + 1] AS w2
  FROM toks, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)
  WHERE len(toks) >= 2
),
uni AS (SELECT w, count(*) AS c1 FROM big GROUP BY w),
bpairs AS (SELECT w, w2, count(*) AS c12 FROM big GROUP BY w, w2),
voc AS (
  SELECT count(DISTINCT t) AS vocab
  FROM (SELECT unnest(toks) AS t FROM toks)
)
SELECT b.doc_id,
       round(avg(ln((p.c12 + 1.0) / (u.c1 + voc.vocab))), 6) AS lm_logp,
       count(*) AS n_bigrams
FROM big b
JOIN bpairs p ON b.w = p.w AND b.w2 = p.w2
JOIN uni u ON b.w = u.w
CROSS JOIN voc
GROUP BY b.doc_id
"""
)

# DSIR importance weights (sampling.dsir_weights, r8 — Xie et al.
# NeurIPS'23): hashed unigram+bigram features (2-hex-char md5 bucket,
# 256 buckets), add-one-smoothed target (lang='en') vs raw
# distributions, per-doc log-weight = Σ n_b·(ln p_b − ln q_b); the
# keep verdict thresholds the ROUNDED weight in both engines.
_DSIR_PART = (
    _TOKS
    + r""",
dfe AS (
  SELECT doc_id, unnest(toks) AS f FROM toks
  UNION ALL
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS f
  FROM toks, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)
  WHERE len(toks) >= 2
),
dfb AS (SELECT doc_id, substr(md5(f), 1, 2) AS b FROM dfe),
dtgt AS (
  SELECT dfb.doc_id, dfb.b FROM dfb
  JOIN documents d ON dfb.doc_id = d.doc_id
  WHERE d.lang = 'en'
),
dtc AS (SELECT b, count(*) AS tc FROM dtgt GROUP BY b),
drc AS (SELECT b, count(*) AS rc FROM dfb GROUP BY b),
dtot AS (
  SELECT (SELECT count(*) FROM dtgt) AS tt,
         (SELECT count(*) FROM dfb) AS tr
),
dlam AS (
  SELECT drc.b,
         ln((COALESCE(dtc.tc, 0) + 1.0) / (tt + 256))
       - ln((drc.rc + 1.0) / (tr + 256)) AS lam
  FROM drc LEFT JOIN dtc ON drc.b = dtc.b, dtot
),
dper AS (SELECT doc_id, b, count(*) AS n FROM dfb GROUP BY doc_id, b),
dlogw AS (
  SELECT dper.doc_id, sum(dper.n * dlam.lam) AS raw_logw
  FROM dper JOIN dlam ON dper.b = dlam.b
  GROUP BY dper.doc_id
)
SELECT d.doc_id,
       round(COALESCE(w.raw_logw, 0.0), 6) AS dsir_logw,
       round(COALESCE(w.raw_logw, 0.0), 6) > 0 AS dsir_keep
FROM documents d LEFT JOIN dlogw w ON d.doc_id = w.doc_id
"""
)

ORACLES["t_lang_quality"] = (
    "SELECT l.doc_id, l.pred_lang, l.score, q.n_tokens, q.mean_token_len,\n"
    "       q.stopword_ratio, q.quality, c.ws_tokens, c.re_tokens, c.n_chars,\n"
    "       p.n_email, p.n_ip, p.n_phone, p.n_id, p.clean_text,\n"
    "       t.n_tri, t.tri_score,\n"
    "       COALESCE(m.lm_logp, 0.0) AS lm_logp,\n"
    "       COALESCE(m.n_bigrams, 0) AS n_bigrams,\n"
    "       s.dsir_logw, s.dsir_keep\n"
    "FROM (" + ORACLES.pop("t_lang_id") + ") l\n"
    "JOIN (" + ORACLES.pop("t_quality_score") + ") q ON l.doc_id = q.doc_id\n"
    "JOIN (" + ORACLES.pop("t_token_counts") + ") c ON l.doc_id = c.doc_id\n"
    "JOIN (" + _PII_PART + ") p ON l.doc_id = p.doc_id\n"
    "JOIN (" + _TRIGRAM_PART + ") t ON l.doc_id = t.doc_id\n"
    "LEFT JOIN (" + _LM_PART + ") m ON l.doc_id = m.doc_id\n"
    "JOIN (" + _DSIR_PART + ") s ON l.doc_id = s.doc_id"
)

# Within-doc repetition (Gopher boilerplate signal): 2-gram occurrence
# counts. Sums cast to BIGINT (DuckDB sum → HUGEINT → float64 in pandas,
# the round-1 hash-fail mode); ratios are double-division + round(6) with
# the identical expression on the Spark side.
ORACLES["t_repetition"] = (
    _TOKS
    + r""",
gram_lists AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> array_to_string(toks[i:i+1], ' '))
              ELSE [array_to_string(toks, ' ')] END AS gl
  FROM toks
),
per_gram AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest(gl) AS gram FROM gram_lists)
  GROUP BY doc_id, gram
),
agg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup_grams,
         CAST(max(cnt) AS BIGINT) AS top_cnt
  FROM per_gram GROUP BY doc_id
)
SELECT doc_id, n_grams, dup_grams, top_cnt,
       round(CAST(dup_grams AS DOUBLE) / n_grams, 6) AS dup_frac,
       round(CAST(top_cnt AS DOUBLE) / n_grams, 6) AS top_frac
FROM agg
"""
)

# Corpus curation report: the keep/drop composition (too_short /
# repetitive / contaminated / exact_dup / near_dup) rebuilt from the
# same fragments as its component oracles — token counts, 2-gram
# repetition, 3-gram contamination probe, md5 exact dedup, and the
# LSH→Jaccard→WITH RECURSIVE closure from d_dedup_clusters. CASE
# without ELSE yields NULL and concat_ws skips NULLs in both engines,
# so the fired-reason string is identical by construction.
ORACLES["t_curation"] = (
    _CANDS
    + r""",
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cands c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE i.inter * 2 >= (na.n_sh + nb.n_sh - i.inter) * 1
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
cnodes AS (SELECT DISTINCT src AS node_id FROM edges),
walk AS (
  SELECT node_id, node_id AS label FROM cnodes
  UNION
  SELECT e.dst AS node_id, w.label
  FROM walk w JOIN edges e ON e.src = w.node_id
  WHERE w.label < e.dst
),
comp AS (SELECT node_id, min(label) AS canon_id FROM walk GROUP BY node_id),
gram_lists AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> array_to_string(toks[i:i+1], ' '))
              ELSE [array_to_string(toks, ' ')] END AS gl
  FROM toks
),
per_gram AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest(gl) AS gram FROM gram_lists)
  GROUP BY doc_id, gram
),
rep_agg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup_grams
  FROM per_gram GROUP BY doc_id
),
bench AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 20 = 0),
candsh AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 20 <> 0),
csizes AS (SELECT doc_id, count(*) AS n_shingles FROM candsh GROUP BY doc_id),
chits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM candsh WHERE shingle IN (SELECT shingle FROM bench)
  GROUP BY doc_id
),
cflag AS (
  SELECT s.doc_id,
         CAST(coalesce(h.n_hits, 0) * 10 >= s.n_shingles * 1 AS INT) AS contaminated
  FROM csizes s LEFT JOIN chits h ON s.doc_id = h.doc_id
),
exact AS (SELECT md5(text) AS text_hash, min(doc_id) AS keep_id
          FROM documents GROUP BY md5(text)),
seg_lists AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           list_transform(generate_series(1, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
             i -> array_to_string(list_slice(toks, (i - 1) * 10 + 1, (i - 1) * 10 + 10), ' '))
         ELSE [] END AS segl
  FROM toks
),
segd AS (
  SELECT doc_id, generate_subscripts(segl, 1) - 1 AS seg_idx, unnest(segl) AS seg
  FROM seg_lists
),
seg_flagged AS (
  SELECT doc_id, seg_idx,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segd
),
seg_perdoc AS (
  SELECT doc_id, count(*) AS n_segs,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_seg_drop
  FROM seg_flagged GROUP BY doc_id
)
SELECT doc_id, n_tokens, reasons, CAST(reasons = '' AS INT) AS keep FROM (
  SELECT t.doc_id,
         len(t.toks) AS n_tokens,
         concat_ws(',',
           CASE WHEN sp.n_segs > 0 AND sp.n_seg_drop * 5 >= sp.n_segs * 3
                THEN 'boilerplate' END,
           CASE WHEN coalesce(cf.contaminated, 0) = 1 THEN 'contaminated' END,
           CASE WHEN t.doc_id <> e.keep_id THEN 'exact_dup' END,
           CASE WHEN c.canon_id IS NOT NULL AND t.doc_id <> c.canon_id
                THEN 'near_dup' END,
           CASE WHEN r.dup_grams * 5 >= r.n_grams * 1 THEN 'repetitive' END,
           CASE WHEN len(t.toks) < 5 THEN 'too_short' END) AS reasons
  FROM toks t
  JOIN documents d ON d.doc_id = t.doc_id
  JOIN rep_agg r ON r.doc_id = t.doc_id
  JOIN exact e ON e.text_hash = md5(d.text)
  LEFT JOIN seg_perdoc sp ON sp.doc_id = t.doc_id
  LEFT JOIN cflag cf ON cf.doc_id = t.doc_id
  LEFT JOIN comp c ON c.node_id = t.doc_id
)
"""
).replace("WITH toks", "WITH RECURSIVE toks", 1)

# Benchmark decontamination: candidate docs' 3-gram shingles probed
# against the benchmark slice's distinct shingle set; integer ratio
# test (≥10%) so no floats cross the hash.
ORACLES["d_contamination"] = (
    _SHINGLES3
    + r""",
bench AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % 20 = 0),
cand AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 20 <> 0),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM cand GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*) AS n_hits
  FROM cand WHERE shingle IN (SELECT shingle FROM bench)
  GROUP BY doc_id
)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) * 10 >= s.n_shingles * 1 AS INT) AS contaminated
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
"""
)

# Salient terms: tf × linear idf in exact integer arithmetic (`//` here,
# `div` on the Spark side — float log idf would hash-mismatch in the
# last ulps between libm implementations).
ORACLES["t_top_terms"] = (
    _TOKS
    + r""",
tok AS (SELECT doc_id, unnest(toks) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, term, tf, df, term_rank FROM (
  SELECT t.doc_id, t.term, t.tf, d.df,
         row_number() OVER (PARTITION BY t.doc_id
           ORDER BY t.tf * ((SELECT n FROM nn) * 1000000 // d.df) DESC,
                    t.term ASC) AS term_rank
  FROM tf t JOIN dfq d USING (term)
) WHERE term_rank <= 3
"""
)

# Fuzzy-dedup clustering: the d_neardup_jaccard pair SQL extended with a
# WITH RECURSIVE min-label closure (same walk shape as g_components).
ORACLES["d_dedup_clusters"] = (
    _CANDS
    + r""",
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cands c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE i.inter * 2 >= (na.n_sh + nb.n_sh - i.inter) * 1
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
cnodes AS (SELECT DISTINCT src AS node_id FROM edges),
walk AS (
  SELECT node_id, node_id AS label FROM cnodes
  UNION
  SELECT e.dst AS node_id, w.label
  FROM walk w JOIN edges e ON e.src = w.node_id
  WHERE w.label < e.dst
),
comp AS (SELECT node_id, min(label) AS canon_id FROM walk GROUP BY node_id),
csize AS (SELECT canon_id, count(*) AS cluster_size FROM comp GROUP BY canon_id)
SELECT c.node_id AS doc_id, c.canon_id, s.cluster_size
FROM comp c JOIN csize s USING (canon_id)
"""
).replace("WITH toks", "WITH RECURSIVE toks", 1)

# Deterministic sampling, both modes (see _q_sampling_modes): rank by
# (md5(id), id) per lang; uniform k=20 plus the weighted mixture quotas
# (MIX_WEIGHTS × total=100). The Spark side's hash-threshold pre-filter
# is a physical optimization only — the result set is the plain window.
ORACLES["t_stratified_sample"] = """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS stratum_rank
  FROM documents
),
q(lang, quota) AS (VALUES ('de', 10), ('en', 50), ('es', 15), ('fr', 5), ('zh', 20))
SELECT 'uniform' AS mode, doc_id, lang, stratum_rank, CAST(20 AS BIGINT) AS quota
FROM ranked WHERE stratum_rank <= 20
UNION ALL
SELECT 'weighted' AS mode, r.doc_id, r.lang, r.stratum_rank,
       CAST(q.quota AS BIGINT) AS quota
FROM ranked r JOIN q USING (lang) WHERE r.stratum_rank <= q.quota
"""
