"""Deterministic stratified sampling over the ``documents`` table.

Beyond-reference extension (the reference's only sampler is a seeded
uniform ``df.sample`` analog, O4): training-data pipelines mix corpora
by *stratum* — "k documents per language / source / quality bucket" —
and need the draw to be reproducible across runs, engines, and
re-partitionings. RNG-based sampling can't give that (Spark's sample is
partition-dependent), so the draw here is rank-by-``md5(id)`` within
each stratum: uniform, stable under any physical layout, and exactly
reproducible by the DuckDB oracle.

Scale notes: the naive plan sorts every stratum end-to-end under one
window, which a hot stratum (one language = 40% of a 100 TB corpus)
turns into a single-task sort. Instead the sample runs hash-threshold
pre-filter → window on survivors: because md5 is uniform, the k
smallest hashes of a stratum of n rows live below the
``oversample·k/n`` hash quantile with overwhelming probability, so the
window only ever sorts ~oversample·k rows per stratum. A per-stratum
survivor-count check guards the tail probability and falls back to the
exact full-stratum window — same adaptive probe-then-pick idiom as
``similarity.cosine_neardup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import spread

#: hash-space size of the 8-hex-digit md5 prefix used for thresholding
_HASH_SPACE = 2**32


def _hash_hex(id_col: str):
    """Full md5 hex of the id rendered as a decimal string — identical
    input bytes on both engines (oracle: ``md5(CAST(id AS VARCHAR))``)."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    k: int = 20,
    id_col: str = "doc_id",
    oversample: float = 4.0,
) -> DataFrame:
    """k-per-stratum deterministic sample: (id, stratum, stratum_rank)
    with ``stratum_rank`` in 1..k assigned by ascending
    ``(md5(id), id)`` within each stratum. Strata smaller than k return
    all their rows.

    ``oversample`` trades pre-filter selectivity against fallback
    probability; at 4.0 the chance any stratum under-fills is
    ~exp(-k·(oversample-1)²/(2·oversample)) — negligible for k ≥ 10 —
    and the guarded fallback keeps the result exact regardless.
    """
    h = _hash_hex(id_col)
    h32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")

    counts = docs.groupBy(strata_col).agg(F.count("*").alias("_n"))
    cutoff = (
        F.when(F.col("_n") * F.lit(1.0) <= F.lit(oversample * k), F.lit(_HASH_SPACE))
        .otherwise(
            (F.lit(oversample * k) / F.col("_n") * F.lit(float(_HASH_SPACE)))
            .cast("bigint")
        )
    )
    survivors = (
        docs.join(F.broadcast(counts), strata_col)
        .filter(h32 < cutoff)
        .drop("_n")
    )

    # tail guard: a stratum whose survivor count fell below min(k, n)
    # would under-sample — recompute exactly (full window) if any did.
    # One tiny aggregate job on the survivor set.
    short = (
        survivors.groupBy(strata_col)
        .agg(F.count("*").alias("_s"))
        .join(F.broadcast(counts), strata_col)
        .filter(F.col("_s") < F.least(F.lit(k), F.col("_n")))
        .limit(1)
        .count()
    )
    pool = docs if short > 0 else survivors

    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        pool.withColumn("stratum_rank", F.row_number().over(w))
        .filter(F.col("stratum_rank") <= k)
        .select(id_col, strata_col, "stratum_rank")
    )


#: default corpus-mixing recipe (weights sum to 1; strata not listed
#: draw nothing) — the "data mixture" a training run specifies
MIX_WEIGHTS: dict[str, float] = {"en": 0.5, "zh": 0.2, "es": 0.15, "de": 0.1, "fr": 0.05}


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    total: int = 100,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted corpus mixing — the data-mixture primitive: stratum s
    contributes ``floor(total · weights[s])`` documents, drawn by the
    same deterministic ``(md5(id), id)`` rank as
    :func:`stratified_sample` (reused, pre-filter and all), so the
    mixture is reproducible across runs, engines, and layouts:
    (id, stratum, stratum_rank, quota).

    Strata missing from ``weights`` contribute nothing; strata smaller
    than their quota contribute everything they have (the under-filled
    mixture is visible as rank < quota). Changing ``total`` only ever
    grows/shrinks each stratum's prefix — nested samples, the property
    mixture ablations rely on.
    """
    weights = MIX_WEIGHTS if weights is None else weights
    quotas = [(s, int(total * w)) for s, w in sorted(weights.items())]
    max_k = max((q for _, q in quotas), default=0)
    ranked = stratified_sample(docs, strata_col, max_k, id_col)
    spark = docs.sparkSession
    qdf = spark.createDataFrame(quotas, [strata_col, "quota"])
    return ranked.join(F.broadcast(qdf), strata_col).filter(
        F.col("stratum_rank") <= F.col("quota")
    ).select(id_col, strata_col, "stratum_rank", "quota")


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    strata_col: str = "lang",
) -> dict[str, float]:
    """Temperature-scaled mixture weights from the corpus's own stratum
    sizes: w_s ∝ p_s^alpha (multilingual-sampling practice — e.g.
    mBERT/XLM-R exponentiated smoothing: alpha=1 keeps natural
    proportions, alpha→0 approaches uniform, lifting low-resource
    strata without drowning high-resource ones).

    One partial-agg count per stratum (the only job); the returned dict
    feeds :func:`mixture_sample` unchanged, so the draw itself stays
    deterministic and nested. Weights are exact ratios of floats of
    counts — reproducible for a fixed corpus."""
    counts = {
        r[strata_col]: r["n"]
        for r in docs.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    if not total:
        return {}
    scaled = {s: (n / total) ** alpha for s, n in counts.items()}
    z = sum(scaled.values())
    return {s: v / z for s, v in scaled.items()}


# --- DSIR: data selection via importance resampling -----------------

DSIR_BUCKETS = 256


def _dsir_features(
    docs: DataFrame, text_col: str = "text", extra: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, b [, *extra]): one row per feature INSTANCE —
    whitespace unigrams plus adjacent bigrams, each hashed to a
    2-hex-char md5 bucket (256 buckets). The hashed-n-gram feature map
    of Xie et al., NeurIPS'23 (DSIR), with md5 as the engine-portable
    hash. ``extra`` columns pass through the explode row-locally (so a
    per-doc flag never needs a corpus-sized join afterwards)."""
    # materialize the token array ONCE per row before any per-element
    # access: element_at over the raw split/filter EXPRESSION would
    # re-evaluate the whole tokenize per element inside the bigram
    # lambda — O(tokens²) work per document (measured 6+ s for a 500k-
    # feature corpus; ~0.5 s with the projection)
    # spread BEFORE the explode (r15): the single-file documents source
    # is one input split, and the fused single-explode shape has no
    # early exchange of its own — without the spread the explode and
    # the md5 hashing of every feature run on one core (the pre-r15
    # two-branch union at least ran its branches as two scan tasks)
    base = spread(docs).select(
        "doc_id",
        *extra,
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("_toks"),
    )
    tcol = F.col("_toks")
    # unigrams and adjacent bigrams in ONE concatenated array → ONE
    # explode over ONE corpus scan (r15, guide §2.4: the pre-r15 shape
    # ran two explode branches unioned, each re-reading the corpus).
    # The feature multiset is identical, so every downstream aggregate
    # is bit-identical. bigrams: positions 1..n-1 of the token array
    # joined with a space; sequence(1, 0) would generate a DESCENDING
    # [1, 0] for sub-2-token docs, so those contribute unigrams only.
    grams = F.concat(
        tcol,
        F.when(
            F.size(tcol) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tcol) - F.lit(1)),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(tcol, i),
                    F.element_at(tcol, i + F.lit(1)),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return base.select(
        "doc_id", *extra, F.explode(grams).alias("f")
    ).select(
        "doc_id", *extra, F.substring(F.md5(F.col("f")), 1, 2).alias("b")
    )


def dsir_weights(
    docs: DataFrame,
    target_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, dsir_logw, dsir_keep): per-document DSIR importance
    log-weight against a target subset, and the zero-threshold keep
    verdict.

    DSIR (Xie et al., NeurIPS'23 — "Data Selection for Language Models
    via Importance Resampling"): fit two categorical distributions
    over hashed n-gram buckets — p from the TARGET subset (the data
    you want more of, here ``docs.filter(target_filter)``), q from the
    full RAW corpus — and weight each document by its importance ratio

        log w(d) = Σ_b n_{d,b} · (ln p_b − ln q_b)

    with add-one smoothing on both sides. ``dsir_keep = logw > 0``
    ("more target-like than raw-like") is the deterministic,
    shuffle-free selection rule; fraction-based selection at scale
    goes through :func:`dsir_top_fraction` (approxQuantile threshold).

    Scale shape — two passes over the feature explode, everything
    LAZY (no eager count jobs, no checkpoint): pass 1 is ONE combined
    groupBy(bucket) carrying the raw count and (via an is-target flag
    attached at the source) the target count, from whose ≤256 rows the
    totals fold as a 1-row broadcast; pass 2 is the per-doc bucket
    count joined against the broadcast λ table. The per-doc weight
    folds its ≤256 (bucket, count) cells in bucket-sorted order — a
    DETERMINISTIC float summation order, so the oracle reproduces the
    exact double. No global sort, no hot-key window anywhere."""
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(dsir_logw(docs, target_filter, text_col, id_col), "doc_id", "left")
        .select("doc_id", *dsir_coalesced_cols())
    )


def dsir_logw(
    docs: DataFrame,
    target_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The aggregate half of :func:`dsir_weights`: (doc_id, raw_logw)
    for documents WITH at least one hashed n-gram feature (callers
    left-join and coalesce via :func:`dsir_coalesced_cols` — the fused
    t_lang_quality row attaches this to its row-local frame instead of
    paying the rejoin corpus scan)."""
    flagged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col),
        target_filter.alias("_is_tgt"),
    )
    # the target flag rides the explode row-locally — never a
    # corpus-sized join or broadcast to re-attach it. ONE explode pass
    # total: the per-(doc, bucket) counts are the root aggregate (the
    # flag is doc-constant, so it sits in the grouping key for free)
    # and the global bucket distributions roll up from those ≤256·|D|
    # cells — never from the feature rows a second time.
    per_doc = (
        _dsir_features(flagged, text_col, extra=("_is_tgt",))
        .groupBy("doc_id", "b", "_is_tgt")
        .agg(F.count("*").alias("n"))
    )
    counts = per_doc.groupBy("b").agg(
        F.sum("n").alias("rc"),
        F.sum(F.when(F.col("_is_tgt"), F.col("n")).otherwise(F.lit(0))).alias(
            "tc"
        ),
    )
    totals = counts.agg(
        F.sum("rc").alias("tot_r"), F.sum("tc").alias("tot_t")
    )
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log(
                (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("tot_t"), F.lit(0)) + F.lit(float(DSIR_BUCKETS)))
            )
            - F.log(
                (F.col("rc") + F.lit(1.0))
                / (F.col("tot_r") + F.lit(float(DSIR_BUCKETS)))
            )
        ).alias("lam"),
    )
    per = per_doc.join(F.broadcast(lam), "b").select(
        "doc_id", "b", (F.col("n") * F.col("lam")).alias("v")
    )
    return per.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("b", "v"))),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        ).alias("raw_logw")
    )


def dsir_coalesced_cols() -> list:
    """[dsir_logw, dsir_keep] over a frame carrying ``raw_logw`` (null
    for feature-less docs) — the exact post-left-join expressions of
    :func:`dsir_weights`. keep thresholds the ROUNDED weight: both
    engines compare the same 6-decimal double, so a last-ulp summation
    difference can never flip the verdict at the boundary."""
    logw = F.round(F.coalesce("raw_logw", F.lit(0.0)), 6)
    return [
        logw.alias("dsir_logw"),
        (logw > 0).alias("dsir_keep"),
    ]


def dsir_top_fraction(
    docs: DataFrame,
    target_filter,
    frac: float = 0.2,
    text_col: str = "text",
    rel_err: float = 0.001,
) -> DataFrame:
    """The paper's fraction-based selection at scale: keep the top
    ``frac`` of documents by DSIR log-weight, thresholded at the
    (1-frac) approxQuantile of the weight distribution — one
    Greenwald-Khanna pass instead of a global sort. The boundary is
    approximate by construction (rel_err), which is the honest at-scale
    trade; the oracle-checked row pins the exact-semantics logw/keep
    columns instead."""
    if not 0 < frac < 1:
        raise ValueError(f"frac must be in (0, 1), got {frac}")
    w = dsir_weights(docs, target_filter, text_col)
    thr = w.approxQuantile("dsir_logw", [1.0 - frac], rel_err)[0]
    return w.filter(F.col("dsir_logw") >= thr).select("doc_id", "dsir_logw")
