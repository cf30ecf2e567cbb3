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
