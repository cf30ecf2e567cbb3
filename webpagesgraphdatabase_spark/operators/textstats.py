"""Text-analysis operators over the ``documents`` table.

Beyond-reference extension: the per-document statistics a training-data
pipeline computes corpus-wide — language ID, quality scoring, token
counting, content fingerprinting. Everything is built-in-function
column algebra (whole-stage codegen; no Python in the hot path) and is
reproduced exactly by the DuckDB oracles in the registry.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import spread
from .dedup import shingles, tokens_col

# marker-token vocabularies for the n-gram/marker language heuristic;
# scoring is deterministic: count marker hits, argmax with (score desc,
# lang asc) tie-break. (A real pipeline swaps in fastText etc. — the
# *operator shape* — per-doc classify + corpus rollup — is what scales.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "fast"),
    "es": ("el", "la", "los", "de", "una"),
    "de": ("der", "und", "das", "ein", "nicht"),
    "fr": ("le", "les", "et", "une", "dans"),
}

STOPWORDS = ("the", "a", "and", "of", "to")


def _count_in(col_name: str, words: tuple[str, ...]):
    """Count of array elements in ``words`` (needs expr: lambda-scoped
    IN-list)."""
    lst = ", ".join("'" + w + "'" for w in words)
    return F.expr(f"size(filter({col_name}, t -> t in ({lst})))")


def lang_best_struct(toks: str = "toks"):
    """Column: struct(score, pri, lang) of the winning language over an
    already-projected token-array column — the argmax with the
    (score desc, lang asc) tie-break as a ROW-LOCAL struct-max fold
    (``pri`` is the reversed lexicographic rank, so equal scores
    resolve to the lexicographically first language). Shared by
    :func:`lang_id` and the fused t_lang_quality registry row."""
    langs = sorted(LANG_MARKERS)
    n = len(langs)
    return F.array_max(
        F.array(
            *[
                F.struct(
                    _count_in(toks, LANG_MARKERS[lang]).alias("score"),
                    F.lit(n - 1 - i).alias("pri"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(langs)
            ]
        )
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-based language ID: (doc_id, pred_lang, score). score is the
    marker-hit count of the winning language (ties → lexicographically
    first language). Row-local struct-max argmax over the fixed language
    list — one projection, no expansion, no shuffle (the pre-r15 shape
    unioned |docs|×|langs| rows through a window top-1; the scores and
    the tie-break are identical, including all-null scores on null
    text, where both shapes yield the lexicographically first
    language)."""
    toks = docs.select("doc_id", tokens_col().alias("toks"))
    best = lang_best_struct("toks")
    return toks.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["score"].alias("score"),
    )


def quality_stat_cols(toks: str = "toks") -> list:
    """The raw per-doc stats :func:`quality_score` derives from, as
    expressions over an already-projected token-array column:
    [n_tokens, sum_len, n_stop]. Shared with the fused t_lang_quality
    registry row so the arithmetic has ONE definition."""
    return [
        F.size(toks).alias("n_tokens"),
        F.expr(
            f"aggregate(transform({toks}, t -> length(t)), 0, (a, x) -> a + x)"
        ).alias("sum_len"),
        _count_in(toks, STOPWORDS).alias("n_stop"),
    ]


def quality_derived_cols() -> list:
    """The derived quality columns over a frame carrying
    (n_tokens, sum_len, n_stop): [mean_token_len, stopword_ratio,
    quality], each rounded to 6 dp — the oracle-checked expressions."""
    mean_len = F.col("sum_len") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    quality = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - stop_ratio) * 0.3
        + F.least(mean_len / 10.0, F.lit(1.0)) * 0.2
    )
    return [
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    ]


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score per document:
    (doc_id, n_tokens, mean_token_len, stopword_ratio, quality).

    quality = 0.5·min(n_tokens/100, 1) + 0.3·(1 − stopword_ratio)
            + 0.2·min(mean_token_len/10, 1), rounded to 6 dp.
    Pure column algebra — identical expression in the oracle."""
    toks = docs.select("doc_id", tokens_col().alias("toks"))
    stats = toks.select("doc_id", *quality_stat_cols("toks"))
    return stats.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        *quality_derived_cols(),
    )


def token_counts(docs: DataFrame, tokenizer=None) -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens
    (alnum runs + single non-alnum-non-space marks):
    (doc_id, ws_tokens, re_tokens, n_chars).

    Pass a :mod:`.tokenize` tokenizer to append a ``custom_tokens``
    column counted under it (e.g. WordPiece); the default schema is
    unchanged so the DuckDB oracle row stays byte-identical."""
    out = docs.select(
        "doc_id",
        F.size(tokens_col()).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")).alias(
            "re_tokens"
        ),
        F.length("text").alias("n_chars"),
        *([F.size(tokenizer("text")).alias("custom_tokens")] if tokenizer else []),
    )
    return out


def fingerprint(docs: DataFrame, n: int = 5) -> DataFrame:
    """Document fingerprint: minimum md5 over word ``n``-gram shingles
    (rolling-hash sampling, the min-sketch special case) plus the
    distinct-shingle count: (doc_id, fp, n_shingles)."""
    sh = shingles(docs, n=n)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle"))).alias("fp"),
        F.count("*").alias("n_shingles"),
    )


# Rabin-Karp parameters. All arithmetic stays exact in int64:
# token hashes are 28-bit (7 hex chars of md5), powers of B are reduced
# mod P < 2^31, so every product is < 2^59 and every 4-term sum < 2^61.
RK_P = 2_147_483_647  # 2^31 - 1 (Mersenne)
RK_B = 1_000_003
RK_B2 = RK_B * RK_B % RK_P
RK_B3 = RK_B2 * RK_B % RK_P

_TH = "cast(conv(substr(md5(token), 1, 7), 16, 10) as bigint)"


def rolling_fingerprint(docs: DataFrame, window: int = 4) -> DataFrame:
    """True rolling-hash fingerprint (Rabin-Karp): polynomial hash
    ``Σ th_j · B^(w-1-j) mod P`` over every ``window`` consecutive
    tokens, reported as the per-document minimum (winnowing-style
    selection) plus the window count: (doc_id, rolling_fp, n_windows).

    ``window`` is fixed at 4 (the polynomial is unrolled into codegen).
    Documents shorter than the window hash their full token list with
    correspondingly lower powers, so every doc has exactly
    ``max(1, n_tokens - 3)`` windows.

    Plan shape: posexplode to (doc_id, pos, th) narrow rows, the window
    hash via three ``lead`` columns over (doc_id ORDER BY pos) — one
    shuffle of int rows, partitioned by doc (no skew: partition size =
    doc length) — then a partial-aggregatable min/count per doc.
    """
    if window != 4:
        raise ValueError("rolling_fingerprint is unrolled for window=4")
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens_col()).alias("pos", "token"),
        F.size(tokens_col()).alias("n"),
    ).select("doc_id", "pos", "n", F.expr(_TH).alias("th"))

    w = Window.partitionBy("doc_id").orderBy("pos")
    th1, th2, th3 = (F.lead("th", i).over(w) for i in (1, 2, 3))
    full = (
        tok.withColumn(
            "h",
            (
                F.col("th") * RK_B3
                + th1 * RK_B2
                + th2 * RK_B
                + th3
            )
            % RK_P,
        )
        .filter(F.col("pos") <= F.col("n") - 4)
        .select("doc_id", "h")
    )
    # short docs (n < window): one hash over all tokens, powers B^(n-1-pos)
    short = (
        tok.filter(F.col("n") < 4)
        .withColumn(
            "term",
            F.col("th")
            * F.when(F.col("n") - 1 - F.col("pos") == 0, F.lit(1))
            .when(F.col("n") - 1 - F.col("pos") == 1, F.lit(RK_B))
            .otherwise(F.lit(RK_B2)),
        )
        .groupBy("doc_id")
        .agg((F.sum("term") % RK_P).alias("h"))
        .select("doc_id", "h")
    )
    return (
        full.unionByName(short)
        .groupBy("doc_id")
        .agg(F.min("h").alias("rolling_fp"), F.count("*").alias("n_windows"))
    )


def gram_array(n: int = 2, col: str = "text"):
    """Word ``n``-gram array expression (row-local; the unit
    :func:`repetition` explodes). Docs shorter than ``n`` tokens yield
    their whole text as one gram, so every doc has ≥1."""
    words = tokens_col(col)
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))


def dup_gram_counts(grams):
    """(n_grams, dup_grams) as a row-local struct expression over a
    gram array — the streaming-safe twin of :func:`repetition`'s
    explode + groupBy (bit-identical counts, pinned by test): sort the
    array once, then a single ``aggregate`` pass counts occurrences
    inside duplicated runs (a run's second member adds 2 — itself and
    the first — every further member adds 1). O(n log n) per row, no
    shuffle, no state."""
    s = F.array_sort(grams)
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("dup"),
    )
    dup = F.aggregate(
        s,
        zero,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (
                a["dup"]
                + F.when(
                    x == a["prev"],
                    F.when(a["run"] == 1, F.lit(2)).otherwise(F.lit(1)),
                ).otherwise(F.lit(0))
            ).alias("dup"),
        ),
        lambda a: a["dup"],
    )
    return F.struct(
        F.size(grams).cast("long").alias("n_grams"), dup.alias("dup_grams")
    )


def repetition(docs: DataFrame, n: int = 2) -> DataFrame:
    """Within-document repetition stats over word ``n``-grams — the
    Gopher-rules boilerplate signal (Rae et al. 2021, "Scaling Language
    Models: ... Gopher", §A1.1: fraction of text in duplicated n-grams):
    (doc_id, n_grams, dup_grams, top_cnt, dup_frac, top_frac).

    - ``n_grams``   — total n-gram occurrences in the doc;
    - ``dup_grams`` — occurrences belonging to an n-gram that appears
      ≥2× in the same doc;
    - ``top_cnt``   — occurrences of the doc's most frequent n-gram;
    - ``dup_frac`` / ``top_frac`` — the two ratios, rounded to 6 dp
      (filter thresholds belong on the exact integer columns).

    Docs shorter than ``n`` tokens count their whole text as one gram,
    so every doc has ≥1 gram and the ratios stay defined.

    Scale shape: explode → count per (doc, gram) → per-doc rollup. Both
    aggregations partial-agg below their exchange; partitions are keyed
    by doc content, never corpus-skewed. No Python anywhere.
    """
    occ = spread(docs).select("doc_id", F.explode(gram_array(n)).alias("gram"))
    per_gram = occ.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    agg = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias(
            "dup_grams"
        ),
        F.max("cnt").alias("top_cnt"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "dup_grams",
        "top_cnt",
        F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias("dup_frac"),
        F.round(F.col("top_cnt") / F.col("n_grams"), 6).alias("top_frac"),
    )


def top_terms(docs: DataFrame, k: int = 3, idf_scale: int = 1_000_000) -> DataFrame:
    """Per-document salient terms by tf×idf with a *linear* idf:
    (doc_id, term, tf, df, term_rank), term_rank in 1..k by descending
    ``tf · floor(N·idf_scale / df)`` (ties → term asc).

    Linear idf (N/df instead of log(N/df)) keeps the score in exact
    integer arithmetic — bit-identical across engines, where float log
    would differ in the last ulps between libm implementations and
    poison the value hash. The ordering it induces is the standard
    rare-terms-first salience; the log variant differs only for terms
    whose tf·idf products straddle the log's compression, which the
    docstring trades for cross-engine exactness.

    Scale shape: explode → partial-agg tf(doc, term) → small df(term)
    aggregate joined back (broadcast at any realistic vocabulary) → a
    per-document window whose partitions are single documents' term
    sets (bounded by doc length, never corpus-skewed).
    """
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.count()
    # `div` = integral division (DuckDB `//`): exact bigint arithmetic,
    # no double rounding at quotient boundaries
    scored = tf.join(df_, "term").withColumn(
        "score",
        F.col("tf") * F.expr(f"CAST({n * idf_scale} AS BIGINT) div df"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "term", "tf", "df", "term_rank")
    )


#: fixed-point scale for the trigram frequency score — large enough
#: that floor division keeps ~9 significant digits, small enough that
#: scale · max(cnt) stays far inside int64 at any real corpus size
TRIGRAM_SCALE = 1_000_000_000


def char_trigrams_col(text_col: str = "text"):
    """Column: the character-trigram list of ``text_col`` (empty when
    shorter than 3 chars — guarded, since ``sequence(1, 0)`` would
    count *down* rather than produce an empty range)."""
    t = F.col(text_col)
    return F.when(
        F.length(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: F.substring(t, i, 3),
        ),
    ).otherwise(F.array().cast("array<string>"))


def trigram_score(docs: DataFrame, scale: int = TRIGRAM_SCALE) -> DataFrame:
    """Corpus-trained character-trigram frequency score — the
    LM-quality curation signal shape (CCNet scores documents with a
    KenLM n-gram model; this is the same train-on-corpus / score-per-doc
    architecture with the model reduced to unigram-of-trigrams so the
    arithmetic stays *exact*): (doc_id, n_tri, tri_score).

    ``tri_score`` is the per-document mean of
    ``floor(scale · count(trigram) / total_trigrams)`` over the doc's
    trigram occurrences, floored again — all integer division, so the
    DuckDB oracle reproduces it bit-for-bit (the same reason
    :func:`top_terms` uses linear idf instead of log). High score =
    built from common trigrams (fluent for the corpus's languages);
    near-zero = rare-trigram noise (mojibake, binary spill, wrong
    charset). Docs with no trigrams (< 3 chars) score 0.

    Scale shape: explode to one row per trigram occurrence (bounded by
    corpus character count), partial-agg count per trigram (the "model"
    — vocab-bounded, ≤ |charset|³ rows, broadcast back), then a per-doc
    partial-agg mean. Two shuffles, both on high-cardinality keys; the
    model join is broadcast at any realistic charset."""
    return (
        spread(docs)
        .select("doc_id")
        .join(trigram_per_doc(docs, scale), "doc_id", "left")
        .select("doc_id", *trigram_coalesced_cols())
    )


def trigram_per_doc(docs: DataFrame, scale: int = TRIGRAM_SCALE) -> DataFrame:
    """The aggregate half of :func:`trigram_score`: (doc_id, n_tri,
    tri_score) for documents WITH trigrams only (callers left-join and
    coalesce via :func:`trigram_coalesced_cols` — the fused
    t_lang_quality row attaches this to its row-local frame instead of
    paying the rejoin corpus scan)."""
    # Internals measured and deliberately KEPT as the occurrence-level
    # shape (r15, guide §1.1): a (doc, trigram)-cell root aggregate won
    # standalone (one explode pass instead of two) but LOST inside the
    # fused t_lang_quality join — a pushed join-side filter broke the
    # subtree identity, so the cells exchange was NOT reused, the
    # corpus still exploded twice, and the near-unique (doc, tri) cell
    # shuffle came on top. The model groupBy below is vocab-bounded
    # partial aggregation and broadcasts back — no full-stream shuffle
    # at any scale.
    occ = spread(docs).select(
        "doc_id", F.explode(char_trigrams_col()).alias("tri")
    )
    model = occ.groupBy("tri").agg(F.count("*").alias("cnt"))
    total = model.agg(F.sum("cnt").alias("total"))
    scored = (
        occ.join(F.broadcast(model), "tri")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(f"cast({scale} as bigint) * cnt div total").alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tri"),
        F.expr("sum(s) div count(*)").alias("tri_score"),
    )


def trigram_coalesced_cols() -> list:
    """[n_tri, tri_score] with the no-trigram default (0) applied —
    the exact post-left-join expressions of :func:`trigram_score`."""
    return [
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
        F.coalesce(F.col("tri_score"), F.lit(0))
        .cast("long")
        .alias("tri_score"),
    ]


# --------------------------------------------------------------------------
# trained quality classifier (distributed logistic regression)
# --------------------------------------------------------------------------

#: Feature expressions for the quality classifier, in weight order.
#: Row-local codegen only — so scoring is a pure map (stream-safe) and
#: training iterations scan a persisted 4-column table, not raw text.
_QUALITY_FEATS = ("f_log_tokens", "f_mean_len", "f_stop_ratio", "f_log_chars")


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, f_log_tokens, f_mean_len, f_stop_ratio, f_log_chars):
    the classifier's feature vector — log-damped length signals plus
    the composition ratios :func:`quality_score` uses, all pure column
    algebra over one pass of the text."""
    toks = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        tokens_col().alias("toks"),
    )
    stats = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr("aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)").alias(
            "sum_len"
        ),
        _count_in("toks", STOPWORDS).alias("n_stop"),
        "n_chars",
    ).filter(F.col("n_tokens") > 0)
    return stats.select(
        "doc_id",
        F.log1p("n_tokens").alias("f_log_tokens"),
        (F.col("sum_len") / F.col("n_tokens")).alias("f_mean_len"),
        (F.col("n_stop") / F.col("n_tokens")).alias("f_stop_ratio"),
        F.log1p("n_chars").alias("f_log_chars"),
    )


def train_quality_classifier(
    docs: DataFrame,
    labels: DataFrame | None = None,
    n_iters: int = 40,
    lr: float = 1.0,
    tol: float = 1e-6,
    reg: float = 1e-4,
) -> dict:
    """Train a logistic-regression quality classifier as Newton/IRLS
    supersteps — the fastText-style linear quality filter real corpus
    pipelines run (e.g. GPT-3/CCNet quality scoring), trained
    *distributively*: the corpus is featurized once into a persisted
    4-column table, and each full-batch Newton step is ONE scan of
    that table producing a single small row on the driver (avg
    gradient + the 5×5 Hessian's upper triangle — 21 numbers) — the
    cache-then-iterate shape Spark's own MLlib GLMs use, with the
    second-order update MLlib's own LogisticRegression uses (L-BFGS /
    IRLS family). No MLlib dependency: the loop is ~30 lines of
    DataFrame aggregation plus a 5×5 solve on the driver.

    Newton steps converge quadratically, so a run that previously paid
    ~40 gradient-descent scans (each a full Spark job whose cost at
    bench scale is dominated by scheduling, and at 100 TB by the scan)
    reaches the same ``tol`` in ~5-8 scans. ``lr`` damps the Newton
    step (default 1.0 = full step); the Hessian gets a tiny ridge so a
    degenerate batch cannot produce a singular solve, and a
    non-finite/failed solve falls back to the plain gradient step for
    that iteration.

    ``labels`` is (doc_id, label∈{0,1}); default is weak supervision
    from the heuristic: label = 1 where :func:`quality_score`'s
    composite ≥ 0.5 (bootstrapping a *smooth, trainable* scorer from a
    hard rule — the standard pipeline move; swap in human labels when
    they exist). Features are standardized (one agg job) so the
    conditioning of the Hessian is uniform across dimensions.

    Returns ``{"weights": [bias, w…], "mean": […], "std": […],
    "loss": […per-iteration log-loss…]}`` — everything
    :func:`quality_lr_score` needs to score new documents as a pure
    map."""
    import math

    import numpy as np

    if labels is None:
        # weak labels derive from the SAME per-doc stats the features
        # do — compute both in one scan instead of a second corpus
        # featurize + a shuffle join (the label expression reproduces
        # quality_score bit-for-bit: same composite, same 6-dp round)
        toks = docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            tokens_col().alias("toks"),
        )
        stats = toks.select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.expr(
                "aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)"
            ).alias("sum_len"),
            _count_in("toks", STOPWORDS).alias("n_stop"),
            "n_chars",
        ).filter(F.col("n_tokens") > 0)
        mean_len = F.col("sum_len") / F.col("n_tokens")
        stop_ratio = F.col("n_stop") / F.col("n_tokens")
        quality = (
            F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
            + (F.lit(1.0) - stop_ratio) * 0.3
            + F.least(mean_len / 10.0, F.lit(1.0)) * 0.2
        )
        feats = stats.select(
            "doc_id",
            F.log1p("n_tokens").alias("f_log_tokens"),
            mean_len.alias("f_mean_len"),
            stop_ratio.alias("f_stop_ratio"),
            F.log1p("n_chars").alias("f_log_chars"),
            (F.round(quality, 6) >= 0.5).cast("double").alias("label"),
        )
    else:
        feats = quality_features(docs).join(labels, "doc_id")

    mom = feats.agg(
        *[F.avg(c).alias(f"m_{c}") for c in _QUALITY_FEATS],
        *[F.stddev_pop(c).alias(f"s_{c}") for c in _QUALITY_FEATS],
    ).first()
    mean = [float(mom[f"m_{c}"]) for c in _QUALITY_FEATS]
    std = [max(float(mom[f"s_{c}"] or 0.0), 1e-9) for c in _QUALITY_FEATS]

    z = feats.select(
        "label",
        *[
            ((F.col(c) - mean[i]) / std[i]).alias(c)
            for i, c in enumerate(_QUALITY_FEATS)
        ],
    ).persist()
    z.count()

    # design columns in weight order; x0 = the bias' constant 1
    xcols = [F.lit(1.0)] + [F.col(c) for c in _QUALITY_FEATS]
    k = len(xcols)
    w = [0.0] * k  # [bias, w1..w4]
    losses: list[float] = []
    try:
        for _ in range(n_iters):
            margin = F.lit(w[0])
            for i, c in enumerate(_QUALITY_FEATS):
                margin = margin + F.col(c) * F.lit(w[i + 1])
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
            s = p * (F.lit(1.0) - p)  # IRLS weight
            eps = 1e-12
            aggs = [
                F.avg((p - F.col("label")) * xcols[i]).alias(f"g{i}")
                for i in range(k)
            ]
            aggs += [
                F.avg(s * xcols[i] * xcols[j]).alias(f"h{i}_{j}")
                for i in range(k)
                for j in range(i, k)
            ]
            aggs.append(
                F.avg(
                    -(
                        F.col("label") * F.log(p + eps)
                        + (1 - F.col("label")) * F.log(1 - p + eps)
                    )
                ).alias("loss")
            )
            row = z.agg(*aggs).first()
            losses.append(float(row["loss"]))
            g = np.array([float(row[f"g{i}"]) for i in range(k)])
            h = np.empty((k, k))
            for i in range(k):
                for j in range(i, k):
                    h[i, j] = h[j, i] = float(row[f"h{i}_{j}"])
            # small L2 on the non-bias weights: weak labels thresholded
            # from the features themselves are (near-)separable, under
            # which the unregularized optimum sits at infinity and the
            # loop burns its full iteration budget chasing it; the
            # penalty makes the optimum finite so Newton's quadratic
            # convergence actually fires (plus a tiny ridge so an
            # all-saturated batch — s ≈ 0 everywhere — cannot go
            # singular)
            g[1:] += reg * np.asarray(w[1:])
            h += np.diag([1e-9] + [reg + 1e-9] * (k - 1))
            try:
                step = np.linalg.solve(h, g)
                if not np.all(np.isfinite(step)):  # pragma: no cover
                    raise np.linalg.LinAlgError
            except np.linalg.LinAlgError:  # pragma: no cover
                step = g  # degenerate Hessian: plain gradient step
            w = [w[i] - lr * float(step[i]) for i in range(k)]
            if not all(math.isfinite(x) for x in w):  # pragma: no cover
                raise ArithmeticError("diverged; lower lr")
            # early stop: each iteration is a distributed scan, so
            # converged-enough means stop paying for them
            if len(losses) >= 2 and abs(losses[-2] - losses[-1]) < tol:
                break
    finally:
        z.unpersist()
    return {"weights": w, "mean": mean, "std": std, "loss": losses}


def quality_lr_score(docs: DataFrame, model: dict) -> DataFrame:
    """(doc_id, lr_quality): the trained classifier's P(good) per
    document — a pure row-local map (featurize + standardize with the
    model's constants + sigmoid), no shuffle, no Python worker, so it
    runs unchanged on streams and fuses with the corpus scan."""
    w, mean, std = model["weights"], model["mean"], model["std"]
    feats = quality_features(docs)
    margin = F.lit(w[0])
    for i, c in enumerate(_QUALITY_FEATS):
        margin = margin + ((F.col(c) - mean[i]) / std[i]) * F.lit(w[i + 1])
    return feats.select(
        "doc_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("lr_quality"),
    )


def bigram_lm_scores(docs: DataFrame, k: float = 1.0) -> DataFrame:
    """Corpus-trained bigram language-model fluency score per document:
    (doc_id, lm_logp, n_bigrams) — the CCNet/KenLM perplexity-filter
    signal (Wenzek et al. 2019, arXiv:1911.00359) as a self-trained
    in-corpus model: ``lm_logp`` is the mean ln P(w2|w1) over the doc's
    bigram positions under add-k (Laplace, k=1) smoothing,
    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V). Docs whose token
    sequence is typical of the corpus score high; gibberish and
    boilerplate-mangled text score low. Perplexity = exp(-lm_logp).

    Deterministic (counts + closed-form smoothing — no SGD), so the
    oracle reproduces it digit-for-digit at 6 dp. Docs with fewer than
    two tokens have no bigrams and are absent (callers left-join).

    Scale shape: training IS the scoring pass's side input — one
    partial-aggregated count per bigram and per context (shuffle keys:
    the grams, never documents), a vocab count, then one equi-join of
    the doc bigram stream against the count tables and a per-doc avg.
    No model object leaves the cluster; at 100 TB the bigram table is
    the only intermediate and it is vocabulary-, not corpus-, sized."""
    # Measured and deliberately KEPT as the window shape (r15, guide
    # §1.1 "a fresh implementation of the ideal plan is usually slower
    # at first"): two rewrites — (doc,w,w2) count cells as the root
    # aggregate, and a row-local array-algebra bigram explode — both
    # measured SLOWER in interleaved A/B at sf0.1 (cells 1.62 vs 1.21 s
    # min; row-local explode 1.24 vs 0.89 s min), because the window's
    # exchange is computed once and REUSED by all three downstream
    # consumers, while a narrow explode is re-evaluated per consumer
    # and the cells exchange barely compacts (bigrams are mostly
    # unique per doc).
    tok = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "w")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("w2", F.lead("w").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "w", "w2")
    )
    uni = big.groupBy("w").agg(F.count("*").alias("c1"))
    pairs = big.groupBy("w", "w2").agg(F.count("*").alias("c12"))
    # vocab stays IN the plan (1-row broadcast crossJoin) — no eager
    # count job per call, and the whole operator remains lazy
    voc = tok.agg(F.countDistinct("w").alias("_vocab"))
    return (
        big.join(pairs, ["w", "w2"])
        .join(uni, "w")
        .crossJoin(F.broadcast(voc))
        .select(
            "doc_id",
            F.log(
                (F.col("c12") + F.lit(float(k)))
                / (F.col("c1") + F.lit(float(k)) * F.col("_vocab"))
            ).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("lp"), 6).alias("lm_logp"),
            F.count("*").alias("n_bigrams"),
        )
    )


def cdc_segments(docs: DataFrame, divisor: int = 16) -> DataFrame:
    """Content-defined chunking (the Rabin/LBFS idea at token level):
    a segment boundary falls AFTER token ``e`` whenever the 4-token
    rolling hash ending at ``e`` satisfies ``h % divisor == 0`` —
    boundaries depend only on local content, so two documents sharing
    a long substring produce byte-identical interior segments even at
    different offsets (the shifted-duplicate case fixed-size chunking
    misses; segment-hash dedup then catches it). Expected segment
    length ≈ ``divisor`` tokens; no min/max clamp (documented
    contract — clamping needs a sequential scan).

    Returns (doc_id, seg_idx, n_seg_tokens, seg_text, seg_hash).
    Documents shorter than the window form one segment; empty docs
    produce no rows.

    Plan shape: the same narrow (doc_id, pos, th) explode as
    :func:`rolling_fingerprint`, the window hash via three ``lag``
    columns + the boundary cumsum over (doc_id ORDER BY pos) — doc-
    bounded windows, then one keyed reassembly groupBy. Deterministic
    and engine-exact (integer arithmetic only)."""
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens_col()).alias("pos", "token"),
        F.size(tokens_col()).alias("n"),
    ).select("doc_id", "pos", "n", "token", F.expr(_TH).alias("th"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    h_end = (
        F.lag("th", 3).over(w) * RK_B3
        + F.lag("th", 2).over(w) * RK_B2
        + F.lag("th", 1).over(w) * RK_B
        + F.col("th")
    ) % RK_P
    flagged = tok.withColumn(
        "cut",
        F.when((F.col("pos") >= 3) & (h_end % divisor == 0), 1).otherwise(0),
    )
    seg = F.coalesce(
        F.sum("cut").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        flagged.withColumn("seg_idx", seg.cast("long"))
        .groupBy("doc_id", "seg_idx")
        .agg(
            F.count("*").cast("long").alias("n_seg_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("seg_text"),
        )
        .withColumn("seg_hash", F.md5("seg_text"))
    )


def cdc_stats(docs: DataFrame, divisor: int = 16) -> DataFrame:
    """Per-document fingerprint of the CDC layout — (doc_id,
    n_cdc_segments, cdc_fp) with ``cdc_fp`` the md5 of the segment
    hashes joined in segment order; the oracle-gate leg."""
    return (
        cdc_segments(docs, divisor)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_cdc_segments"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seg_idx", "seg_hash"))
                        ),
                        lambda s: s["seg_hash"],
                    ),
                    "|",
                )
            ).alias("cdc_fp"),
        )
    )


def compression_ratio(docs: DataFrame, level: int = 6) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, compression_ratio): zlib-
    compressed size over raw UTF-8 size — the classic redundancy
    signal real curation stacks use alongside the Gopher repetition
    stats (highly repetitive or templated text compresses far below
    natural prose; near-random noise compresses above it). Returns
    ratio rounded to 6 dp; empty docs read ratio 0.

    Arrow-batched pandas UDF by necessity (a DEFLATE pass is stateful
    per document, not column algebra) — one batch pass, no shuffle,
    stream-safe. Unit-pinned rather than oracle-checked: DuckDB has no
    zlib surface, and the zlib output is platform-stable only per
    (library, level), which the test pins."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _csize(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
            if t is not None
            else 0
        )

    out = docs.select(
        "doc_id",
        F.length(F.col("text")).cast("long").alias("n_chars"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        _csize(F.col("text")).alias("n_compressed"),
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "n_compressed",
        F.when(
            F.col("n_bytes") > 0,
            F.round(F.col("n_compressed") / F.col("n_bytes"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("compression_ratio"),
    )
