"""Text-analysis operators over the ``documents`` table.

Beyond-reference extension: the per-document statistics a training-data
pipeline computes corpus-wide — language ID, quality scoring, token
counting, content fingerprinting. Everything is built-in-function
column algebra (whole-stage codegen; no Python in the hot path) and is
reproduced exactly by the DuckDB oracles in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-based language ID: (doc_id, pred_lang, score). score is the
    marker-hit count of the winning language (ties → lexicographically
    first language). One narrow |docs|×|langs| expansion, then a
    per-doc top-1 — partial-aggregatable, no shuffle beyond the top-1."""
    toks = docs.select("doc_id", tokens_col().alias("toks"))
    scored = None
    for lang, markers in sorted(LANG_MARKERS.items()):
        part = toks.select(
            "doc_id",
            F.lit(lang).alias("lang"),
            _count_in("toks", markers).alias("score"),
        )
        scored = part if scored is None else scored.unionByName(part)
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("lang").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "score")
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + composite score per document:
    (doc_id, n_tokens, mean_token_len, stopword_ratio, quality).

    quality = 0.5·min(n_tokens/100, 1) + 0.3·(1 − stopword_ratio)
            + 0.2·min(mean_token_len/10, 1), rounded to 6 dp.
    Pure column algebra — identical expression in the oracle."""
    toks = docs.select("doc_id", tokens_col().alias("toks"))
    stats = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr("aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)").alias(
            "sum_len"
        ),
        _count_in("toks", STOPWORDS).alias("n_stop"),
    )
    mean_len = F.col("sum_len") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    quality = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + (F.lit(1.0) - stop_ratio) * 0.3
        + F.least(mean_len / 10.0, F.lit(1.0)) * 0.2
    )
    return stats.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens
    (alnum runs + single non-alnum-non-space marks):
    (doc_id, ws_tokens, re_tokens, n_chars)."""
    return docs.select(
        "doc_id",
        F.size(tokens_col()).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")).alias(
            "re_tokens"
        ),
        F.length("text").alias("n_chars"),
    )


def fingerprint(docs: DataFrame, n: int = 5) -> DataFrame:
    """Document fingerprint: minimum md5 over word ``n``-gram shingles
    (rolling-hash sampling, the min-sketch special case) plus the
    distinct-shingle count: (doc_id, fp, n_shingles)."""
    sh = shingles(docs, n=n)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("shingle"))).alias("fp"),
        F.count("*").alias("n_shingles"),
    )
