"""Streaming corpus hygiene: the contamination probe and per-doc text
stats applied to a document *stream*.

Pattern notes (the part that matters at scale):

- **Per-document operators are row-local here.** A document arrives
  whole in one row, so its shingle set, token counts, and contamination
  flag are computable inside the row with array expressions — no
  cross-row state, no watermark, pure append mode, exactly-once per
  document. The stateless batch operators
  (:func:`..operators.textstats.token_counts`) run on a streaming
  DataFrame unchanged for the same reason.
- **The benchmark set ships with the plan.** Eval sets are MBs against
  a TB-scale stream, so the distinct benchmark shingles are collected
  once (bounded by design) and embedded as an array literal — the
  streaming analog of the batch operator's broadcast semi-join: every
  executor probes a local copy; the stream side never shuffles.
- The cross-row hygiene rules (near-dup clustering, corpus-wide exact
  dedup) are inherently retrospective — they stay batch jobs over the
  accumulated corpus, with :func:`.jobs.streaming_dedup_events` showing
  the within-watermark streaming dedup variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import shingle_array, shingles

DOC_DDL = "doc_id long, text string"


def read_doc_stream(spark, source_dir: str) -> DataFrame:
    """File-source micro-batch stream of documents (declared schema)."""
    return spark.readStream.schema(DOC_DDL).parquet(source_dir)


def benchmark_shingle_set(
    docs: DataFrame, n: int = 3, bench_mod: int = 20
) -> list[str]:
    """The held-out benchmark slice's distinct shingles, materialized
    for plan-shipping. Bounded by the benchmark's size (eval sets are
    small by construction), independent of corpus size."""
    bench = docs.filter(F.col("doc_id") % bench_mod == 0)
    return sorted(r.shingle for r in shingles(bench, n=n).select("shingle").collect())


def streaming_contamination(
    doc_stream: DataFrame,
    bench_shingles: list[str],
    n: int = 3,
    bench_mod: int = 20,
    num: int = 1,
    den: int = 10,
) -> DataFrame:
    """Streaming twin of :func:`..operators.dedup.contamination`:
    (doc_id, n_shingles, n_hits, contaminated) per streamed candidate
    document, same integer ratio test, same shingle expression
    (:func:`..operators.dedup.shingle_array` is shared code, not a
    re-implementation)."""
    dist = F.array_distinct(shingle_array(n))
    hits = F.size(F.array_intersect(dist, F.lit(bench_shingles)))
    out = (
        doc_stream.filter(F.col("doc_id") % bench_mod != 0)
        .select(
            "doc_id",
            F.size(dist).alias("n_shingles"),
            hits.alias("n_hits"),
        )
    )
    return out.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        (F.col("n_hits") * den >= F.col("n_shingles") * num)
        .cast("int")
        .alias("contaminated"),
    )


def streaming_curation_report(
    doc_stream: DataFrame,
    bench_shingles: list[str],
    min_tokens: int | None = None,
    rep_num: int | None = None,
    rep_den: int | None = None,
    shingle_n: int = 3,
    bench_mod: int = 20,
    cont_num: int = 1,
    cont_den: int = 10,
) -> DataFrame:
    """Streaming twin of the row-local subset of
    :func:`..operators.curation.curation_report` (r5 verdict item 8):
    (doc_id, n_tokens, reasons, keep) where ``reasons`` carries the
    rules decidable from one document alone — ``contaminated``
    (benchmark shingle probe against the plan-shipped eval set),
    ``repetitive`` (duplicate-2-gram fraction via the row-local
    sorted-run counter :func:`..operators.textstats.dup_gram_counts`,
    bit-identical to the batch explode+groupBy), and ``too_short``.
    Reason strings keep the batch report's relative order, so the
    streamed report equals the batch report with the retrospective
    reasons (exact_dup / near_dup / boilerplate) stripped — test-pinned.

    The cross-corpus rules are inherently retrospective (they compare
    documents to *each other*) and stay batch jobs — the same honest
    boundary as the near-dup note in this module's docstring. Pure
    stateless projection: no watermark, no state store, exactly-once
    per document in append mode; at 100 TB/day this is the in-flight
    keep/drop gate, with the batch pass running behind it for the
    corpus-wide rules."""
    from ..operators import curation
    from ..operators.textstats import dup_gram_counts, gram_array, tokens_col

    if min_tokens is None:
        min_tokens = curation.MIN_TOKENS
    if rep_num is None:
        rep_num = curation.REP_NUM
    if rep_den is None:
        rep_den = curation.REP_DEN

    dist = F.array_distinct(shingle_array(shingle_n))
    n_hits = F.size(F.array_intersect(dist, F.lit(bench_shingles)))
    contaminated = F.when(F.col("doc_id") % bench_mod == 0, F.lit(0)).otherwise(
        (n_hits * cont_den >= F.size(dist) * cont_num).cast("int")
    )
    rep = dup_gram_counts(gram_array(2))
    flags = doc_stream.select(
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
        F.when(contaminated == 1, F.lit("contaminated")).alias("r_cont"),
        F.when(
            rep["dup_grams"] * rep_den >= rep["n_grams"] * rep_num,
            F.lit("repetitive"),
        ).alias("r_rep"),
        F.when(
            F.size(tokens_col()) < min_tokens, F.lit("too_short")
        ).alias("r_short"),
    )
    reasons = F.concat_ws(",", "r_cont", "r_rep", "r_short")
    return flags.select(
        "doc_id",
        "n_tokens",
        reasons.alias("reasons"),
        (reasons == "").cast("int").alias("keep"),
    )
