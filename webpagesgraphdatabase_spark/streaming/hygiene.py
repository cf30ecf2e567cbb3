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
