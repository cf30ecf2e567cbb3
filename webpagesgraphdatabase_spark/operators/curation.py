"""Corpus curation report — the end-to-end keep/drop pass a
training-data pipeline runs over a raw corpus, composed from the
individually-oracle-checked operators:

- too short (token count, :func:`..operators.textstats.token_counts`),
- repetitive (Gopher duplicate-2-gram fraction,
  :func:`..operators.textstats.repetition`),
- benchmark-contaminated (n-gram collision probe,
  :func:`..operators.dedup.contamination`),
- exact duplicate (content-hash dedup,
  :func:`..operators.dedup.dedup_exact`),
- near duplicate (MinHash → LSH → Jaccard verify → connected
  components, :func:`..operators.dedup.dedup_clusters`),
- boilerplate (CCNet-style segment dedup: fraction of a document's
  segments already seen in earlier documents,
  :func:`..operators.dedup.paragraph_dedup`).

One row per document: the drop reasons that fired (sorted, stable) and
the final keep flag. Every threshold is an exact integer ratio and
every flag is engine-portable, so the whole composition is reproduced
bit-for-bit by the DuckDB oracle in the registry.

Scale shape: five independent per-doc annotation DataFrames, each with
the scale-safe plan already audited for its operator (broadcast
contamination probe, bucketed LSH, partial-agg rollups), joined back
on ``doc_id`` — co-partitioned single-key equi-joins. Nothing here
adds a shuffle beyond the component operators' own; the canonical-
keeper rule (drop only non-canonical cluster members) keeps exactly
one survivor per duplicate cluster at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textstats

#: Drop documents with fewer whitespace tokens than this (Gopher's
#: minimum-word-count gate, scaled to this corpus).
MIN_TOKENS = 5

#: Drop when dup_grams/n_grams ≥ REP_NUM/REP_DEN — Gopher's
#: duplicate-2-gram-fraction bound (0.20, Rae et al. 2021 table A1),
#: compared in integers.
REP_NUM, REP_DEN = 1, 5

#: Drop when n_dropped_segments/n_segments ≥ BOILER_NUM/BOILER_DEN —
#: a document that is mostly segments already seen elsewhere is
#: cross-document boilerplate even when no whole-document dup rule
#: fires (the CCNet paragraph-dedup keep/drop consequence, integerized).
BOILER_NUM, BOILER_DEN = 3, 5


def curation_report_with_audit(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    rep_num: int = REP_NUM,
    rep_den: int = REP_DEN,
    max_bucket: int | None = dedup.DEFAULT_MAX_BUCKET,
    persist_shingles: bool = False,
    checkpoint_dir: str | None = None,
    hasher: str = "md5",
    boiler_num: int = BOILER_NUM,
    boiler_den: int = BOILER_DEN,
) -> tuple[DataFrame, DataFrame]:
    """:func:`curation_report` plus the LSH degenerate-bucket audit as a
    second DataFrame — (n_dropped_buckets, n_dropped_rows, max_bucket),
    one row — so the cap that bounds the near-dup candidate join is
    observable where it's consumed (r3 verdict item 7). The audit is
    built over the same shingle table as the report, but by default the
    sharing is by plan reference only — evaluating the audit re-scans
    and re-shingles the corpus. Set ``persist_shingles=True`` (or
    ``checkpoint_dir``) to materialize the shingle table once so
    observing the cap adds no second corpus scan."""
    return _curation(
        docs, min_tokens, rep_num, rep_den, max_bucket,
        persist_shingles, checkpoint_dir, hasher, boiler_num, boiler_den,
    )


def curation_report(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    rep_num: int = REP_NUM,
    rep_den: int = REP_DEN,
    max_bucket: int | None = dedup.DEFAULT_MAX_BUCKET,
    persist_shingles: bool = False,
    checkpoint_dir: str | None = None,
    hasher: str = "md5",
    boiler_num: int = BOILER_NUM,
    boiler_den: int = BOILER_DEN,
) -> DataFrame:
    """(doc_id, n_tokens, reasons, keep): ``reasons`` is the
    comma-joined, fixed-order list of drop rules that fired
    (``boilerplate,contaminated,exact_dup,near_dup,repetitive,
    too_short`` order — alphabetical, so the string is deterministic),
    ``keep`` is 1 iff none fired.

    Documents in the benchmark slice (``contamination``'s holdout) are
    never flagged contaminated — they *are* the benchmark. Exact
    duplicates keep their min-id representative (``keep_id``); near-dup
    clusters keep their canonical member, exactly the keeper rules of
    the underlying operators.
    """
    report, _ = _curation(
        docs, min_tokens, rep_num, rep_den, max_bucket,
        persist_shingles, checkpoint_dir, hasher, boiler_num, boiler_den,
    )
    return report


def _curation(
    docs: DataFrame,
    min_tokens: int,
    rep_num: int,
    rep_den: int,
    max_bucket: int | None,
    persist_shingles: bool,
    checkpoint_dir: str | None,
    hasher: str = "md5",
    boiler_num: int = BOILER_NUM,
    boiler_den: int = BOILER_DEN,
) -> tuple[DataFrame, DataFrame]:
    # One shingle definition feeds both shingle consumers (the
    # contamination probe and the LSH→Jaccard near-dup pass). By
    # default the table is shared by *reference* — recompute per
    # consumer, which benchmarks faster at small SF where the narrow
    # rebuild is cheaper than a materialization barrier. At cluster
    # scale the corpus scan dominates, so shingle once:
    # ``checkpoint_dir`` writes the table to Parquet and re-reads it
    # (cuts lineage; survives executor loss; both consumers scan the
    # checkpoint, not ``documents``), while ``persist_shingles`` caches
    # it in executor memory/disk (same single-computation property,
    # cache-lifetime bound to the session; caller unpersists).
    sh = dedup.shingles(docs)
    if checkpoint_dir is not None:
        path = checkpoint_dir.rstrip("/") + "/curation_shingles.parquet"
        sh.write.mode("overwrite").parquet(path)
        sh = docs.sparkSession.read.parquet(path)
    elif persist_shingles:
        sh = sh.persist()
    tok = textstats.token_counts(docs).select("doc_id", "ws_tokens")
    rep = textstats.repetition(docs).select("doc_id", "n_grams", "dup_grams")
    cont = dedup.contamination(docs, sh=sh).select("doc_id", "contaminated")
    exact = dedup.dedup_exact(docs).select("text_hash", "keep_id")
    near = dedup.dedup_clusters(
        docs, sh=sh, max_bucket=max_bucket, hasher=hasher
    ).select("doc_id", "canon_id")
    para = dedup.paragraph_dedup(docs).select("doc_id", "n_segs", "n_dropped")

    ann = (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .join(tok, "doc_id")
        .join(rep, "doc_id")
        .join(cont, "doc_id", "left")
        .join(exact, "text_hash")
        .join(near, "doc_id", "left")
        .join(para, "doc_id")
    )
    flags = ann.select(
        "doc_id",
        F.col("ws_tokens").alias("n_tokens"),
        F.when(
            (F.col("n_segs") > 0)
            & (F.col("n_dropped") * boiler_den >= F.col("n_segs") * boiler_num),
            F.lit("boilerplate"),
        ).alias("r_boiler"),
        F.when(F.coalesce(F.col("contaminated"), F.lit(0)) == 1, F.lit("contaminated")).alias("r_cont"),
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("exact_dup")).alias("r_exact"),
        F.when(
            F.col("canon_id").isNotNull() & (F.col("doc_id") != F.col("canon_id")),
            F.lit("near_dup"),
        ).alias("r_near"),
        F.when(
            F.col("dup_grams") * rep_den >= F.col("n_grams") * rep_num,
            F.lit("repetitive"),
        ).alias("r_rep"),
        F.when(F.col("ws_tokens") < min_tokens, F.lit("too_short")).alias("r_short"),
    )
    # concat_ws skips NULLs in both engines — the fired reasons join
    # into one stable string with no filter step
    reasons = F.concat_ws(
        ",", "r_boiler", "r_cont", "r_exact", "r_near", "r_rep", "r_short"
    )
    report = flags.select(
        "doc_id",
        "n_tokens",
        reasons.alias("reasons"),
        (reasons == "").cast("int").alias("keep"),
    )
    audit = dedup.lsh_dropped_buckets(
        sh, max_bucket=max_bucket, hasher=hasher
    ).agg(
        F.count("*").alias("n_dropped_buckets"),
        F.coalesce(F.sum("bsz"), F.lit(0)).cast("long").alias("n_dropped_rows"),
        F.lit(-1 if max_bucket is None else max_bucket).cast("long").alias("max_bucket"),
    )
    return report, audit
