"""Shared lifecycle for at-rest index stores (r8 verdict item 6).

Four index families persist exactly-once append-able Parquet stores —
IVF lists (``similarity.ivf_index_append``), SQ8 codes
(``sq8_index_append``), packed binary signatures (``bin_index_append``)
and the three-store BM25 text index (``search.text_index_append``) —
and before this module each re-implemented the same four rituals:

1. **batch-id allocation**: ``batch=None`` allocates
   ``max(existing, compaction watermark) + 1`` from a metadata-only
   partition-column scan; an explicit ``batch`` at or below the
   watermark is a replay of a batch already folded into segment 0 and
   must NO-OP (re-appending would duplicate rows the fold kept);
2. **dynamic-overwrite append**: the batch's rows land in their own
   ``batch`` sub-partition under every touched leading partition, via a
   PER-WRITER ``partitionOverwriteMode=dynamic`` (never the session
   conf — a concurrent write in the same SparkSession must not inherit
   dynamic semantics), so a crash replay overwrites exactly its own
   partitions;
3. **watermark-first compaction**: before any fold rewrites batch ids,
   the pre-fold max batch id persists atomically
   (``_compaction_watermark.json``, temp + ``os.replace``) — crash
   after the marker but before the fold is safe, crash after the fold
   without the marker is the duplication hazard;
4. **two-rename fold**: each sub-store rewrites (relabelled to batch 0,
   or merged — the stats row sums) into a temp dir and swaps in with
   two renames, under the single-writer discipline every index
   mutation here assumes.

The four families keep their own encode/layout semantics (what a row
is, which column leads the partitioning, whether a fold merges); this
module owns the REPLAY-SAFETY state machine so the next index layout
cannot drift from it. The thin adapters live where they always did —
``similarity.py`` / ``search.py`` — and their replay/compaction tests
pin that behavior is unchanged.

Scale notes: allocation reads only the partition column (file listing,
no data); the append shuffles only the new batch; compaction is one
distributed read + per-partition coalesce per sub-store — the classic
LSM-style fold an accumulated-append store needs periodically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import (
    count_parquet_files,
    read_compaction_state,
    swap_in_rewrite,
    write_compaction_watermark,
)


def allocate_batch(
    spark,
    path: str,
    batch_source: str,
    batch: int | None,
    allow_missing: bool = False,
) -> int | None:
    """Watermark-guarded batch-id allocation for an index dir ``path``.

    ``batch=None`` → ``max(existing in batch_source, watermark) + 1``.
    An explicit ``batch`` that was already folded into segment 0
    returns ``None``: the caller must treat it as a replay and no-op.
    "Already folded" is decided by EXACT membership in the persisted
    folded-id set when the marker carries one (correct for unordered
    id spaces — the crawl loop's content-hash archive ids hash in no
    particular order, and a NEW low id arriving after a fold must
    append, not silently no-op); a legacy watermark-only marker keeps
    the ``batch ≤ watermark`` reading, which is equivalent for the
    monotonic micro-batch id spaces that wrote it.

    ``allow_missing`` is for the ingest-first layouts ONLY (sq8/bin,
    whose ``ensure_*`` skeleton writes just the bucket meta — the code
    store legitimately appears with the first appended batch): a
    missing source reads as 0 and the id space starts at 1. Every
    other family's store must exist by construction (IVF lists come
    from the base build, text stats from ``ensure_text_index``), so a
    vanished source there is a partially-deleted index and the
    ``AnalysisException`` propagates instead of silently restarting
    the batch-id space over a broken store."""
    wm, folded = read_compaction_state(path)
    if batch is not None:
        b = int(batch)
        if folded is not None:
            return None if b in folded else b
        return None if b <= wm else b
    if allow_missing:
        from pyspark.errors import AnalysisException

        try:
            prev = (
                spark.read.parquet(batch_source).agg(F.max("batch")).first()[0]
            )
        except AnalysisException:
            prev = 0
    else:
        prev = spark.read.parquet(batch_source).agg(F.max("batch")).first()[0]
    return max(int(prev or 0), wm) + 1


def dynamic_append(
    df: DataFrame, store: str, partition_cols: tuple[str, ...]
) -> None:
    """The exactly-once append write: dynamic partition overwrite keyed
    on the batch id, configured PER WRITER (see module docstring)."""
    df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(*partition_cols).parquet(store)


def ensure_bucket_meta(spark, path: str, n_buckets: int) -> None:
    """Create the one-row ``meta.parquet`` (bucket count) of a hash-
    bucketed store if ``path`` holds none — the ingest-first shape
    shared by the SQ8 and binary layouts: a crawl/stream sink can
    append exactly-once batches into an index that never had a base
    build. No-op when meta already exists."""
    import os

    if os.path.isdir(f"{path}/meta.parquet"):
        return
    spark.range(1).select(
        F.lit(int(n_buckets)).alias("n_buckets")
    ).write.mode("overwrite").parquet(f"{path}/meta.parquet")


@dataclass(frozen=True)
class SubStore:
    """One foldable Parquet dir of an index: ``store`` is the full
    path (``.../name.parquet``), ``partition_cols`` the fold-time
    partitioning, ``fold`` the frame transform (default: relabel every
    row to batch 0), ``layout`` an optional pre-write repartition/
    coalesce shaping."""

    store: str
    partition_cols: tuple[str, ...]
    fold: Callable[[DataFrame], DataFrame] | None = None
    layout: Callable[[DataFrame], DataFrame] | None = None


def compact_store(
    spark, path: str, substores: list[SubStore], batch_source: str | None = None
) -> dict:
    """The watermark-first, two-rename fold over an index's sub-stores.
    Returns the before/after parquet file counts and the persisted
    watermark — the shape every ``compact_*`` API reports.

    The default fold relabels to segment 0 ONLY rows whose batch id
    appears in ``batch_source`` — the store's commit record. A sub-
    store partition whose id the source lacks is a crash leftover (a
    round that appended its frontier but died before its ledger row;
    an index batch that landed postings but not stats): folding it
    would freeze those rows in segment 0 where the crash RETRY — which
    re-allocates the same id and dynamic-overwrites its own partition
    — could never replace them, duplicating rows and breaking replay
    idempotence. Left in place, the retry's overwrite supersedes them
    exactly."""
    before = sum(count_parquet_files(s.store) for s in substores)
    src = batch_source or substores[0].store
    # the ids being folded, taken from the batch SOURCE: for a plain
    # index that is every stored id; for a ledger-anchored state store
    # it is exactly the COMMITTED ids (an uncommitted partition a crash
    # left behind stays out of the set, so its retry still appends)
    ids = [
        int(r[0])
        for r in spark.read.parquet(src).select("batch").distinct().collect()
        if r[0] is not None
    ]
    prev_wm, prev_folded = read_compaction_state(path)
    wm = max(max(ids, default=0), prev_wm)
    # {0} always folds: segment 0 is the fold target, so a replayed
    # "batch 0" must no-op after any fold regardless of id space
    folded = (set(prev_folded) if prev_folded else set()) | set(ids) | {0}
    write_compaction_watermark(path, wm, folded)
    # committed-only default relabel (see docstring). isin over the
    # committed-id list: one literal per folded batch — compaction runs
    # long before any store accumulates enough batches for the IN list
    # to matter, and the fold is a rare maintenance pass besides
    def _committed_to_zero(d: DataFrame) -> DataFrame:
        if not ids:
            return d
        return d.withColumn(
            "batch",
            F.when(F.col("batch").isin(ids), F.lit(0)).otherwise(
                F.col("batch")
            ),
        )

    for s in substores:

        def _write(tmp: str, s: SubStore = s) -> None:
            df = spark.read.parquet(s.store)
            df = (s.fold or _committed_to_zero)(df)
            if s.layout is not None:
                df = s.layout(df)
            df.write.mode("overwrite").partitionBy(*s.partition_cols).parquet(
                tmp
            )

        swap_in_rewrite(
            _write, s.store, s.store[: -len(".parquet")] + ".compact.tmp"
        )
    return {
        "files_before": before,
        "files_after": sum(count_parquet_files(s.store) for s in substores),
        "watermark": wm,
    }
