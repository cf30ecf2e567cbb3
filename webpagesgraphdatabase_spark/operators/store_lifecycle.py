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
    read_compaction_watermark,
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
    An explicit ``batch`` ≤ the watermark returns ``None``: the caller
    must treat it as a replay of an already-folded batch and no-op.

    ``allow_missing`` is for the ingest-first layouts ONLY (sq8/bin,
    whose ``ensure_*`` skeleton writes just the bucket meta — the code
    store legitimately appears with the first appended batch): a
    missing source reads as 0 and the id space starts at 1. Every
    other family's store must exist by construction (IVF lists come
    from the base build, text stats from ``ensure_text_index``), so a
    vanished source there is a partially-deleted index and the
    ``AnalysisException`` propagates instead of silently restarting
    the batch-id space over a broken store."""
    wm = read_compaction_watermark(path)
    if batch is not None:
        return None if int(batch) <= wm else int(batch)
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
    watermark — the shape every ``compact_*`` API reports."""
    before = sum(count_parquet_files(s.store) for s in substores)
    src = batch_source or substores[0].store
    prev_max = spark.read.parquet(src).agg(F.max("batch")).first()[0]
    wm = max(int(prev_max or 0), read_compaction_watermark(path))
    write_compaction_watermark(path, wm)
    for s in substores:

        def _write(tmp: str, s: SubStore = s) -> None:
            df = spark.read.parquet(s.store)
            df = (s.fold or (lambda d: d.withColumn("batch", F.lit(0))))(df)
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
