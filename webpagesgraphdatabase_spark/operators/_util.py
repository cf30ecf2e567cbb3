"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition a small-file source across the cluster's cores.

    The documents/embeddings tables arrive as one parquet file → one
    input split, but the per-row work downstream (shingle explosion,
    16-way minhash, BLAS blocks, Python UDF batches) is CPU-bound, so a
    single split serializes it on one core (measured 3.6 s → 0.5 s for
    the sf0.1 shingle explode). The shuffle moves only the raw rows —
    trivially small next to the derived work. On a real cluster the same
    applies whenever upstream produced few/large files; matching
    ``spark.sql.files.maxPartitionBytes`` to derived (not stored) row
    cost is the alternative knob.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
