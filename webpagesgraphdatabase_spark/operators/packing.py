"""Training-sequence packing — assign documents to fixed-token-budget
training sequences, the last mile of an LLM data pipeline (corpus →
shuffled token stream → ``seq_len``-token rows).

Semantics (deterministic, engine-portable):

- the corpus is deterministically shuffled by ``md5(doc_id)`` (the
  standard content-independent shuffle; ties broken by doc_id),
- split into ``n_shards`` hash shards, and within each shard documents
  are concatenated in shuffle order into a token stream,
- a document's sequence assignment is the position of its first token:
  ``seq_id = start div seq_len``, ``seq_offset = start mod seq_len``
  (documents may straddle a boundary — the usual packing-with-overflow
  layout; a splitting packer consumes this same assignment).

Scale shape — the reason for shards: packing needs a running token
count, i.e. a window cumsum. A single global ORDER BY would funnel the
corpus through one task; real pipelines pack per shard/worker instead.
Here the window is ``PARTITION BY shard ORDER BY (md5, doc_id)`` —
``n_shards``-way parallel, each partition bounded by corpus/n_shards,
and the only shuffle is the hash partition on ``shard``. Sequence ids
are (shard, seq_id) pairs — globally unique without coordination,
exactly like per-worker output files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tokenize import Tokenizer, whitespace_tokens

SEQ_LEN = 512
N_SHARDS = 8


def pack_sequences(
    docs: DataFrame,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
    tokenizer: Tokenizer | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, shard, seq_id, seq_offset): the packed layout
    of the corpus. All arithmetic is exact integers (md5-prefix shard,
    bigint cumsum, ``div``/``mod``) so the DuckDB oracle reproduces the
    assignment bit-for-bit.

    ``tokenizer`` is any ``(text_col) -> array<string> Column`` factory
    (see :mod:`.tokenize`); only ``n_tokens = size(tokens)`` feeds the
    layout, so the shuffle/window shape is tokenizer-independent —
    whitespace (default) and regex modes stay fully oracle-checkable,
    a vocab-backed subword tokenizer plugs in without touching the
    packing algebra."""
    tokenizer = tokenizer or whitespace_tokens
    base = docs.select(
        "doc_id",
        F.size(tokenizer("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    ).withColumn(
        "shard",
        (
            F.expr("cast(conv(substr(k, 1, 7), 16, 10) as bigint)")
            % n_shards
        ).cast("int"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    return (
        base.select("doc_id", "n_tokens", "shard", start)
        .select(
            "doc_id",
            "n_tokens",
            "shard",
            F.expr(f"start div {seq_len}").cast("long").alias("seq_id"),
            (F.col("start") % seq_len).cast("long").alias("seq_offset"),
        )
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    seq_len: int = SEQ_LEN,
    n_shards: int = N_SHARDS,
    tokenizer: Tokenizer | None = None,
) -> DataFrame:
    """Materialize the packed corpus at rest — the tail of the pipeline
    that hands data to a trainer: shard-partitioned Parquet plus a
    per-shard manifest, so a 1000-worker training job can (a) map
    workers to shards by directory, (b) stream each shard in pack order
    without re-sorting, and (c) checksum what it read against what was
    written.

    Layout: ``path/shard=N/*.parquet`` with rows (doc_id, n_tokens,
    seq_id, seq_offset, text) sorted *within each file* by pack order
    (``sortWithinPartitions`` after a hash ``repartition(shard)`` — a
    per-shard local sort, never a global ORDER BY). The manifest
    (``path/_manifest``) carries per shard: document count, token and
    sequence totals, and ``docs_md5`` — md5 over the sorted doc_id
    list, an order-insensitive content fingerprint (exact-integer /
    md5 arithmetic only, so any engine can recompute it).

    Scale: one shuffle (the repartition on ``shard``; the packing
    window reuses that same partitioning), per-shard sorts bounded by
    corpus/n_shards, and the manifest aggregation is n_shards rows.
    Returns the manifest DataFrame (read back from disk, so it reflects
    what is actually at rest)."""
    packed = pack_sequences(docs, seq_len, n_shards, tokenizer)
    rows = packed.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", "n_tokens", "shard", "seq_id", "seq_offset", "text"
    )
    (
        rows.repartition("shard")
        .sortWithinPartitions("seq_id", "seq_offset", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = docs.sparkSession
    manifest = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (F.max("seq_id") + 1).alias("n_seqs"),
            F.md5(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))
                )
            ).alias("docs_md5"),
        )
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def verify_shards(spark, path: str) -> DataFrame:
    """Consistency check for a shard directory written by
    :func:`write_training_shards`: recompute every manifest column from
    the data files and anti-join against the stored manifest. Returns
    the disagreeing shards (empty DataFrame = consistent) — the
    operational pre-flight a training run does before touching 100 TB
    of shards. Cost: one scan of the shard data + a tiny join."""
    data = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (F.max("seq_id") + 1).alias("n_seqs"),
            F.md5(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))
                )
            ).alias("docs_md5"),
        )
    )
    stored = spark.read.parquet(f"{path}/_manifest")
    cols = ["shard", "n_docs", "n_tokens", "n_seqs", "docs_md5"]
    return data.select(cols).exceptAll(stored.select(cols)).unionByName(
        stored.select(cols).exceptAll(data.select(cols))
    )
