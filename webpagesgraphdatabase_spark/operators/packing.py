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
