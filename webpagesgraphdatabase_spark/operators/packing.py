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


def _chunk_exprs(chunk_tokens: int, overlap: int, tokenizer: Tokenizer):
    """(n, starts, texts) column expressions for the sliding-window
    chunk layout of the ``text`` column — all row-local array algebra
    (sequence → filter → transform/slice), zero shuffle, codegen."""
    toks = tokenizer("text")
    n = F.size(toks)
    stride = chunk_tokens - overlap
    # window starts at 0, stride apart; a tail start whose window adds
    # no tokens beyond the previous window's end (prev covers up to
    # s + overlap) is dropped; empty docs produce no starts
    starts = F.filter(
        F.sequence(
            F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
        ),
        lambda s: (n > F.lit(0))
        & ((s == F.lit(0)) | (s + F.lit(overlap) < n)),
    )
    texts = F.transform(
        starts,
        lambda s: F.array_join(
            F.slice(toks, s + F.lit(1), chunk_tokens), " "
        ),
    )
    return n, starts, texts


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the RAG/embedding-pipeline
    staple: (doc_id, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_text), windows of ``chunk_tokens`` tokens every
    ``chunk_tokens - overlap`` positions, so consecutive chunks share
    ``overlap`` tokens of context. The final window is kept only if it
    adds tokens beyond the previous window's coverage (no chunk that is
    a strict suffix-duplicate of its neighbor); docs with no tokens
    produce no chunks.

    Scale shape: entirely row-local array algebra (sequence → filter →
    slice/array_join) followed by one posexplode — no shuffle, no UDF,
    stream-safe like the tokenizers it builds on. Deterministic and
    engine-portable: the gate leg (:func:`chunk_stats`) hash-checks the
    full layout against DuckDB."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    tokenizer = tokenizer or whitespace_tokens
    n, starts, texts = _chunk_exprs(chunk_tokens, overlap, tokenizer)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n"),
        starts.alias("starts"),
        texts.alias("texts"),
    )
    return base.select(
        "doc_id",
        "n",
        F.posexplode(F.arrays_zip("starts", "texts")).alias(
            "chunk_idx", "z"
        ),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("z.starts").cast("long").alias("chunk_start"),
        F.least(F.lit(chunk_tokens), F.col("n") - F.col("z.starts"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.col("z.texts").alias("chunk_text"),
    )


def chunk_stats(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Row-local fingerprint of :func:`chunk_documents`' layout —
    (doc_id, n_chunks, chunk_fp) with ``chunk_fp`` the md5 of the
    '|'-joined chunk texts in order. One row per input doc (empty docs
    read n_chunks=0), zero shuffle — the oracle-gate leg."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    tokenizer = tokenizer or whitespace_tokens
    _, starts, texts = _chunk_exprs(chunk_tokens, overlap, tokenizer)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(starts).cast("long").alias("n_chunks"),
        F.md5(F.array_join(texts, "|")).alias("chunk_fp"),
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


#: sentences = maximal runs of non-terminators plus their trailing
#: terminator run; no lookaround, so the same pattern runs on RE2
_SENTENCE_RE = "[^.!?]+[.!?]*"


def split_sentences(text_col: str = "text"):
    """array<string> of trimmed, non-empty rule-based sentences:
    terminator runs ([.!?]+) end a sentence. Abbreviation-blind by
    design ("Dr. Smith" splits) — the honest rule-based contract;
    row-local codegen, usable as a chunking unit."""
    raw = F.regexp_extract_all(F.col(text_col), F.lit(_SENTENCE_RE), F.lit(0))
    return F.filter(F.transform(raw, lambda s: F.trim(s)), lambda s: s != "")


def sentence_chunks(
    docs: DataFrame,
    max_tokens: int = 64,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence-bounded chunking — the RAG alternative to the fixed
    sliding window (:func:`chunk_documents`): sentences pack greedily
    into chunks of ≤ ``max_tokens`` tokens without splitting a
    sentence (a single over-long sentence becomes its own chunk).
    Returns (doc_id, chunk_idx, n_sentences, n_chunk_tokens,
    chunk_text).

    Chunk assignment is the running token count's integer division by
    the budget — the standard one-pass approximation of greedy
    bin-packing (a chunk may straddle a budget boundary mid-sentence
    accumulation but never splits a sentence). Shape: one posexplode,
    one per-doc window (bounded by the doc's own sentence count), one
    keyed reassembly groupBy — no global sort."""
    from pyspark.sql import Window

    tokenizer = tokenizer or whitespace_tokens
    sent = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(split_sentences("text")).alias("sent_idx", "sentence"),
    ).withColumn("n_tok", F.size(tokenizer("sentence")))
    w = Window.partitionBy("doc_id").orderBy("sent_idx")
    assigned = sent.withColumn(
        "chunk_idx",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(max_tokens))
        .cast("long"),
    )
    return (
        assigned.groupBy("doc_id", "chunk_idx")
        .agg(
            F.count("*").cast("long").alias("n_sentences"),
            F.sum("n_tok").cast("long").alias("n_chunk_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sent_idx", "sentence"))),
                    lambda s: s["sentence"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
