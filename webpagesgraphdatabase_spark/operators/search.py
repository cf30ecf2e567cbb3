"""BM25 ranked retrieval over the ``documents`` table.

The reference serves keyword lookups over its graph (HAS_KEYWORD
traversals, ``main.py:330-345``); the corpus-scale twin is ranked
text retrieval. This module implements Okapi BM25 (Robertson et al.,
TREC-3; the Lucene-default ``ln(1 + (N - df + .5)/(df + .5))`` idf
form) in three shapes:

- :func:`bm25_topk` — a literal query against the corpus with **zero
  extra shuffles**: per-term tf and document length are row-local
  array algebra, the corpus statistics (N, avgdl, per-term df) are ONE
  partial-aggregated one-row frame broadcast back, scoring is a fixed
  explicit sum (stable float order → engine-exact, oracle-checkable),
  and the top-k is a TakeOrdered with a total-order tie-break — never
  a global sort.
- :func:`bm25_search` — a *batch* of queries (query_id, term rows):
  postings are built by explode + semi-join on the (broadcast) query
  vocabulary so only matching tokens ever shuffle; per-query top-k by
  bounded window.
- :func:`build_text_index` / :func:`bm25_from_index` — the index-at-
  rest serving path: postings Parquet hash-bucketed by term so a query
  reads only its terms' buckets (partition pruning), exactly like the
  IVF index layout in ``similarity.py``.

Scale shape at 100 TB: the one corpus-stats aggregate is map-side
combined into a single row; postings shuffles carry (term, doc_id,
tf) — never text; the bucketed index bounds a query's read to
|terms| buckets of ~1/n_buckets of the postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tokenize import Tokenizer, whitespace_tokens

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _idf(n_docs, df):
    # Lucene/Robertson idf: always positive, df=N safe
    return F.log(
        F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    )


def _tf_weight(tf, dl, avgdl, k1: float, b: float):
    return (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score) for every document matching ≥1 query term.

    Exactly one shuffle (the one-row stats aggregate): tf_t and dl are
    row-local ``size(filter(...))`` algebra, the scalars come back via
    a broadcast 1-row crossJoin, and the score is an explicit
    fixed-order sum so both engines add the same doubles in the same
    order."""
    if not query_terms:
        raise ValueError("need at least one query term")
    tokenizer = tokenizer or whitespace_tokens
    toks = tokenizer("text")

    def _matches(term: str):
        # single-parameter lambda ONLY: a 2-arg lambda (even with a
        # default) dispatches to the (element, index) HOF overload
        lit = F.lit(term)
        return lambda t: t == lit

    tf_cols = [
        F.size(F.filter(toks, _matches(term))).alias(f"tf_{i}")
        for i, term in enumerate(query_terms)
    ]
    per = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        *tf_cols,
    )
    stats = per.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        term_score = F.when(
            F.col(f"tf_{i}") > 0,
            _idf(F.col("n_docs"), F.col(f"df_{i}"))
            * _tf_weight(
                F.col(f"tf_{i}").cast("double"),
                F.col("dl").cast("double"),
                F.col("avgdl"),
                k1,
                b,
            ),
        ).otherwise(F.lit(0.0))
        score = term_score if score is None else score + term_score
    matched = sum(
        (F.col(f"tf_{i}") > 0).cast("int") for i in range(len(query_terms))
    )
    return scored.filter(matched > 0).select("doc_id", score.alias("score"))


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(rank, doc_id, score) — top-``k`` by (score desc, doc_id asc):
    a total order, executed as TakeOrdered (no global sort)."""
    scored = bm25_scores(docs, query_terms, k1, b, tokenizer, id_col)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch retrieval: ``queries`` is (query_id, term) rows; returns
    (query_id, rank, doc_id, score), top-``k`` per query.

    Postings = explode(tokens) semi-joined against the broadcast query
    vocabulary BEFORE the tf aggregation, so the only token-level
    shuffle carries matching (doc_id, term) pairs. The per-query top-k
    window partitions by query_id; its input is already collapsed to
    one row per (query_id, doc_id)."""
    tokenizer = tokenizer or whitespace_tokens
    vocab = queries.select("term").distinct()
    per = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenizer("text")).alias("dl"),
        tokenizer("text").alias("toks"),
    )
    stats = per.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    postings = (
        per.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(vocab), "term")
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_t = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            (
                _idf(F.col("n_docs"), F.col("df"))
                * _tf_weight(
                    F.col("tf"), F.col("dl").cast("double"), F.col("avgdl"), k1, b
                )
            ).alias("term_score"),
        )
        .join(F.broadcast(queries.select("query_id", "term").distinct()), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# --------------------------------------------------------------------------
# index at rest: hash-bucketed postings, pruned reads
# --------------------------------------------------------------------------


def _index_parts(docs, n_buckets, tokenizer, id_col, batch):
    per = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokenizer("text")).alias("dl"),
        tokenizer("text").alias("toks"),
    )
    postings = (
        per.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("double").alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        .withColumn("batch", F.lit(int(batch)))
    )
    # sum_dl (not avgdl) so batch stats MERGE exactly: the global
    # avgdl is one integer-sum division, identical to the live path's
    stats = per.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        F.lit(n_buckets).alias("n_buckets"),
    ).withColumn("batch", F.lit(int(batch)))
    lens = per.select("doc_id", "dl").withColumn("batch", F.lit(int(batch)))
    return postings, stats, lens


def build_text_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> None:
    """Persist a BM25 index: postings Parquet partitioned by
    ``(bucket, batch)`` with ``bucket = pmod(xxhash64(term),
    n_buckets)`` (a query scans only its terms\' buckets —
    PartitionFilters, like the IVF list layout) and the base build as
    batch 0, plus per-batch doc lengths and corpus stats so
    :func:`text_index_append` can grow all three exactly-once."""
    tokenizer = tokenizer or whitespace_tokens
    postings, stats, lens = _index_parts(docs, n_buckets, tokenizer, id_col, 0)
    postings.write.mode("overwrite").partitionBy("bucket", "batch").parquet(
        f"{path}/postings.parquet"
    )
    lens.write.mode("overwrite").partitionBy("batch").parquet(
        f"{path}/doclens.parquet"
    )
    stats.write.mode("overwrite").partitionBy("batch").parquet(
        f"{path}/stats.parquet"
    )


def ensure_text_index(spark, path: str, n_buckets: int = 64) -> None:
    """Create an EMPTY :func:`build_text_index` layout if ``path``
    holds none — the ingest-first shape: a crawl/stream sink can
    :func:`text_index_append` exactly-once batches into an index that
    never had a base build. Writes one zero-stats batch-0 row (n_docs
    0, sum_dl 0 — merges as identity under the integer-sum stats
    discipline); postings/doclens stores appear with the first
    appended batch. No-op when stats already exist."""
    import os

    if os.path.isdir(f"{path}/stats.parquet"):
        return
    spark.createDataFrame(
        [(0.0, 0, int(n_buckets), 0)],
        "n_docs double, sum_dl long, n_buckets int, batch int",
    ).write.mode("overwrite").partitionBy("batch").parquet(
        f"{path}/stats.parquet"
    )


def text_index_append(
    docs: DataFrame,
    path: str,
    batch: int | None = None,
    tokenizer: Tokenizer | None = None,
    id_col: str = "doc_id",
) -> None:
    """Incrementally index new documents — the same exactly-once
    discipline as the IVF/SQ8 ingests: the batch\'s postings, doc
    lengths, and stats row each land in their own ``batch`` partition
    via DYNAMIC partition overwrite keyed on the batch id, so a crash
    replay overwrites exactly its own partitions. Queries see exact
    global statistics because batch stats carry (n_docs, sum_dl) and
    merge by integer addition. Callers own doc_id uniqueness across
    batches (re-indexing a changed doc is a replace of its batch, not
    an upsert)."""
    from .store_lifecycle import allocate_batch, dynamic_append

    spark = docs.sparkSession
    stats0 = spark.read.parquet(f"{path}/stats.parquet")
    n_buckets = int(stats0.first()["n_buckets"])
    batch = allocate_batch(spark, path, f"{path}/stats.parquet", batch)
    if batch is None:
        # replay of a batch already folded into segment 0 by
        # compact_text_index — re-appending would double its postings,
        # doc lengths, AND corpus stats (scores would silently drift)
        return
    tokenizer = tokenizer or whitespace_tokens
    postings, stats, lens = _index_parts(
        docs, n_buckets, tokenizer, id_col, batch
    )
    dynamic_append(postings, f"{path}/postings.parquet", ("bucket", "batch"))
    dynamic_append(lens, f"{path}/doclens.parquet", ("batch",))
    dynamic_append(stats, f"{path}/stats.parquet", ("batch",))


def compact_text_index(spark, path: str) -> dict:
    """Fold an ingest-fragmented BM25 index back into one segment —
    the :func:`~.similarity.compact_ivf_lists` discipline for the
    three-store text layout: postings and doclens relabel to batch 0
    (doc_id uniqueness across batches is the append contract, so no
    merge is needed), the per-batch stats rows SUM into one batch-0 row
    (they merge by integer addition by design), and the pre-fold max
    batch id persists as the shared watermark FIRST so a checkpoint
    replay of a folded batch no-ops in :func:`text_index_append`
    instead of double-counting postings and corpus stats. Query scores
    are bit-identical before and after (test-pinned)."""
    from .store_lifecycle import SubStore, compact_store

    def fold_stats(df):
        return (
            df.agg(
                F.sum("n_docs").cast("double").alias("n_docs"),
                F.sum("sum_dl").cast("long").alias("sum_dl"),
                F.first("n_buckets").cast("int").alias("n_buckets"),
            ).withColumn("batch", F.lit(0))
        )

    return compact_store(
        spark,
        path,
        [
            SubStore(
                f"{path}/postings.parquet",
                ("bucket", "batch"),
                layout=lambda d: d.repartition("bucket"),
            ),
            SubStore(
                f"{path}/doclens.parquet",
                ("batch",),
                layout=lambda d: d.coalesce(1),
            ),
            SubStore(
                f"{path}/stats.parquet",
                ("batch",),
                fold=fold_stats,
                layout=lambda d: d.coalesce(1),
            ),
        ],
        batch_source=f"{path}/stats.parquet",
    )


def bm25_from_index(
    spark: SparkSession,
    path: str,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """Serve a query from a :func:`build_text_index` directory: the
    postings scan is filtered to the query terms' buckets (partition-
    pruned) then to the terms themselves (row-group pushdown).

    ``allowed`` (any frame with a ``doc_id`` column) restricts results
    to that subset via a semi-join on the hit postings — CORPUS-level
    idf/avgdl are kept (the standard filtered-retrieval contract: the
    filter narrows who can be returned, not what the collection
    statistics are), so the filtered top-k equals the allowed-only
    prefix of the unfiltered full ranking — test-pinned."""
    raw_stats = spark.read.parquet(f"{path}/stats.parquet")
    n_buckets = int(raw_stats.first()["n_buckets"])
    # merge per-batch stats exactly: avgdl = Σ sum_dl / Σ n_docs (the
    # identical integer-sum division the live path computes)
    stats = raw_stats.agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
    )
    postings = spark.read.parquet(f"{path}/postings.parquet")
    terms = list(dict.fromkeys(query_terms))
    # xxhash64 is a JVM function: evaluate the |terms| bucket ids with
    # one constant-folded 1-row job, then prune with literals so the
    # scan carries PartitionFilters (bounded collect: |terms| ints)
    buckets = {
        r["b"]
        for r in spark.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets))
                        for t in terms
                    ]
                )
            ).alias("b")
        )
        .collect()
    }
    hit = postings.filter(
        F.col("bucket").isin(*buckets) & F.col("term").isin(*terms)
    )
    # df comes from the UNfiltered postings (corpus statistics); the
    # allowed semi-join then narrows the scoring candidates only. The
    # join keys compare as strings so an int-keyed filter works
    # against a url-keyed index and vice versa — the hit set is
    # already term-pruned, so the cast costs nothing that matters
    df_t = hit.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    if allowed is not None:
        a = allowed.select(
            F.col("doc_id").cast("string").alias("_allowed_doc")
        ).distinct()
        hit = hit.join(
            a,
            F.col("doc_id").cast("string") == F.col("_allowed_doc"),
            "left_semi",
        )
    scored = (
        hit.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats.select("n_docs", "avgdl")))
        .select(
            "doc_id",
            (
                _idf(F.col("n_docs"), F.col("df"))
                * _tf_weight(
                    F.col("tf"), F.col("dl").cast("double"), F.col("avgdl"), k1, b
                )
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "score")
    )


# --- hybrid retrieval: reciprocal-rank fusion -----------------------

RRF_K = 60


def rrf_fuse(
    ranked: list[DataFrame],
    rrf_k: int = RRF_K,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of any number of per-query ranked lists: each input is (query_id,
    doc_id, rank) rows; the fused score of a document is
    Σ_lists 1/(rrf_k + rank), summed only over lists that retrieved
    it. Returns (query_id, rank, doc_id, rrf_score), top-``topk`` per
    query by (score desc, doc_id asc).

    This is how BM25 and vector ANN compose into hybrid search without
    score calibration — ranks are scale-free, so a text leg whose
    scores live in [0, 30] and a cosine leg in [-1, 1] fuse cleanly.

    Scale shape: one union (no join between the legs), one
    partial-aggregatable groupBy on (query_id, doc_id), and the final
    per-query window's input is already collapsed to one row per
    (query, doc) with ≤ Σ|leg top-k| rows per query — never the
    corpus. Float determinism: each addend 1/(rrf_k + rank) is an
    exact double of an integer expression; the sum runs over ≤ a few
    addends per (query, doc) via SUM whose order can vary, but all
    addends are positive with identical magnitude ranges — and the
    oracle-checked registry leg fuses exactly two lists, where a + b
    is order-insensitive in IEEE754."""
    if not ranked:
        raise ValueError("need at least one ranked list")
    u = None
    for leg in ranked:
        part = leg.select(
            "query_id",
            "doc_id",
            (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank").cast("double"))).alias(
                "contrib"
            ),
        )
        u = part if u is None else u.unionByName(part)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "doc_id", "rrf_score")
    )
