"""Deduplication operators over the ``documents`` table.

Beyond-reference extension (the reference dedups only by exact URL key:
``main.py:105-108``); these are the document-level dedup strategies a
training-data pipeline runs at 100 TB:

- :func:`dedup_exact` — hash-groupBy exact dedup.
- :func:`minhash_signatures` / :func:`lsh_candidates` — MinHash + LSH
  banding (shingle → minhash → band → bucket self-join).
- :func:`neardup_jaccard` — exact n-gram Jaccard verification of the LSH
  candidate pairs.
- :func:`simhash` — 64-bit SimHash fingerprints.
- :func:`dedup_clusters` — verified pairs → connected components →
  one canonical keeper per near-dup cluster (transitive closure).
- (embedding-cosine near-dup lives in :mod:`.similarity`.)

Determinism contract: default hashing is ``md5`` over explicit utf-8
strings so the DuckDB oracle (registry) reproduces results bit-for-bit;
no floats (Jaccard thresholds compare integer intersection/union
counts). Every MinHash/LSH entry point also takes ``hasher="xxhash64"``
— Spark's native hash as the production fast path (the md5 → hex →
decimal conversion is a real CPU tax at corpus scale); verification
stays exact either way, and the oracle-checked rows keep md5.

Scale notes:

- Shingling/minhashing is embarrassingly parallel (per-row generators,
  whole-stage codegen; no Python). The only shuffles are the
  per-(doc, perm) min aggregation (partial-agg pushes below the
  exchange) and the band-bucket self-join, which is an equi-join on
  ``(band, band_key)`` — exactly the join LSH exists to make sparse.
- A pathological bucket (many docs with identical band signature, i.e.
  true heavy duplication) makes the candidate join quadratic *within
  that bucket only*; the ``max_bucket`` cap (standard practice in
  web-scale dedup) drops degenerate buckets and is ON by default
  (:data:`DEFAULT_MAX_BUCKET`); :func:`lsh_dropped_buckets` makes the
  drops observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import spread

N_PERMS = 16
N_BANDS = 4  # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4, ~0.5 at j~0.55

#: Default degenerate-bucket cap for the LSH band self-join. A bucket of
#: b identical band-signatures contributes b·(b-1)/2 candidate pairs, so
#: mass-duplicated boilerplate (the very thing the corpus dedup targets)
#: goes quadratic *within its bucket* without a cap. 1000 bounds any
#: single bucket to ≤500k pairs — large enough that genuine near-dup
#: neighborhoods (tens of docs) are never dropped, small enough that a
#: million-copy boilerplate bucket can't produce 5·10¹¹ pairs. Docs in a
#: dropped bucket are still exact-dup-deduped by :func:`dedup_exact`
#: (identical texts — the usual cause of degenerate buckets — hash
#: equal), so the keep/drop pipeline loses no hygiene, only redundant
#: pair enumeration. Pass ``max_bucket=None`` to disable.
DEFAULT_MAX_BUCKET = 1000


def tokens_col(text_col: str = "text"):
    """Whitespace tokens of ``text_col``, empties dropped (F7 analog).
    Canonical definition lives in :mod:`.tokenize` (the pluggable-
    tokenizer module); re-exported here for the dedup/shingle callers."""
    from .tokenize import whitespace_tokens

    return whitespace_tokens(text_col)


def shingle_array(n: int = 3, text_col: str = "text"):
    """Column expression: the word ``n``-gram shingle list of
    ``text_col`` (whole text as one shingle when shorter than ``n``
    words). Row-local — usable unchanged on batch *and* streaming
    DataFrames; :func:`shingles` explodes it into the relational form."""
    words = tokens_col(text_col)
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(words, " ")))


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Distinct word ``n``-gram shingles per document: (doc_id, shingle).

    Documents shorter than ``n`` words contribute their whole text as a
    single shingle so every doc has ≥1 shingle (keeps Jaccard defined).
    """
    return (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingle_array(n)).alias("shingle"),
        )
        .distinct()
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: one surviving ``keep_id`` (min doc_id)
    per distinct text, with the duplicate count.

    Scale: a single hash-partitioned aggregation on the 32-hex digest —
    never shuffles the document bodies themselves.
    """
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


# Mersenne prime 2^61-1: (h1 + i·h2) stays < 2^61 for h1,h2 < 2^56, i ≤ 15
# — exact in int64 in any engine.
MINHASH_P = 2305843009213693951


def minhash_signatures(docs: DataFrame, n_perms: int = N_PERMS) -> DataFrame:
    """MinHash signatures: (doc_id, perm, minhash bigint).

    Permutations are simulated with Kirsch-Mitzenmacher double hashing:
    one md5 per shingle split into two 56-bit halves (h1, h2); perm i's
    hash is ``(h1 + i·h2) mod (2^61-1)``. One hash per shingle instead
    of one per (shingle, perm) — 16× less hashing — and the 16 minima
    aggregate in a single partial-agg pass (16 min columns, then
    unpivot), so there is no 16× row explosion and the only shuffle
    carries |docs| rows. All integer arithmetic, bit-identical in the
    DuckDB oracle.
    """
    return minhash_from_shingles(shingles(docs), n_perms)


#: 56-bit mask keeping (h1 + 15·h2) < 2^61 — exact int64 in any engine
_H56 = (1 << 56) - 1


def _shingle_halves(sh: DataFrame, hasher: str) -> DataFrame:
    """(doc_id, h1, h2) 56-bit hash halves per shingle.

    ``hasher="md5"`` (default everywhere) is the cross-engine
    determinism contract: the DuckDB oracle reproduces it digit for
    digit. ``hasher="xxhash64"`` is the production fast path — Spark's
    native 64-bit hash (one JVM intrinsic vs md5's full digest + hex →
    decimal conversion), with h2 drawn from a second seed column. At
    100 TB the hash is a real fraction of the shingle scan's CPU; the
    candidate *quality* is equivalent (any well-mixed hash family
    works for Kirsch-Mitzenmacher), only bit-reproducibility in
    non-Spark engines is lost — which is exactly what the oracle row
    keeps md5 for. Identical texts map to identical signatures under
    either hasher, so exact duplicates are always candidates."""
    if hasher == "md5":
        return sh.select(
            "doc_id",
            F.expr(
                "cast(conv(substr(md5(shingle), 1, 14), 16, 10) as bigint)"
            ).alias("h1"),
            F.expr(
                "cast(conv(substr(md5(shingle), 15, 14), 16, 10) as bigint)"
            ).alias("h2"),
        )
    if hasher == "xxhash64":
        return sh.select(
            "doc_id",
            F.xxhash64("shingle").bitwiseAND(F.lit(_H56)).alias("h1"),
            F.xxhash64("shingle", F.lit(1)).bitwiseAND(F.lit(_H56)).alias("h2"),
        )
    raise ValueError(f"unknown hasher {hasher!r} (md5 | xxhash64)")


def minhash_from_shingles(
    sh: DataFrame, n_perms: int = N_PERMS, hasher: str = "md5"
) -> DataFrame:
    halves = _shingle_halves(sh, hasher)
    mins = halves.groupBy("doc_id").agg(
        *[
            F.min((F.col("h1") + i * F.col("h2")) % MINHASH_P).alias(f"m{i}")
            for i in range(n_perms)
        ]
    )
    stack = ", ".join(f"{i}, m{i}" for i in range(n_perms))
    return mins.select(
        "doc_id",
        F.expr(f"stack({n_perms}, {stack}) as (perm, minhash)"),
    )


def lsh_bands(docs: DataFrame, n_perms: int = N_PERMS, n_bands: int = N_BANDS) -> DataFrame:
    """LSH band keys: (doc_id, band, band_key) where band_key hashes the
    band's minhash rows in perm order."""
    return bands_from_shingles(shingles(docs), n_perms, n_bands)


def bands_from_shingles(
    sh: DataFrame,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    hasher: str = "md5",
) -> DataFrame:
    rows_per_band = n_perms // n_bands
    sig = minhash_from_shingles(sh, n_perms, hasher)
    joined = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
            lambda s: s["minhash"].cast("string"),
        ),
        "|",
    )
    band_key = (
        F.md5(joined) if hasher == "md5" else F.xxhash64(joined).cast("string")
    )
    return (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(band_key.alias("band_key"))
    )


def lsh_candidates(
    docs: DataFrame,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Candidate near-duplicate pairs: distinct (doc_a < doc_b) sharing at
    least one LSH band bucket.

    The self-join key is (band, band_key) — high-entropy, so the join is
    sparse by construction. ``max_bucket`` (finite by default, see
    :data:`DEFAULT_MAX_BUCKET`) drops degenerate buckets — the
    web-scale guard against quadratic blowup on mass-duplicated
    boilerplate; :func:`lsh_dropped_buckets` reports what the cap
    dropped.
    """
    return lsh_candidates_from_shingles(
        shingles(docs), n_perms, n_bands, max_bucket
    )


def lsh_dropped_buckets(
    sh: DataFrame,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hasher: str = "md5",
) -> DataFrame:
    """Audit of the degenerate-bucket cap: (band, band_key, bsz) for
    every bucket the ``max_bucket`` guard drops from the candidate
    join. A curation run logs/aggregates this (it is at most a handful
    of rows — degenerate buckets are rare by construction) so the cap
    is observable, never silent. Empty when ``max_bucket`` is None."""
    bands = bands_from_shingles(sh, n_perms, n_bands, hasher)
    sizes = bands.groupBy("band", "band_key").agg(F.count("*").alias("bsz"))
    if max_bucket is None:
        return sizes.filter(F.lit(False))
    return sizes.filter(F.col("bsz") > max_bucket)


def lsh_candidates_from_shingles(
    sh: DataFrame,
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hasher: str = "md5",
) -> DataFrame:
    bands = bands_from_shingles(sh, n_perms, n_bands, hasher)
    if max_bucket is not None:
        # bucket-size guard as a window count over (band, band_key):
        # one shuffle on the same key the candidate self-join uses,
        # instead of a groupBy + equi-join back (measured ~30% faster
        # at sf0.1, identical candidate set)
        w = Window.partitionBy("band", "band_key")
        bands = (
            bands.withColumn("bsz", F.count("*").over(w))
            .filter(F.col("bsz") <= max_bucket)
            .drop("bsz")
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def neardup_jaccard(
    docs: DataFrame,
    num: int = 1,
    den: int = 2,
    candidates: DataFrame | None = None,
    sh: DataFrame | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    hasher: str = "md5",
) -> DataFrame:
    """n-gram Jaccard near-dup pairs with exact verification.

    Returns (doc_a, doc_b, inter, uni) for pairs whose shingle-set
    Jaccard ≥ num/den, compared as ``inter * den >= uni * num`` —
    integer arithmetic, so Spark and the oracle agree exactly.

    When ``candidates`` is None the LSH candidates are used (the scale
    path: verification cost is |candidates|, not |docs|²). ``sh`` lets
    a caller that already built the shingle table (e.g. a curation
    pass running several shingle consumers) share one definition — at
    cluster scale, checkpoint that table once instead of re-scanning
    the corpus per consumer. ``hasher`` selects the candidate
    generation's hash family (see :func:`_shingle_halves`) — the
    *verification* is exact set arithmetic either way, so the hash only
    moves recall at the candidate stage, never precision.
    """
    # the shingle table feeds the minhash lineage AND the verify side;
    # recomputing it (cheap narrow ops + one distinct) benchmarks faster
    # here than a persist barrier, which serializes the otherwise-
    # overlapping stages — at cluster scale, checkpoint it to the
    # warehouse instead when |docs| makes recompute dominant
    if sh is None:
        sh = shingles(docs)
    cand = (
        candidates
        if candidates is not None
        else lsh_candidates_from_shingles(sh, max_bucket=max_bucket, hasher=hasher)
    )

    # Verify via per-doc shingle *arrays*: one groupBy collects each
    # document's (already-distinct) shingle set, the small candidate
    # table is broadcast against it, and the intersection runs as
    # ``array_intersect`` inside codegen. This replaces two wide
    # shuffles of the exploded shingle table (join on doc_a, then on
    # (doc_b, shingle)) with one aggregation + two broadcast-sized
    # joins. AQE picks broadcast for the pair side at runtime; if the
    # candidate set ever outgrows broadcast (mass boilerplate), it
    # degrades to a shuffle join of |cand| rows — still never |docs|².
    arrs = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shl"))
    paired = (
        arrs.select(F.col("doc_id").alias("doc_a"), F.col("shl").alias("sha"))
        .join(F.broadcast(cand), "doc_a")
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("shl").alias("shb")),
            "doc_b",
        )
    )
    return (
        paired.select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sha", "shb")).alias("inter"),
            (F.size("sha") + F.size("shb")).alias("sum_sz"),
        )
        .withColumn("uni", F.col("sum_sz") - F.col("inter"))
        .filter(F.col("inter") * den >= F.col("uni") * num)
        .select("doc_a", "doc_b", "inter", "uni")
    )


def contamination(
    docs: DataFrame,
    n: int = 3,
    bench_mod: int = 20,
    num: int = 1,
    den: int = 10,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    ``n``-gram shingles overlap a held-out benchmark set — the standard
    pre-training hygiene pass (e.g. GPT-3 appendix C / PaLM §8: n-gram
    collision against eval sets). Returns, per *candidate* doc,
    (doc_id, n_shingles, n_hits, contaminated).

    The benchmark here is the deterministic slice ``doc_id % bench_mod
    == 0`` (stand-in for an eval-set table; any DataFrame of texts
    works via the same shingle join). ``contaminated`` is an integer
    flag from the exact ratio test ``n_hits·den ≥ n_shingles·num``
    (default ≥10% shingle overlap) — integer arithmetic so the DuckDB
    oracle matches bit-for-bit.

    Scale shape: the benchmark's distinct-shingle set is tiny relative
    to the corpus (eval sets are MBs against TBs), so the probe is a
    **broadcast** semi-join on the shingle string — the corpus-side
    scan streams map-side with no shuffle of document content; the only
    exchange is the per-doc count rollup. At 100 TB this is the same
    plan: benchmark shingles broadcast once, corpus scanned once.
    """
    if sh is None:
        sh = shingles(docs, n=n)
    bench = sh.filter(F.col("doc_id") % bench_mod == 0)
    cand = sh.filter(F.col("doc_id") % bench_mod != 0)
    bench_set = F.broadcast(bench.select("shingle").distinct())
    hits = (
        cand.join(bench_set, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    sizes = cand.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    joined = sizes.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
    )
    return joined.select(
        "doc_id",
        "n_shingles",
        "n_hits",
        (F.col("n_hits") * den >= F.col("n_shingles") * num)
        .cast("int")
        .alias("contaminated"),
    )


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document as a 64-char '0'/'1' string
    (doc_id, simhash): bit b is the sign of the token-count-weighted sum
    of ±1 votes, where token t votes by bit b of md5(t).

    Plan shape: a (token → array of 64 ±1 signs) map is computed once
    over the *distinct vocabulary* and broadcast; the per-doc vote is a
    single partial-aggregatable groupBy with 64 sum columns (the same
    column-unpivot trick as the MinHash path), so no row explosion ever
    crosses a shuffle — the exchange carries |docs| rows of 64 ints.
    No Python, no UDFs — everything stays in whole-stage codegen.
    """
    doc_tokens = (
        spread(docs).select("doc_id", F.explode(tokens_col()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = doc_tokens.select("token").distinct()
    # bit b of the 64-bit prefix of md5(token), via hex-digit arithmetic
    # (no engine-specific hex→int conversion: portable to the oracle)
    signs = vocab.select(
        "token",
        F.expr(
            "transform(sequence(0, 63), b ->"
            " (shiftright(instr('0123456789abcdef',"
            " substring(md5(token), b div 4 + 1, 1)) - 1,"
            " cast(b % 4 as int)) & 1) * 2 - 1)"
        ).alias("signs"),
    )
    votes = doc_tokens.join(F.broadcast(signs), "token").groupBy("doc_id").agg(
        *[
            F.sum(F.element_at("signs", b + 1) * F.col("cnt")).alias(f"v{b}")
            for b in range(64)
        ]
    )
    return votes.select(
        "doc_id",
        F.concat(
            *[
                F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
                for b in range(64)
            ]
        ).alias("simhash"),
    )


def simhash_near_matches(
    new_sigs: DataFrame,
    prior_sigs: DataFrame,
    bits: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """doc_ids of NEW signatures having a prior signature within
    ``bits`` Hamming distance — the Manku/Jain/Das Sarma WWW'07 scheme
    ("Detecting Near-Duplicates for Web Crawling"): split the 64-bit
    signature into ``n_bands`` bands; by pigeonhole any pair differing
    in ≤ ``bits`` < ``n_bands`` positions agrees EXACTLY on at least
    one band, so candidates come from equi-joins on (band_idx, band
    value) and only candidates pay the full 64-position comparison.
    Inputs are (doc_id, simhash) frames (:func:`simhash` output);
    returns distinct new-side doc_ids.

    Scale shape: the explode is n_bands rows per signature (signatures,
    never documents), the join key is (band_idx, 16-bit band) — ~2²⁰
    effective buckets — and the Hamming check is row-local array
    algebra. A degenerate band shared by many near-empty docs is the
    known hot key of the scheme; the per-band join still bounds work to
    true candidate pairs (Manku's tables do exactly this)."""
    if not 0 <= bits < n_bands:
        raise ValueError(
            "completeness needs bits < n_bands (pigeonhole: ≤ bits "
            "differences over n_bands bands leave one band identical)"
        )
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    band_arr = F.expr(
        f"transform(sequence(0, {n_bands - 1}),"
        f" i -> substring(simhash, i * {width} + 1, {width}))"
    )

    def explode_bands(df: DataFrame, id_name: str, sig_name: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(id_name),
            F.col("simhash").alias(sig_name),
            F.posexplode(band_arr).alias("band_idx", "band"),
        )

    cand = explode_bands(new_sigs, "new_id", "_sh_new").join(
        explode_bands(prior_sigs, "old_id", "_sh_old"),
        ["band_idx", "band"],
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("_sh_new"), ""),
                F.split(F.col("_sh_old"), ""),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    return (
        cand.filter(hamming <= bits)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )


def dedup_clusters(
    docs: DataFrame,
    num: int = 1,
    den: int = 2,
    candidates: DataFrame | None = None,
    sh: DataFrame | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    driver_max_edges: int | None = None,
    hasher: str = "md5",
) -> DataFrame:
    """Fuzzy-dedup clustering — the full near-dup dedup shape a
    training-data pipeline runs (reference has no analog; this composes
    the pipeline large corpora need): MinHash → LSH candidates → exact
    Jaccard verify (:func:`neardup_jaccard`) → connected components
    over the verified pairs → one canonical keeper per cluster.

    Returns (doc_id, canon_id, cluster_size) for every document with at
    least one verified near-duplicate, where ``canon_id`` is the
    smallest doc_id in the cluster. The keep-set of a corpus is
    "every doc not listed here, plus the listed docs with
    ``doc_id == canon_id``" — transitive closure matters: if A~B and
    B~C, naive pairwise keep-min would keep both A and C.
    ``driver_max_edges`` overrides the components union-find/superstep
    routing threshold (0 forces the distributed superstep loop — the
    path a >500k-pair corpus takes; None keeps the default).

    Scale shape: pair generation is the bucketed LSH path (never
    |docs|²); the component loop's supersteps are joins/groupBys on the
    verified-pair edge list, which is *far* smaller than the corpus
    (near-dup clusters only), with per-superstep persist/unpersist
    lineage control inherited from
    :func:`..graph.algorithms.components_from_edges`.
    """
    from ..graph.algorithms import DRIVER_MAX_EDGES, components_from_edges

    pairs = neardup_jaccard(docs, num, den, candidates, sh, max_bucket, hasher)
    comp = components_from_edges(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        driver_max_edges=(
            DRIVER_MAX_EDGES if driver_max_edges is None else driver_max_edges
        ),
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node_id").alias("doc_id"),
        F.col("component").alias("canon_id"),
        "cluster_size",
    )


#: Default segment width (in whitespace tokens) for the chunk mode of
#: :func:`doc_segments`. Roughly a sentence of web text; small enough
#: that boilerplate repeats align on segment boundaries often, large
#: enough that segments rarely collide by accident.
SEG_TOKENS = 10


def segment_array(
    mode: str = "chunk", seg_tokens: int = SEG_TOKENS, text_col: str = "text"
):
    """Column expression: the ordered segment list of ``text_col`` —
    row-local (pure codegen), so it runs unchanged on batch and
    streaming DataFrames (the :mod:`..streaming` twin shares it, same
    contract as :func:`shingle_array`)."""
    if mode == "newline":
        return F.filter(
            F.transform(F.split(F.col(text_col), r"\n"), lambda t: F.trim(t)),
            lambda t: t != "",
        )
    if mode == "chunk":
        toks = tokens_col(text_col)
        n_segs = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("int")
        return F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(1), n_segs),
                lambda i: F.array_join(
                    F.slice(toks, (i - F.lit(1)) * seg_tokens + 1, seg_tokens), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    raise ValueError(f"unknown segment mode: {mode!r}")


def doc_segments(
    docs: DataFrame,
    mode: str = "chunk",
    seg_tokens: int = SEG_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document segment table (doc_id, seg_idx, seg) — the unit of
    CCNet/RefinedWeb-style *paragraph-level* dedup.

    ``mode="newline"`` splits on line breaks (the real-web shape, where
    boilerplate headers/footers/navbars repeat verbatim across pages —
    CCNet, Wenzek et al. 2019 §4.1 dedups exactly these). The synthetic
    corpus has no newlines, so ``mode="chunk"`` (default here and in the
    gate row) segments into fixed ``seg_tokens``-token windows instead:
    same operator shape, oracle-expressible in any engine.

    Scale: segmentation is a pure per-row codegen expression (sequence +
    slice + array_join, or split) — zero shuffle; the explode is the
    only row expansion and is linear in corpus tokens.
    """
    segl = segment_array(mode, seg_tokens, text_col)
    return spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(segl).alias("seg_idx", "seg"),
    )


def paragraph_dedup(
    docs: DataFrame,
    mode: str = "chunk",
    seg_tokens: int = SEG_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide paragraph/segment dedup (CCNet-style boilerplate
    removal; reference has no analog — it stores whole pages:
    ``main.py:105-118``): every segment that already occurred in an
    earlier document position is dropped, the first occurrence (ordered
    by (doc_id, seg_idx)) is kept, and each document's surviving
    segments are reassembled in order.

    Returns one row per input document: (doc_id, n_segs, n_dropped,
    clean_text) — documents whose text segments were *all* seen before
    come back with ``clean_text = ''`` (the keep/drop decision is the
    caller's; CCNet drops them). Documents with empty text get
    ``n_segs = 0``.

    Scale shape (r6 — replaces the r5 ``row_number`` window over raw
    segment text): first occurrences come from a *partial-aggregatable*
    ``min(struct(doc_id, seg_idx, seg))`` grouped on ``(xxhash64(seg),
    length(seg))``. A segment duplicated 10⁷ times across the corpus —
    exactly the boilerplate this operator targets — is combined down to
    one candidate row per map partition before the exchange, instead of
    landing on a single window task ranked serially (the skew the LSH
    path bounds with ``DEFAULT_MAX_BUCKET``; a window has no partial
    combine, so no such bound was possible there). The hash key also
    shrinks the shuffle payload: only the one surviving first-occurrence
    struct per distinct segment carries text through the exchange; the
    duplicate copies ride as map-side-combined counts. Reassembly and
    per-doc totals are two further narrow hash aggregates on doc_id
    (both partial-aggregatable). Distinct segments sharing an
    (xxhash64, length) key would merge — at 10¹¹ distinct segments the
    128-bit composite keeps the expected collision count ≪ 1, same
    exposure the MinHash chain already documents.
    """
    segs = doc_segments(docs, mode, seg_tokens, text_col, id_col)
    keyed = segs.select(
        "doc_id",
        "seg_idx",
        "seg",
        F.xxhash64("seg").alias("seg_h"),
        F.length("seg").alias("seg_len"),
    )
    # one row per distinct segment: its globally-first (doc_id, seg_idx)
    # occurrence plus how many copies existed (struct min orders by
    # field position, matching the old window's ORDER BY doc_id, seg_idx)
    firsts = keyed.groupBy("seg_h", "seg_len").agg(
        F.min(F.struct("doc_id", "seg_idx", "seg")).alias("f"),
    )
    per_doc_kept = (
        firsts.select(F.col("f.doc_id").alias("doc_id"), "f.seg_idx", "f.seg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    per_doc_tot = segs.groupBy("doc_id").agg(F.count("*").alias("n_segs"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc_tot, "doc_id", "left")
        .join(per_doc_kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_segs"), F.lit(0)).alias("n_segs"),
            (
                F.coalesce(F.col("n_segs"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).alias("n_dropped"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def _span_windows(tok: DataFrame, window: int) -> DataFrame:
    """(doc_id, pos, wk) for every ``window``-token span: wk is the md5
    of the space-joined token run starting at pos. One per-doc window
    shuffle regardless of width — the ``window - 1`` leads share a
    single window spec, so Catalyst evaluates them in one pass."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("token")] + [
        F.lead("token", i).over(w) for i in range(1, window)
    ]
    return (
        tok.withColumn("wk", F.md5(F.concat_ws(" ", *parts)))
        .filter(F.col("pos") <= F.col("n") - window)
        .select("doc_id", "pos", "wk")
    )


def duplicated_window_stats(docs: DataFrame, window: int = 4) -> DataFrame:
    """Exact duplicated-token-span detection (the window form of Lee et
    al. 2022, arXiv:2107.06499 "Deduplicating Training Data Makes
    Language Models Better" — a distributed stand-in for their suffix
    array): every ``window``-token span is keyed by md5 of its text;
    spans whose key occurs more than once anywhere in the corpus are
    duplicated. Returns per-doc counts
    (doc_id, n_spanwin, n_dup_windows, n_foreign_dup):

    * ``n_spanwin`` — windows in the doc (``n_tokens - window + 1``;
      docs shorter than ``window`` have none and are absent),
    * ``n_dup_windows`` — windows duplicated anywhere (including
      self-repetition inside the doc),
    * ``n_foreign_dup`` — duplicated windows whose first corpus
      occurrence (min doc_id) is a DIFFERENT doc: the "this span's
      canonical copy lives elsewhere" removal signal.

    ``window`` is the span length in tokens (Lee et al. sweep 8/16 at
    character granularity; 4 is this corpus's token-level default and
    the oracle-pinned shape). Any ``window >= 2`` runs: the key is a
    chain of ``window - 1`` ``lead``s over the same per-doc window
    spec, so the plan shape (one window shuffle, one digest groupBy)
    is identical for every width.

    Scale shape: the shuffle key is the 32-hex window digest, never
    text; the global pass is a partial-aggregatable count+min per key
    (a span duplicated 10^7 times combines map-side — the
    paragraph_dedup discipline, no hot-key window rank); the mark join
    is a key-to-key equi-join back to the narrow (doc_id, wk) rows.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens_col()).alias("pos", "token"),
        F.size(tokens_col()).alias("n"),
    )
    wins = _span_windows(tok, window)
    glob = wins.groupBy("wk").agg(
        F.count("*").alias("n_occ"), F.min("doc_id").alias("first_doc")
    )
    dup = F.col("n_occ") > 1
    foreign = dup & (F.col("first_doc") != F.col("doc_id"))
    return (
        wins.join(glob, "wk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spanwin"),
            F.sum(dup.cast("long")).alias("n_dup_windows"),
            F.sum(foreign.cast("long")).alias("n_foreign_dup"),
        )
    )


def strip_duplicated_spans(docs: DataFrame, window: int = 4) -> DataFrame:
    """Remove foreign-duplicated spans from every document: tokens
    covered by any window whose first corpus occurrence is a different
    doc are dropped, and the survivors are rejoined with single spaces
    — (doc_id, deduped_text). The first-occurrence doc keeps its copy
    (Lee et al.'s keep-one policy at window granularity), so every
    duplicated span survives exactly once corpus-wide.

    Docs whose every token is covered by foreign-duplicated windows
    (e.g. an exact duplicate of an earlier doc — the operator's primary
    target) still get a row, with ``deduped_text = ""`` — the
    :func:`paragraph_dedup` contract, so consumers joining on doc_id
    never silently lose rows.

    Same shuffle discipline as :func:`duplicated_window_stats` plus a
    per-doc rebuild: covered positions explode to at most
    ``window × n_foreign_dup`` narrow rows, and the rebuild is one
    sort_array over each doc's surviving (pos, token) structs — state
    bounded by doc length, the same bound the tokenize/pack paths
    already carry.

    Cache discipline: ``wins`` is consumed twice (global first-pass +
    coverage join), so the covered-position set is eagerly
    localCheckpoint'ed inside a persist scope that closes before this
    function returns — deterministic lifetime, nothing keyed on Python
    wrapper GC (which in composed uses fires at plan-construction time,
    silently defeating the cache). The returned rebuild stays lazy; its
    one re-scan of ``tok`` is a narrow posexplode with no shuffle."""
    if window < 2:
        raise ValueError("window must be >= 2")
    tok = docs.select(
        "doc_id",
        F.posexplode(tokens_col()).alias("pos", "token"),
        F.size(tokens_col()).alias("n"),
    )
    wins = _span_windows(tok, window).persist()
    try:
        firsts = wins.groupBy("wk").agg(
            F.count("*").alias("n_occ"), F.min("doc_id").alias("first_doc")
        )
        covered = (
            wins.join(firsts, "wk")
            .filter(
                (F.col("n_occ") > 1) & (F.col("first_doc") != F.col("doc_id"))
            )
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
                ).alias("pos"),
            )
            .distinct()
            # narrow (doc_id, pos) rows, bounded by window × foreign-dup
            # count; materialized here so wins' cache can be released
            # deterministically before returning
            .localCheckpoint(eager=True)
        )
    finally:
        wins.unpersist()
    kept = tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ),
            " ",
        ).alias("deduped_text")
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("deduped_text", F.lit("")).alias("deduped_text"),
        )
    )


def cdc_dedup(docs: DataFrame, divisor: int = 16) -> DataFrame:
    """Shifted-duplicate removal: :func:`paragraph_dedup`'s keep-first
    global pass over CONTENT-DEFINED segments (``textstats.
    cdc_segments``) instead of fixed chunks. Because CDC boundaries
    depend only on local content, a document embedding another's text
    at a different token offset still produces identical interior
    segments — so the copy is detected and stripped, the case
    fixed-size segmentation structurally misses (test-pinned against
    paragraph_dedup on exactly that input).

    Same output contract as paragraph_dedup: one row per input doc,
    (doc_id, n_segs, n_dropped, clean_text), first occurrence ordered
    by (doc_id, seg_idx) kept, fully-deduped docs read ``''``.

    Scale shape: identical to paragraph_dedup's r6 form — first
    occurrences via partial-aggregatable ``min(struct(...))`` grouped
    on (xxhash64(seg), length); a segment duplicated 10⁷ times
    map-side-combines to one candidate per partition, never a hot
    window key."""
    from .textstats import cdc_segments

    segs = cdc_segments(docs, divisor).select(
        "doc_id", "seg_idx", F.col("seg_text").alias("seg")
    )
    keyed = segs.select(
        "doc_id",
        "seg_idx",
        "seg",
        F.xxhash64("seg").alias("seg_h"),
        F.length("seg").alias("seg_len"),
    )
    firsts = keyed.groupBy("seg_h", "seg_len").agg(
        F.min(F.struct("doc_id", "seg_idx", "seg")).alias("f"),
    )
    per_doc_kept = (
        firsts.select(F.col("f.doc_id").alias("doc_id"), "f.seg_idx", "f.seg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    per_doc_tot = segs.groupBy("doc_id").agg(F.count("*").alias("n_segs"))
    return (
        docs.select(F.col("doc_id"))
        .join(per_doc_tot, "doc_id", "left")
        .join(per_doc_kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_segs"), F.lit(0)).alias("n_segs"),
            (
                F.coalesce(F.col("n_segs"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).alias("n_dropped"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
