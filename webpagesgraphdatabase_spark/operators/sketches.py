"""Mergeable distinct-count sketches and their set operations —
theta-sketch-style audience-overlap estimation (Dasgupta et al. 2016,
"Theta-Sketch Framework") built on the deterministic md5 KMV sketch
the registry already oracle-checks.

"How many users did both A and B" over billions of rows is the
canonical sketch-set-operation workload: exact answers need a
|users|-scale distinct per pair, sketches need k minima per side.
Everything here is md5 arithmetic, so unlike library HLL/theta
implementations the DuckDB oracle reproduces every estimate digit for
digit — the sketch's *error* is visible next to the exact answer in
the hash-checked row itself.

Scale shape: the only corpus-wide work is one distinct over
(key, member) with partial aggregation; sketches are k rows per key
(k=32 default) and every set operation runs on k-sized inputs —
pairs cost O(|keys|² · k), independent of corpus size. KMV minima
merge by keeping the union's k smallest (associative, commutative),
which is what makes the sketch a distributed accumulator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 32

#: md5-hex prefix mapped to (0, 1): 13 hex chars fit int64 exactly
_FRAC = "cast(conv(substr({col}, 1, 13), 16, 10) as bigint) / {den}"


def _frac(col: str):
    return F.expr(_FRAC.format(col=col, den=float(16**13)))


def kmv_mins(
    df: DataFrame, key: str, member: str, k: int = KMV_K
) -> DataFrame:
    """The KMV sketch itself: (key, h) — the ``k`` smallest
    md5(member) per key over the distinct (key, member) pairs."""
    hashes = (
        df.select(key, member)
        .distinct()
        .select(key, F.md5(F.col(member).cast("string")).alias("h"))
    )
    w = Window.partitionBy(key).orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(key, "h")
    )


def kmv_pair_overlap(
    df: DataFrame, key: str, member: str, k: int = KMV_K
) -> DataFrame:
    """Theta-style set operations for every unordered key pair:
    (key_a, key_b, k_used, common, union_est, inter_est).

    Per pair, the union sketch is the ``k`` smallest of the two
    sketches' merged distinct minima; ``union_est`` is the standard
    KMV estimator (k_used-1)/h_k — exact when the union has fewer
    than ``k`` hashes (then every member hash is present). ``common``
    counts union-sketch hashes seen in *both* sides;
    ``inter_est = round(common · union_est / k_used, 6)`` — the
    theta-sketch intersection estimator, which degrades to the exact
    intersection in the exact branch. All arithmetic is the md5 hex →
    int64 mapping the oracle mirrors."""
    mins = kmv_mins(df, key, member, k)
    keys = mins.select(F.col(key).alias("ka")).distinct()
    pairs = keys.crossJoin(
        mins.select(F.col(key).alias("kb")).distinct()
    ).filter(F.col("ka") < F.col("kb"))

    a_side = pairs.join(
        mins.select(F.col(key).alias("ka"), "h"), "ka"
    ).select("ka", "kb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b_side = pairs.join(
        mins.select(F.col(key).alias("kb"), "h"), "kb"
    ).select("ka", "kb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    per_hash = (
        a_side.unionByName(b_side)
        .groupBy("ka", "kb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ka", "kb").orderBy("h")
    union_sketch = per_hash.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = union_sketch.groupBy("ka", "kb").agg(
        F.count("*").alias("k_used"),
        F.max("h").alias("h_k"),
        F.sum(
            ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
        ).alias("common"),
    )
    union_est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.round((k - 1) / _frac("h_k"), 6))
    return agg.select(
        F.col("ka").alias("key_a"),
        F.col("kb").alias("key_b"),
        "k_used",
        "common",
        union_est.alias("union_est"),
        F.round(
            F.col("common") * union_est / F.col("k_used"), 6
        ).alias("inter_est"),
    )


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 64
) -> DataFrame:
    """Misra-Gries heavy hitters over a (possibly huge-cardinality)
    key column: (key, est_count, max_err) with the classic guarantee
    ``est_count ≤ true_count ≤ est_count + max_err`` and every key
    whose true count exceeds ``max_err`` present in the output.

    Why a sketch when Spark's groupBy already partial-aggregates:
    partial aggregation keeps ONE state entry per distinct key per
    task — for near-unique keys (URLs, fingerprints, user ids) that is
    the full input in memory and a shuffle as wide as the data. The MG
    summary caps state at ``k`` counters per partition, turning the
    shuffle into ≤ k rows per partition regardless of cardinality —
    the standard frequent-items reduction (Misra & Gries 1982; the
    mergeable-summaries formulation of Agarwal et al. 2012).

    Per partition: each Arrow batch is counted exactly (vectorized
    ``value_counts`` — the Python loop runs over *distinct* batch
    keys, not rows), then folded into the k-counter summary; every
    eviction round increments the partition's decrement tally, whose
    global sum is the reported ``max_err``. Partition summaries merge
    by a plain groupBy-sum (counter sums add, error bounds add).

    The output depends on partition layout (any MG summary does), so
    this is unit-pinned via its guarantees, not an oracle row — the
    exact twin is the ordinary groupBy count.

    Keys are cast to string on the way in (the summary schema is typed
    once, not per-input): non-string key columns work, and the output
    key column is always string. The whole computation is one lazy
    plan — partition summaries flow into a keyed merge plus a global
    window-sum for the error bound over the ≤ k·partitions merged rows,
    so nothing is persisted (the r5 shape cached the summaries for a
    separate error-total job and leaked the blocks for the session)."""
    import pandas as pd

    from ._util import spread

    def mg(batches):
        counters: dict = {}
        decrements = 0
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                if key in counters:
                    counters[key] += int(cnt)
                    continue
                counters[key] = int(cnt)
                if len(counters) > k:
                    # evict: subtract the minimum counter from all
                    m = min(counters.values())
                    decrements += m
                    counters = {
                        key2: c - m for key2, c in counters.items() if c > m
                    }
        yield pd.DataFrame(
            {
                key_col: list(counters) + [None],
                "cnt": list(counters.values()) + [0],
                "dec": [0] * len(counters) + [decrements],
            }
        )

    summaries = spread(
        df.select(F.col(key_col).cast("string").alias(key_col))
    ).mapInPandas(mg, schema=f"{key_col} string, cnt long, dec long")
    merged = summaries.groupBy(key_col).agg(
        F.sum("cnt").alias("est_count"), F.sum("dec").alias("dec")
    )
    # global error bound: window-sum over the merged summary (≤ k rows
    # per partition survived the map side, so this single-partition
    # window sees a tiny frame — never the input)
    total_err = F.sum("dec").over(Window.partitionBy())
    return (
        merged.withColumn("max_err", F.coalesce(total_err, F.lit(0)).cast("long"))
        .filter(F.col(key_col).isNotNull())
        .drop("dec")
        .orderBy(F.col("est_count").desc(), F.col(key_col).asc())
    )


def bottomk_sample_quantiles(
    df: DataFrame,
    key: str,
    id_col: str,
    value: str,
    k: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9),
    safety: int = 4,
) -> DataFrame:
    """Mergeable quantile sketch per key via a deterministic bottom-k
    row sample: (key, bq_n_sample, bq_p50, bq_p90, ...) — interpolated
    percentiles over the ``k`` rows with the smallest md5(``id_col``).

    Why bottom-k and not GK/KLL: those sketches' internal state depends
    on merge ORDER, so a Spark partial-aggregation tree produces
    run-to-run-different (if equally-bounded) estimates — unverifiable
    by a cross-engine hash. A bottom-k-by-hash sample is a mergeable
    sketch whose merge (union → keep k smallest) is associative and
    commutative, so the estimate is bit-reproducible in any engine
    while keeping the same one-pass, O(k)-state contract; rank error is
    O(1/sqrt(k)) w.h.p. (k=256 → ~6 rank-percentile points at 95%).

    Scale shape: one tiny count-per-key job sizes a hash threshold at
    ``safety``× the k/n acceptance rate; the scan filters on that
    threshold BEFORE the per-key rank, so the rank window sees
    O(safety·k) rows per key instead of a hot key's full row set (the
    stratified sampler's prefilter discipline, sampling.py). The
    prefilter is part of the sketch definition — the oracle replicates
    it — so the (≈ e^-k-probability) shortfall case changes the
    estimate, never correctness.
    """
    den = 16**13
    hv = F.expr(
        f"cast(conv(substr(md5(cast({id_col} as string)), 1, 13), 16, 10) "
        "as bigint)"
    )
    counts = df.groupBy(key).agg(F.count("*").alias("bq_n"))
    cutoff = F.floor(
        F.least(F.lit(1.0), F.lit(float(safety * k)) / F.col("bq_n"))
        * F.lit(float(den))
    ).cast("long")
    thresholds = counts.select(key, cutoff.alias("bq_cutoff"))
    survivors = (
        df.select(key, id_col, value)
        .withColumn("bq_hv", hv)
        .join(F.broadcast(thresholds), key)
        .filter(F.col("bq_hv") <= F.col("bq_cutoff"))
    )
    w = Window.partitionBy(key).orderBy("bq_hv", id_col)
    sample = survivors.withColumn("bq_rn", F.row_number().over(w)).filter(
        F.col("bq_rn") <= k
    )
    aggs = [F.count("*").alias("bq_n_sample")] + [
        F.round(F.expr(f"percentile({value}, {q})"), 6).alias(
            f"bq_p{int(q * 100)}"
        )
        for q in qs
    ]
    return sample.groupBy(key).agg(*aggs)
