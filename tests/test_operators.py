"""Unit tests for the beyond-reference operators (dedup / similarity /
text analysis / multimodal / events) on tiny literal DataFrames.

The sf0.01 DuckDB oracle gate (tools/check_oracle.py) checks full-corpus
equivalence; these pin the *semantics* on hand-checkable inputs.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.operators import (
    dedup,
    events as ev,
    multimodal,
    similarity,
    textstats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "completely different words entirely unrelated content here now"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "tiny doc"),  # shorter than shingle width
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_collapses_and_keeps_min_id(docs):
    out = {r.keep_id: r.n_copies for r in dedup.dedup_exact(docs).collect()}
    assert out[0] == 2  # docs 0 and 3 identical, min id kept
    assert out[1] == 1 and out[2] == 1 and out[4] == 1
    assert 3 not in out


def test_shingles_short_doc_fallback(docs):
    sh = dedup.shingles(docs).filter(F.col("doc_id") == 4).collect()
    assert [r.shingle for r in sh] == ["tiny doc"]


def test_shingle_count(docs):
    n = dedup.shingles(docs).filter(F.col("doc_id") == 0).count()
    assert n == 7  # 9 words -> 7 trigrams, all distinct here


def test_lsh_finds_exact_dup_pair(docs):
    pairs = {(r.doc_a, r.doc_b) for r in dedup.lsh_candidates(docs).collect()}
    assert (0, 3) in pairs  # identical docs share every band


def test_xxhash64_fast_path_finds_exact_dups_too(docs):
    """The production hasher must behave like md5 where behavior is
    deterministic: identical texts hash to identical signatures, so the
    exact-dup pair is a candidate under either family, and the
    verified output matches on this corpus (all near-dups here are
    strong enough that both hash families' bands catch them)."""
    fast = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidates_from_shingles(
            dedup.shingles(docs), hasher="xxhash64"
        ).collect()
    }
    assert (0, 3) in fast
    verified_fast = sorted(
        map(tuple, dedup.neardup_jaccard(docs, hasher="xxhash64").collect())
    )
    verified_md5 = sorted(map(tuple, dedup.neardup_jaccard(docs).collect()))
    assert verified_fast == verified_md5


def test_xxhash64_unknown_hasher_rejected(docs):
    with pytest.raises(ValueError, match="unknown hasher"):
        dedup.minhash_from_shingles(dedup.shingles(docs), hasher="sha9").collect()


def test_dedup_clusters_fast_hasher_same_clusters(docs):
    fast = sorted(map(tuple, dedup.dedup_clusters(docs, hasher="xxhash64").collect()))
    slow = sorted(map(tuple, dedup.dedup_clusters(docs).collect()))
    assert fast == slow


def test_neardup_jaccard_exact_dup_has_full_overlap(docs):
    rows = {(r.doc_a, r.doc_b): (r.inter, r.uni) for r in
            dedup.neardup_jaccard(docs).collect()}
    assert rows[(0, 3)][0] == rows[(0, 3)][1]  # jaccard == 1


def test_neardup_jaccard_respects_threshold(docs):
    # at threshold 1/1 only exact shingle-set matches survive
    rows = {(r.doc_a, r.doc_b) for r in dedup.neardup_jaccard(docs, 1, 1).collect()}
    assert rows == {(0, 3)}


def test_simhash_identical_docs_equal_64bit(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert out[0] == out[3]
    assert len(out[0]) == 64 and set(out[0]) <= {"0", "1"}
    assert out[0] != out[2]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.0], 0),  # identical to 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),  # orthogonal
        (3, [0.9, 0.1, 0.0, 0.0], 0),  # close to 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_cosine_neardup_geometry(vecs):
    pairs = {(r.vec_a, r.vec_b) for r in similarity.cosine_neardup(vecs, 0.95).collect()}
    assert (0, 1) in pairs and (0, 3) in pairs and (1, 3) in pairs
    assert all(2 not in p for p in pairs)


def test_cosine_neardup_guard_routes_to_bucketed(vecs):
    # A corpus above the broadcast budget must take the LSH-bucketed
    # path (no driver collect). Identical vectors share every bucket,
    # so the exact-dup pair survives the approximate route.
    pairs = {
        (r.vec_a, r.vec_b)
        for r in similarity.cosine_neardup(vecs, 0.95, max_broadcast_rows=2).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_cosine_neardup_two_concurrent_callers_share_a_session(vecs):
    """r5 verdict item 6: each call owns its broadcast. Interleaving two
    result frames — build both, then materialize both, then re-run the
    first — must work (the old module-global handle destroyed caller A's
    broadcast when caller B built one), and the module must hold no
    broadcast state."""
    a = similarity.cosine_neardup(vecs, 0.95)
    b = similarity.cosine_neardup(vecs, 0.5)
    got_a = {(r.vec_a, r.vec_b) for r in a.collect()}
    got_b = {(r.vec_a, r.vec_b) for r in b.collect()}
    assert (0, 1) in got_a and got_a <= got_b
    # re-execute A after B materialized: its broadcast must still serve
    assert {(r.vec_a, r.vec_b) for r in a.collect()} == got_a
    assert not hasattr(similarity, "_live_broadcast")


def test_neardup_lsh_bucketed_subset_of_exact(vecs):
    exact = {(r.vec_a, r.vec_b) for r in similarity.cosine_neardup(vecs, 0.95).collect()}
    approx = {
        (r.vec_a, r.vec_b)
        for r in similarity.neardup_lsh_bucketed(vecs, 0.95).collect()
    }
    assert approx <= exact  # bucketing only ever drops pairs


def test_ann_bruteforce_nearest_first(vecs):
    rows = similarity.ann_bruteforce(vecs, n_queries=1, k=3).collect()
    ranked = [r.neighbor_id for r in sorted(rows, key=lambda r: r.rank)]
    assert ranked == [1, 3, 2]  # identical, then close, then orthogonal


def test_ann_lsh_same_bucket_for_identical(vecs):
    b = {r.vec_id: r.bucket for r in similarity.lsh_buckets(vecs).collect()}
    assert b[0] == b[1]
    assert len(b[0]) == similarity.N_PLANES


def test_ivf_assign_partitions_corpus(vecs):
    a = similarity.ivf_assign(vecs, n_centroids=2).collect()
    assert len(a) == 4  # every vector in exactly one inverted list
    assert len({r.vec_id for r in a}) == 4


def test_ivf_identical_vectors_share_list(vecs):
    a = {r.vec_id: r.cid for r in similarity.ivf_assign(vecs, n_centroids=2).collect()}
    assert a[0] == a[1]


def test_ann_ivf_full_probe_equals_bruteforce(vecs):
    # probing every list degrades IVF to exact search
    ivf = similarity.ann_ivf(vecs, n_queries=2, k=3, n_centroids=2, n_probe=2)
    bf = similarity.ann_bruteforce(vecs, n_queries=2, k=3)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, bf.collect()))


def test_kmeans_zero_iters_equals_seeded_sample(vecs):
    trained = similarity.kmeans_centroids(vecs, n_centroids=2, n_iters=0)
    sampled = similarity.ivf_centroids(vecs, n_centroids=2)
    assert sorted(
        (r.cid, [round(x, 6) for x in r.cemb]) for r in trained.collect()
    ) == sorted(
        (r.cid, [round(float(x), 6) for x in r.cemb]) for r in sampled.collect()
    )


def test_kmeans_training_leaves_no_cached_blocks(spark):
    """The r14 driver-sample trainer persists nothing: a full training
    run must leave the session's RDD storage exactly as it found it
    (the cache-leak concern the old superstep loop guarded with
    try/finally unpersists is now structural)."""
    rows = [(i, [float(i % 3 + 1), float(i % 5)]) for i in range(12)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    similarity.kmeans_centroids(emb, n_centroids=2, n_iters=3).collect()
    similarity.train_pq(emb.withColumn(
        "embedding",
        F.expr("transform(sequence(1, 4), i -> embedding[0] * i)").cast(
            "array<float>"
        ),
    ), m=2, ks=2, n_iters=2, dim=4).collect()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after == before


def test_kmeans_training_collect_is_cap_bounded(spark, monkeypatch):
    """The Lloyd iterations run driver-side over the hash-sample — the
    collect must be bounded by ~1.2·train_cap (+ the centroid seeds),
    NEVER corpus-sized: the at-scale safety property of the r14
    driver-sample trainer."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older pyspark: one DataFrame class
        from pyspark.sql import DataFrame

    n, cap = 600, 64
    rows = [(i, [float(i % 7 + 1), float(i % 5), 1.0, 0.5]) for i in range(n)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    sizes = []
    real_collect = DataFrame.collect

    def spy_collect(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    cents = similarity.kmeans_centroids(
        emb, n_centroids=4, n_iters=2, train_cap=cap, corpus_count=n
    )
    monkeypatch.undo()
    assert len(cents.collect()) == 4
    assert sizes, "trainer no longer collects — update this pin"
    # hash-sample slack is 1.2x; allow binomial spread on top, but the
    # bound must stay FAR below the corpus
    assert max(sizes) <= int(1.2 * cap + 6 * cap**0.5) + 4
    assert max(sizes) < n / 2


def test_kmeans_centroids_converge_to_blob_directions(spark):
    # two well-separated blobs; after Lloyd steps each blob direction is
    # captured by some centroid (cosine ≈ 1), wherever the seeds started
    import math

    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1.1, -0.1]),
        (3, [0.0, 1.0]), (4, [0.1, 0.9]), (5, [-0.1, 1.1]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    cents = similarity.kmeans_centroids(emb, n_centroids=2, n_iters=3).collect()
    assert len(cents) == 2

    def cos(c, d):
        nc = math.hypot(*c)
        return (c[0] * d[0] + c[1] * d[1]) / nc

    for direction in ([1.0, 0.0], [0.0, 1.0]):
        assert max(cos([float(x) for x in r.cemb], direction) for r in cents) > 0.99


def test_ann_ivf_trained_recall_at_least_sampled(spark):
    """The round-5 headline claim: Lloyd-trained centroids never lose
    recall vs the seeded sample at the same auto-sized probe cost.
    sf0.01 is the gate's scale (measured 0.60 trained vs 0.54 sampled
    there; on sf0.001's vectors the auto-sized 22-list/4-probe index is
    recall-noise-bound and training doesn't separate)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 10, 5).collect()
    }
    n = emb.count()
    sampled = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_ivf(emb, 10, 5, corpus_count=n).collect()
    }
    trained = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_ivf(
            emb, 10, 5, trained=True, corpus_count=n
        ).collect()
    }
    assert len(trained & exact) >= len(sampled & exact)
    assert len(trained & exact) > 0


def test_ann_ivf_trained_wins_big_on_clustered_data(spark):
    """On *clustered* embeddings the Lloyd-trained quantizer must beat
    sampled centroids decisively — this pins that the small trained gain
    on the testdata corpus is a property of its isotropic vectors
    (cosine mean ≈ 0 between random pairs, no cluster structure for
    k-means to find), not of the training machinery. 16 overlapping
    cluster directions (noise 0.2 — wide enough that Voronoi boundaries
    cut through neighborhoods), 25 members each, interleaved ids so the
    40 queries span every cluster; sampled *point* centroids sit at
    arbitrary in-cluster positions whose boundaries split true
    neighborhoods across lists, while 3 Lloyd steps settle boundaries
    into the gaps (measured at this seed: 0.655 sampled vs 0.915
    trained; margins pinned well inside that gap)."""
    import numpy as np

    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(16, 16))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    vid = 0
    for _ in range(25):
        for ci in range(16):
            v = dirs[ci] + 0.2 * rng.normal(size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 40, 5).collect()
    }

    def recall(trained: bool) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_ivf(
                emb, 40, 5, n_centroids=16, n_probe=1,
                trained=trained, corpus_count=400,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_sampled, r_trained = recall(False), recall(True)
    assert r_trained >= 0.85
    assert r_trained >= r_sampled + 0.15


def test_dedup_clusters_superstep_path_same_result(docs):
    """The bench's forced-superstep variant (driver_max_edges=0) must
    produce exactly the union-find fast path's clusters — the two
    physical strategies share one logical result."""
    fast = sorted(map(tuple, dedup.dedup_clusters(docs).collect()))
    slow = sorted(
        map(tuple, dedup.dedup_clusters(docs, driver_max_edges=0).collect())
    )
    assert slow == fast


def test_ivf_index_at_rest_matches_recompute(spark, tmp_path):
    """build_ivf_index + ann_ivf_from_index ≡ ann_ivf: same centroids,
    same probes, same top-k — the at-rest layout changes where the
    candidates come from, never what they are."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    path = similarity.build_ivf_index(emb, str(tmp_path / "ivf"), corpus_count=n)
    from_index = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    recompute = sorted(
        map(tuple, similarity.ann_ivf(emb, 10, 5, corpus_count=n).collect())
    )
    assert from_index == recompute and len(from_index) == 50


def test_ivf_index_scan_prunes_to_probed_lists(spark, tmp_path):
    """The candidate scan must read only the probed lists' partitions:
    the cid isin filter shows up as a PartitionFilters entry on the
    parquet scan, not a post-scan Filter over a full read."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = similarity.build_ivf_index(emb, str(tmp_path / "ivf"), corpus_count=500)
    df = similarity.ann_ivf_from_index(spark, path, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the candidate FileScan carries the probed-cid INSET as a partition
    # filter (the location path is display-truncated, so match on the
    # filter itself)
    assert "PartitionFilters: [cid" in plan, plan


def test_ivf_index_trained_mode_builds_and_queries(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = similarity.build_ivf_index(
        emb, str(tmp_path / "ivf_t"), trained=True, n_iters=1, corpus_count=500
    )
    rows = similarity.ann_ivf_from_index(spark, path, k=5).collect()
    assert len(rows) == 50
    assert {r.query_id for r in rows} == set(range(10))


def test_bench_recall_floors(spark):
    """The bench's recall@5 sidecar (r4 verdict item 2) with floors: a
    latency win that craters recall must fail loudly. Floors sit well
    under the measured sf0.01 values (lsh 0.32, ivf 0.54, trained 0.60)
    so auto-sizing tweaks don't flake the gate, while a collapse to
    near-zero recall still fails."""
    import bench

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    d = len(emb.select("embedding").first()["embedding"])
    rec = bench.ann_recalls(emb, n, d)
    assert rec["s_ann_lsh"] >= 0.2
    assert rec["s_ann_ivf"] >= 0.4
    assert rec["s_ann_ivf_trained"] >= rec["s_ann_ivf"]
    # 4 independent tables: a true neighbor must miss every one of them
    # to be missed, so the union's recall must clear the single table
    assert rec["s_ann_lsh_multi"] >= rec["s_ann_lsh"] + 0.2
    # r6 union re-rank: candidates are a superset of both generators'
    # (same seeds), so its recall dominates each — and must clear the
    # 0.6 bar neither reaches alone on this isotropic corpus
    assert rec["s_ann_hybrid"] >= rec["s_ann_lsh_multi"]
    assert rec["s_ann_hybrid"] >= rec["s_ann_ivf"]
    assert rec["s_ann_hybrid"] >= 0.6
    # r9: the 32x-shortlist binary config must hold the r8 verdict's
    # ≥0.92 bar (measured 0.96 at sf0.1 / BIN_REFINE=32); a refine
    # regression that craters it fails here, not in the sidecar
    assert rec["s_ann_bin"] >= 0.85


def test_ann_probe_jobs_skipped_with_precomputed_sizes(vecs, monkeypatch):
    """With corpus_count/dim supplied, plan construction triggers no
    eager count()/first() probe job (ADVICE r4: one probe per serving
    session, not per call)."""
    from pyspark.sql import DataFrame

    def boom(self, *a, **k):  # pragma: no cover - fires only on regression
        raise AssertionError("eager probe job ran despite precomputed sizes")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "first", boom)
    # building the plans must not probe; execution is not part of this test
    similarity.ann_lsh(vecs, 2, 3, corpus_count=4, dim=4)
    similarity.ann_ivf(vecs, 2, 3, corpus_count=4)


def test_lang_id_markers(spark):
    docs = spark.createDataFrame(
        [(0, "der hund und das brot"), (1, "the cat and the hat"), (2, "xyzzy")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: (r.pred_lang, r.score) for r in textstats.lang_id(docs).collect()}
    assert out[0] == ("de", 3)
    assert out[1] == ("en", 3)
    assert out[2] == ("de", 0)  # all-zero tie -> lexicographically first lang


def test_quality_and_token_counts(spark):
    docs = spark.createDataFrame([(0, "the aa bbbb")], ["doc_id", "text"])
    q = textstats.quality_score(docs).first()
    assert q.n_tokens == 3
    assert q.mean_token_len == pytest.approx(9 / 3)
    assert q.stopword_ratio == pytest.approx(1 / 3)
    t = textstats.token_counts(docs).first()
    assert (t.ws_tokens, t.re_tokens, t.n_chars) == (3, 3, 11)


def test_fingerprint_deterministic(docs):
    a = {r.doc_id: r.fp for r in textstats.fingerprint(docs).collect()}
    b = {r.doc_id: r.fp for r in textstats.fingerprint(docs).collect()}
    assert a == b and a[0] == a[3]


def test_rolling_fp_window_count_and_reference_value(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x y"), (2, "a b c d e")], ["doc_id", "text"]
    )
    rows = {r.doc_id: (r.rolling_fp, r.n_windows) for r in
            textstats.rolling_fingerprint(docs).collect()}
    assert rows[0] == rows[2]  # deterministic
    assert rows[0][1] == 2  # 5 tokens -> 2 windows of 4
    assert rows[1][1] == 1  # short doc -> single whole-text hash

    # hand-computed Rabin-Karp for the first window (a b c d)
    import hashlib

    def th(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:7], 16)

    h1 = (th("a") * textstats.RK_B3 + th("b") * textstats.RK_B2
          + th("c") * textstats.RK_B + th("d")) % textstats.RK_P
    h2 = (th("b") * textstats.RK_B3 + th("c") * textstats.RK_B2
          + th("d") * textstats.RK_B + th("e")) % textstats.RK_P
    assert rows[0][0] == min(h1, h2)


def test_rolling_fp_shifted_text_shares_window_hash(spark):
    # the defining rolling property: a shared 4-token run hashes equally
    # regardless of position
    docs = spark.createDataFrame(
        [(0, "p q r s"), (1, "zz p q r s")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r.rolling_fp for r in
            textstats.rolling_fingerprint(docs).collect()}
    import hashlib

    def th(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:7], 16)

    shared = (th("p") * textstats.RK_B3 + th("q") * textstats.RK_B2
              + th("r") * textstats.RK_B + th("s")) % textstats.RK_P
    assert rows[0] == shared
    other = (th("zz") * textstats.RK_B3 + th("p") * textstats.RK_B2
             + th("q") * textstats.RK_B + th("r")) % textstats.RK_P
    assert rows[1] == min(shared, other)


def test_byte_histogram_counts_total_bytes(spark):
    docs = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    rows = multimodal.byte_histogram(docs).collect()
    assert sum(r.cnt for r in rows) == 3
    # 'a'=97 -> bin 1, 'b' -> 2, 'c' -> 3
    assert {(r.bin, r.cnt) for r in rows} == {(1, 1), (2, 1), (3, 1)}


def test_frame_sample_stride(spark):
    docs = spark.createDataFrame([(0, "x" * 200)], ["doc_id", "text"])
    rows = multimodal.frame_sample(docs).collect()  # 4 frames of 64 -> keep 0, 2
    assert sorted(r.frame_idx for r in rows) == [0, 2]


def test_decode_image_stub_raises_without_codec(spark):
    docs = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        multimodal.decode_image(docs, fake=False).collect()


def test_decode_image_fake_deterministic(spark):
    docs = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    r = multimodal.decode_image(docs, fake=True).first()
    assert 16 <= r.width < 80 and 16 <= r.height < 80 and 1 <= r.channels <= 4
    assert len(r.features) == 4


def test_resize_stub_raises_without_codec(spark):
    docs = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.resize_image(docs, fake=False).collect()


def test_resize_fake_fits_box_preserving_aspect(spark):
    docs = spark.createDataFrame([(0, "abc"), (1, "defg")], ["doc_id", "text"])
    for r in multimodal.resize_image(docs, fake=True).collect():
        assert max(r.new_width, r.new_height) <= multimodal.MAX_SIDE
        assert r.new_width >= 1 and r.new_height >= 1
        # longest side maps exactly to the box edge
        assert max(r.new_width, r.new_height) == (
            max(r.width, r.height) * multimodal.MAX_SIDE // max(r.width, r.height)
        )
        d = multimodal.decode_image(docs, fake=True).filter(
            F.col("doc_id") == r.doc_id
        ).first()
        assert (r.width, r.height) == (d.width, d.height)


@pytest.fixture(scope="module")
def tiny_events(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (1, at(0), 7, "click", 1.0, '{"k": 1}'),
        (2, at(10), 7, "view", 5.0, '{"k": 2}'),
        (3, at(90), 7, "click", 3.0, '{"k": 3}'),  # 80-min gap -> new session
        (4, at(0), 8, "click", 2.0, '{"k": 4}'),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_sessionize_gap_splits(tiny_events):
    rows = {(r.user_id, r.session_id): r.n_events for r in
            ev.sessionize(tiny_events).collect()}
    assert rows == {(7, 1): 2, (7, 2): 1, (8, 1): 1}


def test_top_events_per_user(tiny_events):
    rows = ev.top_events_per_user(tiny_events, k=2).collect()
    u7 = [r.event_id for r in sorted(rows, key=lambda r: (r.user_id, r.rank))
          if r.user_id == 7]
    assert u7 == [2, 3]  # values 5.0, 3.0


def test_props_extract(tiny_events):
    out = {r.event_id: r.k for r in ev.props_extract(tiny_events).collect()}
    assert out == {1: 1, 2: 2, 3: 3, 4: 4}


def test_dedup_clusters_transitive_closure(spark):
    # A~B and B~C verify, but A-C is never a candidate pair: the
    # cluster must still merge to {A,B,C} with canon=min id.
    # Explicit candidates make the test deterministic (LSH band recall
    # at moderate Jaccard is probabilistic by design; recall is pinned
    # separately in test_lsh_finds_exact_dup_pair).
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),   # ~0
        (2, "alpha beta gamma delta epsilon zeta mu iota"),    # ~1
        (3, "totally unrelated words that share nothing at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = spark.createDataFrame([(0, 1), (1, 2)], ["doc_a", "doc_b"])
    out = {r.doc_id: (r.canon_id, r.cluster_size)
           for r in dedup.dedup_clusters(docs, candidates=cand).collect()}
    assert out[0] == (0, 3) and out[1] == (0, 3) and out[2] == (0, 3)
    assert 3 not in out  # singleton: no verified pair, not listed


def test_dedup_clusters_candidate_below_threshold_dropped(spark):
    # a candidate pair that fails Jaccard verify must not edge-connect
    rows = [
        (10, "one two three four five six seven eight"),
        (11, "one two three four five six seven nine"),
        (20, "red orange yellow green blue indigo violet pink"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = spark.createDataFrame([(10, 11), (11, 20)], ["doc_a", "doc_b"])
    out = {r.doc_id: (r.canon_id, r.cluster_size)
           for r in dedup.dedup_clusters(docs, candidates=cand).collect()}
    assert out == {10: (10, 2), 11: (10, 2)}


def test_dedup_clusters_exact_dups_via_lsh(docs):
    # exact duplicates share every band, so the default LSH path is
    # deterministic for them end-to-end
    out = {r.doc_id: (r.canon_id, r.cluster_size)
           for r in dedup.dedup_clusters(docs, 1, 1).collect()}
    assert out[0] == (0, 2) and out[3] == (0, 2)


def test_stratified_sample_small_strata_return_all(spark):
    from webpagesgraphdatabase_spark.operators import sampling

    rows = [(i, "en" if i % 3 else "de") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.stratified_sample(docs, "lang", k=50).collect()
    assert len(out) == 30  # k > stratum sizes: everything sampled
    assert {r.doc_id for r in out} == set(range(30))


def test_stratified_sample_exact_k_and_deterministic(spark):
    from webpagesgraphdatabase_spark.operators import sampling

    rows = [(i, "en" if i % 2 else "de") for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    a = sorted(map(tuple, sampling.stratified_sample(docs, "lang", k=5).collect()))
    b = sorted(map(tuple, sampling.stratified_sample(
        docs.repartition(7), "lang", k=5).collect()))
    assert a == b  # layout-independent draw
    per_lang = {}
    for doc_id, lang, rank in a:
        per_lang.setdefault(lang, []).append(rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_lang.values())


def test_stratified_sample_prefilter_matches_full_window(spark):
    from pyspark.sql import Window
    from webpagesgraphdatabase_spark.operators import sampling

    rows = [(i, "x") for i in range(500)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = sorted(map(tuple, sampling.stratified_sample(docs, "lang", k=10).collect()))
    h = sampling._hash_hex("doc_id")
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    want = sorted(map(tuple, (
        docs.withColumn("stratum_rank", F.row_number().over(w))
        .filter(F.col("stratum_rank") <= 10)
        .select("doc_id", "lang", "stratum_rank").collect()
    )))
    assert got == want


def test_stratified_sample_plan_shape(spark):
    # mechanical plan evidence: the rank<=k predicate must reach a
    # map-side WindowGroupLimit (no full-stratum shuffle), and the
    # hash pre-filter must run inside the broadcast join (codegen, no
    # extra pass)
    from webpagesgraphdatabase_spark.operators import sampling

    docs = spark.createDataFrame([(i, "en") for i in range(50)], ["doc_id", "lang"])
    plan = (
        sampling.stratified_sample(docs, "lang", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan
    assert "md5" in plan  # pre-filter folded into the join condition


def test_top_terms_linear_idf_ranking(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana common common"),
            (2, "common cherry"),
        ],
        ["doc_id", "text"],
    )
    # N=3; df: apple=1, banana=2, common=3, cherry=1
    out = {(r.doc_id, r.term_rank): (r.term, r.tf, r.df)
           for r in textstats.top_terms(docs).collect()}
    # doc0: apple 2*(3M//1)=6M > banana 1*(3M//2)=1.5M > common 1*(3M//3)=1M
    assert out[(0, 1)] == ("apple", 2, 1)
    assert out[(0, 2)] == ("banana", 1, 2)
    assert out[(0, 3)] == ("common", 1, 3)
    # doc1: common 2*1M=2M beats banana 1.5M despite higher df
    assert out[(1, 1)] == ("common", 2, 3)
    assert out[(1, 2)] == ("banana", 1, 2)
    # doc2: rare cherry first
    assert out[(2, 1)] == ("cherry", 1, 1)


def test_repetition_counts_and_fracs(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "x"), (2, "p q r")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in textstats.repetition(docs).collect()}
    # doc 0 2-grams: "a b", "b a", "a b", "b c" → "a b" duplicated
    assert (out[0].n_grams, out[0].dup_grams, out[0].top_cnt) == (4, 2, 2)
    assert out[0].dup_frac == 0.5 and out[0].top_frac == 0.5
    # doc shorter than n: whole text is its single gram
    assert (out[1].n_grams, out[1].dup_grams, out[1].top_cnt) == (1, 0, 1)
    # no repetition at all
    assert (out[2].n_grams, out[2].dup_grams, out[2].top_cnt) == (2, 0, 1)


def test_contamination_flags_benchmark_overlap(spark):
    docs = spark.createDataFrame(
        [
            (0, "one two three four"),  # benchmark (doc_id % 20 == 0)
            (1, "one two three four"),  # full shingle overlap → contaminated
            (2, "alpha beta gamma delta"),  # zero overlap
            (3, "zero one two three five"),  # partial: 1 of 3 shingles
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup.contamination(docs).collect()}
    assert 0 not in out  # benchmark docs are not scored
    assert (out[1].n_shingles, out[1].n_hits, out[1].contaminated) == (2, 2, 1)
    assert (out[2].n_hits, out[2].contaminated) == (0, 0)
    # 1/3 ≥ 10% → flagged at the default threshold
    assert (out[3].n_shingles, out[3].n_hits, out[3].contaminated) == (3, 1, 1)


def test_contamination_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [(0, "one two three four"), (1, "one two three four")],
        ["doc_id", "text"],
    )
    plan = dedup.contamination(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark probe never shuffles the corpus


def test_curation_report_reasons(spark):
    from webpagesgraphdatabase_spark.operators import curation

    long = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (0, long),              # benchmark slice (doc_id % 20 == 0); clean
            (1, long),              # exact dup of 0 (and shingle-contaminated)
            (2, "tiny"),            # too_short (1 token)
            (3, "go go go go go"),  # repetitive: every 2-gram is "go go"
            (4, " ".join(f"v{i}" for i in range(30))),  # clean keeper
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in curation.curation_report(docs).collect()}
    assert out[0].keep == 1 and out[0].reasons == ""  # benchmark never contaminated
    assert "exact_dup" in out[1].reasons and "contaminated" in out[1].reasons
    assert out[1].keep == 0
    assert out[2].reasons == "too_short"
    assert out[3].reasons == "repetitive"
    assert out[4].keep == 1


def test_curation_near_dup_keeps_canonical(spark):
    from webpagesgraphdatabase_spark.operators import curation

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "entirely unrelated words " * 3)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in curation.curation_report(docs).collect()}
    # 1 and 2 are near-dups: the canonical min-id survives, the other drops
    assert out[1].keep == 1
    assert "near_dup" in out[2].reasons


def test_repetition_invariants_on_corpus(spark):
    # cross-operator consistency on the real table: 2-gram count is
    # exactly max(1, n_tokens - 1), fractions are proper ratios, and
    # dup_grams fires iff some gram repeats
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = textstats.repetition(docs)
    tok = textstats.token_counts(docs)
    bad = (
        rep.join(tok, "doc_id")
        .filter(
            (F.col("n_grams") != F.greatest(F.lit(1), F.col("ws_tokens") - 1))
            | (F.col("dup_grams") > F.col("n_grams"))
            | (F.col("top_cnt") < 1)
            | ((F.col("dup_grams") == 0) != (F.col("top_cnt") == 1))
            | (F.col("dup_frac") < 0)
            | (F.col("dup_frac") > 1)
        )
        .count()
    )
    assert bad == 0


def test_dup_gram_counts_row_local_matches_explode_groupby(spark):
    """The sorted-run array expression (streaming curation's repetition
    leg) must reproduce the batch explode+groupBy counts bit-for-bit —
    on the real corpus and on hand-built edge cases (all-identical
    grams, no dups, single word, empty text)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [
            (100001, "a a a a a"),
            (100002, "w x y z"),
            (100003, "solo"),
            (100004, ""),
            (100005, "p q p q p"),
        ],
        ["doc_id", "text"],
    )
    both = docs.select("doc_id", "text").unionByName(edge)
    rl = both.select(
        "doc_id", textstats.dup_gram_counts(textstats.gram_array(2)).alias("s")
    ).select("doc_id", "s.n_grams", "s.dup_grams")
    got = {r.doc_id: (r.n_grams, r.dup_grams) for r in rl.collect()}
    want = {
        r.doc_id: (r.n_grams, r.dup_grams)
        for r in textstats.repetition(both).collect()
    }
    assert got == want and len(got) > 500
    # sanity on the hand cases: "a a a a a" → 4 grams all dup
    assert got[100001] == (4, 4) and got[100002] == (3, 0)
    assert got[100005] == (4, 4)  # "p q","q p","p q","q p"


def test_contamination_invariants_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cont = dedup.contamination(docs)
    assert cont.filter(F.col("n_hits") > F.col("n_shingles")).count() == 0
    # scored set is exactly the non-benchmark slice
    assert cont.filter(F.col("doc_id") % 20 == 0).count() == 0
    assert cont.count() == docs.filter(F.col("doc_id") % 20 != 0).count()


def test_curation_consistent_with_component_operators(spark):
    from webpagesgraphdatabase_spark.operators import curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep_docs = {
        r.doc_id
        for r in curation.curation_report(docs)
        .filter(F.col("reasons").contains("near_dup"))
        .collect()
    }
    clus = {
        r.doc_id
        for r in dedup.dedup_clusters(docs)
        .filter(F.col("doc_id") != F.col("canon_id"))
        .collect()
    }
    assert rep_docs == clus  # the report's near_dup rule IS the cluster rule


def test_pack_sequences_layout(spark):
    from webpagesgraphdatabase_spark.operators import packing

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(300))) for i in range(6)],
        ["doc_id", "text"],
    )
    rows = packing.pack_sequences(docs, seq_len=512, n_shards=2).collect()
    assert len(rows) == 6 and all(r.n_tokens == 300 for r in rows)
    for shard in {r.shard for r in rows}:
        members = sorted(
            (r for r in rows if r.shard == shard),
            key=lambda r: r.seq_id * 512 + r.seq_offset,
        )
        # per-shard stream: starts are the exact running token count
        for i, r in enumerate(members):
            start = i * 300
            assert (r.seq_id, r.seq_offset) == (start // 512, start % 512)


def test_pack_sequences_deterministic_and_parallel_plan(spark):
    from webpagesgraphdatabase_spark.operators import packing

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)], ["doc_id", "text"]
    )
    a = {tuple(r) for r in packing.pack_sequences(docs).collect()}
    b = {tuple(r) for r in packing.pack_sequences(docs.repartition(7)).collect()}
    assert a == b  # layout-independent
    plan = packing.pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    # the cumsum window partitions by shard — never a single global sort
    assert "hashpartitioning(shard" in plan


def test_mixture_sample_quotas_and_nesting(spark):
    from webpagesgraphdatabase_spark.operators import sampling

    rows = [(i, "en" if i % 3 else "de") for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    w = {"en": 0.75, "de": 0.25}
    m20 = sampling.mixture_sample(docs, w, total=20).collect()
    by_lang = {}
    for r in m20:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 15 and len(by_lang["de"]) == 5
    # nesting: a smaller total is a prefix of the larger draw
    m8 = {(r.lang, r.doc_id) for r in sampling.mixture_sample(docs, w, total=8).collect()}
    m20_set = {(r.lang, r.doc_id) for r in m20}
    assert m8 <= m20_set
    # unlisted strata draw nothing
    assert {r.lang for r in m20} == {"en", "de"}


# --- LSH degenerate-bucket cap (on by default) ---------------------------


@pytest.fixture(scope="module")
def boilerplate(spark):
    """Mass-duplicated boilerplate plus a small genuine near-dup pair:
    the shape the bucket cap exists for."""
    rows = [(i, "identical boilerplate text repeated everywhere") for i in range(60)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "the quick brown fox jumps over the lazy cat"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lsh_max_bucket_drops_degenerate_bucket(boilerplate):
    capped = dedup.lsh_candidates(boilerplate, max_bucket=50)
    pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # the 60-doc bucket is dropped entirely ...
    assert not any(a < 100 and b < 100 for a, b in pairs)
    # ... while the small genuine near-dup bucket survives
    assert (100, 101) in pairs
    # uncapped: the boilerplate bucket contributes its full C(60,2) pairs
    full = dedup.lsh_candidates(boilerplate, max_bucket=None)
    assert full.filter("doc_a < 100 AND doc_b < 100").count() == 60 * 59 // 2


def test_lsh_dropped_buckets_reports_what_the_cap_removed(boilerplate):
    sh = dedup.shingles(boilerplate)
    dropped = dedup.lsh_dropped_buckets(sh, max_bucket=50).collect()
    # identical docs share every band signature: one dropped bucket per band
    assert len(dropped) == dedup.N_BANDS
    assert all(r.bsz == 60 for r in dropped)
    assert dedup.lsh_dropped_buckets(sh, max_bucket=None).count() == 0


def test_lsh_default_cap_bounds_mass_boilerplate(spark):
    """A >DEFAULT_MAX_BUCKET boilerplate blob completes with a bounded
    candidate count under the defaults — and the exact-dedup path still
    collapses it, so the hygiene pipeline loses nothing."""
    n = dedup.DEFAULT_MAX_BUCKET + 100
    docs = spark.createDataFrame(
        [(i, "mass produced boilerplate page footer text") for i in range(n)],
        ["doc_id", "text"],
    )
    assert dedup.lsh_candidates(docs).count() == 0  # dropped, not O(n^2)
    exact = dedup.dedup_exact(docs).collect()
    assert len(exact) == 1 and exact[0].keep_id == 0 and exact[0].n_copies == n


def test_curation_threads_max_bucket(boilerplate):
    from webpagesgraphdatabase_spark.operators import curation

    rep = curation.curation_report(boilerplate, max_bucket=50)
    by_id = {r.doc_id: r.reasons for r in rep.collect()}
    # boilerplate: exact-dedup'd (min id kept), near_dup never computed
    # for the dropped bucket
    assert "exact_dup" in by_id[5] and "near_dup" not in by_id[5]
    assert "exact_dup" not in by_id[0]
    # the genuine near-dup pair is still verified and clustered
    assert "near_dup" in by_id[101] and "near_dup" not in by_id[100]


def test_curation_audit_reports_dropped_buckets(boilerplate):
    from webpagesgraphdatabase_spark.operators import curation

    rep, audit = curation.curation_report_with_audit(boilerplate, max_bucket=50)
    a = audit.first()
    # identical docs share every band signature: one dropped bucket per
    # band, each holding the 60 boilerplate docs
    assert a.n_dropped_buckets == dedup.N_BANDS
    assert a.n_dropped_rows == 60 * dedup.N_BANDS
    assert a.max_bucket == 50
    # the report half is byte-identical to the plain entry point
    plain = {tuple(r) for r in curation.curation_report(boilerplate, max_bucket=50).collect()}
    assert {tuple(r) for r in rep.collect()} == plain
    # uncapped: nothing dropped, sentinel max_bucket
    _, audit_off = curation.curation_report_with_audit(boilerplate, max_bucket=None)
    off = audit_off.first()
    assert off.n_dropped_buckets == 0 and off.n_dropped_rows == 0
    assert off.max_bucket == -1


# --- curation shingle checkpoint/persist -------------------------------


def _curation_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "the quick brown fox jumps over the lazy cat today"),
        (2, "completely different words entirely unrelated content here now"),
        (3, "the quick brown fox jumps over the lazy dog today"),
        (4, "tiny doc"),
        (20, "benchmark slice text for the contamination holdout rules"),
        (21, "benchmark slice text for the contamination holdout rules extra"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curation_checkpoint_single_shingle_scan(spark, tmp_path):
    from webpagesgraphdatabase_spark.operators import curation

    docs = _curation_docs(spark)
    base = {tuple(r) for r in curation.curation_report(docs).collect()}

    ckpt = str(tmp_path / "ckpt")
    rep = curation.curation_report(docs, checkpoint_dir=ckpt)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # the docs fixture is a literal DataFrame, so every parquet FileScan
    # in the plan is a read of the shingle checkpoint: both live shingle
    # consumers (contamination + the Jaccard verify) scan it instead of
    # rebuilding the shingle lineage from the corpus
    assert plan.count("FileScan parquet") >= 2
    assert {tuple(r) for r in rep.collect()} == base


def test_curation_persist_caches_shingles(spark):
    from webpagesgraphdatabase_spark.operators import curation

    docs = _curation_docs(spark)
    base = {tuple(r) for r in curation.curation_report(docs).collect()}
    rep = curation.curation_report(docs, persist_shingles=True)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert {tuple(r) for r in rep.collect()} == base
    spark.catalog.clearCache()


def test_ann_lsh_multi_table_recall_is_monotone(spark):
    """Multi-table LSH is the recall lever: more independent tables can
    only add candidates, so recall@k vs exact never decreases — and the
    1-table run must equal the oracle-checked default exactly."""
    from webpagesgraphdatabase_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 10, 5).collect()
    }
    one = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_lsh(emb, 10, 5, n_tables=1).collect()
    }
    default = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_lsh(emb, 10, 5).collect()
    }
    assert one == default
    recalls = []
    for nt in (1, 3):
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_lsh(emb, 10, 5, n_tables=nt).collect()
        }
        recalls.append(len(got & exact))
    assert recalls[1] >= recalls[0]


def test_curation_fast_hasher_same_report(docs):
    """Curation with the production hash family: identical keep/drop
    report on a corpus whose near-dups are strong (both hash families'
    bands catch them), pinning that the hasher knob only touches
    candidate generation, never the report semantics."""
    from webpagesgraphdatabase_spark.operators import curation

    fast = sorted(
        map(tuple, curation.curation_report(docs, hasher="xxhash64").collect())
    )
    slow = sorted(map(tuple, curation.curation_report(docs).collect()))
    assert fast == slow


def test_ivf_index_append_equals_full_rebuild_with_same_centroids(spark, tmp_path):
    """Append-mode ingest: build on the first half, append the second;
    queries over the incrementally-built index must equal queries over
    an index holding everything (same frozen centroids either way,
    since both derive from the first half's seeded sample)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)

    inc = str(tmp_path / "ivf_inc")
    similarity.build_ivf_index(first, inc, n_centroids=8)
    similarity.ivf_index_append(second, inc)

    full = str(tmp_path / "ivf_full")
    similarity.build_ivf_index(first, full, n_centroids=8)
    # rewrite the full index's lists from everything, same stored centroids
    stored = spark.read.parquet(f"{full}/centroids.parquet")
    v = emb.select(
        "vec_id", "embedding", similarity._norm(F.col("embedding")).alias("nrm")
    )
    (
        v.join(similarity._argmax_assign(v, stored), "vec_id")
        .withColumn("batch", F.lit(0))
        .repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid", "batch")
        .parquet(f"{full}/lists.parquet")
    )

    got = sorted(map(tuple, similarity.ann_ivf_from_index(spark, inc, k=5).collect()))
    want = sorted(map(tuple, similarity.ann_ivf_from_index(spark, full, k=5).collect()))
    assert got == want and got


def test_compact_ivf_lists_preserves_results_and_merges_segments(spark, tmp_path):
    """After several appends the lists fragment into per-batch files;
    compaction folds them back to segment 0 with bit-identical query
    results (assignments are never recomputed — frozen centroids)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb.filter(F.col("vec_id") % 3 == 0), path,
                               n_centroids=8)
    similarity.ivf_index_append(emb.filter(F.col("vec_id") % 3 == 1), path)
    similarity.ivf_index_append(emb.filter(F.col("vec_id") % 3 == 2), path)
    before_rows = spark.read.parquet(f"{path}/lists.parquet").count()
    res_before = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    report = similarity.compact_ivf_lists(spark, path)
    assert report["files_after"] < report["files_before"]
    lists = spark.read.parquet(f"{path}/lists.parquet")
    assert lists.count() == before_rows
    assert {r.batch for r in lists.select("batch").distinct().collect()} == {0}
    res_after = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    assert res_after == res_before and res_after


def test_ivf_index_append_replay_is_idempotent(spark, tmp_path):
    """Re-running an append with the same batch id (the crash-replay /
    speculative-retry case) overwrites exactly its own (cid, batch)
    partitions — no duplicated vectors, identical query results."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(first, path, n_centroids=8)
    similarity.ivf_index_append(second, path, batch=7)
    once = spark.read.parquet(f"{path}/lists.parquet").count()
    res_once = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    similarity.ivf_index_append(second, path, batch=7)  # replay
    assert spark.read.parquet(f"{path}/lists.parquet").count() == once
    res_twice = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    assert res_twice == res_once
    # auto-numbering continues past the replayed batch
    similarity.ivf_index_append(second.limit(0), path)  # no-op rows, batch 8
    batches = {
        r.batch
        for r in spark.read.parquet(f"{path}/lists.parquet")
        .select("batch")
        .distinct()
        .collect()
    }
    assert batches == {0, 7}


def test_trigram_score_hand_computed(spark):
    """Corpus: aaa appears 3×, aab/xyz/yzq once each, total 6. Per-occ
    scores floor(1e9·cnt/6); doc means floor again; <3-char docs 0."""
    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "aaab"), (2, "xyzq"), (3, "ab")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_tri, r.tri_score) for r in
           textstats.trigram_score(docs).collect()}
    assert got == {
        0: (2, 500_000_000),   # aaa, aaa
        1: (2, 333_333_333),   # (500000000 + 166666666) // 2
        2: (2, 166_666_666),   # two singleton trigrams
        3: (0, 0),             # too short for any trigram
    }


def test_trigram_score_ranks_fluent_over_noise(spark):
    # many docs sharing common trigrams vs one mojibake doc: the noise
    # doc must score strictly lowest — the curation use of the signal
    rows = [(i, "the cat sat on the mat") for i in range(5)]
    rows.append((99, "zq8#k!vw0&xj"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.tri_score for r in textstats.trigram_score(docs).collect()}
    assert got[99] < min(got[i] for i in range(5))


def test_trigram_model_join_is_broadcast(spark):
    docs = spark.createDataFrame([(0, "abcdef")], ["doc_id", "text"])
    plan = textstats.trigram_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_asof_join_strict_prior_semantics(spark):
    """Hand-checkable as-of: equal-timestamp references are excluded
    (strict), keys without any prior reference carry nulls."""
    import datetime as dt

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    probe = spark.createDataFrame(
        [(1, 10, T(5)), (2, 10, T(10)), (3, 10, T(10)), (4, 20, T(7)), (5, 30, T(9))],
        "event_id long, user_id long, ts timestamp",
    )
    ref = spark.createDataFrame(
        [(10, T(3), 100, 1.5), (10, T(10), 101, 2.5), (20, T(7), 102, 3.5)],
        "user_id long, ts timestamp, ref_id long, ref_value double",
    )
    got = {r.event_id: (r.ref_id, r.ref_value) for r in ev.asof_join(probe, ref).collect()}
    assert got == {
        1: (100, 1.5),   # ts 5 → latest prior ref at ts 3
        2: (100, 1.5),   # ts 10 → the ts-10 ref is NOT prior (strict)
        3: (100, 1.5),
        4: (None, None),  # user 20's only ref is same-instant
        5: (None, None),  # user 30 has no refs
    }


def test_asof_join_plan_is_one_shuffle_no_range_join(spark):
    import datetime as dt

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    probe = spark.createDataFrame(
        [(1, 10, T(5))], "event_id long, user_id long, ts timestamp"
    )
    ref = spark.createDataFrame(
        [(10, T(3), 1, 0.5)], "user_id long, ts timestamp, ref_id long, ref_value double"
    )
    plan = ev.asof_join(probe, ref)._jdf.queryExecution().executedPlan().toString()
    # the union trick: a window over the key, never a join of any kind
    assert "Window" in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node


def test_range_join_containment_hand_checked(spark):
    """Points land in exactly the intervals containing them, boundaries
    inclusive, and an interval spanning many buckets matches a point
    exactly once (the single-bucket-per-point guarantee)."""
    import datetime as dt

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    pts = spark.createDataFrame(
        [(1, T(1, 30)), (2, T(5)), (3, T(23))], "pid long, ts timestamp"
    )
    ivals = spark.createDataFrame(
        [
            (10, T(1), T(2)),        # contains p1 only
            (11, T(1, 30), T(5)),    # boundary-inclusive both ends: p1, p2
            (12, T(0), T(23)),       # spans 24 buckets: all three, once each
        ],
        "iid long, session_start timestamp, session_end timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in ev.range_join(pts, ivals, "ts").collect()
    )
    assert got == [(1, 10), (1, 11), (1, 12), (2, 11), (2, 12), (3, 12)]


def test_range_join_equals_naive_inequality_join(spark):
    """Property: the bucketized rewrite equals the naive inequality
    join on random data across bucket sizes (incl. buckets much
    smaller and much larger than the intervals)."""
    import datetime as dt
    import random

    rnd = random.Random(11)
    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=rnd.randrange(86400))) for i in range(60)],
        "pid long, ts timestamp",
    )
    rows = []
    for i in range(40):
        s = rnd.randrange(86400)
        rows.append(
            (i, base + dt.timedelta(seconds=s),
             base + dt.timedelta(seconds=s + rnd.randrange(1, 14400)))
        )
    ivals = spark.createDataFrame(
        rows, "iid long, session_start timestamp, session_end timestamp"
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            ivals,
            (F.col("session_start") <= F.col("ts"))
            & (F.col("ts") <= F.col("session_end")),
        ).collect()
    )
    for bucket in (60, 3600, 86400 * 2):
        got = sorted(
            (r.pid, r.iid)
            for r in ev.range_join(pts, ivals, "ts", bucket_seconds=bucket).collect()
        )
        assert got == naive, bucket


def test_range_join_plan_is_equi_join_not_nested_loop(spark):
    import datetime as dt

    T = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame([(1, T)], "pid long, ts timestamp")
    ivals = spark.createDataFrame(
        [(1, T, T)], "iid long, session_start timestamp, session_end timestamp"
    )
    plan = ev.range_join(pts, ivals)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_multi_resolution_rollup_derived_equals_direct(spark):
    """The re-aggregation property: every coarse level (derived from
    the finest aggregates, never from raw events) must equal the same
    rollup computed directly from the raw stream."""
    from webpagesgraphdatabase_spark.io_tpch import load_table

    events_df = load_table(spark, "/root/testdata/sf0.001", "events")
    rolled = ev.multi_resolution_rollup(events_df, (5, 60, 1440))
    for m in (5, 60, 1440):
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in rolled.filter(F.col("resolution_min") == m).collect()
        }
        direct = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in ev.windowed_counts(events_df, minutes=m).collect()
        }
        assert set(got) == set(direct), m
        for k in got:
            assert got[k][0] == direct[k][0], (m, k)
            assert abs(got[k][1] - direct[k][1]) < 1e-6, (m, k)


def test_multi_resolution_rollup_rejects_non_nesting(spark):
    events_df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with pytest.raises(ValueError, match="not a multiple"):
        ev.multi_resolution_rollup(events_df, (5, 7))


def test_multi_resolution_rollup_scans_raw_once(spark):
    """The materialized fine level must make the union read raw parquet
    exactly once — without it Spark recomputes each branch and the raw
    source is scanned once per resolution (measured: 3 scans)."""
    from webpagesgraphdatabase_spark.io_tpch import load_table

    events_df = load_table(spark, "/root/testdata/sf0.001", "events")
    spark.catalog.clearCache()  # other rollup tests may have persisted
    # with no cache: the unmaterialized union recomputes each branch —
    # three raw scans, the shape to avoid
    unmat = ev.multi_resolution_rollup(events_df, materialize=False)
    unplan = unmat._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in unplan
    assert unplan.count("Scan parquet") == 3
    try:
        rolled = ev.multi_resolution_rollup(events_df)
        plan = rolled._jdf.queryExecution().executedPlan().toString()
        # every level reads the cached fine table (the parquet lineage
        # printed inside InMemoryTableScan is the cache-miss fallback,
        # not a separate scan; the cache is populated exactly once)
        assert plan.count("InMemoryTableScan") == 3
    finally:
        spark.catalog.clearCache()


def test_kmv_pair_overlap_exact_branch_is_exact(spark):
    """Unions under k hashes take the exact branch: union_est is the
    true union size and inter_est the true intersection."""
    from webpagesgraphdatabase_spark.operators import sketches

    rows = (
        [("A", m) for m in range(10)]
        + [("B", m) for m in range(5, 15)]     # |A∩B| = 5, |A∪B| = 15
        + [("C", m) for m in range(100, 110)]  # disjoint from both
    )
    df = spark.createDataFrame(rows, ["seg", "member"])
    got = {
        (r.key_a, r.key_b): (r.k_used, r.common, r.union_est, r.inter_est)
        for r in sketches.kmv_pair_overlap(df, "seg", "member", k=32).collect()
    }
    assert got[("A", "B")] == (15, 5, 15.0, 5.0)
    assert got[("A", "C")][1] == 0 and got[("A", "C")][3] == 0.0
    assert got[("B", "C")][1] == 0 and got[("B", "C")][3] == 0.0


def test_kmv_pair_overlap_identical_sets_estimate_full_overlap(spark):
    from webpagesgraphdatabase_spark.operators import sketches

    rows = [(s, m) for s in ("X", "Y") for m in range(500)]  # identical, > k
    df = spark.createDataFrame(rows, ["seg", "member"])
    r = sketches.kmv_pair_overlap(df, "seg", "member", k=32).collect()[0]
    # every union-sketch hash is in both sides → inter_est == union_est,
    # and the estimate is in the right ballpark of the true 500
    assert r.common == r.k_used == 32
    assert r.inter_est == r.union_est
    assert 250 < r.union_est < 1000


def test_kmv_sketch_estimate_quality_on_testdata(spark):
    """On the real events table the sketch estimate must land within
    the theory's ~3/sqrt(k) relative-error envelope of the exact
    answer (k=32 → ~53%; generous bound, deterministic data)."""
    from webpagesgraphdatabase_spark.io_tpch import load_table
    from webpagesgraphdatabase_spark.operators import sketches

    ev_df = load_table(spark, "/root/testdata/sf0.01", "events")
    du = ev_df.select("event_type", "user_id").distinct()
    exact = {
        (r.a, r.b): r.n
        for r in du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("a"), F.col("y.event_type").alias("b")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in sketches.kmv_pair_overlap(ev_df, "event_type", "user_id").collect():
        true_inter = exact.get((r.key_a, r.key_b), 0)
        assert abs(r.inter_est - true_inter) <= max(10, 0.55 * true_inter), (
            r.key_a,
            r.key_b,
            r.inter_est,
            true_inter,
        )


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet-style boilerplate removal)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_drops_repeated_segments_keeps_first(spark):
    """Chunk mode with tiny segments: a 2-token segment repeated across
    docs survives only at its first (doc_id, seg_idx) occurrence, and
    each doc's clean text preserves original segment order."""
    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),          # segs: "a b","c d","e f"
            (1, "x y a b"),              # "x y" kept, "a b" dropped (seen in doc 0)
            (2, "a b x y"),              # both segs already seen
            (3, ""),                     # empty text -> 0 segs
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.paragraph_dedup(df, mode="chunk", seg_tokens=2).collect()
    }
    assert (out[0].n_segs, out[0].n_dropped, out[0].clean_text) == (3, 0, "a b c d e f")
    assert (out[1].n_segs, out[1].n_dropped, out[1].clean_text) == (2, 1, "x y")
    assert (out[2].n_segs, out[2].n_dropped, out[2].clean_text) == (2, 2, "")
    assert (out[3].n_segs, out[3].n_dropped, out[3].clean_text) == (0, 0, "")


def test_paragraph_dedup_newline_mode(spark):
    """Newline mode: repeated boilerplate lines dedup across docs;
    blank lines are not segments; ragged final chunks are fine."""
    df = spark.createDataFrame(
        [
            (0, "header boilerplate\nunique alpha text\n\nfooter boilerplate"),
            (1, "header boilerplate\nunique beta text\nfooter boilerplate"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.paragraph_dedup(df, mode="newline").collect()
    }
    assert (out[0].n_segs, out[0].n_dropped) == (3, 0)
    assert out[1].n_segs == 3 and out[1].n_dropped == 2
    assert out[1].clean_text == "unique beta text"


def test_doc_segments_ragged_tail(spark):
    """A doc whose token count is not a multiple of seg_tokens gets a
    shorter final segment, never padding or loss."""
    df = spark.createDataFrame([(7, "a b c d e")], "doc_id long, text string")
    segs = sorted(
        (r.seg_idx, r.seg)
        for r in dedup.doc_segments(df, mode="chunk", seg_tokens=2).collect()
    )
    assert segs == [(0, "a b"), (1, "c d"), (2, "e")]


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: cluster-bucketed embedding near-dup)
# ---------------------------------------------------------------------------


def test_semantic_dedup_within_cluster_keep_smallest(spark):
    """Two well-separated clusters with explicit centroids: in-cluster
    near-dups point at the smallest in-cluster id; singletons keep."""
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.99, 0.14]),   # near-dup of 0 (same cluster)
            (2, [0.0, 1.0]),
            (3, [0.1, 0.995]),   # near-dup of 2 (other cluster)
        ],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0])],
        "cid long, cemb array<float>",
    ).selectExpr(
        "cid", "cemb", "sqrt(aggregate(cemb, 0.0D, (a, x) -> a + x * x)) AS cnrm"
    )
    out = {
        r.vec_id: r
        for r in similarity.semantic_dedup(emb, threshold=0.9, cents=cents).collect()
    }
    assert (out[0].cluster_id, out[0].dup_of, out[0].keep) == (0, -1, 1)
    assert (out[1].cluster_id, out[1].dup_of, out[1].keep) == (0, 0, 0)
    assert (out[2].cluster_id, out[2].dup_of, out[2].keep) == (2, -1, 1)
    assert (out[3].cluster_id, out[3].dup_of, out[3].keep) == (2, 2, 0)


def test_semantic_dedup_misses_cross_cluster_pairs(spark):
    """The documented recall trade: a near-dup pair split across
    clusters is NOT flagged (both keep), while brute-force cosine
    (cosine_neardup) does find it."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.05]), (1, [1.0, -0.05])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.2]), (11, [1.0, -0.2])],
        "cid long, cemb array<float>",
    ).selectExpr(
        "cid", "cemb", "sqrt(aggregate(cemb, 0.0D, (a, x) -> a + x * x)) AS cnrm"
    )
    sd = {r.vec_id: r for r in similarity.semantic_dedup(emb, 0.9, cents=cents).collect()}
    assert sd[0].cluster_id != sd[1].cluster_id
    assert sd[0].keep == 1 and sd[1].keep == 1
    bf = similarity.cosine_neardup(emb, 0.9).collect()
    assert [(r.vec_a, r.vec_b) for r in bf] == [(0, 1)]


def test_semantic_dedup_auto_sizing_runs_on_corpus(spark):
    """Default quantizer path (auto-sized seeded sample) on the real
    table: every vector gets exactly one verdict, keepers ∪ dups
    partition the corpus, and dup_of is always a smaller same-cluster id."""
    from webpagesgraphdatabase_spark.io_tpch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    out = similarity.semantic_dedup(emb, corpus_count=n)
    rows = out.collect()
    assert len(rows) == n
    for r in rows:
        assert (r.keep == 1) == (r.dup_of == -1)
        if r.dup_of != -1:
            assert r.dup_of < r.vec_id


# ---------------------------------------------------------------------------
# training-shard writer (packed corpus at rest + manifest)
# ---------------------------------------------------------------------------


def test_write_training_shards_roundtrip_and_manifest(spark, tmp_path):
    from webpagesgraphdatabase_spark.io_tpch import load_table
    from webpagesgraphdatabase_spark.operators import packing

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "shards")
    manifest = packing.write_training_shards(docs, path).collect()

    # every document lands in exactly one shard; totals add up
    assert sum(m.n_docs for m in manifest) == docs.count()
    direct = packing.pack_sequences(docs)
    per_shard = {
        r.shard: (r.n, r.tok)
        for r in direct.groupBy("shard")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    }
    for m in manifest:
        assert per_shard[m.shard] == (m.n_docs, m.n_tokens)

    # at-rest rows are sorted in pack order within each shard
    rows = (
        spark.read.parquet(path)
        .filter(F.col("shard") == manifest[0].shard)
        .select("seq_id", "seq_offset", "doc_id")
        .collect()
    )
    keys = [(r.seq_id, r.seq_offset, r.doc_id) for r in rows]
    assert keys == sorted(keys)

    # verifier: consistent directory -> empty report
    assert packing.verify_shards(spark, path).count() == 0


def test_write_training_shards_deterministic(spark, tmp_path):
    from webpagesgraphdatabase_spark.io_tpch import load_table
    from webpagesgraphdatabase_spark.operators import packing

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    m1 = {
        r.shard: r.docs_md5
        for r in packing.write_training_shards(docs, str(tmp_path / "a")).collect()
    }
    m2 = {
        r.shard: r.docs_md5
        for r in packing.write_training_shards(docs, str(tmp_path / "b")).collect()
    }
    assert m1 == m2


def test_verify_shards_catches_tampering(spark, tmp_path):
    from webpagesgraphdatabase_spark.io_tpch import load_table
    from webpagesgraphdatabase_spark.operators import packing

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "shards")
    packing.write_training_shards(docs, path)
    # tamper: drop one shard's data files entirely
    import shutil

    victim = next(p for p in (tmp_path / "shards").iterdir() if p.name.startswith("shard="))
    shutil.rmtree(victim)
    bad = packing.verify_shards(spark, path).collect()
    assert len(bad) >= 1


# ---------------------------------------------------------------------------
# trained quality classifier (distributed logistic regression)
# ---------------------------------------------------------------------------


def test_quality_classifier_separates_synthetic_classes(spark):
    """Good docs (long, wordy, low stopword share) vs junk (short,
    stopword-heavy): training must drive loss down and rank every good
    doc above every junk doc."""
    good = [
        (i, "substantial informative paragraph discussing engines " * 8)
        for i in range(20)
    ]
    junk = [(100 + i, "the the a of " * 2) for i in range(20)]
    docs = spark.createDataFrame(good + junk, ["doc_id", "text"])
    labels = spark.createDataFrame(
        [(i, 1.0) for i, _ in good] + [(i, 0.0) for i, _ in junk],
        "doc_id long, label double",
    )
    model = textstats.train_quality_classifier(docs, labels, n_iters=30)
    assert model["loss"][-1] < model["loss"][0] * 0.5
    scores = {
        r.doc_id: r.lr_quality
        for r in textstats.quality_lr_score(docs, model).collect()
    }
    assert min(scores[i] for i, _ in good) > max(scores[i] for i, _ in junk)


def test_quality_classifier_weak_labels_default(spark):
    """Default (no labels): weak supervision from the heuristic rule;
    the smooth scorer must agree with the hard rule on the real corpus
    for the vast majority of documents."""
    from webpagesgraphdatabase_spark.io_tpch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    model = textstats.train_quality_classifier(docs, n_iters=25)
    both = (
        textstats.quality_lr_score(docs, model)
        .join(textstats.quality_score(docs), "doc_id")
        .select(
            ((F.col("lr_quality") >= 0.5) == (F.col("quality") >= 0.5))
            .cast("int")
            .alias("agree")
        )
        .agg(F.avg("agree").alias("rate"))
        .first()
    )
    assert both.rate >= 0.9


def test_quality_lr_score_is_pure_map(spark):
    """Scoring must not shuffle and must stay JVM-side (stream-safe)."""
    docs = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    model = {"weights": [0.1, 0.2, 0.3, -0.4, 0.5], "mean": [1, 2, 3, 4], "std": [1, 1, 1, 1]}
    df = textstats.quality_lr_score(docs, model)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_curation_flags_boilerplate_without_whole_doc_dup(spark):
    """A document stitched from segments of two other documents is
    flagged 'boilerplate' by the segment-dedup rule even though no
    whole-document rule (exact/near dup) fires."""
    from webpagesgraphdatabase_spark.operators import curation

    seg_a = " ".join(f"a{i}" for i in range(10))
    seg_b = " ".join(f"b{i}" for i in range(10))
    uniq1 = " ".join(f"u{i}" for i in range(10))
    uniq2 = " ".join(f"v{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"{seg_a} {uniq1}"),
            (2, f"{seg_b} {uniq2}"),
            (3, f"{seg_a} {seg_b}"),  # both segments already seen
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in curation.curation_report(docs).collect()}
    assert out[1].keep == 1 and out[2].keep == 1
    assert out[3].reasons == "boilerplate" and out[3].keep == 0


# ---------------------------------------------------------------------------
# ordered funnel analysis
# ---------------------------------------------------------------------------


def test_funnel_requires_strict_order(spark):
    """User 1 converts in order; user 2 has all three event types but
    purchase precedes click, so the chain stops at depth 2; user 3
    never views -> absent from the funnel output."""
    t = datetime.datetime(2024, 1, 1)

    def e(eid, ts_min, uid, typ):
        return (eid, t + datetime.timedelta(minutes=ts_min), uid, typ, 1.0, "{}")

    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    ev_df = spark.createDataFrame(
        [
            e(1, 0, 1, "view"), e(2, 5, 1, "click"), e(3, 9, 1, "purchase"),
            e(4, 0, 2, "purchase"), e(5, 3, 2, "view"), e(6, 7, 2, "click"),
            e(7, 1, 3, "click"), e(8, 2, 3, "purchase"),
        ],
        ddl,
    )
    out = {r.user_id: r for r in ev.funnel(ev_df).collect()}
    assert set(out) == {1, 2}
    assert out[1].funnel_depth == 3
    assert out[2].funnel_depth == 2 and out[2].ts_purchase is None


def test_funnel_strictly_after_not_equal(spark):
    """A click at exactly the view's timestamp does not count (strict)."""
    t = datetime.datetime(2024, 1, 1)
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    ev_df = spark.createDataFrame(
        [
            (1, t, 1, "view", 1.0, "{}"),
            (2, t, 1, "click", 1.0, "{}"),
            (3, t + datetime.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        ],
        ddl,
    )
    row = ev.funnel(ev_df, steps=("view", "click")).collect()[0]
    assert row.ts_click == t + datetime.timedelta(minutes=1)


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """merge_asof(tolerance=...) parity: a prior ref older than the
    tolerance comes back null; a fresh one still matches; untolerated
    call keeps both."""
    t = datetime.datetime(2024, 1, 1)
    probe = spark.createDataFrame(
        [(1, t + datetime.timedelta(seconds=30)), (1, t + datetime.timedelta(seconds=300))],
        "user_id long, ts timestamp_ntz",
    )
    ref = spark.createDataFrame(
        [(1, t, 7, 0.5)],
        "user_id long, ts timestamp_ntz, ref_id long, ref_value double",
    )
    loose = {r.ts: r.ref_id for r in ev.asof_join(probe, ref).collect()}
    tight = {r.ts: r.ref_id for r in ev.asof_join(probe, ref, tolerance_s=60).collect()}
    assert loose[t + datetime.timedelta(seconds=30)] == 7
    assert loose[t + datetime.timedelta(seconds=300)] == 7
    assert tight[t + datetime.timedelta(seconds=30)] == 7
    assert tight[t + datetime.timedelta(seconds=300)] is None


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_heavy_hitters_guarantees_on_skewed_keys(spark):
    """est ≤ true ≤ est + max_err for every reported key, and every key
    whose true count exceeds max_err is reported — under a small k that
    forces evictions."""
    from webpagesgraphdatabase_spark.operators import sketches

    rows = (
        [("hot",)] * 500
        + [("warm",)] * 120
        + [(f"cold{i}",) for i in range(400)]
    )
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    out = sketches.heavy_hitters(df, "k", k=8).collect()
    true = {"hot": 500, "warm": 120, **{f"cold{i}": 1 for i in range(400)}}

    reported = {r.k: r for r in out}
    max_err = out[0].max_err
    # state is bounded: ≤ k counters per partition (spread() may widen
    # the frame to the cluster's default parallelism)
    n_parts = spark.sparkContext.defaultParallelism
    assert len(reported) <= 8 * n_parts
    for key, r in reported.items():
        assert r.est_count <= true[key] <= r.est_count + max_err, (key, r)
    for key, cnt in true.items():
        if cnt > max_err:
            assert key in reported, (key, cnt, max_err)
    assert out[0].k == "hot"  # ordered by estimated count


def test_heavy_hitters_exact_when_k_exceeds_cardinality(spark):
    """With capacity above the distinct-key count, no evictions happen:
    estimates are exact and max_err is 0."""
    from webpagesgraphdatabase_spark.operators import sketches

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, ["k"])
    out = {r.k: r for r in sketches.heavy_hitters(df, "k", k=10).collect()}
    assert {k: v.est_count for k, v in out.items()} == {"a": 5, "b": 3, "c": 2}
    assert all(r.max_err == 0 for r in out.values())


def test_heavy_hitters_casts_non_string_keys_and_leaves_no_cached_blocks(spark):
    """r5 advice: non-string key columns must work (cast to string, not
    fail at the Arrow boundary), and the call must not leave persisted
    blocks behind for the session (the old shape cached partition
    summaries and never unpersisted them)."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.operators import sketches

    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    df = spark.range(0, 2100).select((F.col("id") % 7).alias("k"))
    out = {r.k: r.est_count for r in sketches.heavy_hitters(df, "k", k=16).collect()}
    assert out == {str(i): 300 for i in range(7)}  # long keys → string out
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after == before


def test_window_anomalies_flags_spike_not_baseline(spark):
    """Steady 5-minute click volume with one 10x spike window: only the
    spike is flagged, and early windows (insufficient history) never
    are."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for w in range(12):
        n = 100 if w == 9 else 10
        for i in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(minutes=5 * w, seconds=i % 300),
                 1, "click", 1.0, "{}")
            )
            eid += 1
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    df = spark.createDataFrame(rows, ddl).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = sorted(
        ev.window_anomalies(df, minutes=5).collect(), key=lambda r: r.window_start
    )
    flags = [r.anomaly for r in out]
    assert flags == [0] * 9 + [1, 0, 0]
    assert out[9].n_events == 100 and out[9].trailing_mean == 10.0


def test_window_anomalies_zero_variance_history(spark):
    """Identical history (std 0): any deviation flags; equality does not."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for w in range(8):
        n = 5 if w < 7 else 6
        for i in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(minutes=5 * w, seconds=i),
                 1, "view", 1.0, "{}")
            )
            eid += 1
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    df = spark.createDataFrame(rows, ddl).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = sorted(
        ev.window_anomalies(df, minutes=5).collect(), key=lambda r: r.window_start
    )
    assert [r.anomaly for r in out] == [0] * 7 + [1]


def test_temperature_weights_flatten_toward_uniform(spark):
    """alpha=1 reproduces natural proportions; smaller alpha moves the
    minority stratum's weight toward uniform, never past it."""
    from webpagesgraphdatabase_spark.operators import sampling

    rows = [(i, "en") for i in range(90)] + [(90 + i, "de") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    natural = sampling.temperature_weights(df, alpha=1.0)
    assert natural["en"] == pytest.approx(0.9) and natural["de"] == pytest.approx(0.1)
    smoothed = sampling.temperature_weights(df, alpha=0.3)
    assert 0.1 < smoothed["de"] < 0.5
    flat = sampling.temperature_weights(df, alpha=0.0)
    assert flat["de"] == pytest.approx(0.5)
    # feeds the deterministic mixture draw unchanged
    mix = sampling.mixture_sample(df, smoothed, total=20)
    got = {r.lang: r.quota for r in mix.collect()}
    assert got["de"] == int(20 * smoothed["de"])


# ---------------------------------------------------------------------------
# distributed PCA / whitening
# ---------------------------------------------------------------------------


def test_pca_whitening_gives_identity_covariance(spark):
    """Correlated synthetic embeddings: after whitening, the sample
    covariance is ~identity; without whitening, components carry the
    eigenvalue spread."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(400, 3) @ np.array(
        [[3.0, 0.0, 0.0], [1.5, 1.0, 0.0], [0.0, 0.2, 0.1]]
    )
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(base)],
        "vec_id long, embedding array<float>",
    )
    model = similarity.pca_model(emb)
    assert model["components"].shape == (3, 3)
    assert (model["eigvals"][:-1] >= model["eigvals"][1:]).all()

    proj = similarity.pca_project(emb, model, whiten=True).collect()
    y = np.array([r.embedding for r in proj], dtype=np.float64)
    cov = np.cov(y, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(3), atol=0.05), cov


def test_pca_distributed_stats_match_numpy(spark):
    """gram_stats' partition-partial reduction equals the single-node
    computation exactly (same doubles, order-insensitive sums)."""
    import numpy as np

    rng = np.random.RandomState(3)
    x = rng.randn(257, 4)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).repartition(16)
    n, mean, gram = similarity.gram_stats(emb)
    x64 = np.array(x, dtype=np.float32).astype(np.float64)
    assert n == 257
    assert np.allclose(mean, x64.mean(axis=0), atol=1e-9)
    assert np.allclose(gram, x64.T @ x64, atol=1e-6)


def test_pca_projection_is_pure_map_and_truncates(spark):
    import numpy as np

    emb = spark.createDataFrame(
        [(i, [float(i), float(2 * i), 0.5]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    model = similarity.pca_model(emb, k=1)
    out = similarity.pca_project(emb, model)
    assert len(out.first().embedding) == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca_projection_composes_with_ann(spark):
    """The projected table is a first-class embedding table: the ANN
    stack runs on it unchanged, and on data with a dominant noise
    direction, whitening recovers the true nearest neighbor."""
    import numpy as np

    rng = np.random.RandomState(11)
    # pairs along a signal axis, swamped by a high-variance noise axis
    signal = np.repeat(np.arange(25, dtype=np.float64), 2) * 0.1
    noise = rng.randn(50) * 50.0
    x = np.stack([signal + rng.randn(50) * 0.01, noise], axis=1)
    emb = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    model = similarity.pca_model(emb)
    white = similarity.pca_project(emb, model, whiten=True)
    # composes: exact top-k over the projected table
    top = similarity.ann_bruteforce(white, n_queries=1, k=1).collect()
    assert len(top) == 1 and top[0].query_id == 0


def test_pca_model_roundtrips_through_disk(spark, tmp_path):
    import numpy as np

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    model = similarity.pca_model(emb, k=2)
    path = str(tmp_path / "pca.json")
    similarity.pca_save(model, path)
    loaded = similarity.pca_load(path)
    a = similarity.pca_project(emb, model, whiten=True).collect()
    b = similarity.pca_project(emb, loaded, whiten=True).collect()
    assert [r.embedding for r in a] == [r.embedding for r in b]
    assert np.array_equal(model["components"], loaded["components"])


def test_paragraph_dedup_degenerate_identical_corpus(spark):
    """Worst-case segment skew: every document identical. The keep-first
    window concentrates one hot segment key; output must still be exact
    — doc 0 keeps everything, every other doc is fully boilerplate."""
    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(i, text) for i in range(200)], "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.paragraph_dedup(df).collect()}
    assert out[0].n_dropped == 0 and out[0].clean_text == text
    for i in range(1, 200):
        assert out[i].n_dropped == out[i].n_segs and out[i].clean_text == ""


def test_bottomk_quantile_sketch_error_and_mergeability(spark):
    """The bottom-k sample's p50 lands within the O(1/sqrt(k)) rank
    envelope of the exact median, and the sketch is a true mergeable
    accumulator: bottom-k over the full set equals bottom-k over the
    union of per-half bottom-k samples."""
    from webpagesgraphdatabase_spark.operators import sketches

    n = 20_000
    rows = [("all", i, float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, ["seg", "rid", "value"])
    got = sketches.bottomk_sample_quantiles(
        df, "seg", "rid", "value", k=256
    ).collect()[0]
    assert got.bq_n_sample == 256
    # exact p50 = 9999.5; 3/sqrt(256) rank error => ~±3750 here
    assert abs(got.bq_p50 - (n - 1) / 2) < 0.20 * n
    # determinism: same inputs, same estimate
    again = sketches.bottomk_sample_quantiles(
        df, "seg", "rid", "value", k=256
    ).collect()[0]
    assert (got.bq_p50, got.bq_p90) == (again.bq_p50, again.bq_p90)
    # mergeability: union of per-half samples re-sketched == full sketch
    half1 = spark.createDataFrame(rows[: n // 2], ["seg", "rid", "value"])
    half2 = spark.createDataFrame(rows[n // 2 :], ["seg", "rid", "value"])
    import pyspark.sql.functions as F

    def sample_rows(d, k=256):
        # the sketch's state: its sampled rows (k smallest hashes)
        den = 16**13
        hv = F.expr(
            "cast(conv(substr(md5(cast(rid as string)), 1, 13), 16, 10)"
            " as bigint)"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("seg").orderBy("hv", "rid")
        return (
            d.withColumn("hv", hv)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("seg", "rid", "value")
        )

    merged_state = sample_rows(sample_rows(half1).unionByName(sample_rows(half2)))
    full_state = sample_rows(df)
    assert sorted(r.rid for r in merged_state.collect()) == sorted(
        r.rid for r in full_state.collect()
    )


def test_duplicated_window_stats_hand_corpus(spark):
    """Two docs sharing a 5-token span: 4-token windows inside the span
    are duplicated; the lower doc_id is the canonical copy (foreign=0),
    the higher sees them as foreign. A unique doc reports zero dups."""
    from webpagesgraphdatabase_spark.operators import dedup

    shared = "the quick brown fox jumps"
    rows = [
        (1, f"alpha {shared} omega"),
        (2, f"start {shared} end zz"),
        (3, "completely unrelated text here indeed"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in dedup.duplicated_window_stats(docs).collect()}
    # 7 tokens -> 4 windows; the shared 5-token run yields 2 shared windows
    assert got[1].n_spanwin == 4 and got[2].n_spanwin == 5
    assert got[1].n_dup_windows == 2 and got[2].n_dup_windows == 2
    assert got[1].n_foreign_dup == 0  # doc 1 is the canonical copy
    assert got[2].n_foreign_dup == 2
    assert got[3].n_dup_windows == 0


def test_strip_duplicated_spans_keeps_first_occurrence(spark):
    """The canonical doc keeps the span verbatim; later docs lose the
    covered tokens and keep everything else in order."""
    from webpagesgraphdatabase_spark.operators import dedup

    shared = "one two three four"
    rows = [
        (1, f"alpha {shared} omega"),
        (2, f"pre {shared} post tail"),
        (3, "no duplication in this document"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.deduped_text for r in
           dedup.strip_duplicated_spans(docs).collect()}
    assert got[1] == f"alpha {shared} omega"
    assert got[2] == "pre post tail"
    assert got[3] == "no duplication in this document"


def test_strip_duplicated_spans_self_repetition_survives(spark):
    """Within-doc repetition is not foreign: a doc repeating its own
    span keeps both copies (the operator removes cross-doc copies)."""
    from webpagesgraphdatabase_spark.operators import dedup

    rows = [(7, "a b c d a b c d")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = dedup.strip_duplicated_spans(docs).collect()[0]
    assert got.deduped_text == "a b c d a b c d"


def test_strip_duplicated_spans_fully_stripped_doc_keeps_row(spark):
    """An exact duplicate of an earlier doc — the operator's primary
    target — is fully covered by foreign windows; it must still emit a
    (doc_id, "") row (the paragraph_dedup contract), not vanish from
    the output (r6 advice item 2)."""
    from webpagesgraphdatabase_spark.operators import dedup

    rows = [(1, "one two three four five"), (2, "one two three four five")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.deduped_text for r in
           dedup.strip_duplicated_spans(docs).collect()}
    assert got == {1: "one two three four five", 2: ""}


def test_span_window_8_hand_corpus(spark):
    """window=8 (a width Lee et al. actually sweep): a shared 9-token
    run yields two 8-token duplicated windows; a 10-token doc has 3
    windows total. The shorter shared 4-run that window=4 flags is
    invisible at width 8."""
    from webpagesgraphdatabase_spark.operators import dedup

    shared9 = "a b c d e f g h i"
    rows = [
        (1, f"{shared9} x"),           # 10 tokens -> 3 windows of 8
        (2, f"y {shared9}"),           # 10 tokens -> 3 windows of 8
        (3, "one two three four unrelated text pad pad2"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r
        for r in dedup.duplicated_window_stats(docs, window=8).collect()
    }
    assert got[1].n_spanwin == 3 and got[2].n_spanwin == 3
    # the 9-token shared run contains exactly 2 distinct 8-windows
    assert got[1].n_dup_windows == 2 and got[2].n_dup_windows == 2
    assert got[1].n_foreign_dup == 0 and got[2].n_foreign_dup == 2
    assert got[3].n_dup_windows == 0
    # strip at width 8: doc 2 loses the 9 covered tokens, keeps "y"
    stripped = {
        r.doc_id: r.deduped_text
        for r in dedup.strip_duplicated_spans(docs, window=8).collect()
    }
    assert stripped[1] == f"{shared9} x"
    assert stripped[2] == "y"
    with pytest.raises(ValueError):
        dedup.duplicated_window_stats(docs, window=1)


def test_pq_exact_when_codebook_saturates(spark):
    """With ks >= corpus size and no training, every vector is its own
    codeword: PQ reconstruction is lossless and ann_pq must equal the
    brute-force top-k exactly — pins the codes/LUT/ADC plumbing with
    no compression error in the way."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(16)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 4, 3).collect()
    }
    pq = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in similarity.ann_pq(
            emb, 4, 3, m=4, ks=16, n_iters=0, dim=16
        ).collect()
    }
    assert pq == exact


def test_pq_codes_shape_and_determinism(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    book = similarity.train_pq(emb, m=4, ks=8, n_iters=2, dim=16)
    assert book.count() == 4 * 8
    codes = similarity.pq_encode(emb, book, m=4, dim=16)
    got = {r.vec_id: tuple(r.codes) for r in codes.collect()}
    assert len(got) == 40
    assert all(len(c) == 4 for c in got.values())
    assert all(0 <= x < 8 for c in got.values() for x in c)
    again = {
        r.vec_id: tuple(r.codes)
        for r in similarity.pq_encode(
            emb, similarity.train_pq(emb, m=4, ks=8, n_iters=2, dim=16),
            m=4, dim=16,
        ).collect()
    }
    assert got == again


def test_pq_recall_high_on_clustered_data(spark):
    """Same clustered fixture as the trained-IVF test: PQ's trained
    codebooks capture the cluster directions, so ADC + re-rank should
    recover most true neighbors at 4x shortlist refinement."""
    import numpy as np

    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(16, 16))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    vid = 0
    for _ in range(25):
        for ci in range(16):
            v = dirs[ci] + 0.2 * rng.normal(size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 40, 5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_pq(
            emb, 40, 5, m=4, ks=16, n_iters=3, dim=16
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.8


def test_pq_index_at_rest_prunes_and_derives_params(spark, tmp_path):
    """IVFPQ at rest: the ADC scan reads only probed ccid partitions
    (PartitionFilters pin), m/ks come from the stored codebook, and
    the result carries exactly k ranked rows per query."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    path = similarity.build_pq_index(
        emb, str(tmp_path / "pq"), m=8, ks=16, n_iters=1, corpus_count=n
    )
    df = similarity.ann_pq_from_index(spark, path, emb, n_queries=6, k=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ccid" in plan, plan
    rows = df.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert len(per_q) == 6
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_q.values())
    # determinism across a rebuild
    path2 = similarity.build_pq_index(
        emb, str(tmp_path / "pq2"), m=8, ks=16, n_iters=1, corpus_count=n
    )
    again = similarity.ann_pq_from_index(spark, path2, emb, n_queries=6, k=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_bigram_lm_scores_hand_check(spark):
    """Tiny corpus, hand-computable add-1 model: vocab {a,b,c} (V=3);
    corpus bigrams: (a,b)x2, (b,a)x1, (b,c)x1. Doc 1 = "a b a b":
    positions (a,b),(b,a),(a,b) ->
    ln(3/5) + ln(2/5) + ln(3/5) averaged. A doc full of the corpus's
    common transition outscores one full of a rare transition."""
    import math

    from webpagesgraphdatabase_spark.operators import textstats

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in textstats.bigram_lm_scores(docs).collect()}
    # c(a,b)=2, c(b,a)=1, c(b,c)=1; contexts: c1(a)=2, c1(b)=2; V=3
    exp1 = (math.log(3 / 5) + math.log(2 / 5) + math.log(3 / 5)) / 3
    exp2 = math.log(2 / 5)
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 1
    assert abs(got[1].lm_logp - round(exp1, 6)) < 1e-9
    assert abs(got[2].lm_logp - round(exp2, 6)) < 1e-9
    assert got[1].lm_logp > got[2].lm_logp


def test_bigram_lm_gibberish_scores_below_fluent(spark):
    """Fluency ranking on a corpus with a dominant phrase pattern: the
    doc that repeats corpus-typical transitions outranks the doc of
    singleton transitions."""
    from webpagesgraphdatabase_spark.operators import textstats

    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    docs = spark.createDataFrame(
        base + [(100, "the quick brown fox"), (101, "zxq wvu tsr qpo nml")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lm_logp for r in textstats.bigram_lm_scores(docs).collect()}
    assert got[100] > got[101]


def test_pq_balanced_allocation_repairs_pca_concentration(spark):
    """Parametric OPQ (Ge et al. 2013): naive PCA rotation piles the
    variance into one subspace and PQ recall collapses; the
    eigenvalue-balanced dimension permutation restores it. Pins all
    three recall relationships on a correlated synthetic (3 dense
    latent directions + noise)."""
    import numpy as np

    rng = np.random.default_rng(13)
    d, latents = 16, 3
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    strong = basis[:, :latents]  # dense directions: cross every subspace
    rows = []
    for i in range(400):
        v = strong @ (rng.normal(size=latents) * 5.0) + 0.3 * rng.normal(size=d)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 30, 5).collect()
    }

    def recall(vectors) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_pq(
                vectors, 30, 5, m=4, ks=8, n_iters=3, dim=16
            ).collect()
        }
        return len(got & exact) / len(exact)

    raw = recall(emb)
    model = similarity.pca_model(emb)
    rotated = similarity.pca_project(emb, model)
    naive = recall(rotated)
    perm = similarity.pq_dim_permutation(model, m=4)
    balanced = recall(similarity.apply_dim_permutation(rotated, perm))
    # naive PCA concentrates the 3 strong latents into ONE subspace —
    # PQ's worst case; the balanced allocation repairs it
    assert naive <= raw - 0.2, (raw, naive)
    assert balanced >= naive + 0.3, (naive, balanced)
    assert balanced >= 0.8, balanced


def test_build_pq_index_opq_transform_is_wired_and_at_rest(spark, tmp_path):
    """build_pq_index(opq=True) persists the OPQ transform beside the
    index and ann_pq_from_index applies it to queries automatically
    (r6 verdict item 3 — the permutation was test-pinned but
    shelf-ware). Corpus with its variance concentrated in ONE raw
    subspace (dims 0-3 strong, the rest noise): plain PQ burns all
    its other subquantizers on noise, the OPQ permutation deals the
    strong dims one per subspace — the wired index must beat the
    plain one, and the transform file must exist at rest."""
    import os

    import numpy as np

    rng = np.random.default_rng(13)
    d, latents = 16, 4
    rows = []
    for i in range(400):
        v = np.concatenate(
            [rng.normal(size=latents) * 5.0, 0.3 * rng.normal(size=d - latents)]
        )
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 30, 5).collect()
    }

    def recall(path) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_pq_from_index(
                spark, path, emb, n_queries=30, k=5
            ).collect()
        }
        return len(got & exact) / len(exact)

    plain = str(tmp_path / "pq_plain")
    opq = str(tmp_path / "pq_opq")
    similarity.build_pq_index(emb, plain, m=4, ks=8, n_iters=3, dim=d)
    similarity.build_pq_index(emb, opq, m=4, ks=8, n_iters=3, dim=d, opq=True)
    assert os.path.isdir(f"{opq}/opq.parquet")
    assert not os.path.exists(f"{plain}/opq.parquet")
    r_plain, r_opq = recall(plain), recall(opq)
    assert r_opq > r_plain, (r_plain, r_opq)
    assert r_opq >= 0.8, r_opq
    # stored transform round-trips exactly
    model, perm = similarity._load_opq_transform(spark, opq)
    assert sorted(perm) == list(range(d))
    assert model["components"].shape == (d, d)


def test_build_pq_index_residual_ivfadc(spark, tmp_path):
    """residual=True is canonical IVFADC (Jégou et al. TPAMI'11 §IV):
    PQ quantizes the within-list offsets ``v - c(v)`` instead of the
    absolute positions, so on a clustered corpus the same code budget
    quantizes much finer — recall must beat or match the plain index.
    The stored codes must carry the ``vnrm`` marker column (the exact
    norm used as the ADC denominator)."""
    import numpy as np

    rng = np.random.default_rng(7)
    d, n_clusters = 16, 8
    centers = rng.normal(size=(n_clusters, d)) * 3.0
    rows = [
        (
            i,
            [
                float(x)
                for x in centers[i % n_clusters] + 1.0 * rng.normal(size=d)
            ],
        )
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 30, 5).collect()
    }

    def recall(path) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_pq_from_index(
                spark, path, emb, n_queries=30, k=5
            ).collect()
        }
        return len(got & exact) / len(exact)

    plain = str(tmp_path / "pq_plain")
    res = str(tmp_path / "pq_res")
    similarity.build_pq_index(
        emb, plain, m=4, ks=32, n_iters=3, dim=d, trained=True
    )
    similarity.build_pq_index(
        emb, res, m=4, ks=32, n_iters=3, dim=d, residual=True, trained=True
    )
    codes = spark.read.parquet(f"{res}/codes.parquet")
    assert "vnrm" in codes.columns and "rnrm" in codes.columns
    plain_codes = spark.read.parquet(f"{plain}/codes.parquet")
    assert "rnrm" not in plain_codes.columns
    r_plain, r_res = recall(plain), recall(res)
    assert r_res >= r_plain, (r_plain, r_res)
    assert r_res >= 0.8, r_res


def test_chunk_documents_sliding_windows_hand_checked(spark):
    """12-token doc, chunk=5, overlap=2 (stride 3): starts 0,3,6,9.
    Start 9 is kept (9+2 < 12 adds tokens); a hypothetical start 12
    never generates. 4-token doc -> one chunk; empty doc -> none."""
    from webpagesgraphdatabase_spark.operators import packing

    t12 = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"
    docs = spark.createDataFrame(
        [(1, t12), (2, "a b c d"), (3, "")], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.n_chunk_tokens, r.chunk_text)
        for r in packing.chunk_documents(
            docs, chunk_tokens=5, overlap=2
        ).collect()
    }
    assert got == {
        (1, 0): (0, 5, "t0 t1 t2 t3 t4"),
        (1, 1): (3, 5, "t3 t4 t5 t6 t7"),
        (1, 2): (6, 5, "t6 t7 t8 t9 t10"),
        (1, 3): (9, 3, "t9 t10 t11"),
        (2, 0): (0, 4, "a b c d"),
    }
    # a redundant tail is dropped: 6 tokens, stride 3 -> start 3 adds
    # token 5..? start 3 covers 3..6(5 tokens->3..5); prev covered 0..4;
    # 3+2=5 < 6 so kept. With 5 tokens: start 3 -> 3+2=5 not < 5 -> drop.
    five = spark.createDataFrame([(9, "a b c d e")], ["doc_id", "text"])
    rows = packing.chunk_documents(five, chunk_tokens=5, overlap=2).collect()
    assert len(rows) == 1 and rows[0].chunk_text == "a b c d e"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        packing.chunk_documents(docs, chunk_tokens=5, overlap=5)


def test_chunk_stats_matches_exploded_layout(spark):
    """chunk_stats' row-local fingerprint equals the md5 of the
    exploded layout's texts joined in chunk order, for every doc
    including empty ones (n_chunks=0, fp of '')."""
    import hashlib

    from webpagesgraphdatabase_spark.operators import packing

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven"), (2, ""), (3, "x y")],
        ["doc_id", "text"],
    )
    chunks = {}
    for r in packing.chunk_documents(docs, chunk_tokens=3, overlap=1).collect():
        chunks.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    stats = {
        r.doc_id: (r.n_chunks, r.chunk_fp)
        for r in packing.chunk_stats(docs, chunk_tokens=3, overlap=1).collect()
    }
    for doc_id in (1, 2, 3):
        texts = [t for _, t in sorted(chunks.get(doc_id, []))]
        want_fp = hashlib.md5("|".join(texts).encode()).hexdigest()
        assert stats[doc_id] == (len(texts), want_fp), doc_id


def test_sq8_encode_quantization_properties(spark):
    """Codes are int8 in [-127, 127], the max-|x| dimension maps to
    ±127 exactly, and per-dimension reconstruction error is bounded by
    half a quantization step (scale/2)."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    enc = {r.vec_id: r for r in similarity.sq8_encode(emb).collect()}
    for vid, v in vecs:
        codes = enc[vid].codes
        arr = np.array(v)
        scale = np.abs(arr).max() / 127.0
        assert max(abs(c) for c in codes) == 127
        recon = np.array(codes, dtype=float) * scale
        assert np.max(np.abs(recon - arr)) <= scale / 2 + 1e-12
        assert enc[vid].cnrm == pytest.approx(
            float(np.linalg.norm(codes)), rel=1e-12
        )


def test_ann_sq8_recall_and_index_at_rest(spark, tmp_path):
    """SQ8 + exact re-rank is near-exact (recall@5 >= 0.9 on a random
    corpus); the served-from-parquet path returns identical rows and
    reads the 4x-compressed code schema."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 10, 5).collect()
    }
    live = similarity.ann_sq8(emb, 10, 5)
    got = {(r.query_id, r.neighbor_id) for r in live.collect()}
    assert len(got & exact) / len(exact) >= 0.9

    path = str(tmp_path / "sq8")
    similarity.build_sq8_index(emb, path)
    served = similarity.ann_sq8_from_index(spark, path, emb, 10, 5)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, live.collect())
    )
    stored = spark.read.parquet(f"{path}/sq8.parquet")
    assert dict(stored.dtypes)["codes"] == "array<tinyint>"


def test_split_sentences_and_sentence_chunks(spark):
    """Rule-based sentence split (terminator runs end a sentence,
    abbreviation-blind by contract) and greedy sentence-bounded
    chunking: no sentence is ever split across chunks; every chunk
    except possibly the last stays under budget unless a single
    sentence overflows it."""
    from webpagesgraphdatabase_spark.operators import packing

    docs = spark.createDataFrame(
        [
            (1, "One two three. Four five! Six? Seven eight nine ten."),
            (2, "No terminator here"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    sents = (
        docs.select("doc_id", packing.split_sentences().alias("s"))
        .collect()
    )
    by_id = {r.doc_id: r.s for r in sents}
    assert by_id[1] == [
        "One two three.", "Four five!", "Six?", "Seven eight nine ten.",
    ]
    assert by_id[2] == ["No terminator here"]
    assert by_id[3] == []

    got = {
        (r.doc_id, r.chunk_idx): (r.n_sentences, r.n_chunk_tokens, r.chunk_text)
        for r in packing.sentence_chunks(docs, max_tokens=5).collect()
    }
    # doc 1 token counts per sentence: 3, 2, 1, 4 -> running starts
    # 0,3,5,6 -> chunks 0,0,1,1
    assert got[(1, 0)] == (2, 5, "One two three. Four five!")
    assert got[(1, 1)] == (2, 5, "Six? Seven eight nine ten.")
    assert got[(2, 0)] == (1, 3, "No terminator here")
    assert (3, 0) not in got
    # a single over-budget sentence stays whole in its own chunk
    long = spark.createDataFrame(
        [(9, "a b c d e f g h. x y.")], ["doc_id", "text"]
    )
    rows = {
        r.chunk_idx: r.chunk_text
        for r in packing.sentence_chunks(long, max_tokens=4).collect()
    }
    assert rows[0] == "a b c d e f g h."
    assert rows[2] == "x y."


def test_cdc_segments_shift_invariance_and_layout(spark):
    """Content-defined boundaries: a document embedded at a different
    offset reproduces byte-identical interior segments (the property
    fixed-size chunking lacks); short docs form one segment; the
    reassembled segments concatenate back to the original text."""
    from webpagesgraphdatabase_spark.operators import textstats

    base = " ".join(f"w{i % 23}x{i % 7}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, base), (2, "prefix tokens here " + base), (3, "a b"), (4, "")],
        ["doc_id", "text"],
    )
    segs = textstats.cdc_segments(docs).collect()
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.seg_idx)
    # reassembly: segments joined in order == original token stream
    assert " ".join(r.seg_text for r in by_doc[1]) == base
    # segmentation is content-defined: expected length ~ divisor
    assert len(by_doc[1]) >= 3
    # shift invariance: doc 2's interior segment hashes contain all of
    # doc 1's except possibly the first (prefix-polluted) segment
    h1 = [r.seg_hash for r in by_doc[1]]
    h2 = set(r.seg_hash for r in by_doc[2])
    assert set(h1[1:]) <= h2
    # short doc: one segment, whole text
    assert [r.seg_text for r in by_doc[3]] == ["a b"]
    assert 4 not in by_doc  # empty doc -> no rows

    stats = {r.doc_id: (r.n_cdc_segments, r.cdc_fp)
             for r in textstats.cdc_stats(docs).collect()}
    assert stats[1][0] == len(by_doc[1])
    import hashlib
    want = hashlib.md5("|".join(h1).encode()).hexdigest()
    assert stats[1][1] == want


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below natural-ish prose; random
    hex compresses worse than both; sizes match a local zlib pass."""
    import zlib

    from webpagesgraphdatabase_spark.operators import textstats

    rep = "spam and eggs " * 200
    prose = " ".join(f"w{i}token{i * 7 % 13}" for i in range(200))
    import hashlib
    noise = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(60)
    )
    docs = spark.createDataFrame(
        [(1, rep), (2, prose), (3, noise), (4, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in textstats.compression_ratio(docs).collect()}
    for did, text in [(1, rep), (2, prose), (3, noise)]:
        assert got[did].n_compressed == len(zlib.compress(text.encode(), 6)), did
        assert got[did].n_bytes == len(text.encode())
    assert got[1].compression_ratio < got[2].compression_ratio < got[3].compression_ratio
    assert got[1].compression_ratio < 0.05
    assert got[4].compression_ratio == 0.0


def test_retention_matrix_hand_checked(spark):
    """Cohort retention triangle on a hand-built event log: offset 0
    counts the cohort size; later offsets count returning users only;
    consistency with the user_cohort basis."""
    from datetime import datetime as dt

    from webpagesgraphdatabase_spark.operators import events as E

    rows = [
        # u1: cohort wk of Jan-01 (Mon), active wk0, wk1, wk3
        (1, dt(2024, 1, 2), 1), (2, dt(2024, 1, 9), 1), (3, dt(2024, 1, 23), 1),
        # u2: same cohort, only wk0 (two events, one distinct week)
        (4, dt(2024, 1, 3), 2), (5, dt(2024, 1, 4), 2),
        # u3: cohort wk of Jan-08, active wk0 and wk1
        (6, dt(2024, 1, 10), 3), (7, dt(2024, 1, 16), 3),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    m = {
        (r.cohort_week.date().isoformat(), r.week_offset): r.n_users
        for r in E.retention_matrix(ev).collect()
    }
    assert m == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }
    basis = {r.user_id: r for r in E.user_cohort(ev).collect()}
    assert basis[1].n_active_weeks == 3 and basis[1].last_week_offset == 3
    assert basis[2].n_active_weeks == 1 and basis[2].last_week_offset == 0
    # matrix offset-0 row equals the number of users per cohort in the basis
    from collections import Counter
    sizes = Counter(r.cohort_week.date().isoformat() for r in basis.values())
    for (cw, off), n in m.items():
        if off == 0:
            assert n == sizes[cw]


def test_ann_ivf_from_index_filtered(spark, tmp_path):
    """Filtered vector search: with an allowed-id set, every neighbor
    is allowed, and with full probing the result equals brute force
    restricted to the allowed subset."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, n_centroids=8)
    allowed = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    got = similarity.ann_ivf_from_index(
        spark, path, n_queries=6, k=3, n_probe=8, allowed=allowed
    ).collect()
    assert got and all(r.neighbor_id % 2 == 0 for r in got)
    # full probe == exact brute force restricted to allowed neighbors:
    # take a wide exact top-k over the union corpus, drop disallowed
    # neighbors, re-rank the first 3 (k=20 >> 3 + |odd queries|, so the
    # filtered prefix is exact)
    sub = emb.join(allowed, "vec_id", "left_semi").unionByName(
        emb.filter(F.col("vec_id") < 6)
    ).distinct()
    wide = sorted(
        (
            (r.query_id, r.rank, r.neighbor_id)
            for r in similarity.ann_bruteforce(sub, 6, 20).collect()
        ),
        key=lambda t: (t[0], t[1]),
    )
    by_q = {}
    for q, _, n in wide:
        if n % 2 == 0:
            by_q.setdefault(q, []).append(n)
    want_ranked = {
        (q, i + 1, n)
        for q, ns in by_q.items()
        for i, n in enumerate(ns[:3])
    }
    got_set = {(r.query_id, r.rank, r.neighbor_id) for r in got}
    assert got_set == want_ranked


def test_cdc_dedup_catches_shifted_duplicates(spark):
    """The shifted-duplicate case: doc 2 embeds doc 1's text at a
    different token offset. Fixed-chunk paragraph_dedup sees no
    duplicate segments (offsets shifted every chunk); cdc_dedup strips
    the shared interior because content-defined boundaries realign."""
    from webpagesgraphdatabase_spark.operators import dedup

    base = " ".join(f"w{i % 23}x{i % 7}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, base), (2, "three extra prefix tokens " + base)],
        ["doc_id", "text"],
    )
    fixed = {r.doc_id: r for r in dedup.paragraph_dedup(docs).collect()}
    cdc = {r.doc_id: r for r in dedup.cdc_dedup(docs).collect()}
    # fixed segmentation misses every shifted copy
    assert fixed[2].n_dropped == 0
    # CDC drops most of doc 2's segments (all interior shared ones)
    assert cdc[2].n_dropped >= cdc[2].n_segs - 2 > 0
    # doc 1 is the canonical keeper: untouched in both
    assert cdc[1].n_dropped == 0 and cdc[1].clean_text == base
    # the survivors of doc 2 are exactly its non-shared prefix segment(s)
    assert cdc[2].clean_text.startswith("three extra prefix tokens")
    assert base[-40:] not in cdc[2].clean_text


def _exact_filtered(emb, allowed_pred, n_queries, k):
    """Expected (query_id, rank, neighbor_id) set: brute-force top-k
    over the allowed subset (plus the query vectors themselves, which
    never appear as neighbors unless allowed)."""
    sub = emb.filter(allowed_pred).unionByName(
        emb.filter(F.col("vec_id") < n_queries)
    ).distinct()
    wide = sorted(
        (
            (r.query_id, r.rank, r.neighbor_id)
            for r in similarity.ann_bruteforce(sub, n_queries, 300).collect()
        ),
        key=lambda t: (t[0], t[1]),
    )
    by_q = {}
    for q, _, n in wide:
        if n % 2 == 0:
            by_q.setdefault(q, []).append(n)
    return {
        (q, i + 1, n) for q, ns in by_q.items() for i, n in enumerate(ns[:k])
    }


def test_ann_sq8_from_index_filtered(spark, tmp_path):
    """Filtered SQ8 at rest (r7 verdict item 5): the allowed semi-join
    narrows the candidate scan, so with a shortlist covering the whole
    allowed subset the result EQUALS brute force restricted to it —
    the same discipline as the IVF filtered path."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "sq8")
    similarity.build_sq8_index(emb, path)
    allowed = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    got = similarity.ann_sq8_from_index(
        spark, path, emb, n_queries=6, k=3, refine=90, allowed=allowed
    ).collect()
    assert got and all(r.neighbor_id % 2 == 0 for r in got)
    want = _exact_filtered(emb, F.col("vec_id") % 2 == 0, 6, 3)
    assert {(r.query_id, r.rank, r.neighbor_id) for r in got} == want


def test_ann_pq_from_index_filtered(spark, tmp_path):
    """Filtered IVFPQ at rest: allowed semi-join on the code rows after
    partition pruning; with full probing and a subset-covering
    shortlist the result equals brute force over the allowed subset."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    path = similarity.build_pq_index(
        emb, str(tmp_path / "pq"), m=8, ks=16, n_iters=1, corpus_count=n,
        n_centroids=8,
    )
    allowed = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    got = similarity.ann_pq_from_index(
        spark, path, emb, n_queries=6, k=3, n_probe=8, refine=90,
        allowed=allowed,
    ).collect()
    assert got and all(r.neighbor_id % 2 == 0 for r in got)
    want = _exact_filtered(emb, F.col("vec_id") % 2 == 0, 6, 3)
    assert {(r.query_id, r.rank, r.neighbor_id) for r in got} == want


def test_build_pq_index_multi_assign(spark, tmp_path):
    """assign_mult=2 lands each code row in its 2 nearest lists: ~2x
    code rows at rest, candidates deduped at query time (k unique
    neighbors per query), and recall at the SAME probe budget is never
    below the single-assignment layout's."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    p1 = similarity.build_pq_index(
        emb, str(tmp_path / "pq1"), m=8, ks=16, n_iters=1,
        corpus_count=n, n_centroids=8,
    )
    p2 = similarity.build_pq_index(
        emb, str(tmp_path / "pq2"), m=8, ks=16, n_iters=1,
        corpus_count=n, n_centroids=8, assign_mult=2,
    )
    c1 = spark.read.parquet(f"{p1}/codes.parquet").count()
    c2 = spark.read.parquet(f"{p2}/codes.parquet").count()
    assert c1 == n and n < c2 <= 2 * n
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_bruteforce(emb, 10, 5).collect()
    }

    def run(p):
        # refine large enough that the exact re-rank covers EVERY
        # probed candidate: mult=2's candidate set is then a superset
        # of mult=1's (each vector's top-1 list is among its top-2),
        # so recall is monotone by construction — at small shortlists
        # the extra candidates can displace true neighbors from the
        # ADC shortlist and the comparison becomes noisy
        rows = similarity.ann_pq_from_index(
            spark, p, emb, n_queries=10, k=5, n_probe=2, refine=90
        ).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.neighbor_id)
        # dedup discipline: no neighbor may appear twice for a query
        for ns in per_q.values():
            assert len(ns) == len(set(ns))
        got = {(r.query_id, r.neighbor_id) for r in rows}
        return len(got & exact) / len(exact)

    assert run(p2) >= run(p1)
    # residual codes are relative to ONE list's centroid — multi-assign
    # must refuse, not silently decode garbage
    import pytest

    with pytest.raises(ValueError):
        similarity.build_pq_index(
            emb, str(tmp_path / "pq3"), m=8, ks=16, corpus_count=n,
            residual=True, assign_mult=2,
        )


def test_compaction_watermark_blocks_folded_replay(spark, tmp_path):
    """compact_ivf_lists persists the pre-fold max batch id; a replayed
    append with a batch id at/below that watermark is a no-op (its
    vectors already live in segment 0 — re-appending would duplicate
    them), and batch=None allocates ABOVE the watermark."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(first, path, n_centroids=8)
    similarity.ivf_index_append(second, path, batch=1)
    report = similarity.compact_ivf_lists(spark, path)
    assert report["watermark"] == 1
    rows = spark.read.parquet(f"{path}/lists.parquet").count()
    res = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    # checkpoint replay of the pre-compaction micro-batch: must no-op
    similarity.ivf_index_append(second, path, batch=1)
    lists = spark.read.parquet(f"{path}/lists.parquet")
    assert lists.count() == rows
    assert {r.batch for r in lists.select("batch").distinct().collect()} == {0}
    assert res == sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    # fresh data with batch=None must land above the watermark, never
    # in a partition the fold owns
    extra = second.withColumn("vec_id", F.col("vec_id") + 10_000)
    similarity.ivf_index_append(extra, path)
    lists = spark.read.parquet(f"{path}/lists.parquet")
    assert lists.count() == rows + second.count()
    assert {r.batch for r in lists.select("batch").distinct().collect()} == {0, 2}


def test_hash_embed_deterministic_and_normalized(spark):
    """Feature-hashing embedder: unit-norm vectors, deterministic
    across runs, cosine reflects token overlap (shared-token docs
    closer than disjoint ones), empty docs produce no row."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota kappa"),
            (4, "   "),
        ],
        ["doc_id", "text"],
    )
    out = {r.vec_id: list(r.embedding) for r in
           similarity.hash_embed(docs, dim=32).collect()}
    assert set(out) == {1, 2, 3}
    for v in out.values():
        assert len(v) == 32
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(out[1], out[2]) > cos(out[1], out[3]) + 0.2
    again = {r.vec_id: list(r.embedding) for r in
             similarity.hash_embed(docs, dim=32).collect()}
    assert again == out


def test_compact_sq8_store_identical_results_and_replay_noop(spark, tmp_path):
    """SQ8 compaction: per-bucket fold to batch 0, bit-identical query
    results, replayed folded batches no-op via the shared watermark."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "sq8")
    similarity.build_sq8_index(first, path, n_buckets=4)
    similarity.sq8_index_append(second, path, batch=1)
    res = sorted(
        map(tuple, similarity.ann_sq8_from_index(spark, path, emb, 6, 3).collect())
    )
    report = similarity.compact_sq8_store(spark, path)
    assert report["watermark"] == 1
    assert report["files_after"] <= report["files_before"]
    store = spark.read.parquet(f"{path}/sq8.parquet")
    n = store.count()
    assert {r.batch for r in store.select("batch").distinct().collect()} == {0}
    assert res == sorted(
        map(tuple, similarity.ann_sq8_from_index(spark, path, emb, 6, 3).collect())
    )
    # replay of the folded batch: no duplicated codes
    similarity.sq8_index_append(second, path, batch=1)
    assert spark.read.parquet(f"{path}/sq8.parquet").count() == n
    # fresh data lands above the watermark
    extra = second.withColumn("vec_id", F.col("vec_id") + 10_000)
    similarity.sq8_index_append(extra, path)
    store = spark.read.parquet(f"{path}/sq8.parquet")
    assert store.count() == n + second.count()
    assert {r.batch for r in store.select("batch").distinct().collect()} == {0, 2}


def test_build_pq_index_plain_rebuild_clears_stale_opq(spark, tmp_path):
    """Rebuilding a PLAIN index over a previous opq=True layout must
    remove the stale transform — otherwise the query path rotates
    queries against unrotated codes (silently wrong scores)."""
    import os

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    p = str(tmp_path / "pq")
    similarity.build_pq_index(
        emb, p, m=8, ks=16, n_iters=1, corpus_count=n, n_centroids=8, opq=True
    )
    assert os.path.isdir(f"{p}/opq.parquet")
    similarity.build_pq_index(
        emb, p, m=8, ks=16, n_iters=1, corpus_count=n, n_centroids=8
    )
    assert not os.path.isdir(f"{p}/opq.parquet")
    # and the rebuilt plain index equals a fresh plain build
    fresh = str(tmp_path / "pq2")
    similarity.build_pq_index(
        emb, fresh, m=8, ks=16, n_iters=1, corpus_count=n, n_centroids=8
    )
    a = similarity.ann_pq_from_index(spark, p, emb, n_queries=6, k=4).collect()
    b = similarity.ann_pq_from_index(spark, fresh, emb, n_queries=6, k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_near_matches_banded(spark):
    """Pigeonhole-complete banded near-match: ≤ bits differing
    positions always share a band (found); far signatures are not;
    bits >= n_bands refuses (completeness would break)."""
    import pytest

    base = "01" * 32
    two_off = list(base)
    two_off[0] = "1"; two_off[40] = "0"
    two_off = "".join(two_off)
    # flip 3 positions in EACH of the 4 16-bit bands: 12 differences,
    # no band identical
    far = list(base)
    for b in range(4):
        for j in range(3):
            i = b * 16 + j * 5
            far[i] = "1" if far[i] == "0" else "0"
    far = "".join(far)
    new = spark.createDataFrame(
        [(1, two_off), (2, far)], ["doc_id", "simhash"]
    )
    prior = spark.createDataFrame([(100, base)], ["doc_id", "simhash"])
    got = {
        r.doc_id
        for r in dedup.simhash_near_matches(new, prior, bits=3).collect()
    }
    assert got == {1}
    # exact equality matches at bits=0
    new0 = spark.createDataFrame([(3, base)], ["doc_id", "simhash"])
    assert {
        r.doc_id
        for r in dedup.simhash_near_matches(new0, prior, bits=0).collect()
    } == {3}
    with pytest.raises(ValueError):
        dedup.simhash_near_matches(new, prior, bits=4, n_bands=4)


def test_bin_encode_pack_roundtrip(spark):
    """Packed sign words unpack to exactly sign(x > 0) as ±1 — the
    bit-level bridge the oracle relies on (it scores the unpacked
    list; Spark serves the packed words)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    enc = similarity.bin_encode(emb)
    stored = dict(enc.dtypes)["words"]
    assert stored == "array<bigint>"
    chk = emb.join(enc, "vec_id").select(
        F.transform(
            "embedding",
            lambda x: F.when(x > 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
        ).alias("ref"),
        similarity.bin_sign_col(F.col("words"), dim).alias("got"),
    )
    assert chk.filter(F.col("ref") != F.col("got")).count() == 0


def test_bin_encode_short_tail_word(spark):
    """A dimension count that is not a multiple of 64 packs its tail
    into a short word; unpacking still round-trips every sign."""
    from pyspark.sql import functions as F

    vecs = [
        (0, [1.0, -2.0, 3.0] * 25),   # dim 75: one full word + 11-bit tail
        (1, [-1.0, 0.5, -0.25] * 25),
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    enc = similarity.bin_encode(emb)
    chk = emb.join(enc, "vec_id").select(
        F.transform(
            "embedding",
            lambda x: F.when(x > 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
        ).alias("ref"),
        similarity.bin_sign_col(F.col("words"), 75).alias("got"),
    )
    assert chk.filter(F.col("ref") != F.col("got")).count() == 0


def test_ann_bin_asym_matches_numpy_twin(spark):
    """The asymmetric binary path (float query vs ±1 signs, shortlist,
    exact re-rank) reproduces a driver-local NumPy implementation of
    the same semantics exactly."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = similarity.ann_bin(emb, 5, 5).collect()
    a = np.array([r.embedding for r in emb.orderBy("vec_id").collect()])
    n = a / np.linalg.norm(a, axis=1, keepdims=True)
    s = np.where(a > 0, 1.0, -1.0)
    for qid in range(5):
        sc = (a[qid] @ s.T).astype(np.float64)
        sc[qid] = -np.inf
        idx = np.lexsort((np.arange(len(a)), -sc))[: 5 * similarity.BIN_REFINE]
        sims = n[idx] @ n[qid]
        top = list(idx[np.lexsort((idx, -sims))[:5]])
        got = [
            r.neighbor_id
            for r in sorted(
                (r for r in res if r.query_id == qid), key=lambda r: r.rank
            )
        ]
        assert got == top


def test_ann_bin_hamming_mode_and_popcount(spark):
    """score='hamming' ranks candidates by packed-word popcount; the
    distance expression agrees with the unpacked bit-difference count
    on every pair it scores."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = similarity.ann_bin(emb, 3, 5, score="hamming").collect()
    assert {r.query_id for r in res} == {0, 1, 2}
    a = np.array([r.embedding for r in emb.orderBy("vec_id").collect()])
    n = a / np.linalg.norm(a, axis=1, keepdims=True)
    bits = a > 0
    for qid in range(3):
        h = (bits[qid] != bits).sum(1).astype(float)
        h[qid] = np.inf
        idx = np.lexsort((np.arange(len(a)), h))[: 5 * similarity.BIN_REFINE]
        sims = n[idx] @ n[qid]
        top = list(idx[np.lexsort((idx, -sims))[:5]])
        got = [
            r.neighbor_id
            for r in sorted(
                (r for r in res if r.query_id == qid), key=lambda r: r.rank
            )
        ]
        assert got == top


def test_ann_bin_rejects_unknown_score(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="unknown score"):
        similarity.ann_bin(emb, 2, 2, score="cosine")


def test_ann_bin_filtered_equals_bruteforce_over_subset(spark):
    """allowed= narrows the candidate scan (left-semi): the result is
    the exact binary-ANN answer computed over only the allowed subset,
    never a post-filter of the unfiltered answer."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    allowed = emb.filter(
        (F.col("vec_id") % 2 == 0) | (F.col("vec_id") < 5)
    ).select("vec_id")
    got = similarity.ann_bin(emb, 5, 5, allowed=allowed)
    # queries (vec_id < 5) are all inside the allowed set, so the
    # filtered run must equal the full run over the subset corpus
    sub = emb.join(allowed, "vec_id", "left_semi")
    want = similarity.ann_bin(sub, 5, 5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_ann_bin_index_at_rest(spark, tmp_path):
    """build_bin_index persists packed words (32x vs float32 at rest);
    the served path returns rows identical to the live path."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "bin")
    similarity.build_bin_index(emb, path)
    stored = spark.read.parquet(f"{path}/bin.parquet")
    assert dict(stored.dtypes)["words"] == "array<bigint>"
    served = similarity.ann_bin_from_index(spark, path, emb, 5, 5)
    live = similarity.ann_bin(emb, 5, 5)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, live.collect())
    )


def test_rrf_fuse_hand_check(spark):
    """RRF on a tiny hand-built pair of ranked lists: fused score is
    1/(60+r1) + 1/(60+r2) for docs in both lists, single-term
    otherwise; ties break by doc_id."""
    from webpagesgraphdatabase_spark.operators import search

    text = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        ["query_id", "doc_id", "rank"],
    )
    vec = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 10, 3)],
        ["query_id", "doc_id", "rank"],
    )
    got = {
        r.doc_id: (r.rank, r.rrf_score)
        for r in search.rrf_fuse([text, vec], topk=4).collect()
    }
    # doc 11: 1/62 + 1/61 (best), doc 10: 1/61 + 1/63, 12: 1/63, 13: 1/62
    assert [d for d, (rk, _) in sorted(got.items(), key=lambda kv: kv[1][0])] == [
        11,
        10,
        13,
        12,
    ]
    assert got[11][1] == pytest.approx(1 / 62 + 1 / 61, rel=1e-12)
    assert got[10][1] == pytest.approx(1 / 61 + 1 / 63, rel=1e-12)
    assert got[13][1] == pytest.approx(1 / 62, rel=1e-12)


def test_rrf_fuse_requires_input(spark):
    from webpagesgraphdatabase_spark.operators import search

    with pytest.raises(ValueError, match="at least one"):
        search.rrf_fuse([])


def test_dsir_weights_discriminate_target(spark):
    """DSIR log-weights against the English target: en docs keep at a
    much higher rate than non-en (the whole point of importance
    resampling), logw is rounded to 6 decimals, and keep thresholds
    the rounded value."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.operators import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sampling.dsir_weights(docs, F.col("lang") == "en").collect()
    assert len(out) == docs.count()
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    keep_en = [r.dsir_keep for r in out if langs[r.doc_id] == "en"]
    keep_other = [r.dsir_keep for r in out if langs[r.doc_id] != "en"]
    assert sum(keep_en) / len(keep_en) > 2 * sum(keep_other) / len(keep_other)
    for r in out:
        assert r.dsir_keep == (r.dsir_logw > 0)
        assert r.dsir_logw == round(r.dsir_logw, 6)


def test_dsir_short_and_empty_docs(spark):
    """Sub-2-token docs emit no bigrams (the sequence(1,0) descending
    trap), zero-token docs get logw 0.0 / keep False."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.operators import sampling

    docs = spark.createDataFrame(
        [(0, "solo", "en"), (1, "", "en"), (2, "   ", "de"),
         (3, "two tokens", "en"), (4, "a b c d e", "de")],
        ["doc_id", "text", "lang"],
    )
    out = {r.doc_id: r for r in sampling.dsir_weights(
        docs, F.col("lang") == "en").collect()}
    assert len(out) == 5
    assert out[1].dsir_logw == 0.0 and not out[1].dsir_keep
    assert out[2].dsir_logw == 0.0 and not out[2].dsir_keep
    # feature counts: doc 0 -> 1 unigram, doc 3 -> 2 uni + 1 bigram
    fb = sampling._dsir_features(docs)
    counts = {r.doc_id: r.n for r in fb.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    assert counts[0] == 1 and counts[3] == 3 and counts[4] == 9
    assert 1 not in counts and 2 not in counts


def test_dsir_top_fraction(spark):
    """Fraction-based selection keeps ~frac of the corpus, all above
    the threshold, and rejects a degenerate frac."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.operators import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    kept = sampling.dsir_top_fraction(docs, F.col("lang") == "en", frac=0.2)
    k = kept.count()
    assert 0.1 * n <= k <= 0.35 * n  # approx threshold, generous band
    w = {r.doc_id: r.dsir_logw for r in sampling.dsir_weights(
        docs, F.col("lang") == "en").collect()}
    thr = min(r.dsir_logw for r in kept.collect())
    assert all(w[r.doc_id] >= thr for r in kept.collect())
    with pytest.raises(ValueError, match="frac"):
        sampling.dsir_top_fraction(docs, F.col("lang") == "en", frac=1.5)


def test_train_sample_bounds_and_determinism(spark):
    """_train_sample: a corpus at/under the cap passes through
    untouched; above it, the hash-filter keeps ~1.2·cap rows, the
    SAME rows on every call and partitioning."""
    from pyspark.sql import functions as F

    emb = spark.range(3000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    assert similarity._train_sample(emb, None) is emb
    assert similarity._train_sample(emb, 5000, corpus_count=3000) is emb
    s1 = similarity._train_sample(emb, 500, corpus_count=3000)
    n1 = s1.count()
    assert 350 <= n1 <= 900  # ~1.2*cap with binomial spread
    ids1 = {r.vec_id for r in s1.collect()}
    ids2 = {
        r.vec_id
        for r in similarity._train_sample(
            emb.repartition(7), 500, corpus_count=3000
        ).collect()
    }
    assert ids1 == ids2


def test_kmeans_train_cap_still_serves(spark):
    """Capped Lloyd training (the at-scale quantizer discipline) still
    yields n_centroids centroids and an IVF whose full-probe search is
    exact — training on a sample changes WHERE the centroids sit,
    never the search contract."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 8)) * 5
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.normal(size=8) * 0.1])
        for i in range(600)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = similarity.kmeans_centroids(
        emb, n_centroids=4, n_iters=2, train_cap=150, corpus_count=600
    )
    got = cents.collect()
    assert len(got) == 4
    # full-probe capped-trained IVF == brute force (search contract)
    res = similarity.ann_ivf(
        emb, 5, 3, n_centroids=4, n_probe=4, trained=True,
        corpus_count=600,
    )
    exact = similarity.ann_bruteforce(emb, 5, 3)
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_bin_index_append_and_compaction_exactly_once(spark, tmp_path):
    """The binary index grows exactly-once: an append replay of the
    same batch id is idempotent, compaction folds batches to segment 0
    with bit-identical query results, and a replay of a folded batch
    no-ops via the watermark."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 300)
    extra = emb.filter(F.col("vec_id") >= 300)
    path = str(tmp_path / "bin")
    similarity.build_bin_index(base, path)
    similarity.bin_index_append(extra, path, batch=1)
    grown = sorted(
        map(tuple, similarity.ann_bin_from_index(spark, path, emb, 5, 5).collect())
    )
    oneshot_path = str(tmp_path / "bin1")
    similarity.build_bin_index(emb, oneshot_path)
    oneshot = sorted(
        map(
            tuple,
            similarity.ann_bin_from_index(spark, oneshot_path, emb, 5, 5).collect(),
        )
    )
    assert grown == oneshot
    # replaying batch 1 (same rows, same id) leaves the store identical
    similarity.bin_index_append(extra, path, batch=1)
    n_rows = spark.read.parquet(f"{path}/bin.parquet").count()
    assert n_rows == emb.count()
    # compact: results bit-identical, all rows in batch 0
    rep = similarity.compact_bin_store(spark, path)
    assert rep["files_after"] <= rep["files_before"]
    st = spark.read.parquet(f"{path}/bin.parquet")
    assert st.select(F.max("batch")).first()[0] == 0
    compacted = sorted(
        map(tuple, similarity.ann_bin_from_index(spark, path, emb, 5, 5).collect())
    )
    assert compacted == grown
    # a replay of the folded batch must NO-OP (watermark guard)
    similarity.bin_index_append(extra, path, batch=1)
    assert spark.read.parquet(f"{path}/bin.parquet").count() == emb.count()


def test_streaming_bin_ingest_exactly_once(spark, tmp_path):
    """The streaming twin lands micro-batches through the same append
    path: after the drain, the served index equals a one-shot build
    over the union."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.streaming import jobs as sj

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    src = str(tmp_path / "src")
    extra.repartition(1).write.parquet(src)
    path = str(tmp_path / "bin")
    similarity.build_bin_index(base, path)
    stream = spark.readStream.schema(extra.schema).parquet(src)
    sj.streaming_bin_ingest(stream, path, str(tmp_path / "ckpt"))
    served = sorted(
        map(tuple, similarity.ann_bin_from_index(spark, path, emb, 5, 5).collect())
    )
    oneshot_path = str(tmp_path / "bin1")
    similarity.build_bin_index(emb, oneshot_path)
    oneshot = sorted(
        map(
            tuple,
            similarity.ann_bin_from_index(spark, oneshot_path, emb, 5, 5).collect(),
        )
    )
    assert served == oneshot


def test_mmr_select_diversifies(spark):
    """MMR hand-check: with two near-duplicate top candidates and one
    diverse lower-relevance one, lam=0.5 picks the diverse item second
    while lam=1.0 keeps pure relevance order; ties break by id; lam
    outside [0,1] raises."""
    import math

    cands = [
        (1, 0.90, [1.0, 0.0]),
        (2, 0.89, [1.0, 0.01]),   # near-duplicate of 1
        (3, 0.50, [0.0, 1.0]),    # diverse
    ]
    assert similarity.mmr_select(cands, 2, lam=0.5) == [1, 3]
    assert similarity.mmr_select(cands, 3, lam=1.0) == [1, 2, 3]
    assert similarity.mmr_select([], 3) == []
    # deterministic first pick on a relevance tie: smaller id
    tie = [(9, 0.5, [1.0, 0.0]), (4, 0.5, [0.0, 1.0])]
    assert similarity.mmr_select(tie, 1)[0] == 4
    with pytest.raises(ValueError, match="lam"):
        similarity.mmr_select(cands, 2, lam=1.5)


def test_bin_encode_randomized_dims_roundtrip(spark):
    """Packed-signature round trip over 60 random vectors with random
    dimensions 1..130 (crossing the 64-bit word boundary both ways,
    zeros included): unpack == sign(x > 0) for every row, in ONE Spark
    job (seeded numpy, deterministic)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rng = np.random.default_rng(77)
    rows = []
    for i in range(60):
        dim = int(rng.integers(1, 131))
        v = rng.normal(size=dim)
        v[rng.random(dim) < 0.15] = 0.0  # exact zeros: sign bit must be 0
        rows.append((i, dim, [float(x) for x in v]))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("dim", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    emb = spark.createDataFrame(rows, schema)
    enc = similarity.bin_encode(emb)
    got = {r.vec_id: r.words for r in enc.collect()}
    for i, dim, v in rows:
        bits = [1 if x > 0 else 0 for x in v]
        want = []
        for j in range(0, dim, 64):
            word = 0
            for b in bits[j:j + 64]:
                word = ((word << 1) | b) & 0xFFFFFFFFFFFFFFFF
            if word >= 1 << 63:
                word -= 1 << 64
            want.append(word)
        assert list(got[i]) == want, f"row {i} dim {dim}"
