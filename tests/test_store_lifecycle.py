"""The shared at-rest index lifecycle (r8 verdict item 6): batch-id
allocation, per-writer dynamic-overwrite appends, and the
watermark-first two-rename compaction fold — tested directly on a toy
store so the four index adapters (IVF / SQ8 / bin / text) can stay
thin. The adapters' own replay/compaction tests pin that their behavior
is unchanged."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.operators import store_lifecycle as L


def _append(spark, path, store, batch, vals):
    # the toy store is ingest-first (like sq8/bin): the rows store
    # legitimately appears with the first appended batch
    b = L.allocate_batch(spark, path, store, batch, allow_missing=True)
    if b is None:
        return None
    df = spark.createDataFrame(
        [(v, v % 2) for v in vals], ["v", "k"]
    ).withColumn("batch", F.lit(int(b)))
    L.dynamic_append(df, store, ("k", "batch"))
    return b


def test_allocate_append_compact_roundtrip(spark, tmp_path):
    path = str(tmp_path / "idx")
    store = f"{path}/rows.parquet"
    os.makedirs(path)

    # first allocation on an empty store starts the id space at 1
    assert _append(spark, path, store, None, [1, 2, 3]) == 1
    assert _append(spark, path, store, None, [4, 5]) == 2
    # explicit ids pass through untouched (no watermark yet)
    assert _append(spark, path, store, 7, [6]) == 7
    before = {tuple(r) for r in spark.read.parquet(store).collect()}
    assert len(before) == 6

    # replaying an explicit batch overwrites exactly its own partitions
    assert _append(spark, path, store, 7, [6]) == 7
    assert {tuple(r) for r in spark.read.parquet(store).collect()} == before

    # compaction folds everything to batch 0, persists the watermark,
    # and reports file counts
    rep = L.compact_store(
        spark, path, [L.SubStore(store, ("k", "batch"))]
    )
    assert rep["watermark"] == 7
    assert rep["files_after"] <= rep["files_before"]
    after = spark.read.parquet(store)
    assert {r.batch for r in after.select("batch").distinct().collect()} == {0}
    assert {(r.v, r.k) for r in after.collect()} == {
        (v, k) for v, k, _ in before
    }

    # a replay of any FOLDED batch id is refused by allocation...
    assert L.allocate_batch(spark, path, store, 1) is None
    assert L.allocate_batch(spark, path, store, 7) is None
    assert L.allocate_batch(spark, path, store, 0) is None
    # ...but an explicit id that never appended is a NEW batch even
    # when it sits below the watermark — content-hash id spaces (the
    # crawl loop's archive ids) arrive in no particular order, and the
    # old ≤-watermark reading silently DROPPED such appends (r11 fix:
    # the marker carries the exact folded-id set)
    assert L.allocate_batch(spark, path, store, 3) == 3
    # ...and fresh allocation resumes ABOVE the watermark, not at max+1
    # of the folded store (whose ids all read 0 now)
    assert L.allocate_batch(spark, path, store, None) == 8


def test_unordered_batch_ids_survive_compaction(spark, tmp_path):
    """The content-hash id space end to end (r11): archive ids hash in
    no particular order, so after a fold a NEW id below the watermark
    must still append, a folded id must still no-op, and a second fold
    must absorb the late-arriving low id too."""
    path = str(tmp_path / "idx")
    store = f"{path}/rows.parquet"
    os.makedirs(path)

    assert _append(spark, path, store, 500, [1, 2]) == 500
    rep = L.compact_store(spark, path, [L.SubStore(store, ("k", "batch"))])
    assert rep["watermark"] == 500

    # a NEW archive whose hash lands below the fold watermark
    assert _append(spark, path, store, 100, [3]) == 100
    rows = {(r.v, r.batch) for r in spark.read.parquet(store).collect()}
    assert rows == {(1, 0), (2, 0), (3, 100)}

    # replays adjudicate exactly: folded id no-ops, live id overwrites
    assert _append(spark, path, store, 500, [9]) is None
    assert _append(spark, path, store, 100, [3]) == 100
    rows = {(r.v, r.batch) for r in spark.read.parquet(store).collect()}
    assert rows == {(1, 0), (2, 0), (3, 100)}

    # the second fold absorbs the low id; now IT no-ops on replay too
    L.compact_store(spark, path, [L.SubStore(store, ("k", "batch"))])
    assert _append(spark, path, store, 100, [3]) is None
    rows = {(r.v, r.batch) for r in spark.read.parquet(store).collect()}
    assert rows == {(1, 0), (2, 0), (3, 0)}


def test_compact_preserves_uncommitted_partitions(spark, tmp_path):
    """ADVICE r10: with a separate commit record as ``batch_source``,
    the default fold relabels ONLY committed ids — a partition a crash
    left behind (appended, never committed) stays in place so the
    retry's dynamic overwrite can replace it instead of duplicating
    rows frozen in segment 0."""
    path = str(tmp_path / "st")
    store = f"{path}/rows.parquet"
    ledger = f"{path}/ledger.parquet"
    os.makedirs(path)

    def commit(b):
        L.dynamic_append(
            spark.createDataFrame(
                [(f"a{b}.warc", b)], "archive string, batch int"
            ),
            ledger,
            ("batch",),
        )

    # round 1 commits; round 2 appends rows but crashes before commit
    assert _append(spark, path, store, 1, [10, 11]) == 1
    commit(1)
    assert _append(spark, path, store, 2, [20, 21, 22]) == 2  # no commit

    rep = L.compact_store(
        spark, path, [L.SubStore(store, ("k", "batch"))], batch_source=ledger
    )
    assert rep["watermark"] == 1
    rows = {(r.v, r.batch) for r in spark.read.parquet(store).collect()}
    # committed rows folded, the crash leftover stays in partition 2
    assert rows == {(10, 0), (11, 0), (20, 2), (21, 2), (22, 2)}

    # the retry re-allocates id 2 (not folded) and its dynamic
    # overwrite REPLACES the stale partition — no duplication
    assert _append(spark, path, store, 2, [20, 25]) == 2
    commit(2)
    rows = {(r.v, r.batch) for r in spark.read.parquet(store).collect()}
    assert rows == {(10, 0), (11, 0), (20, 2), (25, 2)}


def test_allocate_batch_missing_source_fails_loudly(spark, tmp_path):
    """r9 advice: families whose store exists by construction (IVF
    lists, text stats) must NOT silently restart the batch-id space at
    1 when the source vanished (partially-deleted index) — only the
    ingest-first layouts opt in via allow_missing."""
    import pytest
    from pyspark.errors import AnalysisException

    path = str(tmp_path / "idx")
    os.makedirs(path)
    missing = f"{path}/lists.parquet"
    with pytest.raises(AnalysisException):
        L.allocate_batch(spark, path, missing, None)
    # the ingest-first opt-in keeps the skeleton-first behavior
    assert L.allocate_batch(spark, path, missing, None, allow_missing=True) == 1
    # explicit-batch replay guarding never needs the source at all
    assert L.allocate_batch(spark, path, missing, 3) == 3


def test_compact_store_custom_fold_and_layout(spark, tmp_path):
    """A sub-store may MERGE at fold time (the text index's stats sum)
    instead of relabelling; layout shapes the rewrite."""
    path = str(tmp_path / "idx2")
    store = f"{path}/stats.parquet"
    os.makedirs(path)
    for b, n in ((1, 10), (2, 32)):
        L.dynamic_append(
            spark.createDataFrame([(n, b)], "n long, batch int"),
            store,
            ("batch",),
        )
    rep = L.compact_store(
        spark,
        path,
        [
            L.SubStore(
                store,
                ("batch",),
                fold=lambda d: d.agg(F.sum("n").alias("n")).withColumn(
                    "batch", F.lit(0)
                ),
                layout=lambda d: d.coalesce(1),
            )
        ],
    )
    assert rep["watermark"] == 2
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 1 and rows[0]["n"] == 42 and rows[0]["batch"] == 0


def test_model_based_adapter_lifecycle(spark, tmp_path):
    """Model-based pin of the lifecycle discipline ON the real adapters
    (r10 verdict item 8, the crawl-state model test's shape one layer
    down): a seeded scripted interleaving of append / crash-replay /
    compact steps over the BM25 text index and the SQ8 code store must
    always agree with a pure-Python model on the visible doc/vec sets,
    the summed corpus stats, the persisted folded-id set, and query
    results — replays and folds at ANY point never change what a
    reader sees. Batch ids are drawn unordered (the content-hash id
    space), so late low ids cross folds like real archive hashes do."""
    import random

    from webpagesgraphdatabase_spark.operators import search as S
    from webpagesgraphdatabase_spark.operators import similarity as SIM
    from webpagesgraphdatabase_spark.operators._util import (
        read_compaction_state,
    )

    rng = random.Random(4021)
    tdir, sdir = str(tmp_path / "ti"), str(tmp_path / "si")
    S.ensure_text_index(spark, tdir, n_buckets=8)
    SIM.ensure_sq8_index(spark, sdir, n_buckets=8)

    # the pure model: per adapter, live batch->doc set + folded ids
    model = {
        "text": {"rows": {}, "folded": set()},
        "sq8": {"rows": {}, "folded": set()},
    }
    used_ids: set[int] = set()
    doc_of_batch: dict[int, list[int]] = {}
    next_doc = [0]

    def docs_frame(ids):
        return spark.createDataFrame(
            [
                (f"d{i}", f"uniq{i} shared corpus words", f"https://m.x/{i}")
                for i in ids
            ],
            "doc_id string, text string, url string",
        )

    def emb_frame(ids):
        return spark.createDataFrame(
            [
                (f"d{i}", [float((i + j) % 7 + 1) for j in range(8)])
                for i in ids
            ],
            "vec_id string, embedding array<float>",
        )

    def visible(which):
        out: set[str] = set()
        for s in model[which]["rows"].values():
            out |= s
        return out

    def check():
        got_t = {
            r.doc_id
            for r in spark.read.parquet(f"{tdir}/doclens.parquet")
            .select("doc_id")
            .collect()
        }
        assert got_t == visible("text")
        n_docs = (
            spark.read.parquet(f"{tdir}/stats.parquet")
            .agg(F.sum("n_docs"))
            .first()[0]
        )
        assert int(n_docs or 0) == len(visible("text"))
        got_s = {
            r.vec_id
            for r in spark.read.parquet(f"{sdir}/sq8.parquet")
            .select("vec_id")
            .collect()
        }
        assert got_s == visible("sq8")
        # persisted folded sets match the model exactly (the text
        # skeleton's batch-0 stats row folds as id 0, which the model
        # includes with any fold)
        for which, d in (("text", tdir), ("sq8", sdir)):
            _, folded = read_compaction_state(d)
            assert (folded or set()) == model[which]["folded"]
        # one sampled doc stays queryable through every fold/replay
        if visible("text"):
            probe = sorted(visible("text"))[0]
            hits = S.bm25_from_index(
                spark, tdir, (f"uniq{probe[1:]}",), k=3
            ).collect()
            assert [r.doc_id for r in hits] == [probe]

    for step in range(10):
        op = (
            "append"
            if step == 0
            else rng.choice(["append", "append", "replay", "compact"])
        )
        if op == "append":
            b = rng.randrange(1, 10_000)
            while b in used_ids:
                b = rng.randrange(1, 10_000)
            used_ids.add(b)
            ids = [next_doc[0] + i for i in range(rng.randint(1, 3))]
            next_doc[0] += len(ids)
            doc_of_batch[b] = ids
            S.text_index_append(docs_frame(ids), tdir, batch=b)
            SIM.sq8_index_append(emb_frame(ids), sdir, batch=b)
            for which in ("text", "sq8"):
                model[which]["rows"][b] = {f"d{i}" for i in ids}
        elif op == "replay" and used_ids:
            # a crash replay re-delivers the SAME rows under the same
            # id: folded -> allocator no-op; live -> exact overwrite.
            # Visible state must not move either way.
            b = rng.choice(sorted(used_ids))
            ids = doc_of_batch[b]
            S.text_index_append(docs_frame(ids), tdir, batch=b)
            SIM.sq8_index_append(emb_frame(ids), sdir, batch=b)
        elif op == "compact":
            S.compact_text_index(spark, tdir)
            SIM.compact_sq8_store(spark, sdir)
            for which in ("text", "sq8"):
                m = model[which]
                m["folded"] |= set(m["rows"]) | {0}
                merged: set[str] = set()
                for s in m["rows"].values():
                    merged |= s
                m["rows"] = {0: merged} if merged else {}
        check()


def test_ensure_bucket_meta_noop_when_present(spark, tmp_path):
    path = str(tmp_path / "idx3")
    L.ensure_bucket_meta(spark, path, 16)
    assert spark.read.parquet(f"{path}/meta.parquet").first()["n_buckets"] == 16
    # second call with a DIFFERENT count must not clobber the layout
    L.ensure_bucket_meta(spark, path, 64)
    assert spark.read.parquet(f"{path}/meta.parquet").first()["n_buckets"] == 16
