"""Streaming jobs: watermarked window counts + stateful sessionization."""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

from ..operators.events import SESSION_GAP_MIN, WINDOW_MINUTES

EVENT_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source micro-batch ingestion: each parquet file dropped into
    ``source_dir`` becomes (part of) a micro-batch. Schema is declared,
    not inferred — streaming sources require it, and it keeps the
    nanosecond-timestamp quirk out of the stream (writers to this dir
    produce µs TIMESTAMP_NTZ, see io_tpch._load_events)."""
    return spark.readStream.schema(EVENT_DDL).parquet(source_dir)


def streaming_windowed_counts(
    events: DataFrame,
    minutes: int = WINDOW_MINUTES,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of :func:`..operators.events.windowed_counts`:
    same tumbling-window expression plus a watermark so window state is
    dropped once event time passes. Append output emits each window
    exactly once, when it closes."""
    # watermarks require TIMESTAMP (LTZ); session tz is UTC so the
    # NTZ->LTZ cast is wall-clock-preserving, and the output start is
    # cast back to NTZ to match the batch twin's schema
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", IntegerType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
    ]
)

# GroupState payload: (next_session_id, open_n, open_start, open_end) with
# timestamps as epoch-µs longs (state schemas keep to primitive types).
_SESSION_STATE = StructType(
    [
        StructField("next_id", IntegerType()),
        StructField("open_n", LongType()),
        StructField("open_start", LongType()),
        StructField("open_end", LongType()),
    ]
)


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Per-user gap sessionization across micro-batches: closed sessions
    are emitted; the open tail session is carried in state. Batch-mode
    semantics twin: operators.events.sessionize."""
    import pandas as pd

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    (user_id,) = key

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # unit-safe epoch-µs regardless of the Arrow batch's datetime unit
    ts_us = rows["ts"].astype("datetime64[us]").astype("int64")

    if state.exists:
        next_id, open_n, open_start, open_end = state.get
    else:
        next_id, open_n, open_start, open_end = 1, 0, 0, 0

    out = []
    for t in ts_us:
        t = int(t)
        if open_n == 0:
            open_n, open_start, open_end = 1, t, t
        elif t - open_end > gap_us:
            out.append((user_id, next_id, open_n, open_start, open_end))
            next_id += 1
            open_n, open_start, open_end = 1, t, t
        else:
            open_n += 1
            open_end = t

    state.update((next_id, open_n, open_start, open_end))

    emitted = pd.DataFrame(
        out,
        columns=["user_id", "session_id", "n_events", "session_start", "session_end"],
    )
    if len(emitted):
        emitted["session_start"] = pd.to_datetime(emitted["session_start"], unit="us")
        emitted["session_end"] = pd.to_datetime(emitted["session_end"], unit="us")
    else:
        emitted = emitted.astype(
            {"session_start": "datetime64[us]", "session_end": "datetime64[us]"}
        )
    yield emitted


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): emits a
    session row when a >30-min gap closes it; the open session per user
    rides in GroupState between micro-batches. session_ids are assigned
    per user in time order, matching the batch twin for every *closed*
    session (the batch version also reports the still-open tail)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_events(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Exactly-once ingestion dedup: the streaming twin of exact dedup
    (:func:`..operators.dedup.dedup_exact`'s keep-first semantics, keyed
    on event_id) via ``dropDuplicatesWithinWatermark`` — re-delivered
    events arriving within the watermark horizon are dropped, and the
    dedup state itself is evicted once the watermark passes, so state
    stays O(events per horizon), not O(stream history). This is the
    standard at-least-once-source → effectively-exactly-once pattern
    when the sink can't be made idempotent (the graph-ingest stream in
    :mod:`.ingest` takes the other route: an idempotent upsert sink)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def run_available_now(
    stream_df: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently in the source into a memory sink
    (tests/backfills): one availableNow run, blocking until done."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_BQ_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bq_n_sample", LongType()),
        StructField("bq_p50", DoubleType()),
        StructField("bq_p90", DoubleType()),
    ]
)

# GroupState payload: the sketch itself — parallel arrays of the k
# smallest (hash, id, value) triples seen so far for this key
_BQ_STATE = StructType(
    [
        StructField("hvs", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def _bottomk_fn(k: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import hashlib

        import numpy as np
        import pandas as pd

        (event_type,) = key
        if state.exists:
            hvs, ids, vals = state.get
            rows = list(zip(hvs, ids, vals))
        else:
            rows = []
        for pdf in pdfs:
            for i, v in zip(pdf["event_id"], pdf["value"]):
                h = int(
                    hashlib.md5(str(int(i)).encode()).hexdigest()[:13], 16
                )
                rows.append((h, int(i), float(v)))
        rows.sort()
        del rows[k:]
        state.update(
            (
                [r[0] for r in rows],
                [r[1] for r in rows],
                [r[2] for r in rows],
            )
        )
        sample = np.array([r[2] for r in rows])
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "bq_n_sample": [len(rows)],
                "bq_p50": [round(float(np.percentile(sample, 50)), 6)],
                "bq_p90": [round(float(np.percentile(sample, 90)), 6)],
            }
        )

    return fn


def streaming_bottomk_quantiles(events: DataFrame, k: int = 256) -> DataFrame:
    """Streaming twin of the mergeable bottom-k quantile sketch
    (:func:`..operators.sketches.bottomk_sample_quantiles`): the k
    smallest-md5(event_id) rows per event_type ride in GroupState and
    each micro-batch folds its rows in and re-emits the key's current
    estimate (update mode — the estimate refines as data arrives).

    This is the sketch's mergeability made operational: because
    bottom-k union is associative and order-independent, the stream's
    final estimate over any prefix-complete delivery equals the batch
    operator on the same rows — bit-for-bit, whatever the micro-batch
    boundaries were (test-pinned). One caveat inherited from the batch
    side's hash-threshold prefilter: the stream keeps an exact bottom-k
    while the batch operator prefilters by a hash threshold sized for
    ≥k survivors with probability ≈1−e^−k — in the vanishingly rare
    shortfall case the batch sample is smaller than k and the two
    estimates differ (the batch docstring quantifies it). State is
    O(k) per key forever; no
    watermark needed because the sketch never grows. numpy's linear
    interpolation is the same percentile definition as Spark's
    ``percentile`` and the oracle's ``percentile_cont``."""
    return events.groupBy("event_type").applyInPandasWithState(
        _bottomk_fn(k),
        outputStructType=_BQ_OUT,
        stateStructType=_BQ_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_segment_dedup(
    doc_stream: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    mode: str = "chunk",
    seg_tokens: int | None = None,
) -> DataFrame:
    """Streaming twin of the paragraph-dedup keep/drop decision
    (:func:`..operators.dedup.paragraph_dedup`): each arriving document
    explodes into its segments *row-locally* (the shared
    :func:`..operators.dedup.segment_array` expression — batch and
    stream compile the identical segmentation), then the first
    occurrence of each segment within the watermark horizon survives
    via ``dropDuplicatesWithinWatermark`` keyed on the segment text.

    Returns the kept-segment stream (doc_id, seg_idx, seg, ts). State
    is O(distinct segments per horizon) — evicted as the watermark
    advances, never O(stream history). Keep-first follows *arrival*
    order where the batch operator uses (doc_id, seg_idx) order; a
    source delivering documents in id order makes the two identical
    (stream ≡ batch is test-pinned under that ordering). Per-document
    reassembly (concat of surviving segments) is a batch job over the
    accumulated keep-set — cross-row retrospective work, like the
    near-dup clustering noted in :mod:`.hygiene`."""
    from ..operators.dedup import SEG_TOKENS, segment_array

    segl = segment_array(mode, seg_tokens or SEG_TOKENS)
    return (
        doc_stream.withColumn("ts", F.col(ts_col).cast("timestamp"))
        .select("doc_id", "ts", F.posexplode(segl).alias("seg_idx", "seg"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["seg"])
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def streaming_fine_rollup(
    events: DataFrame, minutes: int = 5, watermark: str = "10 minutes"
) -> DataFrame:
    """The continuous-aggregate *maintainer* stream: finest-level
    tumbling rollup rows (window_start, event_type, n_events,
    sum_value), one row per (window, type) emitted exactly once when
    the watermark closes the window. Unlike
    :func:`streaming_windowed_counts` the sum stays unrounded — this
    stream feeds re-aggregation (:func:`rollup_from_store`), and
    rounding belongs at the serving edge, after coarser sums."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_to_parquet(stream_df: DataFrame, path: str, checkpoint_dir: str) -> None:
    """Drain the stream into a Parquet store with the file sink's
    exactly-once manifest (availableNow, blocking). Unlike a
    foreachBatch upsert, replayed micro-batches are deduplicated by
    the sink's own transaction log — the natural sink for append-mode
    closed-window aggregates."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_parquet_with_zonemap(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    cols: tuple[str, ...],
) -> None:
    """:func:`run_to_parquet` twin that also maintains a zone-map
    manifest incrementally, so the serving read path
    (:func:`read_store_pruned`) prunes on streamed data exactly as
    :meth:`..catalog.Warehouse.read_pruned` does on batch-written
    tables (r6 verdict item 8).

    Each micro-batch lands in its own ``b<batch_id>`` subdir with
    ``mode=overwrite`` — a replayed batch after a crash rewrites the
    same files and re-derives the same stats, the foreachBatch
    idempotence discipline (the file sink's transaction-log role,
    done with directories). The batch's per-file min/max (from the
    shared :func:`..catalog.zonemap_file_stats`, so batch and stream
    can never derive stats differently) then merges into
    ``_zonemap.json`` atomically (temp + ``os.replace``), replacing
    any stale entries for that batch dir first. Single writer, like
    every warehouse mutation; manifest work per batch is
    O(new files), never a store rescan."""
    import json
    import os

    from ..catalog import ZONEMAP_NAME, zonemap_file_stats

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bdir = os.path.join(path, f"b{batch_id:08d}")
        batch_df.write.mode("overwrite").parquet(bdir)
        part = zonemap_file_stats(
            batch_df.sparkSession.read.parquet(bdir), cols
        )
        mpath = os.path.join(path, ZONEMAP_NAME)
        manifest = {"columns": list(cols), "files": {}}
        if os.path.isfile(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
        # manifest keys are stripped 'file:' URIs ('///abs/path');
        # normalize both sides (as read_store_pruned does) or the
        # stale-entry purge never matches and a crash-replayed batch
        # (new part-file UUIDs) leaves dangling entries behind
        prefix = os.path.normpath(bdir) + "/"
        manifest["files"] = {
            f: st
            for f, st in manifest["files"].items()
            if not os.path.normpath(f).startswith(prefix)
        }
        manifest["files"].update(part)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, mpath)

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_store(spark: SparkSession, path: str) -> DataFrame:
    """Full scan of a :func:`run_to_parquet_with_zonemap` store: the
    per-batch subdirs read recursively (``_``-prefixed manifest files
    are skipped by Spark's file index)."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)


def read_store_pruned(spark: SparkSession, path: str, ranges: dict) -> DataFrame:
    """Zone-map-pruned scan of a streamed store — row-equivalent to
    ``read_store(...).filter(...)``, reading only the files whose
    [min, max] intersects every range. A data file the manifest has
    not caught up with (a writer between its batch write and manifest
    flip) is read unconditionally: stats are a pruning hint, never a
    correctness filter. ``ranges`` maps column → (lower, upper),
    either bound None for open."""
    import json
    import os

    from ..catalog import (
        ZONEMAP_NAME,
        zonemap_range_predicate,
        zonemap_surviving_files,
    )

    mpath = os.path.join(path, ZONEMAP_NAME)
    if not os.path.isfile(mpath):
        raise FileNotFoundError(
            f"no zone map at {path}; run run_to_parquet_with_zonemap first"
        )
    with open(mpath) as f:
        manifest = json.load(f)
    keep = set(zonemap_surviving_files(manifest, ranges))
    # input_file_name URIs strip to ///path; normalize before comparing
    # against the os.walk listing or every known file double-reads
    known = {os.path.normpath(f) for f in manifest["files"]}
    on_disk = [
        os.path.join(dp, fn)
        for dp, _, fns in os.walk(path)
        for fn in fns
        if fn.endswith(".parquet") and not fn.startswith((".", "_"))
    ]
    files = sorted(
        keep | {f for f in on_disk if os.path.normpath(f) not in known}
    )
    if not files:
        df = read_store(spark, path).limit(0)
    else:
        df = spark.read.parquet(*files)
    return df.filter(zonemap_range_predicate(ranges))


def streaming_ivf_ingest(
    vec_stream: DataFrame, path: str, checkpoint_dir: str
) -> None:
    """Streaming twin of ``similarity.ivf_index_append``: each
    micro-batch of (vec_id, embedding) rows is assigned against the
    index's STORED frozen centroids (broadcast argmax — the corpus at
    rest is never read) and lands in the ``(cid, batch)`` partition
    layout via dynamic partition overwrite keyed on this micro-batch's
    id. A crash replay re-delivers the same batch id and overwrites
    exactly its own partitions — exactly-once index growth without a
    transaction log, so an ANN index stays queryable and fresh while a
    vector stream feeds it (the serving loop the at-rest layout
    exists for).

    Batch ids map to ``bid + 1`` so the base build's segment 0 is
    never touched; the stream owns the id space through its
    checkpoint. availableNow + blocking, like the other drain-style
    jobs here."""
    from ..operators.similarity import ivf_index_append

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ivf_index_append(batch_df, path, batch=int(batch_id) + 1)

    q = (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def rollup_from_store(
    spark, path: str, minutes: tuple[int, ...] = (5, 60, 1440)
) -> DataFrame:
    """Serve the multi-resolution rollup off the *materialized* fine
    level a :func:`streaming_fine_rollup` maintainer has been appending
    — the TimescaleDB continuous-aggregate read path: raw events are
    never rescanned; every resolution re-aggregates the fine Parquet
    table (``minutes[0]`` must be the maintained resolution). Output
    schema matches :func:`..operators.events.multi_resolution_rollup`
    exactly (batch ≡ maintained-store is test-pinned on closed
    windows)."""
    from ..operators.events import coarsen_levels

    return coarsen_levels(spark.read.parquet(path), minutes)


def streaming_sessionize_native(
    events: DataFrame, gap_min: int = 30, watermark: str = "10 minutes"
) -> DataFrame:
    """Gap sessionization via Spark's *native* ``session_window``
    (merging event-time windows) — the built-in alternative to the
    custom ``applyInPandasWithState`` operator in
    :func:`streaming_sessionize`. Same closed-session semantics
    (append mode emits a session once the watermark passes its gap),
    different machinery: state lives in the engine's window store, no
    Python worker at all.

    Returns (user_id, session_start, session_end, n_events) — note the
    native form carries no per-user session ordinal (the custom
    operator numbers sessions 1..n per user); callers needing ids
    derive them downstream. ``session_window.end`` is last-event + gap
    by definition, so the gap is subtracted back out to report the last
    event time — the custom operator's (and batch sessionize's)
    ``session_end`` — and both timestamps are cast to timestamp_ntz to
    match the custom operator's declared schema exactly. Both paths are
    pinned ≡ the batch sessionize on closed sessions."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_min} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            (F.col("w.end") - F.expr(f"INTERVAL {gap_min} MINUTES"))
            .cast("timestamp_ntz")
            .alias("session_end"),
            "n_events",
        )
    )


def streaming_sq8_ingest(
    vec_stream: DataFrame, path: str, checkpoint_dir: str
) -> None:
    """Streaming twin of ``similarity.sq8_index_append``: each
    micro-batch of (vec_id, embedding) rows encodes row-locally and
    lands in the ``(bucket, batch)`` layout via dynamic partition
    overwrite keyed on this micro-batch's id — a crash replay
    overwrites exactly its own partitions (exactly-once growth, same
    discipline as ``streaming_ivf_ingest``). Batch ids map to
    ``bid + 1`` so the base build's batch 0 is never touched.
    availableNow + blocking, like the other drain-style jobs here."""
    from ..operators.similarity import sq8_index_append

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sq8_index_append(batch_df, path, batch=int(batch_id) + 1)

    q = (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_text_index_ingest(
    doc_stream: DataFrame, path: str, checkpoint_dir: str
) -> None:
    """Streaming twin of ``search.text_index_append``: each
    micro-batch of (doc_id, text) rows is tokenized, posted, and
    landed in the ``(bucket, batch)`` index layout (plus its own
    doclens/stats batch partitions) via dynamic partition overwrite
    keyed on this micro-batch's id — exactly-once index growth, same
    discipline as the IVF/SQ8 ingests, so a BM25 serving layer stays
    fresh while a document stream feeds it. Batch ids map to
    ``bid + 1``; availableNow + blocking."""
    from ..operators.search import text_index_append

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        text_index_append(batch_df, path, batch=int(batch_id) + 1)

    q = (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_bin_ingest(
    vec_stream: DataFrame, path: str, checkpoint_dir: str
) -> None:
    """Streaming twin of ``similarity.bin_index_append`` — the packed
    binary-signature store grows with the same exactly-once dynamic-
    overwrite discipline as ``streaming_sq8_ingest`` (micro-batch id
    + 1 as the batch partition, base build stays batch 0, replays of
    compaction-folded batches no-op via the shared watermark)."""
    from ..operators.similarity import bin_index_append

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bin_index_append(batch_df, path, batch=int(batch_id) + 1)

    q = (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
