"""Streaming graph ingestion — the reference app's incremental path
(per-request ``add_link``/``upload_csv`` CRUD, ``main.py:217-433``) as
micro-batches: metadata CSVs dropped into a directory stream through
``foreachBatch`` into the same batched upsert job the batch preload
uses (:func:`..serving.preload_csv`).

One code path for both arrival modes — the batch/streaming twin
pattern used across this engine. Idempotency comes for free from the
preload's skip-existing anti-join, which also makes micro-batch
*replays* safe (foreachBatch is at-least-once; the upsert is a natural
idempotent sink, the standard way to get effectively-exactly-once).

Scale notes: each micro-batch is one set-based upsert per table (no
per-row writes); the anti-join broadcasts the (small) incoming batch
against the stored key column only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..graph.mutations import GraphStore
from ..serving import PRELOAD_REQUIRED, preload_csv

CSV_SCHEMA = ", ".join(f"{c} string" for c in PRELOAD_REQUIRED)


def read_metadata_csv_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of links_with_metadata-shaped CSVs (S2 schema,
    header row per file). ``max_files_per_trigger`` bounds micro-batch
    size (the streaming analog of the app's ``batch_size`` cap O3)."""
    reader = spark.readStream.schema(CSV_SCHEMA).option("header", True)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(source_dir)


def stream_preload(
    stream_df: DataFrame,
    store: GraphStore,
    checkpoint_dir: str,
    batch_size: int | None = None,
):
    """Run the metadata stream into the graph store; returns the started
    StreamingQuery (caller awaits/stops). Each micro-batch goes through
    the full preload pipeline: normalize → dedup → anti-join → MERGE ×5."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        preload_csv(store, batch_df, batch_size=batch_size)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
