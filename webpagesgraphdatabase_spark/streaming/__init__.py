"""Structured Streaming surface — beyond-reference extension.

The reference has no streaming (SURVEY.md §2.9); its incremental path is
request-driven CRUD. This module provides the streaming twins of the
batch event analytics in :mod:`..operators.events`, so the same logical
queries run incrementally:

- :func:`read_event_stream` — file-source ``readStream`` over
  events-shaped parquet drops (the micro-batch ingestion surface).
- :func:`streaming_windowed_counts` — watermarked tumbling-window
  aggregate (same ``F.window`` expression as the batch twin).
- :func:`streaming_sessionize` — custom stateful operator via
  ``applyInPandasWithState``: per-user gap sessionization with open
  sessions carried in GroupState across micro-batches.
- :mod:`.hygiene` — streaming corpus hygiene: the contamination probe
  as a row-local, state-free stream transform (benchmark shingles
  plan-shipped), and the stateless text stats applied to doc streams
  unchanged.

Scale notes: state is partitioned by user_id (the natural shuffle key);
watermarks bound both window state and session state, so state size is
O(active keys), not O(history). File-source + availableNow gives
exactly-once per checkpoint; tests drive everything with availableNow
and a memory sink.
"""

from .hygiene import (
    DOC_DDL,
    benchmark_shingle_set,
    read_doc_stream,
    streaming_contamination,
    streaming_curation_report,
)
from .jobs import (
    EVENT_DDL,
    read_event_stream,
    run_available_now,
    streaming_bottomk_quantiles,
    streaming_dedup_events,
    streaming_sessionize,
    streaming_windowed_counts,
)

__all__ = [
    "DOC_DDL",
    "EVENT_DDL",
    "benchmark_shingle_set",
    "read_doc_stream",
    "read_event_stream",
    "run_available_now",
    "streaming_contamination",
    "streaming_curation_report",
    "streaming_bottomk_quantiles",
    "streaming_dedup_events",
    "streaming_sessionize",
    "streaming_windowed_counts",
]
