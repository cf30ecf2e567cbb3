"""Beyond-reference operators for large-scale training-data pipelines.

The reference (`ch4444rlie/WebpagesGraphDatabase`) stops at a ~60-row web
corpus; these modules add the operations a 100 TB LLM-data pipeline needs
(BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal column plumbing. Every deterministic operator is
registered in :mod:`..registry` with a DuckDB oracle.
"""

from . import (  # noqa: F401
    dedup,
    events,
    mediainfo,
    multimodal,
    similarity,
    sketches,
    textstats,
)
