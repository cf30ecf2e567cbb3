"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``ch4444rlie/WebpagesGraphDatabase``.

The reference is a property-graph application (Kùzu-embedded): Link /
Category / Keyword node tables, BELONGS_TO / HAS_KEYWORD relationship
tables, Cypher pattern-match queries, plus a pandas ETL/enrichment
pipeline. This package re-expresses that surface Spark-first:

- Graph = plain DataFrames (3 node tables + 2 edge tables); traversal =
  equi-joins (GraphFrames-style motifs). See ``graph/``.
- Mutations (MERGE / DETACH DELETE / orphan cleanup) = set-based
  table-rewrite jobs over a Parquet warehouse. See ``graph/mutations.py``
  and ``catalog.py``.
- ETL pipeline = lazy DataFrame stages with Parquet checkpoints and
  pluggable (stubbed) fetch/LLM enrichment via ``mapInPandas``.
  See ``pipeline/``.
- Beyond-reference, training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) live in ``operators/``.

Everything is declarative DataFrame/SQL so Catalyst + AQE handle
pushdown, pruning, join selection, and skew; UDFs appear only where
built-ins genuinely cannot express the semantics (and then always as
Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
