"""Document-corpus sources beyond the test parquet: schema-enforced
JSONL ingestion with a reject side-output.

Web-scale text corpora arrive as JSON-lines (one doc per line —
Common Crawl derivatives, data-exchange dumps); the reference ingests
only CSV (``main.py:217-356``, mirrored by ``serving.preload_csv``).
This module is the JSONL front door with the same hygiene discipline
the CSV path has: declared schema (never inference — a schema-inference
pass over 100 TB is a full extra scan), malformed lines quarantined to
a side-output instead of poisoning the run, and a one-shot conversion
into Parquet, because JSON is a *landing* format, not a query format
(no column pruning, no predicate pushdown, full-text parse per row).

Scale notes:

- ``PERMISSIVE`` mode parses each line once; corrupt lines surface in
  ``_corrupt_record`` instead of failing the job (a single bad line
  must not kill a 100 TB backfill).
- The reject filter runs in the same scan — no second pass; rejects
  carry the raw line and a reason column for operator triage
  (the ``pipeline.py`` reject-side-output convention).
- ``to_parquet`` is the landing→warehouse hop: one scan of the JSONL,
  written as Parquet so every downstream operator gets pushdown and
  pruning. Re-reading JSONL per query is the anti-pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents-table schema (TESTDATA.md) + the corrupt-line channel.
DOC_FIELDS: tuple[tuple[str, T.DataType], ...] = (
    ("doc_id", T.LongType()),
    ("text", T.StringType()),
    ("lang", T.StringType()),
    ("source", T.StringType()),
    ("n_chars", T.LongType()),
)

CORRUPT_COL = "_corrupt_record"


def _doc_schema() -> T.StructType:
    return T.StructType(
        [T.StructField(n, t) for n, t in DOC_FIELDS]
        + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_documents_jsonl(
    spark: SparkSession, path: str, required: tuple[str, ...] = ("doc_id", "text")
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document corpus under a declared schema.

    Returns ``(docs, rejects)``:

    - ``docs`` — rows that parsed AND carry every ``required`` column
      non-null, projected to the documents-table schema.
    - ``rejects`` — quarantined rows: (reason, raw) where reason is
      ``malformed`` (unparseable line; ``raw`` is the original text) or
      ``missing:<col>`` (parsed but a required field is null; ``raw``
      is the row re-serialized to JSON).

    Both sides come from ONE scan (the reject filter is a projection of
    the same parsed rows). Type mismatches (e.g. a string doc_id that
    is not a number) parse to null under PERMISSIVE and are caught by
    the required-column gate."""
    raw = spark.read.schema(_doc_schema()).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    ).json(path)

    doc_cols = [n for n, _ in DOC_FIELDS]
    ok = F.col(CORRUPT_COL).isNull()
    for c in required:
        ok = ok & F.col(c).isNotNull()

    docs = raw.filter(ok).select(*doc_cols)

    missing_reason = F.concat(
        F.lit("missing:"),
        F.concat_ws(
            ",",
            *[
                F.when(F.col(c).isNull(), F.lit(c))
                for c in required
            ],
        ),
    )
    rejects = raw.filter(~ok).select(
        F.when(F.col(CORRUPT_COL).isNotNull(), F.lit("malformed"))
        .otherwise(missing_reason)
        .alias("reason"),
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct(*doc_cols)),
        ).alias("raw"),
    )
    return docs, rejects


def to_parquet(
    spark: SparkSession,
    jsonl_path: str,
    parquet_path: str,
    rejects_path: str | None = None,
) -> DataFrame:
    """Land a JSONL corpus into Parquet (the query format): one scan,
    good rows written columnar, rejects written as JSON beside them
    when ``rejects_path`` is given. Returns the landed docs DataFrame
    re-read from Parquet (so downstream plans scan Parquet, with
    pushdown, not the JSON)."""
    docs, rejects = read_documents_jsonl(spark, jsonl_path)
    docs.write.mode("overwrite").parquet(parquet_path)
    if rejects_path is not None:
        rejects.write.mode("overwrite").json(rejects_path)
    return spark.read.parquet(parquet_path)


def read_documents_jsonl_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_documents_jsonl`'s *good* side: a
    file-source JSONL stream under the same declared schema, with
    malformed/required-null rows filtered out in-flight (append mode;
    stateless, so every row-local operator — PII scrub, text stats,
    segment explosion — applies unchanged downstream). A landing job
    that must *quarantine* rejects runs the batch reader per drop
    instead; a stream can only keep-or-drop."""
    raw = (
        spark.readStream.schema(_doc_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    doc_cols = [n for n, _ in DOC_FIELDS]
    return raw.filter(
        F.col(CORRUPT_COL).isNull()
        & F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
    ).select(*doc_cols)


def read_documents_orc(
    spark: SparkSession,
    path: str,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """Read an ORC document corpus (the Hive/Trino-ecosystem
    interchange format) under the declared documents schema.

    ORC is already typed and columnar, so there is no per-line corrupt
    channel — the failure modes are *schema drift* (a column missing
    from the files entirely: raises ``ValueError`` naming it, instead
    of silently reading nulls for 100 TB) and *row-level nulls* in
    required fields (quarantined to the same (reason, raw) reject
    shape as the JSONL reader). Columns beyond the declared schema are
    ignored by projection — pruning means they are never read."""
    doc_cols = [n for n, _ in DOC_FIELDS]
    raw = spark.read.orc(path)
    missing = [c for c in doc_cols if c not in raw.columns]
    if missing:
        raise ValueError(
            f"ORC corpus at {path} lacks declared columns {missing}"
        )
    typed = raw.select(
        *[F.col(n).cast(t).alias(n) for n, t in DOC_FIELDS]
    )
    ok = F.lit(True)
    for c in required:
        ok = ok & F.col(c).isNotNull()
    docs = typed.filter(ok)
    missing_reason = F.concat(
        F.lit("missing:"),
        F.concat_ws(
            ",", *[F.when(F.col(c).isNull(), F.lit(c)) for c in required]
        ),
    )
    rejects = typed.filter(~ok).select(
        missing_reason.alias("reason"),
        F.to_json(F.struct(*doc_cols)).alias("raw"),
    )
    return docs, rejects


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink for interchange with Hive/Trino consumers (zlib
    compression, Spark's native writer — predicate pushdown and column
    projection work on the way back in)."""
    df.write.mode("overwrite").orc(path)
