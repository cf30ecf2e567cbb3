"""PII detection and redaction over document text — the scrub pass a
training-data pipeline runs before anything leaves the raw zone
(reference has no analog; this extends the corpus-hygiene suite the
same way dedup/curation do).

Everything is JVM-side codegen (``regexp_count`` / ``regexp_replace``
chains) — no Python in the hot path, so the scrub costs one projection
over the corpus scan and fuses into whatever else reads the text.

The patterns are deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB, the correctness oracle): no
backreferences, no lookaround, only ``\\b`` / classes / bounded
quantifiers — so the oracle recomputes byte-identical results from
first principles.

Scale shape: per-row regular expressions inside whole-stage codegen;
no shuffle, no UDF, no driver participation. At 100 TB this is a pure
map stage that pipelines with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Ordered (kind, pattern, placeholder). Order matters for redaction:
# emails first so a ``+digits`` local part can't be half-eaten by the
# phone rule; the identical order is baked into the oracle SQL.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}", "<PHONE>"),
    ("id", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
)


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts: (doc_id, n_email, n_ip, n_phone,
    n_id). Counts are *progressive* — each kind is counted on the text
    with every higher-priority kind already redacted, so ``n_<kind>``
    is exactly the number of ``<KIND>`` placeholders :func:`pii_redact`
    inserts (an email local part like ``a+1234567@`` never double-counts
    as a phone). Still one codegen projection; the staged
    ``regexp_replace`` chain is the same work the redactor does."""
    staged = F.col(text_col)
    cols = []
    for kind, pat, placeholder in PII_RULES:
        cols.append(
            F.regexp_count(staged, F.lit(pat))
            .cast("long")  # DuckDB len() is BIGINT; match dtypes exactly
            .alias(f"n_{kind}")
        )
        staged = F.regexp_replace(staged, pat, placeholder)
    return docs.select("doc_id", *cols)


def redact_col(text_col: str = "text") -> Column:
    """The redaction expression alone: ``text`` with every rule's
    matches replaced by its typed placeholder, applied in
    :data:`PII_RULES` order (emails before phones — see module doc)."""
    col = F.col(text_col)
    for _, pat, placeholder in PII_RULES:
        col = F.regexp_replace(col, pat, placeholder)
    return col


def scrub_cols(text_col: str = "text") -> list:
    """The scan+redact projection columns alone: [n_email, n_ip,
    n_phone, n_id, clean_text] over ``text_col`` — shared by
    :func:`pii_scrub` and the fused t_lang_quality registry row (the
    staged redaction chain is computed once either way)."""
    staged = F.col(text_col)
    cols = []
    for kind, pat, placeholder in PII_RULES:
        cols.append(
            F.regexp_count(staged, F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        staged = F.regexp_replace(staged, pat, placeholder)
    cols.append(staged.alias("clean_text"))
    return cols


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scan + redact in one projection: (doc_id, n_email, n_ip,
    n_phone, n_id, clean_text). Computes the staged redaction chain
    once — use this over joining :func:`pii_scan` + :func:`pii_redact`
    when both are wanted (the join would run the regex chain twice)."""
    return docs.select("doc_id", *scrub_cols(text_col))


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text): the document text with all PII spans
    replaced by typed placeholders (``<EMAIL>``, ``<IP>``, ``<PHONE>``,
    ``<ID>``) — span positions survive, so downstream tokenization and
    packing stay aligned with the unredacted layout."""
    return docs.select("doc_id", redact_col(text_col).alias("clean_text"))


def plant_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically append one of each PII kind (derived from
    ``doc_id``) to every document's text, as ``text_pii``.

    The synthetic corpus contains no natural PII, so an end-to-end
    scrub demonstration needs planted positives; deriving them from
    ``doc_id`` keeps the row reproducible from first principles in any
    engine (the DuckDB oracle plants the identical suffix). Production
    corpora skip this and scrub ``text`` directly."""
    return docs.withColumn(
        "text_pii",
        F.concat(
            F.col(text_col),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com node 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7 ref 123-45-6789 call +1415555"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 4, "0"),
        ),
    )
