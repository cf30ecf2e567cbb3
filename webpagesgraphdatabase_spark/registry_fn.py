"""Registry section for the scalar-function library (SURVEY §2.8).

These queries apply the *real* implementations — including the F1/F2
pandas UDFs — to synthetic inputs built identically in Spark SQL and
DuckDB, so the driver's oracle gate checks the UDF ports character for
character. The F2 oracle regenerates the reference's 19-entry allowlist
loop (exact case-insensitive OR substring-of-response, first hit wins,
``main.py:61-64``) as an ordered SQL CASE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import functions as fn
from .functions import html
from .io_tpch import load_table

# --- f_url_normalize: F1 UDF over customer-derived raw URLs --------------
# raw = 'customer.example/c<k>/' (schemeless + trailing slash); normalized
# adds https:// and strips the slash. Clean ASCII input → the quote step
# is the identity, so the oracle is plain string algebra.


def _q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 normalization plus the r7 HTML function family (html.py):
    per customer, a synthesized page exercises title extraction,
    noise/boilerplate stripping, entity decode, href harvest, and
    base-relative resolution (incl. a dot-segment collapse); the
    oracle recomputes the known extraction results directly."""
    customer = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    raw = F.concat(F.lit("customer.example/c"), k, F.lit("/"))
    page = F.concat(
        F.lit("<html><head><title> "),
        F.col("c_name"),
        F.lit(" &amp; co </title><style>a{color:red}</style></head><body>"),
        F.lit('<!-- generated --><nav><a href="/nav">n</a></nav>'),
        F.lit("<p>Segment  "),
        F.col("c_mktsegment"),
        F.lit(' &lt;end&gt;</p><a href="https://abs.example/c/'),
        k,
        F.lit("\">a</a><a href='/rel/"),
        (F.col("c_custkey") % 7).cast("string"),
        F.lit("'>r</a><a href=\"../up/"),
        (F.col("c_custkey") % 3).cast("string"),
        F.lit('">u</a><script>var a="<i>x</i>";</script>'),
        F.lit("<footer>f</footer></body></html>"),
    )
    base = F.concat(F.lit("https://site.example/c/"), k, F.lit("/index.html"))
    links = F.transform(
        html.extract_hrefs(page), lambda h: html.resolve_href(base, h)
    )
    # Unicode normalization leg (r7): a combining-acute 'e'+U+0301 and
    # the U+FB01 fi-ligature — NFC precomposes the accent and keeps the
    # ligature (checked against DuckDB's nfc_normalize); NFKC folds the
    # ligature too (checked against the literal expected form)
    denorm = F.concat(F.col("c_name"), F.lit(" cafe\u0301 \ufb01n"))
    return customer.select(
        F.col("c_custkey").alias("id"),
        fn.normalize_url(raw).alias("url"),
        html.html_title(page).alias("page_title"),
        html.html_text(page).alias("clean_text"),
        F.size(links).cast("long").alias("n_links"),
        F.md5(F.array_join(links, "|")).alias("links_fp"),
        fn.normalize_unicode(denorm, "NFC").alias("nfc_name"),
        fn.normalize_unicode(denorm, "NFKC").alias("nfkc_name"),
    )


_URL_ORACLE = """
SELECT c_custkey AS id,
       'https://customer.example/c' || c_custkey AS url,
       c_name || ' & co' AS page_title,
       'Segment ' || c_mktsegment || ' <end> a r u' AS clean_text,
       CAST(4 AS BIGINT) AS n_links,
       md5('https://site.example/nav'
           || '|https://abs.example/c/' || c_custkey
           || '|https://site.example/rel/' || (c_custkey % 7)
           || '|https://site.example/c/up/' || (c_custkey % 3)) AS links_fp,
       -- same denormalized input (combining acute U+0301, fi-ligature
       -- U+FB01) through DuckDB's own NFC; NFKC folds the ligature, so
       -- its expectation is the literal compatibility-folded form
       nfc_normalize(c_name || ' cafe' || chr(769) || ' ' || chr(64257) || 'n')
         AS nfc_name,
       c_name || ' caf' || chr(233) || ' fin' AS nfkc_name
FROM customer
"""

# --- f_parse_enrichment: F2 UDF over synthetic LLM responses -------------
# response = 'Category: <cat> Keywords: <tok1>, <tok2>.' where <cat>
# cycles allowlist-exact / case-insensitive / miss across doc_ids.

_RESPONSE_SQL = """
  SELECT doc_id,
         'Category: ' || CASE WHEN doc_id % 5 = 0 THEN 'News'
                              WHEN doc_id % 5 = 1 THEN 'database'
                              ELSE lang END
         || ' Keywords: ' || toks[1] || ', ' || toks[2] || '.' AS response
  FROM (
    SELECT doc_id, lang,
           list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
    FROM documents
  )
"""


def _response_col():
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    cat = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("News"))
        .when(F.col("doc_id") % 5 == 1, F.lit("database"))
        .otherwise(F.col("lang"))
    )
    return F.concat(
        F.lit("Category: "),
        cat,
        F.lit(" Keywords: "),
        F.element_at(toks, 1),
        F.lit(", "),
        F.element_at(toks, 2),
        F.lit("."),
    )


def _q_parse_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    parsed = docs.select(
        "doc_id", fn.parse_enrichment(_response_col()).alias("p")
    )
    return parsed.select(
        "doc_id",
        F.col("p.category").alias("category"),
        F.col("p.suggested_category").alias("suggested_category"),
        F.array_join(F.col("p.keywords"), ", ").alias("keywords"),
    )


def _allowlist_case() -> str:
    """The reference's allowlist loop as an ordered CASE (first hit wins)."""
    branches = []
    for cat in fn.CATEGORY_ALLOWLIST:
        c = cat.lower().replace("'", "''")
        out = cat.replace("'", "''")
        branches.append(
            f"WHEN lower(suggested) = '{c}' OR contains(lower(response), '{c}')"
            f" THEN '{out}'"
        )
    return "CASE " + " ".join(branches) + " ELSE 'Uncategorized' END"


# suggested falls back to 'Uncategorized' exactly like the Python UDF
# (parse_category_and_keywords_py keeps its initial sentinel when the
# Category regex misses or the whole response is NULL — e.g. a document
# with <2 tokens makes the synthetic response NULL); same for the
# keywords sentinel 'none'.
_PARSE_ORACLE = f"""
WITH resp AS ({_RESPONSE_SQL}),
extracted AS (
  SELECT doc_id, response,
         trim(regexp_extract(response,
              'Category:\\s*([A-Za-z\\s/]+)(?:\\s*Keywords:|$)', 1)) AS suggested,
         regexp_extract(response, 'Keywords:\\s*([^.]+)', 1) AS kw_raw
  FROM resp
)
SELECT doc_id,
       {_allowlist_case()} AS category,
       coalesce(nullif(suggested, ''), 'Uncategorized') AS suggested_category,
       coalesce(nullif(array_to_string(
         list_filter(list_transform(string_split(kw_raw, ','), k -> trim(k)),
                     k -> k <> '')[1:3], ', '), ''), 'none') AS keywords
FROM extracted
"""

# --- f_fenced_json: F3 fence-strip + schema parse, plus the F4/F5
# truncation/trim family in the same documents-grain row (merged to keep
# the registry inside the driver gate's ~50-row window). A fenced
# ArticleClassification JSON built from doc fields, then parsed back
# with from_json (Spark) / json_extract (DuckDB).


def _fenced_col():
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    inner = F.to_json(
        F.struct(
            F.col("lang").alias("category"),
            F.slice(toks, 1, 2).alias("keywords"),
            F.concat(F.lit("Explained for doc "), F.col("doc_id").cast("string")).alias(
                "category_explanation"
            ),
            F.array(F.lit("stub")).alias("keyword_explanations"),
        )
    )
    return F.concat(F.lit("```json\n"), inner, F.lit("\n```"))


def _q_fenced_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    parsed = docs.select(
        "doc_id",
        "text",
        fn.parse_fenced_json(_fenced_col()).alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("p.category").alias("category"),
        F.array_join(F.col("p.keywords"), "|").alias("keywords"),
        F.col("p.category_explanation").alias("category_explanation"),
        fn.truncate_title(F.col("text")).alias("title_255"),
        F.substring(F.col("text"), 1, 100).alias("head_100"),
        F.length(F.trim(F.col("text"))).alias("trimmed_len"),
    )


_FENCED_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, text, lang,
         list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
  FROM documents
)
SELECT doc_id, lang AS category,
       toks[1] || '|' || toks[2] AS keywords,
       'Explained for doc ' || doc_id AS category_explanation,
       substr(text, 1, 255) AS title_255,
       substr(text, 1, 100) AS head_100,
       length(trim(text)) AS trimmed_len
FROM toks
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "f_url_normalize": _q_url_normalize,
    "f_parse_enrichment": _q_parse_enrichment,
    "f_fenced_json": _q_fenced_json,
}

ORACLES: dict[str, str] = {
    "f_url_normalize": _URL_ORACLE,
    "f_parse_enrichment": _PARSE_ORACLE,
    "f_fenced_json": _FENCED_ORACLE,
}
