"""Scalar function library — SURVEY.md §2.8 (F1–F7).

Fidelity ports of the reference's string/URL/parse logic, re-expressed
for Spark. Pure string algebra stays in built-in functions (JVM-side,
codegen); the two genuinely stateful parsers — URL normalization (F1,
``main.py:100-104``) and the LLM-output category/keyword parser (F2,
``main.py:53-80``) — are pure-Python functions (exhaustively unit
tested) wrapped as Arrow-batched pandas UDFs.

Sentinel conventions are centralized here (SURVEY §7 "what's hard"):
the reference itself drifts between ``'Uncategorized'`` (app,
``main.py:61-62``) and ``'uncategorized'`` (notebook, ``c7:80``); both
constants exist so each pipeline surface keeps its own casing.
"""

from __future__ import annotations

import json
import re
import urllib.parse
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

SENTINEL_NONE = "none"
SENTINEL_NONE_TITLE = "None"
UNCATEGORIZED_APP = "Uncategorized"  # main.py:61-62
UNCATEGORIZED_NB = "uncategorized"  # c7:80
MAX_KEYWORDS = 3  # main.py:116, c7:11

# the app's 19-entry category allowlist, main.py:54-60
CATEGORY_ALLOWLIST = (
    "general tools",
    "graph technologies",
    "healthcare data",
    "ai and legal systems",
    "federated search",
    "organized crime analysis",
    "beneficial ownership",
    "financial crime technology",
    "corporate governance",
    "power and utilities",
    "Social Media",
    "Community Platform",
    "Database",
    "News",
    "Blog",
    "E-commerce",
    "International Economics/Policy",
    "Data Analysis",
    "Machine Learning / AI",
)

# --- F1: URL normalization (main.py:100-104, 252-256, 362-366) ----------


def normalize_url_py(url: str) -> str:
    """Reference semantics exactly: default https scheme, keep only
    scheme://netloc/path (query/fragment dropped), strip trailing '/',
    percent-quote with safe ':/?=&'."""
    url = url.strip()
    if not url:
        return ""
    if not url.startswith(("http://", "https://")):
        url = "https://" + url
    parsed = urllib.parse.urlparse(url)
    normalized = f"{parsed.scheme}://{parsed.netloc}{parsed.path}".rstrip("/")
    return urllib.parse.quote(normalized, safe=":/?=&")


def normalize_url(col) -> Column:
    """F1 as an Arrow-batched pandas UDF (built lazily: pandas_udf
    needs an active session to resolve its return type)."""

    @pandas_udf(StringType())
    def _udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: normalize_url_py(u) if u is not None else None)

    return _udf(col)


# --- F2: LLM-output category/keyword parser (main.py:53-80) --------------

_CAT_RE = re.compile(r"Category:\s*([A-Za-z\s/]+)(?:\s*Keywords:|$)")
_KW_RE = re.compile(r"Keywords:\s*([^.]+)")
_FALLBACK_KW_RE = re.compile(r"\b[A-Z][a-zA-Z\s-]+\b")


def parse_category_and_keywords_py(response: str | None) -> tuple[str, str, list[str]]:
    """Reference semantics exactly (main.py:53-80): extract
    ``Category:``, match against the allowlist (exact case-insensitive
    OR substring-of-response), extract ``Keywords:`` up to the first
    '.', cap at 3; if none, fall back to capitalized phrases ≤2 words
    that don't echo the category."""
    category = UNCATEGORIZED_APP
    suggested = UNCATEGORIZED_APP
    keywords = [SENTINEL_NONE]
    if not response:
        return category, suggested, keywords
    m = _CAT_RE.search(response)
    if m:
        suggested = m.group(1).strip()
    for cat in CATEGORY_ALLOWLIST:
        if cat.lower() == suggested.lower() or cat.lower() in response.lower():
            category = cat
            break
    m = _KW_RE.search(response)
    if m:
        keywords = [k.strip() for k in m.group(1).strip().split(",") if k.strip()][
            :MAX_KEYWORDS
        ]
    if not keywords or keywords == [SENTINEL_NONE]:
        found = _FALLBACK_KW_RE.findall(response)
        keywords = [
            k.strip()
            for k in found
            if len(k.split()) <= 2
            and k.lower() not in category.lower()
            and k.lower() not in suggested.lower()
        ][:MAX_KEYWORDS]
    return category, suggested, keywords if keywords else [SENTINEL_NONE]


_ENRICHMENT_TYPE = StructType(
    [
        StructField("category", StringType()),
        StructField("suggested_category", StringType()),
        StructField("keywords", ArrayType(StringType())),
    ]
)


def parse_enrichment(col) -> Column:
    """F2 as an Arrow-batched pandas UDF returning a struct column."""

    @pandas_udf(_ENRICHMENT_TYPE)
    def _udf(responses: pd.Series) -> pd.DataFrame:
        rows = [parse_category_and_keywords_py(r) for r in responses]
        return pd.DataFrame(
            rows, columns=["category", "suggested_category", "keywords"]
        )

    return _udf(col)


# --- F3: JSON-fence strip + schema parse (c5:44-47, c7:53-59) ------------

ARTICLE_SCHEMA = (
    "category string, keywords array<string>, "
    "category_explanation string, keyword_explanations array<string>"
)
CLEANING_SCHEMA = "garbage_text string, cleaned_content string, unsure_content string"


def strip_json_fence(col: Column) -> Column:
    """Remove a leading ```json / ``` fence and trailing ``` fence."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.trim(col), r"^```(json)?\s*", ""), r"```\s*$", ""
        )
    )


def parse_fenced_json(col: Column, schema: str = ARTICLE_SCHEMA) -> Column:
    """F3: fence-strip + from_json; malformed input → null struct (the
    caller's fallback branch, c7:60-63)."""
    return F.from_json(strip_json_fence(col), schema)


def parse_fenced_json_py(text: str, keys: tuple[str, ...]) -> dict | None:
    """Python twin used by enrichment stages (stub clients return str)."""
    stripped = re.sub(r"^```(json)?\s*", "", text.strip())
    stripped = re.sub(r"```\s*$", "", stripped)
    try:
        obj = json.loads(stripped)
    except (ValueError, TypeError):
        return None
    # valid JSON scalars/arrays are not row objects (found by hypothesis)
    if not isinstance(obj, dict) or not all(k in obj for k in keys):
        return None
    return obj


# --- F4: truncation family (c4:22, main.py:44-48,110-111) ----------------


def truncate_content(col: Column) -> Column:
    return F.substring(col, 1, 5000)


def truncate_cleaned(col: Column) -> Column:
    return F.substring(col, 1, 500)


def truncate_title(col: Column) -> Column:
    return F.substring(col, 1, 255)


# --- F6/F7: delimited keyword list <-> string (main.py:116-118, c7:75) ---


def join_keywords(col: Column) -> Column:
    """array<string> → ', '-joined, sentinel 'none' when empty."""
    return F.when(
        F.size(col) > 0, F.array_join(col, ", ")
    ).otherwise(F.lit(SENTINEL_NONE))


def split_keywords(col: Column) -> Column:
    """comma-string → trimmed non-empty array, capped at 3; the
    sentinel 'none' → empty array."""
    arr = F.filter(
        F.transform(F.split(col, ","), lambda k: F.trim(k)),
        lambda k: (k != "") & (k != SENTINEL_NONE),
    )
    return F.slice(arr, 1, MAX_KEYWORDS)


# --- Unicode normalization (curation hygiene; beyond-reference) ----------
# Web text mixes precomposed and combining-mark forms of the same
# glyph ('é' as U+00E9 vs 'e'+U+0301); exact dedup, shingling, and
# tokenization all treat them as different bytes unless the corpus is
# normalized first. NFC is the curation default (byte-stable for
# already-normalized ASCII/Latin text); NFKC additionally folds
# compatibility forms (ligatures, full-width digits) for tokenizers.


def normalize_unicode(col, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (Arrow-batched pandas UDF —
    normalization tables are per-codepoint stateful, not expressible in
    codegen string algebra). ``form``: NFC/NFD/NFKC/NFKD."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf(StringType())
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return _udf(col)
