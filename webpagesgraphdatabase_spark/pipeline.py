"""Staged ETL/enrichment pipeline — SURVEY.md §3.3 / §7 milestone 3.

Re-expresses the reference notebook's batch DAG (``Edits.ipynb`` cells
c3→c7) as Spark stages with Parquet checkpoints between them (the
notebook checkpoints every stage to CSV — same restart/debug property,
columnar storage):

  urls → **fetch** (S7) → **clean** (S8 + cleaning_log side output)
       → **gate** (P6; rejects → links_please_review) → **categorize**
       (S8 + failed_processing side output) → links_with_metadata

Enrichment I/O (webpage fetch, LLM calls) runs executor-side through
``mapInPandas`` — one Spark job per stage instead of the reference's
row-at-a-time loops (``c4:9-27``, ``c5:12-51``, ``c7:21-63``). Clients
are injected so tests (and this container) use deterministic stubs; a
real deployment passes clients that do requests/Ollama I/O with the
reference's timeouts and truncations.

Scale notes: every stage is embarrassingly parallel over url
partitions; no stage shuffles (narrow maps + filters); side outputs are
separate filtered writes from the same stage result, so each stage's
lineage is computed once (checkpointed before fan-out to main/reject
sinks). At 100 TB the fetch/LLM stages are rate-limited by the external
services, not Spark — partition count = desired request concurrency.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator
from dataclasses import dataclass
from typing import TYPE_CHECKING, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import (
    MAX_KEYWORDS,
    SENTINEL_NONE,
    UNCATEGORIZED_NB,
    parse_fenced_json_py,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MIN_CONTENT = 100  # quality gate, c6:9/c6:21
FETCH_TRUNC = 5000  # c4:22
TITLE_TRUNC = 255
CLEAN_TRUNC = 500


# ---------------------------------------------------------------------------
# Pluggable enrichment clients (deterministic stubs; real ones do I/O)
# ---------------------------------------------------------------------------


def stub_fetcher(url: str) -> tuple[str, str]:
    """Deterministic fetch stand-in: content derived from md5(url).
    ~1/5 of urls get short content (<100 chars) to exercise the gate —
    mirrors the reference corpus where 14/63 rows fail the gate."""
    h = hashlib.md5(url.encode()).hexdigest()
    title = f"Title {h[:8]}"
    words = [h[i : i + 4] for i in range(0, 32, 4)]
    if int(h[:2], 16) % 5 == 0:
        return title, " ".join(words[:2])  # too short -> gate reject
    body = " ".join(words * 8)
    return title, body[:FETCH_TRUNC]


def stub_cleaner(content: str) -> str:
    """Deterministic LLM-clean stand-in: returns the fenced-JSON shape
    the real Ollama call returns (c5:23-33 example)."""
    obj = {
        "garbage_text": "Navbar: Home | About",
        "cleaned_content": content.strip(),
        "unsure_content": "",
    }
    return "```json\n" + json.dumps(obj) + "\n```"


def stub_categorizer(content: str) -> str:
    """Deterministic LLM-categorize stand-in (ArticleClassification
    shape, c7:9-13): category/keywords derived from the content hash."""
    h = hashlib.md5(content.encode()).hexdigest()
    cats = ["graph technologies", "general tools", "healthcare data"]
    obj = {
        "category": cats[int(h[:2], 16) % len(cats)],
        "keywords": [f"kw {h[i:i+3]}" for i in range(0, 9, 3)][
            : 1 + int(h[2], 16) % MAX_KEYWORDS
        ],
        "category_explanation": f"Derived deterministically from {h[:6]}.",
        "keyword_explanations": ["stub explanation."],
    }
    return "```json\n" + json.dumps(obj) + "\n```"


def failing_categorizer(content: str) -> str:
    return "not json at all"


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------


FETCH_RETRIES = 2  # c4:9 — fetch_webpage_content(url, retries=2)


def fetch_stage(
    urls: DataFrame,
    fetcher: Callable[[str], tuple[str, str]],
    retries: int = FETCH_RETRIES,
) -> DataFrame:
    """c4: url → (url, title, content); executor-side I/O via
    mapInPandas, reference truncations applied.

    Retry fidelity (c4:9-27): each url gets ``retries`` attempts; an
    exception on the last attempt degrades to ``(title=url,
    content='')`` — the reference's ``return "", url`` — so one bad url
    never fails the stage/task (which would re-fetch the whole
    partition on task retry)."""

    def call(url: str) -> tuple[str, str]:
        for attempt in range(retries):
            try:
                return fetcher(url)
            except Exception:
                if attempt == retries - 1:
                    return url, ""  # c4:24-26: (content="", title=url)
        return url, ""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            titles, contents = [], []
            for url in pdf["url"]:
                title, content = call(url)
                titles.append((title or url)[:TITLE_TRUNC])
                contents.append((content or "")[:FETCH_TRUNC])
            yield pd.DataFrame(
                {"url": pdf["url"], "title": titles, "content": contents}
            )

    return urls.select("url").mapInPandas(run, "url string, title string, content string")


def clean_stage(fetched: DataFrame, cleaner: Callable[[str], str]) -> DataFrame:
    """c5: LLM content cleaning. Output columns: url, title, content
    (cleaned), garbage_text, unsure_content. Parse/validation failure
    falls back to the raw content (reference behavior, main.py:50-51);
    content <100 chars short-circuits to '' without an LLM call
    (c5:14-15)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        keys = ("garbage_text", "cleaned_content", "unsure_content")
        for pdf in batches:
            cleaned, garbage, unsure = [], [], []
            for content in pdf["content"]:
                if not content or len(content.strip()) < MIN_CONTENT:
                    cleaned.append("")
                    garbage.append("")
                    unsure.append("")
                    continue
                obj = parse_fenced_json_py(cleaner(content), keys)
                if obj is None:
                    cleaned.append(content[:CLEAN_TRUNC])
                    garbage.append("")
                    unsure.append("")
                else:
                    cleaned.append(str(obj["cleaned_content"]))
                    garbage.append(str(obj["garbage_text"]))
                    unsure.append(str(obj["unsure_content"]))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "title": pdf["title"],
                    "content": cleaned,
                    "garbage_text": garbage,
                    "unsure_content": unsure,
                }
            )

    schema = (
        "url string, title string, content string, "
        "garbage_text string, unsure_content string"
    )
    return fetched.mapInPandas(run, schema)


def gate_stage(cleaned: DataFrame) -> tuple[DataFrame, DataFrame]:
    """c6: quality gate. Returns (passed, rejected); rejected carries
    the reference's reason string."""
    ok = F.length(F.trim(F.col("content"))) >= MIN_CONTENT
    passed = cleaned.filter(ok).select("url", "title", "content")
    rejected = cleaned.filter(~ok).select(
        "url", F.lit("Insufficient content after cleaning").alias("reason")
    )
    return passed, rejected


def categorize_stage(
    gated: DataFrame, categorizer: Callable[[str], str]
) -> DataFrame:
    """c7: LLM categorization. Output: url, title, content, category,
    keyword (comma-joined, 'none' sentinel), category_explanation,
    keyword_explanation ('; '-joined), ok flag (False rows feed the
    failed_processing side output with the notebook sentinels
    'uncategorized'/'none', c7:80-87)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        keys = ("category", "keywords", "category_explanation", "keyword_explanations")
        for pdf in batches:
            out = {
                "category": [],
                "keyword": [],
                "category_explanation": [],
                "keyword_explanation": [],
                "ok": [],
            }
            for content in pdf["content"]:
                obj = parse_fenced_json_py(categorizer(content), keys)
                if obj is None or not obj["keywords"]:
                    out["category"].append(UNCATEGORIZED_NB)
                    out["keyword"].append(SENTINEL_NONE)
                    out["category_explanation"].append("")
                    out["keyword_explanation"].append("")
                    out["ok"].append(False)
                else:
                    kws = [str(k).strip() for k in obj["keywords"]][:MAX_KEYWORDS]
                    out["category"].append(str(obj["category"]))
                    out["keyword"].append(", ".join(kws))
                    out["category_explanation"].append(str(obj["category_explanation"]))
                    out["keyword_explanation"].append(
                        "; ".join(str(e) for e in obj["keyword_explanations"])
                    )
                    out["ok"].append(True)
            yield pd.DataFrame(
                {"url": pdf["url"], "title": pdf["title"], "content": pdf["content"], **out}
            )

    schema = (
        "url string, title string, content string, category string, "
        "keyword string, category_explanation string, "
        "keyword_explanation string, ok boolean"
    )
    return gated.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Pipeline runner with Parquet stage checkpoints
# ---------------------------------------------------------------------------


@dataclass
class PipelineResult:
    metadata: DataFrame  # links_with_metadata (valid rows)
    cleaning_log: DataFrame  # url, garbage_text, unsure_content
    review: DataFrame  # url, reason (gate rejects)
    failed: DataFrame  # url, reason (categorize failures)


class Pipeline:
    """c3→c7 as checkpointed Spark stages under ``warehouse_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        fetcher: Callable[[str], tuple[str, str]] = stub_fetcher,
        cleaner: Callable[[str], str] = stub_cleaner,
        categorizer: Callable[[str], str] = stub_categorizer,
    ) -> None:
        self.spark = spark
        self.dir = warehouse_dir.rstrip("/")
        self.fetcher = fetcher
        self.cleaner = cleaner
        self.categorizer = categorizer

    def _checkpoint(self, df: DataFrame, name: str) -> DataFrame:
        path = f"{self.dir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def run(self, urls: DataFrame) -> PipelineResult:
        fetched = self._checkpoint(
            fetch_stage(urls, self.fetcher), "links_with_raw_content"
        )
        cleaned = self._checkpoint(
            clean_stage(fetched, self.cleaner), "links_with_cleaned_content"
        )
        cleaning_log = self._checkpoint(
            cleaned.select("url", "garbage_text", "unsure_content"), "cleaning_log"
        )
        passed, rejected = gate_stage(cleaned)
        review = self._checkpoint(rejected, "links_please_review")
        passed = self._checkpoint(passed, "links_with_content")
        categorized = self._checkpoint(
            categorize_stage(passed, self.categorizer), "categorized"
        )
        failed = self._checkpoint(
            categorized.filter(~F.col("ok")).select(
                "url",
                F.lit(
                    "Failed to generate meaningful category or keywords"
                ).alias("reason"),
            ),
            "failed_processing",
        )
        metadata = self._checkpoint(
            categorized.filter(F.col("ok")).select(
                "url",
                "title",
                "content",
                "category",
                "keyword",
                "category_explanation",
                "keyword_explanation",
            ),
            "links_with_metadata",
        )
        return PipelineResult(metadata, cleaning_log, review, failed)
