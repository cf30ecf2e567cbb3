"""Benchmark harness (driver-run per round).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Execution is forced with the ``noop`` sink (full pipeline runs, no
driver-side collect skew). Each query includes its graph-construction
cost — that is the honest end-to-end number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webpagesgraphdatabase_spark import registry
from webpagesgraphdatabase_spark.session import get_spark

HEADLINE = (
    "g_interconnect_canonical",
    "g_interconnect_pair_counts",
    "g_links_with_categories",
    "g_top_keywords",
    "g_export_edges",
    "g_links_per_category",
    "d_neardup_jaccard",  # shingle -> minhash -> LSH bands -> verified pairs
    "d_simhash",
    "s_cosine_neardup",  # brute-force all-pairs cosine (2k vecs at sf0.1)
    "s_ann_lsh",
    "t_quality_score",
    "mm_byte_histogram",  # the Arrow/pandas-UDF path
    "e_sessionize",
)


def run_one(spark, sf_dir: str, name: str) -> float:
    fn = registry.QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # warm the JVM/codegen path once so per-query numbers aren't
    # dominated by first-job startup
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_one(spark, sf_dir, name), 3)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
