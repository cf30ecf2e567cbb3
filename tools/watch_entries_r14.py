"""r14 quiet-window watch (VERDICT r13 item 4): clear the two carried
watches measured — ``t_quality_lr_score`` (r13 retime calibrated 2.01,
raw 0.72) and ``d_paragraph_dedup_hot`` (r13 retime raw 1.67, the only
breach with a NON-divergent probe; builder 0.619 -> 0.915 across
r12->r13 with dedup.py untouched).

Measures each entry BOTH ways:

* at the historical 1x input (closes the carried watch against the
  historical bands: t_quality_lr_score 0.38-0.95, d_paragraph_dedup_hot
  0.62-0.92 builder quiet readings), and
* at the r14 BENCH_SCALE size (the go-forward series), n>=5 medians.

Also records the environment-bisect facts the verdict asked for on
d_paragraph_dedup_hot: file count / row count / bytes of its input
table (the driver regenerates testdata between rounds, so layout drift
is the prime suspect for an unchanged-code shift).

Writes/updates WATCHES.json at the repo root (entries keyed by bench
name, medians at the SCALED size + an initial band of
[0.75x, 1.3x] median) — bench.py's ``cross_host`` block reads it
(VERDICT r13 item 3). Usage: python tools/watch_entries_r14.py [n]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402

HISTORICAL_BANDS = {
    # builder quiet readings, r11-r13 BENCHLOG series (1x inputs)
    "t_quality_lr_score": (0.38, 0.95),
    "d_paragraph_dedup_hot": (0.62, 0.92),
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark("watch-r14")

    from pyspark.sql import functions as SF

    from webpagesgraphdatabase_spark.operators import dedup, textstats
    from webpagesgraphdatabase_spark.operators._util import (
        count_parquet_files,
        count_parquet_rows,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = textstats.train_quality_classifier(docs)
    scaled = bench.ScaledInputs(spark, sf_dir)
    hot_text = SF.lit(
        ("boilerplate navigation footer terms " * 24).strip()
    ).alias("text")

    # environment bisect for d_paragraph_dedup_hot (unchanged code,
    # moving reading): its input table's physical layout this round
    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):  # the testdata tables are single flat files
        import pyarrow.parquet as pq

        env = {
            "documents_files": 1,
            "documents_rows": pq.ParquetFile(src).metadata.num_rows,
            "documents_bytes": os.path.getsize(src),
        }
    else:
        bytes_total = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fns in os.walk(src)
            for f in fns
        )
        env = {
            "documents_files": count_parquet_files(src),
            "documents_rows": count_parquet_rows(src),
            "documents_bytes": bytes_total,
        }
    print(f"input-layout bisect: {env}")

    k_lr = bench.BENCH_SCALE["t_quality_lr_score"]
    k_hot = bench.BENCH_SCALE["d_paragraph_dedup_hot"]
    docs_lr = scaled.table("documents", k_lr)
    hot1 = docs.select("doc_id", hot_text)
    hot_k = scaled.table("documents", k_hot).select("doc_id", hot_text)

    thunks = {
        ("t_quality_lr_score", 1): lambda: bench._force(
            textstats.quality_lr_score(docs, model)
        ),
        ("t_quality_lr_score", k_lr): lambda: bench._force(
            textstats.quality_lr_score(docs_lr, model)
        ),
        ("d_paragraph_dedup_hot", 1): lambda: bench._force(
            dedup.paragraph_dedup(hot1)
        ),
        ("d_paragraph_dedup_hot", k_hot): lambda: bench._force(
            dedup.paragraph_dedup(hot_k)
        ),
    }

    medians: dict[tuple, float] = {}
    try:
        for (name, k), fn in thunks.items():
            fn()  # warm pass (JVM/codegen/page cache)
            samples = []
            for _ in range(n):
                t0 = time.time()
                fn()
                samples.append(round(time.time() - t0, 3))
            med = statistics.median(samples)
            medians[(name, k)] = med
            band = HISTORICAL_BANDS.get(name) if k == 1 else None
            verdict = ""
            if band:
                verdict = (
                    " -> inside the historical band (watch CLOSED)"
                    if band[0] <= med <= band[1]
                    else f" -> OUTSIDE the historical band {band}"
                )
            print(
                f"{name} @x{k}: samples={samples} "
                f"median={med:.3f}{verdict}"
            )
    finally:
        scaled.close()

    # go-forward watch rows at the scaled sizes for bench cross_host
    wpath = os.path.join(here, "WATCHES.json")
    try:
        with open(wpath) as fh:
            watches = json.load(fh)
    except (OSError, ValueError):
        watches = {"entries": {}}
    for name, k in (("t_quality_lr_score", k_lr),
                    ("d_paragraph_dedup_hot", k_hot)):
        med = medians[(name, k)]
        watches["entries"][name] = {
            "builder_quiet_median": round(med, 3),
            "n": n,
            "scale": k,
            # initial band at the new size: +-(25-30)% of the quiet
            # median, the jitter envelope the retime series established
            "band": [round(med * 0.75, 3), round(med * 1.3, 3)],
            "source": "tools/watch_entries_r14.py",
            "env": env,
        }
    with open(wpath, "w") as fh:
        json.dump(watches, fh, indent=1)
    print(f"wrote {wpath}")


if __name__ == "__main__":
    main()
