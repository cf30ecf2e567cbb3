"""r15 quiet-window watch (VERDICT r14 item 3): close the two open
perf watches measured — ``d_dedup_clusters`` (the one r14 breach whose
automatic re-time STAYED slow: retime raw 2.77 with probe divergence
only 0.68; driver 4.14 vs r13 2.91) and ``s_ann_ivfpq_res_indexed``
(driver raw 1.71x, calibrated 1.473 — just under the 1.5 trigger, so
no retime fired).

Measures each entry exactly as the bench does (same thunk, noop sink),
n>=5 samples after an untimed warm pass, on a host the quiet gate
accepts. Historical quiet-window readings for the bands:

* d_dedup_clusters: r13 driver 2.91, r14 builder run-1 3.20
  (calibrated 0.94) -> band 2.6-3.6. A quiet median inside it closes
  the watch (the driver 4.14 / builder-retime 8.06 readings were the
  degraded window); outside it, profile the driver-collect union-find
  path (io/driver-bound, invisible to the cpu probe).
* s_ann_ivfpq_res_indexed: r13 driver 2.67, r14 builder run-1 2.84
  (calibrated 0.89) -> band 2.4-3.4.

Writes/updates WATCHES.json at the repo root (builder quiet medians +
[0.75x, 1.3x] go-forward bands) — bench.py's ``cross_host`` block joins
them into the detail sidecar's mechanical adjudication.
Usage: python tools/watch_entries_r15.py [n]
"""

import json
import os
import statistics
import sys
import tempfile
import time
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from webpagesgraphdatabase_spark import registry  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402

HISTORICAL_BANDS = {
    "d_dedup_clusters": (2.6, 3.6),
    "s_ann_ivfpq_res_indexed": (2.4, 3.4),
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gate = bench.host_quiet_gate(retry_sleep=30.0)
    print(f"host-quiet gate: {gate}")
    spark = get_spark("watch-r15")

    from webpagesgraphdatabase_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_emb = emb.count()
    emb_dim = len(emb.select("embedding").first()["embedding"])

    # untimed index build — the bench times the *_indexed entry
    # against an at-rest index exactly like this
    pqr_dir = tempfile.mkdtemp(prefix="watch_pq_res_")
    medians: dict[str, float] = {}
    try:
        sim.build_pq_index(
            emb,
            f"{pqr_dir}/pq",
            corpus_count=n_emb,
            dim=emb_dim,
            opq=True,
            residual=True,
            trained=True,
        )
        res_probe = (
            sim.auto_n_probe(sim.auto_n_centroids(n_emb)) * sim.RES_PROBE_MULT
        )
        thunks = {
            "d_dedup_clusters": lambda: bench._force(
                registry.QUERIES["d_dedup_clusters"](spark, sf_dir)
            ),
            "s_ann_ivfpq_res_indexed": lambda: bench._force(
                sim.ann_pq_from_index(
                    spark, f"{pqr_dir}/pq", emb,
                    n_probe=res_probe, refine=sim.RES_REFINE,
                )
            ),
        }
        for name, fn in thunks.items():
            fn()  # warm pass (JVM/codegen/page cache)
            samples = []
            for _ in range(n):
                t0 = time.time()
                fn()
                samples.append(round(time.time() - t0, 3))
            med = statistics.median(samples)
            medians[name] = med
            band = HISTORICAL_BANDS[name]
            verdict = (
                "inside the historical band (watch CLOSED)"
                if band[0] <= med <= band[1]
                else f"OUTSIDE the historical band {band}"
            )
            print(f"{name}: samples={samples} median={med:.3f} -> {verdict}")
    finally:
        shutil.rmtree(pqr_dir, ignore_errors=True)

    wpath = os.path.join(here, "WATCHES.json")
    try:
        with open(wpath) as fh:
            watches = json.load(fh)
    except (OSError, ValueError):
        watches = {"entries": {}}
    for name, med in medians.items():
        watches["entries"][name] = {
            "builder_quiet_median": round(med, 3),
            "n": n,
            "scale": 1,
            "band": [round(med * 0.75, 3), round(med * 1.3, 3)],
            "source": "tools/watch_entries_r15.py",
            "gate": {k: gate.get(k) for k in ("pre", "retry", "degraded")},
        }
    with open(wpath, "w") as fh:
        json.dump(watches, fh, indent=1)
    print(f"wrote {wpath}")


if __name__ == "__main__":
    main()
