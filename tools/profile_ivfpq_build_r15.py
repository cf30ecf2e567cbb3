"""Phase profile of the bench's heaviest entry, s_ann_ivfpq_res_build
(build_pq_index opq+residual+trained): wraps the phase functions the
build calls with wall timers and prints per-phase seconds over N runs,
so the round log's "what remains is writes + corpus passes" claim is a
measurement, not an assertion. Attribution caveat printed with the
results: build-scoped persists materialize inside their FIRST consumer,
so the OPQ GEMM cost lands in the phase that first scans the projected
corpus (kmeans sample collect), not in pca_project itself.
Usage: python tools/profile_ivfpq_build_r15.py [runs]
"""

import functools
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from webpagesgraphdatabase_spark.operators import similarity as sim  # noqa: E402
from webpagesgraphdatabase_spark.io_tpch import load_table  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402

PHASES = [
    "pca_model",
    "pca_project",
    "_write_opq_transform",
    "kmeans_centroids",
    "ivf_assign",
    "train_pq",
    "pq_encode",
]


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(f"host-quiet gate: {bench.host_quiet_gate(retry_sleep=30.0)}")
    spark = get_spark("profile-ivfpq-r15")
    emb = load_table(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    emb_dim = len(emb.select("embedding").first()["embedding"])

    acc = {p: 0.0 for p in PHASES}

    def timed(name, fn):
        @functools.wraps(fn)
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            acc[name] += time.time() - t0
            return out
        return wrap

    originals = {p: getattr(sim, p) for p in PHASES}
    for p in PHASES:
        setattr(sim, p, timed(p, originals[p]))
    try:
        totals = []
        for i in range(runs):
            for p in PHASES:
                acc[p] = 0.0
            d = tempfile.mkdtemp(prefix="prof_ivfpq_")
            t0 = time.time()
            try:
                sim.build_pq_index(
                    emb, f"{d}/pq", corpus_count=n_emb, dim=emb_dim,
                    opq=True, residual=True, trained=True,
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)
            total = time.time() - t0
            totals.append(total)
            attributed = sum(acc.values())
            print(f"run {i}: total={total:.3f} "
                  + " ".join(f"{p}={acc[p]:.3f}" for p in PHASES)
                  + f" remainder(writes/persists/rnorms)={total - attributed:.3f}",
                  flush=True)
        print(f"RESULT totals={['%.3f' % t for t in totals]}")
    finally:
        for p in PHASES:
            setattr(sim, p, originals[p])


if __name__ == "__main__":
    main()
