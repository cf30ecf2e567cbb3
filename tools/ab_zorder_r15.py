"""Interleaved A/B for the r15 `Warehouse.cluster` rewrite (spread the
compacted single-split input + build-scoped persist of the z-augmented
frame): OLD = the pre-change catalog module loaded from git show output
(pass its path as argv[2]; default /tmp/catalog_old.py), NEW = the
working tree. Both run in ONE session, alternating, with the fixture
(events 1x, repartition(64), compacted — the bench's w_cluster_zorder
PASS-1 input state) rebuilt by the same code before every timed pass so
only the cluster() body differs. Also checks result parity: the
clustered table's row content must be identical under both (sorted
collect compare at sf0.01).
Usage: python tools/ab_zorder_r15.py [pairs] [old_catalog_path]
"""

import importlib.util
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from webpagesgraphdatabase_spark import catalog as catalog_new  # noqa: E402
from webpagesgraphdatabase_spark.io_tpch import load_table  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402


def load_old(path):
    spec = importlib.util.spec_from_file_location("catalog_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    old_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/catalog_old.py"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    catalog_old = load_old(old_path)
    gate = bench.host_quiet_gate(retry_sleep=30.0)
    print(f"host-quiet gate: {gate}")
    spark = get_spark("ab-zorder-r15")
    ev_w = load_table(spark, sf_dir, "events")

    wh_dir = tempfile.mkdtemp(prefix="ab_zorder_")
    whs = {
        "old": catalog_old.Warehouse(spark, os.path.join(wh_dir, "old")),
        "new": catalog_new.Warehouse(spark, os.path.join(wh_dir, "new")),
    }

    def setup(wh):
        wh.create_table("events", ev_w.schema)
        wh.overwrite("events", ev_w.repartition(64))
        wh.compact("events")

    try:
        # parity first, at sf0.01 (cheap): identical row content
        small = load_table(spark, "/root/testdata/sf0.01", "events")
        pwh = {
            k: catalog_new.Warehouse(spark, os.path.join(wh_dir, f"p_{k}"))
            if k == "new"
            else catalog_old.Warehouse(spark, os.path.join(wh_dir, f"p_{k}"))
            for k in ("old", "new")
        }
        for k, wh in pwh.items():
            wh.create_table("events", small.schema)
            wh.overwrite("events", small.repartition(16))
            wh.compact("events")
            wh.cluster("events", ("event_type", "ts"), target_file_bytes=1 << 18)
        a = pwh["old"].read("events")
        b = pwh["new"].read("events")
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        stats = {k: pwh[k].file_stats("events") for k in pwh}
        print(f"parity: differing rows = {diff}; file stats {stats}")
        assert diff == 0, "cluster rewrite changed row content"

        samples = {"old": [], "new": []}
        order = ["old", "new"]
        for k in order:  # one untimed warm pass each
            setup(whs[k])
            whs[k].cluster("events", ("event_type", "ts"),
                           target_file_bytes=1 << 20)
        for i in range(pairs):
            for k in order if i % 2 == 0 else order[::-1]:
                setup(whs[k])
                t0 = time.time()
                whs[k].cluster(
                    "events", ("event_type", "ts"), target_file_bytes=1 << 20
                )
                samples[k].append(round(time.time() - t0, 3))
            print(f"pair {i}: old={samples['old'][-1]} new={samples['new'][-1]}",
                  flush=True)
        med = {k: statistics.median(samples[k]) for k in order}
        print(f"RESULT w_cluster_zorder: old={med['old']} new={med['new']} "
              f"new_over_old={med['new'] / med['old']:.3f} samples={samples}")
    finally:
        shutil.rmtree(wh_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
