"""Interleaved parquet-codec A/B for the io-bound warehouse rewrites
(VERDICT r14 item 5 / guide §6): snappy (the session default) vs zstd,
on the bench's own w_cluster_zorder and w_compact fixtures.

``spark.sql.parquet.compression.codec`` is a runtime SQL conf, so both
codecs run in ONE session, alternating, with the fixture rebuilt under
the same codec before each timed pass (the timed op reads the fixture
and writes the rewrite — per-codec end-to-end, exactly what the bench
times). Reports per-codec medians, rewrite output bytes, and the
read-path check (a pruned point read must stay flat under zstd).
Usage: python tools/ab_io_codec_r15.py [pairs]
"""

import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from webpagesgraphdatabase_spark.catalog import Warehouse  # noqa: E402
from webpagesgraphdatabase_spark.io_tpch import load_table  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gate = bench.host_quiet_gate(retry_sleep=30.0)
    print(f"host-quiet gate: {gate}")
    spark = get_spark("ab-io-codec-r15")
    ev_w = load_table(spark, sf_dir, "events")
    ev_c = bench._replicate(
        ev_w, bench.BENCH_SCALE["w_compact"], bench._SCALE_SALT["events"]
    )
    # materialize the scaled frame once (like ScaledInputs does) so the
    # fixture rebuild cost is a read, not a 32x explode, per pass
    scaled_dir = tempfile.mkdtemp(prefix="ab_codec_scaled_")
    ev_c.repartition(
        spark.sparkContext.defaultParallelism
    ).write.mode("overwrite").parquet(f"{scaled_dir}/events_c_src")
    ev_c_at_rest = spark.read.parquet(f"{scaled_dir}/events_c_src")

    wh_dir = tempfile.mkdtemp(prefix="ab_codec_wh_")
    wh = Warehouse(spark, wh_dir)

    def set_codec(c):
        spark.conf.set("spark.sql.parquet.compression.codec", c)

    def setup_zorder():
        wh.create_table("events", ev_w.schema)
        wh.overwrite("events", ev_w.repartition(64))
        wh.compact("events")

    def setup_compact():
        wh.create_table("events_c", ev_c_at_rest.schema)
        wh.overwrite("events_c", ev_c_at_rest.repartition(64))

    entries = {
        "w_cluster_zorder": (
            setup_zorder,
            lambda: wh.cluster(
                "events", ("event_type", "ts"), target_file_bytes=1 << 20
            ),
            "events",
        ),
        "w_compact": (setup_compact, lambda: wh.compact("events_c"), "events_c"),
    }

    results = {}
    try:
        for name, (setup, op, table) in entries.items():
            samples = {"snappy": [], "zstd": []}
            out_bytes = {}
            order = ["snappy", "zstd"]
            # one untimed warm pass per codec
            for c in order:
                set_codec(c)
                setup()
                op()
            for i in range(pairs):
                for c in order if i % 2 == 0 else order[::-1]:
                    set_codec(c)
                    setup()
                    t0 = time.time()
                    op()
                    samples[c].append(round(time.time() - t0, 3))
                    out_bytes[c] = wh.file_stats(table)["total_bytes"]
                print(
                    f"{name} pair {i}: "
                    + " ".join(f"{c}={samples[c][-1]}" for c in order),
                    flush=True,
                )
            med = {c: statistics.median(samples[c]) for c in order}
            results[name] = {
                "samples": samples,
                "medians": med,
                "rewrite_bytes": out_bytes,
                "zstd_over_snappy": round(med["zstd"] / med["snappy"], 3),
            }
            print(f"{name}: medians={med} bytes={out_bytes}")

        # read-path check: pruned point read over a zstd-written table
        set_codec("zstd")
        wh.create_table("events_zp", ev_w.schema)
        wh.overwrite(
            "events_zp", ev_w.repartitionByRange(64, "event_type", "ts")
        )
        wh.write_zonemap("events_zp", ("event_type", "ts"))
        lo = ev_w.agg({"event_type": "min"}).first()[0]
        reads = []
        bench._force(wh.read_pruned("events_zp", {"event_type": (lo, lo)}))
        for _ in range(5):
            t0 = time.time()
            bench._force(
                wh.read_pruned("events_zp", {"event_type": (lo, lo)})
            )
            reads.append(round(time.time() - t0, 3))
        print(f"w_read_pruned over zstd: samples={reads} "
              f"median={statistics.median(reads):.3f}")
        for name, r in results.items():
            print(
                f"RESULT {name}: snappy={r['medians']['snappy']} "
                f"zstd={r['medians']['zstd']} "
                f"ratio={r['zstd_over_snappy']} bytes={r['rewrite_bytes']}"
            )
    finally:
        shutil.rmtree(wh_dir, ignore_errors=True)
        shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
