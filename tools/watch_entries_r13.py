"""r13 quiet-window watch readings (VERDICT r12 item 3): n>=5 solo
medians for the two entries the r12 driver window flagged —
w_crawl_round (driver raw 1.54x, retime calibrated 2.11, the round's
one changed component) and u_heavy_hitters (driver raw 2.47x, retime
0.881, code untouched). Replicates the bench.py thunks verbatim at the
bench SF. Usage: python tools/watch_entries_r13.py [n]
"""
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("watch-r13")
    from webpagesgraphdatabase_spark import warc as _W  # noqa: E402
    from webpagesgraphdatabase_spark.graph.mutations import (  # noqa: E402
        GraphStore,
    )
    from webpagesgraphdatabase_spark.operators import (  # noqa: E402
        sketches,
        tokenize,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # --- w_crawl_round: the bench thunk verbatim (fresh store dir per
    # pass = equal work; the archive fixture builds once, untimed)
    crawl_dir = tempfile.mkdtemp(prefix="watch_crawl_")
    tmp_dirs = []
    doc_rows = docs.select("doc_id", "text").collect()
    payload = _W.build_warc(
        [
            {
                "record_id": f"<urn:doc:{r.doc_id}>",
                "warc_type": "response",
                "target_uri": f"https://bench.example/{r.doc_id}",
                "warc_date": "2026-01-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "block": _W.http_response_block(
                    (
                        "<html><head><title>d</title></head><body>"
                        + (r.text or "")
                        + "</body></html>"
                    ).encode("utf-8", "replace")
                ),
            }
            for r in doc_rows
        ],
        compress="record",
    )
    with open(f"{crawl_dir}/bench.warc.gz", "wb") as fh:
        fh.write(payload)

    def w_crawl_round():
        d = tempfile.mkdtemp(prefix="watch_crawl_run_")
        tmp_dirs.append(d)
        st = GraphStore(spark, f"{d}/wh")
        st.init_schema()
        _W.crawl_round(
            spark,
            st,
            f"{crawl_dir}/bench.warc.gz",
            text_index=f"{d}/ti",
            sq8_index=f"{d}/si",
        )

    # --- u_heavy_hitters: the bench thunk verbatim
    tok_stream = docs.select(
        F.explode(tokenize.whitespace_tokens("text")).alias("t")
    )

    def u_heavy_hitters():
        force(sketches.heavy_hitters(tok_stream, "t", k=64))

    try:
        # one untimed warm pass each (JVM/page-cache), then n timed
        for name, fn in (
            ("w_crawl_round", w_crawl_round),
            ("u_heavy_hitters", u_heavy_hitters),
        ):
            fn()
            samples = []
            for _ in range(n):
                t0 = time.time()
                fn()
                samples.append(round(time.time() - t0, 3))
            print(
                f"{name}: samples={samples} "
                f"median={statistics.median(samples):.3f}"
            )
    finally:
        shutil.rmtree(crawl_dir, ignore_errors=True)
        for d in tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
