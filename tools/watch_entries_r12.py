"""r12 quiet-window watch readings (VERDICT r11 item 4): n>=5 solo
medians for the two entries whose r11 retimes stayed above bound on
the degraded window — t_quality_lr_train (retime calibrated 1.53) and
s_rrf_hybrid. Replicates the bench.py thunks verbatim at the bench SF.
Usage: python tools/watch_entries_r12.py [n]
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("watch-r12")
    from webpagesgraphdatabase_spark.operators import (  # noqa: E402
        search,
        similarity,
        textstats,
    )
    from webpagesgraphdatabase_spark.registry_ops import RRF_QUERY_TERMS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def t_quality_lr_train():
        textstats.train_quality_classifier(docs)

    def s_rrf_hybrid():
        legs = None
        for qid, terms in enumerate(RRF_QUERY_TERMS):
            leg = search.bm25_topk(docs, terms, k=20).select(
                F.lit(qid).alias("query_id"), "doc_id", "rank"
            )
            legs = leg if legs is None else legs.unionByName(leg)
        vec = similarity.ann_bruteforce(
            emb, len(RRF_QUERY_TERMS), 20
        ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
        force(search.rrf_fuse([legs, vec], topk=5))

    # one untimed warm pass each (JVM/page-cache), then n timed passes
    for name, fn in (("t_quality_lr_train", t_quality_lr_train),
                     ("s_rrf_hybrid", s_rrf_hybrid)):
        fn()
        samples = []
        for _ in range(n):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        print(f"{name}: samples={samples} median={statistics.median(samples):.3f}")


if __name__ == "__main__":
    main()
