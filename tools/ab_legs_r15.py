"""Leg-level interleaved A/B for the r15 snapshot changes: old vs new
lang_id and dsir_weights, standalone, plus the composed row, so the
row-level delta can be attributed. Usage: python tools/ab_legs_r15.py [pairs]
"""

import importlib
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_TREE = "/tmp/r15_before"
sys.path.insert(0, REPO)

import bench  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402
from webpagesgraphdatabase_spark.io_tpch import load_table  # noqa: E402
from webpagesgraphdatabase_spark.operators import (  # noqa: E402
    sampling as new_sampling,
    textstats as new_textstats,
)


def load_old_modules():
    saved = {
        k: v for k, v in sys.modules.items()
        if k.startswith("webpagesgraphdatabase_spark")
    }
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, OLD_TREE)
    try:
        old_sampling = importlib.import_module(
            "webpagesgraphdatabase_spark.operators.sampling"
        )
        old_textstats = importlib.import_module(
            "webpagesgraphdatabase_spark.operators.textstats"
        )
        assert old_sampling.__file__.startswith(OLD_TREE)
    finally:
        sys.path.remove(OLD_TREE)
        for k in [
            m for m in sys.modules if m.startswith("webpagesgraphdatabase_spark")
        ]:
            del sys.modules[k]
        sys.modules.update(saved)
    return old_sampling, old_textstats


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    print(f"gate: {bench.host_quiet_gate(retry_sleep=30.0)['pre']}")
    old_sampling, old_textstats = load_old_modules()
    spark = get_spark("ab-legs-r15")
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")

    legs = {
        "lang_id": (
            lambda: old_textstats.lang_id(docs),
            lambda: new_textstats.lang_id(docs),
        ),
        "dsir_weights": (
            lambda: old_sampling.dsir_weights(docs, F.col("lang") == "en"),
            lambda: new_sampling.dsir_weights(docs, F.col("lang") == "en"),
        ),
    }
    for name, (old_fn, new_fn) in legs.items():
        # parity first
        a, b = old_fn(), new_fn()
        mism = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"{name} parity: {mism} differing rows")

        def run(fn):
            t0 = time.time()
            bench._force(fn())
            return round(time.time() - t0, 3)

        run(old_fn); run(new_fn)
        olds, news = [], []
        for i in range(pairs):
            if i % 2 == 0:
                olds.append(run(old_fn)); news.append(run(new_fn))
            else:
                news.append(run(new_fn)); olds.append(run(old_fn))
        print(
            f"{name}: OLD={olds} med={statistics.median(olds)} | "
            f"NEW={news} med={statistics.median(news)} | "
            f"ratio={statistics.median(news)/statistics.median(olds):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
