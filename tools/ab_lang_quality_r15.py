"""Interleaved A/B for the r15 t_lang_quality leg optimizations
(lang_id union+window -> row-local struct-max argmax; DSIR two-explode
union -> single concatenated-grams explode + spread).

OLD = the pre-snapshot tree (a git worktree of the commit before the
operator edits) loaded under an aliased package name; NEW = the repo
tree. Same session, same fixture, alternating passes — window drift
cannot fake the delta. The timed action is the bench's own _force
(noop sink). Usage: python tools/ab_lang_quality_r15.py [pairs] [entry]
where entry is t_lang_quality (default).
"""

import importlib.util
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_TREE = "/tmp/r15_before"
sys.path.insert(0, REPO)

import bench  # noqa: E402
from webpagesgraphdatabase_spark import registry  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402


def load_old_queries():
    """Import the OLD tree's registry under an isolated module tree."""
    import importlib

    saved = {
        k: v for k, v in sys.modules.items()
        if k.startswith("webpagesgraphdatabase_spark")
    }
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, OLD_TREE)
    try:
        old_pkg = importlib.import_module("webpagesgraphdatabase_spark")
        assert old_pkg.__file__.startswith(OLD_TREE), old_pkg.__file__
        old_registry = importlib.import_module(
            "webpagesgraphdatabase_spark.registry"
        )
        old_queries = dict(old_registry.QUERIES)
    finally:
        sys.path.remove(OLD_TREE)
        for k in [
            m for m in sys.modules if m.startswith("webpagesgraphdatabase_spark")
        ]:
            del sys.modules[k]
        sys.modules.update(saved)
    return old_queries


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    entry = sys.argv[2] if len(sys.argv) > 2 else "t_lang_quality"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gate = bench.host_quiet_gate(retry_sleep=30.0)
    print(f"host-quiet gate: {gate}")

    old_queries = load_old_queries()
    spark = get_spark("ab-lang-quality-r15")

    def run(fn):
        t0 = time.time()
        bench._force(fn(spark, sf_dir))
        return round(time.time() - t0, 3)

    new_fn = registry.QUERIES[entry]
    old_fn = old_queries[entry]
    # verify the two frames agree before timing anything
    a = registry.QUERIES[entry](spark, sf_dir)
    b = old_queries[entry](spark, sf_dir)
    mism = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"result parity old-vs-new: {mism} differing rows")
    assert mism == 0, "old and new frames disagree — not an optimization"

    run(old_fn); run(new_fn)  # warm both paths untimed
    olds, news = [], []
    for i in range(pairs):
        if i % 2 == 0:
            olds.append(run(old_fn)); news.append(run(new_fn))
        else:
            news.append(run(new_fn)); olds.append(run(old_fn))
        print(f"pair {i}: old={olds[-1]} new={news[-1]}", flush=True)
    print(f"OLD samples={olds} min={min(olds)} median={statistics.median(olds)}")
    print(f"NEW samples={news} min={min(news)} median={statistics.median(news)}")
    print(
        f"ratio (new/old medians): "
        f"{statistics.median(news) / statistics.median(olds):.3f}"
    )


if __name__ == "__main__":
    main()
