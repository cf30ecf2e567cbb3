"""One-shot io-window probe: runs bench.io_probe in a throwaway session
and prints the reading against the commit gate's steady band, so a
25-minute full-bench run is only launched on a window that can PASS
``tools/commit_bench.py``. Exit 0 = in band (probe <= 1.5x steady),
exit 1 = degraded."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from tools.commit_bench import steady_io  # noqa: E402
from webpagesgraphdatabase_spark.session import get_spark  # noqa: E402


def main() -> int:
    steady = steady_io(REPO) or 1.597
    spark = get_spark("io-window-probe")
    io = bench.io_probe(spark)
    ok = io <= 1.5 * steady
    print(f"io_probe={io} steady={steady} bound={1.5 * steady:.3f} "
          f"{'IN BAND' if ok else 'DEGRADED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
