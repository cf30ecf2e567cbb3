"""Dump ``explain("formatted")`` for every driver-registry query to one
file per query, so plan-shape claims in OPTIMIZATION notes are checkable
without running Spark.

Usage::

    python tools/dump_plans.py <out_dir> [sf_dir] [suffix] [name ...]

Writes ``<out_dir>/<name>_<suffix>.txt`` (suffix defaults to
``before``). Plans are built statically — nothing executes beyond the
eager sizing probes some operators run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def explain_formatted(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    only = set(sys.argv[4:])

    import __spark_entry__ as ent
    from webpagesgraphdatabase_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name, fn in sorted(ent.queries().items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, flush=True)


if __name__ == "__main__":
    main()
