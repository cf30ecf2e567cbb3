"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark at a given sf dir and the
matching ``oracle_sql()[name]`` in DuckDB over the same parquet tables,
then compares row count, column-name set, and an order-insensitive
canonicalized value hash. Usage::

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def list_merge_map() -> int:
    """``--list`` (VERDICT r13 item 7): print the registry's documented
    merge map — which gate row carries which operator legs — so the
    next row merge is a lookup, not archaeology. No Spark session."""
    from webpagesgraphdatabase_spark.registry_map import (
        MERGE_MAP,
        operator_index,
    )

    print(f"# {len(MERGE_MAP)} gate rows -> operator legs\n")
    for row, legs in MERGE_MAP.items():
        print(row)
        for leg, op in legs:
            print(f"  [{leg}] {op}")
    print("\n# operator -> (row, leg)\n")
    for op, sites in sorted(operator_index().items()):
        locs = ", ".join(f"{r}[{leg}]" for r, leg in sites)
        print(f"{op}\n  -> {locs}")
    return 0


def main() -> int:
    if "--list" in sys.argv:
        try:
            return list_merge_map()
        except BrokenPipeError:  # `--list | head` is a normal use
            return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from webpagesgraphdatabase_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = ent.queries(), ent.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) rows={len(s_rows)} "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs = canon_hash(s_rows, s_cols)
            hd = canon_hash(d_rows, d_cols)
            if hs != hd:
                problems.append(f"hash mismatch {hs[:12]} != {hd[:12]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK   {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
