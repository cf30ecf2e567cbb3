"""Bucketed-table layout for co-located joins — the 100 TB scale path.

The engine's biggest repeated join is orders ⋈ lineitem on orderkey
(graph edge construction, segment set-ops, rollups). At cluster scale
the right layout is both tables **bucketed and sorted by the join key**:
each bucket pair joins locally, so the join plans with *zero Exchange
nodes* — no shuffle of either fact table, ever, amortized across every
downstream query (`tests/test_bucketed.py` asserts the plan shape).

Spark only honors bucketing metadata through its session catalog, not
raw parquet paths, so this module writes **external** tables
(``bucketBy().sortBy().saveAsTable`` with an explicit path) — the data
lives wherever the caller says (the warehouse dir), the catalog entry
carries the bucket spec. This is the classic Hive-compatible layout;
the versioned :mod:`.catalog` warehouse stays the system of record for
the mutable graph tables, while bucketing serves the immutable fact
tables where co-location pays.

Sizing rule at 100 TB: pick ``n_buckets`` so each bucket is
O(maxPartitionBytes) — e.g. 2048 buckets for a 1 TB fact table; bucket
counts must match (or divide) across co-joined tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed (and bucket-sorted) table.

    Sorting within buckets upgrades the downstream sort-merge join to a
    merge without a Sort node — the scan itself satisfies the join's
    ordering requirement."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external data files are left in place)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def bucketed_orders_lineitem(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    n_buckets: int = 8,
    prefix: str = "b",
) -> tuple[DataFrame, DataFrame]:
    """Load + register orders and lineitem co-bucketed on orderkey;
    returns the two catalog-backed DataFrames. The one-time bucketed
    write is the amortized cost; every subsequent orderkey join is
    shuffle-free."""
    from .io_tpch import load_table

    save_bucketed(
        load_table(spark, sf_dir, "orders"),
        f"{prefix}_orders",
        ("o_orderkey",),
        n_buckets,
        f"{base_path}/{prefix}_orders",
    )
    save_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        f"{prefix}_lineitem",
        ("l_orderkey",),
        n_buckets,
        f"{base_path}/{prefix}_lineitem",
    )
    return spark.table(f"{prefix}_orders"), spark.table(f"{prefix}_lineitem")
