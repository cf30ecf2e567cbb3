from __future__ import annotations

import pytest
from pyspark.sql import types as T

from webpagesgraphdatabase_spark.catalog import TableNotFoundError, Warehouse

SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]
)


def test_create_if_absent_and_list(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert wh.list_tables() == []
    wh.create_table("t1", SCHEMA)
    wh.create_table("t1", SCHEMA)  # idempotent
    assert wh.list_tables() == ["t1"]
    assert wh.read("t1").count() == 0
    assert wh.read("t1").schema == SCHEMA


def test_read_missing_raises(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(TableNotFoundError):
        wh.read("nope")


def test_versioned_overwrite_is_read_modify_write_safe(spark, tmp_path):
    """The core warehouse property: overwrite a table with a transform of
    itself (illegal on a flat parquet path) works via versioning."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite("t", spark.createDataFrame([("a", "1"), ("b", "2")], SCHEMA))
    cur = wh.read("t")
    wh.overwrite("t", cur.filter("k = 'a'"))
    assert [r.k for r in wh.read("t").collect()] == ["a"]


def test_snapshot_isolation(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite("t", spark.createDataFrame([("a", "1")], SCHEMA))
    old = wh.read("t")
    wh.overwrite("t", spark.createDataFrame([("b", "2")], SCHEMA))
    assert [r.k for r in old.collect()] == ["a"]  # reader sees its snapshot
    assert [r.k for r in wh.read("t").collect()] == ["b"]


def test_vacuum_keeps_current(spark, tmp_path):
    import os

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i in range(4):
        wh.overwrite("t", spark.createDataFrame([(str(i), "v")], SCHEMA))
    wh.vacuum("t", keep=1)
    tdir = tmp_path / "wh" / "t"
    versions = [d for d in os.listdir(tdir) if d.startswith("v")]
    assert len(versions) == 1
    assert [r.k for r in wh.read("t").collect()] == ["3"]


def test_drop_all_reinit(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create_table("t", SCHEMA)
    wh.drop_all()
    assert wh.list_tables() == []


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    """A table fragmented into many tiny files compacts to few files
    with identical data; old version stays until vacuum."""
    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
    wh.create_table("frag", df.schema)
    wh.overwrite("frag", df.repartition(64))  # 64 slivers
    before = wh.file_stats("frag")
    assert before["n_files"] == 64

    report = wh.compact("frag", target_file_bytes=10 * 1024 * 1024)
    assert report["after"]["n_files"] < before["n_files"]
    assert report["after"]["total_bytes"] > 0

    got = sorted((r.id, r.v) for r in wh.read("frag").collect())
    assert got == [(i, 2 * i) for i in range(10_000)]
    # versioned: the pre-compaction version is still readable
    # (v1 empty create, v2 fragmented write, v3 compacted)
    assert len(wh.list_versions("frag")) == 3


def test_compact_partitioned_table_keeps_partition_layout(spark, tmp_path):
    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(2_000).selectExpr("id", "id % 3 AS part").repartition(32)
    wh.create_table("p", df.schema, partition_by=("part",))
    wh.overwrite("p", df)
    report = wh.compact("p", target_file_bytes=50 * 1024 * 1024)
    assert report["after"]["n_files"] <= report["before"]["n_files"]
    # hive layout survives and partition pruning still applies
    pruned = wh.read("p").filter("part = 1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "part" in plan
    assert pruned.count() == sum(1 for i in range(2_000) if i % 3 == 1)


def test_diff_keyed_insert_update_delete(spark, tmp_path):
    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, v string"
    )
    wh.create_table("t", v1.schema)
    wh.overwrite("t", v1)
    wh.overwrite("t", v2)
    versions = wh.list_versions("t")
    got = {
        (r.op, r.id): r.v
        for r in wh.diff("t", versions[-2], versions[-1], key="id").collect()
    }
    assert got == {("update", 2): "B", ("delete", 3): None, ("insert", 4): "d"}


def test_diff_setwise_without_key(spark, tmp_path):
    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    v2 = spark.createDataFrame([(2, "b"), (2, "b"), (5, "e")], "id long, v string")
    wh.create_table("t", v1.schema)
    wh.overwrite("t", v1)
    wh.overwrite("t", v2)
    vs = wh.list_versions("t")
    ops = sorted(
        (r.op, r.id, r.v) for r in wh.diff("t", vs[-2], vs[-1]).collect()
    )
    # exceptAll honors multiplicity: the duplicated (2, b) appears once as insert
    assert ops == [("delete", 1, "a"), ("insert", 2, "b"), ("insert", 5, "e")]


def test_add_column_is_metadata_only_with_lazy_default(spark, tmp_path):
    """Schema evolution: old versions project the new column with its
    default (no rewrite); new writes carry real values; time travel to
    the pre-evolution version still resolves the evolved schema."""
    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    wh.create_table("t", v1.schema)
    wh.overwrite("t", v1)

    wh.add_column("t", "score", "double", default=0.5)
    got = {r.id: r.score for r in wh.read("t").collect()}
    assert got == {1: 0.5, 2: 0.5}  # old files lack the column -> default

    v2 = spark.createDataFrame([(1, "a", 0.9), (3, "c", 0.1)],
                               "id long, v string, score double")
    wh.overwrite("t", v2)
    got2 = {r.id: r.score for r in wh.read("t").collect()}
    assert got2 == {1: 0.9, 3: 0.1}

    # time travel to the pre-evolution snapshot: evolved schema + default
    first_data_version = wh.list_versions("t")[1]
    old = {r.id: r.score for r in wh.read_version("t", first_data_version).collect()}
    assert old == {1: 0.5, 2: 0.5}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        wh.add_column("t", "score", "double")


def test_add_column_default_does_not_swallow_post_evolution_nulls(spark, tmp_path):
    """r5 advice: the lazy default applies only to versions written
    BEFORE the evolution. An explicit NULL written into the evolved
    column afterwards must read back as NULL — and compact() must
    preserve it while baking the default into pre-evolution rows."""
    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    wh.create_table("t", v1.schema)
    wh.overwrite("t", v1)
    wh.add_column("t", "score", "double", default=0.5)

    # post-evolution write with an explicit NULL score for id=2
    v2 = spark.createDataFrame(
        [(1, "a", 0.9), (2, "b", None)], "id long, v string, score double"
    )
    wh.overwrite("t", v2)
    got = {r.id: r.score for r in wh.read("t").collect()}
    assert got == {1: 0.9, 2: None}  # NOT 0.5

    # pre-evolution snapshot still fills the default under time travel
    pre = wh.list_versions("t")[1]
    old = {r.id: r.score for r in wh.read_version("t", pre).collect()}
    assert old == {1: 0.5, 2: 0.5}

    # compaction rewrites the current version; the explicit NULL survives
    wh.compact("t")
    got2 = {r.id: r.score for r in wh.read("t").collect()}
    assert got2 == {1: 0.9, 2: None}


def test_zorder_cluster_concentrates_conjunctive_ranges(spark, tmp_path):
    """Z-order rewrite: after clustering on (user_id, ts), a range
    predicate on BOTH columns finds its rows in a small subset of the
    files; the unclustered (insert-order) layout stripes them across
    most files. Row content must be identical before and after."""
    import pyspark.sql.functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = 20_000
    # insert order correlates with NEITHER dimension of the query
    df = (
        spark.range(n)
        .select(
            (F.col("id") * 2654435761 % 1000).alias("user_id"),
            (F.col("id") * 40503 % 86400).alias("ts_s"),
            F.col("id").alias("payload"),
        )
        .repartition(16)
    )
    wh.create_table("ev", df.schema)
    wh.overwrite("ev", df)
    pred = (
        (F.col("user_id").between(100, 140))
        & (F.col("ts_s").between(10_000, 20_000))
    )

    def touched_files():
        return (
            wh.read("ev")
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    before_rows = sorted(map(tuple, wh.read("ev").filter(pred).collect()))
    # force a multi-file layout comparable to the clustered rewrite
    stats = wh.cluster("ev", ("user_id", "ts_s"), target_file_bytes=8 * 1024)
    after_files = touched_files()
    after_rows = sorted(map(tuple, wh.read("ev").filter(pred).collect()))
    assert after_rows == before_rows  # clustering never changes content
    total_files = stats["after"]["n_files"]
    assert total_files >= 8
    # the conjunctive range lives in a small corner of z-space
    assert after_files <= max(2, total_files // 3), (
        after_files,
        total_files,
    )


def test_zorder_cluster_rejects_bad_column_counts(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh2"))
    df = spark.range(10).select(F.col("id").alias("a"))
    wh.create_table("t", df.schema)
    wh.overwrite("t", df)
    with pytest.raises(ValueError, match="1-4"):
        wh.cluster("t", ())


def test_zorder_cluster_string_pair_and_zonemap_prune(spark, tmp_path):
    """The reference's entire schema is STRING (main.py:20-22), so
    cluster() must rank string columns — sampled boundary strings in
    raw string order, the order zone maps prune on (r6 verdict item
    5). Two-dimensional locality on a (url, category) string pair,
    then a file-subset zone-map-pruned read on a string range."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = 20_000
    df = spark.range(n).select(
        F.format_string(
            "https://site%05d.example.com/", (F.col("id") * 2654435761) % 10_000
        ).alias("url"),
        F.format_string("cat_%02d", (F.col("id") * 40503) % 40).alias(
            "category"
        ),
        F.col("id").alias("payload"),
    )
    wh.create_table("links", df.schema)
    wh.overwrite("links", df.repartition(16))
    pred = F.col("url").between(
        "https://site02000", "https://site03000"
    ) & F.col("category").between("cat_10", "cat_15")
    before_rows = sorted(map(tuple, wh.read("links").filter(pred).collect()))
    assert before_rows  # the query range is non-empty
    stats = wh.cluster("links", ("url", "category"), target_file_bytes=8 * 1024)
    after_rows = sorted(map(tuple, wh.read("links").filter(pred).collect()))
    assert after_rows == before_rows  # clustering never changes content
    total_files = stats["after"]["n_files"]
    assert total_files >= 8
    touched = (
        wh.read("links")
        .filter(pred)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    # the conjunctive string range lives in a small corner of z-space
    assert touched <= max(2, total_files // 3), (touched, total_files)

    manifest = wh.write_zonemap("links", ("url", "category"))
    pruned = wh.read_pruned(
        "links",
        {
            "url": ("https://site02000", "https://site03000"),
            "category": ("cat_10", "cat_15"),
        },
    )
    assert sorted(map(tuple, pruned.collect())) == before_rows
    read_files = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert read_files <= max(2, len(manifest["files"]) // 3)


def test_zorder_cluster_rejects_unorderable_dtype(spark, tmp_path):
    """Non-orderable clustering columns raise up front instead of
    silently casting to null and degrading to the remaining columns
    (r6 advice item 4)."""
    import pytest
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh3"))
    df = spark.range(10).select(
        F.col("id").alias("a"), F.array(F.col("id")).alias("arr")
    )
    wh.create_table("t", df.schema)
    wh.overwrite("t", df)
    with pytest.raises(ValueError, match="numeric/timestamp"):
        wh.cluster("t", ("a", "arr"))
    with pytest.raises(ValueError, match="no column"):
        wh.cluster("t", ("nope",))


def test_zonemap_prunes_files_and_matches_plain_filter(spark, tmp_path):
    """Zone-map manifest + pruned read: a range predicate on the
    clustered column reads a strict subset of the data files while
    returning exactly the rows read().filter() returns; an impossible
    range reads zero files but keeps the schema."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("payload")
    )
    wh.create_table("t", df.schema)
    # range-partition on k so files carry tight, disjoint k-ranges
    wh.overwrite("t", df.repartitionByRange(10, "k"))
    manifest = wh.write_zonemap("t", ("k",))
    assert len(manifest["files"]) >= 8
    assert sum(st["n_rows"] for st in manifest["files"].values()) == 10_000

    pruned = wh.read_pruned("t", {"k": (2_000, 2_500)})
    want = sorted(
        map(tuple, wh.read("t").filter(F.col("k").between(2_000, 2_500)).collect())
    )
    assert sorted(map(tuple, pruned.collect())) == want
    touched = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert touched <= 2, touched  # ~1 of 10 range files holds 500 keys

    empty = wh.read_pruned("t", {"k": (10**9, None)})
    assert empty.count() == 0
    assert empty.columns == ["k", "payload"]


def test_zonemap_missing_manifest_raises(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh3"))
    df = spark.range(10).select(F.col("id").alias("k"))
    wh.create_table("t", df.schema)
    wh.overwrite("t", df)
    with pytest.raises(FileNotFoundError, match="write_zonemap"):
        wh.read_pruned("t", {"k": (1, 2)})
    # a new overwrite invalidates the old version's manifest scope
    wh.write_zonemap("t", ("k",))
    wh.overwrite("t", df)
    with pytest.raises(FileNotFoundError):
        wh.read_pruned("t", {"k": (1, 2)})


def test_zonemap_pruned_read_equals_plain_filter_property(spark, tmp_path):
    """Property: for ANY range (including empty, open-ended, and
    all-covering), read_pruned == read().filter() row-for-row — the
    manifest may only skip files that provably contain no match."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "whp"))
    df = spark.range(3_000).select(
        ((F.col("id") * 48271) % 777).alias("k"), F.col("id").alias("v")
    )
    wh.create_table("t", df.schema)
    wh.overwrite("t", df.repartitionByRange(6, "k"))
    wh.write_zonemap("t", ("k",))
    base = wh.read("t").persist()
    base.count()

    @settings(max_examples=12, deadline=None)
    @given(
        lo=st.one_of(st.none(), st.integers(-50, 850)),
        hi=st.one_of(st.none(), st.integers(-50, 850)),
    )
    def check(lo, hi):
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (F.col("k") >= lo)
        if hi is not None:
            pred = pred & (F.col("k") <= hi)
        want = sorted(map(tuple, base.filter(pred).collect()))
        got = sorted(
            map(tuple, wh.read_pruned("t", {"k": (lo, hi)}).collect())
        )
        assert got == want

    try:
        check()
    finally:
        base.unpersist()


def test_zorder_then_zonemap_prunes_on_both_dimensions(spark, tmp_path):
    """The full lakehouse loop: Z-order on (user, time), write the zone
    map, then a conjunctive range on BOTH dimensions prunes to a small
    file subset — which a single-column sort could only deliver for its
    leading column. Results stay equal to the unpruned filter."""
    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = 30_000
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 500).alias("user_id"),
        (F.col("id") * 40503 % 86_400).alias("ts_s"),
        F.col("id").alias("payload"),
    )
    wh.create_table("ev", df.schema)
    wh.overwrite("ev", df.repartition(16))
    wh.cluster("ev", ("user_id", "ts_s"), target_file_bytes=16 * 1024)
    manifest = wh.write_zonemap("ev", ("user_id", "ts_s"))
    total = len(manifest["files"])
    assert total >= 6

    ranges = {"user_id": (100, 160), "ts_s": (10_000, 22_000)}
    pruned = wh.read_pruned("ev", ranges)
    want = sorted(
        map(
            tuple,
            wh.read("ev")
            .filter(
                F.col("user_id").between(100, 160)
                & F.col("ts_s").between(10_000, 22_000)
            )
            .collect(),
        )
    )
    assert sorted(map(tuple, pruned.collect())) == want and want
    read_files = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    # the z-locality claim: the 12%x14% corner lives in <= half the files
    assert read_files <= total // 2, (read_files, total)


def test_zonemap_prunes_on_timestamp_column(spark, tmp_path):
    """Zone maps on a timestamp column: stats round-trip JSON as
    strings, so datetime range bounds must normalize into the same
    chronologically-ordered string domain instead of raising."""
    import datetime as dt

    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(hours=i)) for i in range(48)]
    df = spark.createDataFrame(rows, "k long, ts timestamp").repartition(
        8, F.col("k")
    )
    wh.create_table("t", df.schema)
    wh.overwrite("t", df.sortWithinPartitions("ts"))
    wh.cluster("t", ("ts",), target_file_bytes=2 * 1024)
    manifest = wh.write_zonemap("t", ("ts",))
    lo, hi = t0 + dt.timedelta(hours=10), t0 + dt.timedelta(hours=13)
    pruned = wh.read_pruned("t", {"ts": (lo, hi)})
    want = sorted(
        map(tuple, wh.read("t").filter(F.col("ts").between(lo, hi)).collect())
    )
    assert sorted(map(tuple, pruned.collect())) == want and want
    read_files = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert read_files < len(manifest["files"])
