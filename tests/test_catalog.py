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
