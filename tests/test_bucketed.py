"""Bucketed-layout tests: the co-bucketed orders ⋈ lineitem join must
plan with zero Exchange nodes (no shuffle of either fact table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.bucketed import (
    bucketed_orders_lineitem,
    drop_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucketed_wh"))
    orders, lineitem = bucketed_orders_lineitem(spark, SF_DIR, base, prefix="tb")
    yield orders, lineitem
    drop_bucketed(spark, "tb_orders")
    drop_bucketed(spark, "tb_lineitem")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    orders, lineitem = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).select("o_orderkey", "o_custkey", "l_partkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregate_on_bucket_key_has_no_exchange(spark, bucketed):
    _, lineitem = bucketed
    agg = lineitem.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    orders, lineitem = bucketed
    got = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    plain_o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plain_l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = plain_o.join(plain_l, plain_o.o_orderkey == plain_l.l_orderkey).count()
    assert got == want
