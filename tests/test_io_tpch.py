"""Loader-layer tests: dtype-robust events loading + schema drift check.

Round-3 postmortem: the driver's events.parquet switched ``ts`` from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds, and the loader's
unconditional nanos→µs shim broke 7 correctness rows, the bench, and a
streaming test. These tests pin that both physical generations load to
the same logical TIMESTAMP_NTZ column, and that genuine schema drift
(missing / retyped column) fails with an error naming the table+column.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webpagesgraphdatabase_spark.io_tpch import TABLES, load_table

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 6, 15, 12, 30, 45, 654321),
]


def _events_arrays(ts_array: pa.Array) -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "click"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"a":1}', "{}"], pa.string()),
        }
    )


def _write_events(dirpath, ts_array: pa.Array) -> str:
    pq.write_table(_events_arrays(ts_array), str(dirpath / "events.parquet"))
    return str(dirpath)


def _loaded_ts(spark, sf_dir: str):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    return [r["ts"] for r in df.orderBy("event_id").collect()]


def test_events_micros_timestamp_generation(spark, tmp_path):
    sf_dir = _write_events(tmp_path, pa.array(_TS, pa.timestamp("us")))
    assert _loaded_ts(spark, sf_dir) == _TS


def test_events_nanos_timestamp_generation(spark, tmp_path):
    # TIMESTAMP(NANOS) physical type — Spark loads it as bigint under
    # spark.sql.legacy.parquet.nanosAsLong; the shim must floor to µs.
    sf_dir = _write_events(tmp_path, pa.array(_TS, pa.timestamp("ns")))
    assert _loaded_ts(spark, sf_dir) == _TS


def test_events_both_generations_agree(spark, tmp_path):
    d_us = tmp_path / "us"
    d_ns = tmp_path / "ns"
    d_us.mkdir()
    d_ns.mkdir()
    a = _loaded_ts(spark, _write_events(d_us, pa.array(_TS, pa.timestamp("us"))))
    b = _loaded_ts(spark, _write_events(d_ns, pa.array(_TS, pa.timestamp("ns"))))
    assert a == b


def test_schema_drift_missing_column_is_friendly(spark, tmp_path):
    t = pa.table({"r_regionkey": pa.array([0], pa.int64())})  # r_name missing
    pq.write_table(t, str(tmp_path / "region.parquet"))
    with pytest.raises(ValueError, match=r"table 'region'.*'r_name' missing"):
        load_table(spark, str(tmp_path), "region")


def test_schema_drift_retyped_column_is_friendly(spark, tmp_path):
    t = pa.table(
        {
            "r_regionkey": pa.array([0], pa.int64()),
            "r_name": pa.array([7], pa.int64()),  # should be string
        }
    )
    pq.write_table(t, str(tmp_path / "region.parquet"))
    with pytest.raises(ValueError, match=r"table 'region'.*'r_name' loaded as"):
        load_table(spark, str(tmp_path), "region")


def test_all_real_tables_pass_schema_check(spark):
    sf_dir = "/root/testdata/sf0.001"
    for name in TABLES:
        load_table(spark, sf_dir, name)  # raises on drift
