"""Loaders for the driver-generated parquet test tables.

Tables (see TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns each table must expose after loading. Values are the dtype we
# rely on downstream, or None when any dtype is acceptable. The check
# exists to turn silent testdata drift (a renamed or retyped column)
# into a readable error naming the table and column, instead of an
# AnalysisException deep inside some operator.
_INT = frozenset({"int", "bigint"})  # parquet int32/int64 both fine as keys
EXPECTED_SCHEMA: dict[str, dict[str, frozenset[str] | None]] = {
    "region": {"r_regionkey": _INT, "r_name": frozenset({"string"})},
    "nation": {"n_nationkey": _INT, "n_name": frozenset({"string"}), "n_regionkey": _INT},
    "customer": {"c_custkey": _INT, "c_nationkey": _INT},
    "supplier": {"s_suppkey": _INT, "s_nationkey": _INT},
    "part": {"p_partkey": _INT},
    "orders": {"o_orderkey": _INT, "o_custkey": _INT, "o_orderdate": None},
    "lineitem": {
        "l_orderkey": _INT,
        "l_partkey": _INT,
        "l_suppkey": _INT,
        "l_quantity": None,
        "l_extendedprice": None,
        "l_discount": None,
        "l_returnflag": frozenset({"string"}),
        "l_linestatus": frozenset({"string"}),
    },
    # ts pinned to timestamp_ntz: _load_events normalizes whichever
    # physical type (nanos-as-long or µs timestamp) the file ships,
    # so post-load it must always be NTZ.
    "events": {
        "event_id": _INT,
        "ts": frozenset({"timestamp_ntz"}),
        "user_id": _INT,
        "event_type": frozenset({"string"}),
        "value": frozenset({"double", "float"}),
        "props": frozenset({"string"}),
    },
    "documents": {"doc_id": _INT, "text": frozenset({"string"}), "lang": None, "source": None},
    "embeddings": {"vec_id": _INT, "embedding": frozenset({"array<float>", "array<double>"})},
}


def _check_schema(df: DataFrame, name: str) -> DataFrame:
    expected = EXPECTED_SCHEMA.get(name, {})
    dtypes = dict(df.dtypes)
    for col, want in expected.items():
        if col not in dtypes:
            raise ValueError(
                f"table {name!r}: expected column {col!r} missing; "
                f"loaded columns are {sorted(dtypes)}"
            )
        if want is not None and dtypes[col] not in want:
            raise ValueError(
                f"table {name!r}: column {col!r} loaded as "
                f"{dtypes[col]!r}, expected one of {sorted(want)} — "
                "testdata schema drift? (see io_tpch.EXPECTED_SCHEMA)"
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _check_schema(_load_events(spark, sf_dir), name)
    return _check_schema(spark.read.parquet(f"{sf_dir}/{name}.parquet"), name)


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped ``ts`` as either TIMESTAMP(NANOS) or
    TIMESTAMP(MICROS) across testdata generations. Spark refuses parquet
    nanos by default (PARQUET_TYPE_ILLEGAL), so keep the legacy
    nanos-as-long conf on and branch on what actually loaded:

    - ``bigint``  → nanos-as-long: floor to µs via integer DIV (float
      division of ~1.7e18 ns loses precision) as TIMESTAMP_NTZ.
    - ``timestamp`` / ``timestamp_ntz`` → already µs; just normalize to
      TIMESTAMP_NTZ (NTZ matches DuckDB's µs TIMESTAMP on the same file
      and sidesteps driver-local-timezone conversion on collect).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        shim = F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
    else:
        shim = F.col("ts").cast("timestamp_ntz")
    return raw.withColumn("ts", shim)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
