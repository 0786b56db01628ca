"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

All loads are plain ``spark.read.parquet`` — no schema inference cost
(parquet is self-describing) and full predicate/column pushdown. At
100 TB the same call works against a partitioned table root; nothing
here assumes single-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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

# Small dimension tables that are always broadcast-eligible. At 100 TB the
# facts (lineitem/orders/events) grow; these stay O(thousands) rows.
DIM_TABLES = ("region", "nation", "supplier", "part", "customer")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet; normalize whatever the
    installed Spark surfaces to a plain TIMESTAMP (LTZ) column so every
    event-time operator — in particular ``withWatermark``, which rejects
    TIMESTAMP_NTZ — works downstream.

    * older readers + ``nanosAsLong``: long nanos → truncate to micros
      with integer DIV (no double round-trip — ns epoch values exceed
      2^53), matching DuckDB's own ns→µs truncation so oracle hashes
      agree;
    * Spark 4.1+: the nanos column surfaces as TIMESTAMP_NTZ → cast to
      TIMESTAMP. Value-preserving under the pinned UTC session timezone,
      and collected values stringify identically to the naive oracle's.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load(spark, t, sf_dir) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so the SQL surface works."""
    for t in TABLE_NAMES:
        load(spark, t, sf_dir).createOrReplaceTempView(t)
