"""Parquet table loaders for the driver-generated testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        # plain timestamp[us] files (no isAdjustedToUTC) would otherwise
        # surface as TIMESTAMP_NTZ, which unix_millis()/window arithmetic
        # reject; reading them as LTZ under the UTC session keeps the same
        # epoch values DuckDB's naive-timestamp epoch_ms() sees
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # static conf in exotic deployments; the cast below covers it
    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) columns need the nanos-as-long escape hatch
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long -> TimestampType (integer `div` keeps ns precision;
        # a double division would lose up to ~256ns on 2024-era epochs)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # scan already planned as NTZ (conf ignored/static): NTZ->LTZ cast
        # reinterprets the wall-clock value in the session tz, which
        # tune_session pins to UTC — identical epoch semantics
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}
