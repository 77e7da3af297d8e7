"""Loaders for the driver fixture tables (TESTDATA.md).

All loads are plain ``spark.read.parquet`` — schema comes from the parquet
footer (already canonical), filters/projections push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
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
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .session import ensure_pyfiles

    ensure_pyfiles(spark)  # the driver's own session needs the package too
    # Deterministic timestamp semantics vs the (naive-timestamp) DuckDB
    # oracle: date-part extraction and date literals must render in UTC
    # regardless of how the caller's session was built.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long and
        # convert to a microsecond TimestampType with exact integer division
        # (`div`, not `/` — nanos exceed double's 2^53 integer range).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
