"""Loaders for the driver fixture tables (TESTDATA.md).

All loads are plain ``spark.read.parquet`` — schema comes from the parquet
footer (already canonical), filters/projections push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

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
        # The driver regenerates fixtures between rounds and the physical
        # type of events.ts has changed across regenerations: sometimes
        # parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
        # with PARQUET_TYPE_ILLEGAL unless read as long), sometimes a plain
        # TIMESTAMP(MICROS). Branch on what the footer actually says.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            # nanos-as-long → exact integer division to micros (`div`, not
            # `/` — nanos exceed double's 2^53 integer range).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # Normalize NTZ to TimestampType so every downstream consumer
            # (unix_micros, session_window, streaming watermarks) sees one
            # type regardless of the fixture's physical encoding.  The
            # session timezone is pinned UTC above, so the wall-clock values
            # are unchanged and match the naive-timestamp DuckDB oracle.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
