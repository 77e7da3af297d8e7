"""Replay of time-partitioned telemetry as a stream (SURVEY.md §2.8 T1-T3).

Reference layout: ``telemetry/<signal>/t=<elapsed-s>/*.parquet`` — 34
micro-batches per signal over 121.4 s, replayed to Kafka with
``event.wait(t - prev)`` pacing (`Week#8_Assignment.ipynb:252-289`). Its
offset list was built from a ``set``, so replay order was arbitrary (O3
bug); here ordering is explicit everywhere.

Spark-native replay: the Hive-style ``t=`` dirs are a partitioned file
source; ``maxFilesPerTrigger=1`` approximates batch-at-a-time arrival, and
the event-time column derives from the partition value (free via partition
discovery, F13) plus a stream epoch.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def list_time_partitions(spark: SparkSession, signal_path: str) -> list[float]:
    """T1: discover `t=` partition offsets, sorted ascending (the reference
    iterated a set — unordered; we fix O3)."""
    jvm_path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(signal_path)
    fs = jvm_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    offsets = []
    for status in fs.listStatus(jvm_path):
        name = status.getPath().getName()
        if name.startswith("t="):
            offsets.append(float(name.split("=", 1)[1]))
    return sorted(offsets)


def read_replay_stream(
    spark: SparkSession,
    signal_path: str,
    schema: T.StructType,
    *,
    epoch: str = "2024-01-01 00:00:00",
    files_per_trigger: int = 1,
) -> DataFrame:
    """T2: stream the `t=`-partitioned layout batch-at-a-time.

    The partition column ``t`` (relative seconds) becomes an absolute
    ``event_ts`` = epoch + t — the TimestampType event-time column that
    watermarks and windows need (SURVEY §1.2: the reference has only
    relative float seconds)."""
    full = T.StructType(schema.fields + [T.StructField("t", T.DoubleType())])
    stream = (
        spark.readStream.schema(full)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(signal_path)
    )
    return stream.withColumn(
        "event_ts",
        (F.unix_timestamp(F.lit(epoch)).cast("double") + F.col("t")).cast("timestamp"),
    )


def paced_batches(
    spark: SparkSession,
    signal_path: str,
    *,
    speedup: float = 1.0,
    sleep=time.sleep,
) -> Iterator[tuple[float, DataFrame]]:
    """T2 fidelity variant: yield (offset, batch_df) reproducing original
    inter-arrival gaps (0-4.8 s in the reference log) scaled by ``speedup``.

    A driver-side pacing loop is the honest translation of the reference's
    ``event.wait`` producer; each yielded batch is still a distributed
    DataFrame (e.g. to feed a Kafka sink or a memory table)."""
    offsets = list_time_partitions(spark, signal_path)
    prev = None
    for t in offsets:
        if prev is not None and t > prev:
            sleep((t - prev) / speedup)
        prev = t
        batch = spark.read.parquet(f"{signal_path}/t={t:05.1f}")
        yield t, batch


def union_signals(streams: dict[str, DataFrame]) -> DataFrame:
    """T3: co-stream multiple signals sharing batch boundaries as one
    stream with a ``signal`` tag (unionByName with missing columns allowed —
    locations and accelerations have different value columns)."""
    tagged = [
        df.withColumn("signal", F.lit(name)) for name, df in streams.items()
    ]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
