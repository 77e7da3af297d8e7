"""Bucketed tables for co-located, shuffle-free joins (SURVEY.md 'Optimize
for scale': "Co-locate joins via bucketing or pre-partitioning").

``write_bucketed`` persists a table bucketed by the join key;
two tables bucketed the same way join with NO exchange on either side —
the physical plan shows SortMergeJoin over bucket-local scans. At 100 TB
this removes the dominant shuffle from every recurring fact-fact join
(e.g. orders x lineitem on orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans bucket-local scans and no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
