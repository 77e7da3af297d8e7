"""Continuous-aggregate rollup cascade (hypertable-style).

The 100 TB pattern for time-series dashboards: raw events are aggregated
ONCE into fine-grained partial aggregates (per minute), and every coarser
resolution (hour, day, month…) is computed by MERGING partials — never by
re-scanning raw data. That works iff every carried statistic is a
*mergeable summary*:

    n      -> sum of n            (associative, exact)
    sum    -> sum of sums         (exact in the decimal domain)
    min/max-> min/max of min/max  (exact)
    sumsq  -> sum of sumsqs       (exact in the decimal domain)

from which avg/std at any resolution are derived at read time. Decimal
accumulation makes the merge order-insensitive, so the cascade is
hash-identical to a direct aggregation over raw data — which is exactly
what the DuckDB oracle twin checks (day-level direct vs raw→minute→hour→
day here).

At scale each level is ~60× smaller than the one below; the minute layer
is the only one that ever touches raw rows, and appends only recompute
the buckets they touch (the incremental-materialization property).

No analogue in the reference repo; this generalizes its per-window
statistics (SURVEY §2.8) into the materialized-rollup shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The partial-aggregate columns carried by every level of the cascade.
_PARTIALS = ["n", "s", "ss", "mn", "mx"]


def time_bucket_partials(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 minute",
) -> DataFrame:
    """Level-0 rollup: raw rows -> per-(key, bucket) mergeable partials.

    ``value`` is cast to decimal(18,2) BEFORE any arithmetic (the fixture
    discipline — see queries.py module docstring); ``ss`` is the exact
    decimal sum of squares (decimal(18,2)^2 = scale-4, no rounding).
    """
    v = F.col(value_col).cast("decimal(18,2)")
    return df.groupBy(
        key_col, F.window(ts_col, bucket).getField("start").alias("bucket_start")
    ).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
        F.min(F.col(value_col)).alias("mn"),
        F.max(F.col(value_col)).alias("mx"),
    )


def merge_rollup(partials: DataFrame, key_col: str, bucket: str) -> DataFrame:
    """One cascade step: merge finer partials into coarser buckets.

    Touches only the partial-aggregate table — at scale this is the step
    that replaces a full raw re-scan per resolution.
    """
    return partials.groupBy(
        key_col,
        F.window("bucket_start", bucket).getField("start").alias("bucket_start"),
    ).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize_stats(partials: DataFrame, key_col: str) -> DataFrame:
    """Derive (n, sum, avg, std, min, max) from carried partials.

    The decimal partials are exact, so casting to double HERE (once, at
    the end) yields the same IEEE doubles as the oracle's identical
    expression over a direct aggregation — std included, because both
    engines evaluate the same op sequence on the same exact inputs.
    """
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    ss_d = F.col("ss").cast("double")
    # greatest(, 0): with exact decimal partials the variance is >= 0
    # mathematically, but the double-domain s*s/n can overshoot ss by an ulp
    # for constant-valued buckets; clamp identically to the oracle.
    var = F.greatest(
        (ss_d - s_d * s_d / n_d) / (n_d - F.lit(1.0)), F.lit(0.0)
    )
    return partials.select(
        key_col,
        F.unix_micros("bucket_start").alias("bucket_us"),
        F.col("n").cast("bigint").alias("n_events"),
        s_d.alias("sum_value"),
        (s_d / n_d).alias("avg_value"),
        F.when(F.col("n") > 1, F.sqrt(var)).alias("std_value"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
    )
