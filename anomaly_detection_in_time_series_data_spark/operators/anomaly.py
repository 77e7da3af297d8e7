"""Anomaly-detection operators — the capability the reference's title names.

The reference approaches anomaly detection only via Keras reconstruction
models (VAE, ``Week#12_Assignment.ipynb:132-186``) and z-score normalization
(``house_price.pdf`` normalization cell — ``(x - mean)/std``). The engine
ships the statistical equivalents Spark supports natively (SURVEY.md §2.10):

- rolling / grouped z-score over event time (this module)
- KMeans distance-to-centroid and GaussianMixture log-likelihood
  (``models.py``; MLlib)

All batch scoring here is window/agg expression work — JVM-side, whole-stage
codegen, no Python in the hot path. At 100 TB the window partitions by
``event_type`` (low cardinality) — for very hot keys the grouped variant
(`global_zscore`) is a two-pass agg+broadcast-join, which scales better than
a sort-based window; both are provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Guard against zero/degenerate dispersion (constant window) — mirrors the
# oracle SQL exactly so boolean flags hash-match.
_SIGMA_FLOOR = 1e-12


def rolling_zscore(
    df: DataFrame,
    *,
    partition_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    lookback: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score over the previous ``lookback`` rows per partition.

    Reproduces the reference's z-score normalization (house_price.pdf:
    ``(x - mean)/std``) as a *trailing-window* statistic — the standard
    streaming-friendly formulation (the stats at row i use rows i-k..i-1,
    never the current row, so the score is causal and replayable).

    Adds ``mu``, ``sigma``, ``zscore``, ``is_anomaly`` columns.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg(value_col).over(w)
    sigma = F.stddev_samp(value_col).over(w)
    z = F.when(
        sigma.isNotNull() & (sigma > _SIGMA_FLOOR),
        (F.col(value_col) - mu) / sigma,
    )
    return (
        df.withColumn("mu", mu)
        .withColumn("sigma", sigma)
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > F.lit(threshold), F.lit(False)),
        )
    )


def global_zscore(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str = "value",
    threshold: float = 3.0,
) -> DataFrame:
    """Two-pass grouped z-score: agg per group, broadcast join stats back.

    Preferred at scale for low-cardinality groups: the per-group stats frame
    is tiny (one row per group), so the join is a broadcast — no sort, no
    window state, and the scan of ``df`` happens exactly twice with full
    predicate/column pushdown.
    """
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("mu"),
        F.stddev_samp(value_col).alias("sigma"),
    )
    joined = df.join(F.broadcast(stats), on=group_cols, how="left")
    z = F.when(
        F.col("sigma").isNotNull() & (F.col("sigma") > _SIGMA_FLOOR),
        (F.col(value_col) - F.col("mu")) / F.col("sigma"),
    )
    return joined.withColumn("zscore", z).withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("zscore")) > F.lit(threshold), F.lit(False)),
    )


def flag_event_anomalies(
    events: DataFrame, *, lookback: int = 20, threshold: float = 3.0
) -> DataFrame:
    """Flagship query (SURVEY.md §7 Phase 1): windowed z-score over `events`.

    Partition by ``event_type``, order by ``(ts, event_id)`` (event_id breaks
    timestamp ties deterministically), trailing window of ``lookback`` rows.
    """
    return rolling_zscore(
        events,
        partition_cols=["event_type"],
        order_cols=["ts", "event_id"],
        value_col="value",
        lookback=lookback,
        threshold=threshold,
    ).select("event_id", "event_type", "value", "is_anomaly")


def rolling_zscore_chunked(
    df: DataFrame,
    *,
    partition_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    value_col: str = "value",
    lookback: int = 20,
    threshold: float = 3.0,
    chunk: str = "7 days",
) -> DataFrame:
    """Scale formulation of ``rolling_zscore`` with identical semantics.

    ``rolling_zscore`` sorts each key's entire history in one task — with a
    handful of keys (events has 5 event types) that is 5-way parallelism
    forever, a non-starter at 100 TB. Here time is cut into ``chunk``
    buckets and the window runs per (key, chunk):

    1. rank rows from the end of each chunk (a per-(key,chunk) window —
       fully parallel) and copy the last ``lookback`` rows of chunk c into
       chunk c+1 as context rows;
    2. run the trailing-window stats per (key, chunk) over own+context
       rows; context rows supply the cross-boundary history and are then
       dropped from the output.

    Results are identical to the single-partition window whenever every
    chunk holds at least ``lookback`` rows per key (first-chunk rows have
    genuinely less history in both formulations). Parallelism becomes
    #keys x #chunks, and each sort is bounded by chunk row count.
    """
    base = df.withColumn("_chunk", F.window(F.col(ts_col), chunk).start)
    # Rank from chunk end to find context rows for the next chunk.
    w_desc = Window.partitionBy(*partition_cols, "_chunk").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    ctx = (
        base.withColumn("_rn_desc", F.row_number().over(w_desc))
        .filter(F.col("_rn_desc") <= lookback)
        .drop("_rn_desc")
        # move into the NEXT chunk as history-only rows
        .withColumn(
            "_chunk",
            (
                F.col("_chunk").cast("timestamp")
                + F.expr(f"INTERVAL {chunk}")
            ),
        )
        .withColumn("_ctx", F.lit(True))
    )
    own = base.withColumn("_ctx", F.lit(False))
    unioned = own.unionByName(ctx)
    w = (
        Window.partitionBy(*partition_cols, "_chunk")
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg(value_col).over(w)
    sigma = F.stddev_samp(value_col).over(w)
    z = F.when(
        sigma.isNotNull() & (sigma > _SIGMA_FLOOR),
        (F.col(value_col) - mu) / sigma,
    )
    return (
        unioned.withColumn("mu", mu)
        .withColumn("sigma", sigma)
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > F.lit(threshold), F.lit(False)),
        )
        .filter(~F.col("_ctx"))
        .drop("_ctx", "_chunk")
    )


def ewma_anomaly(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.1,
    threshold: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """EWMA control-chart anomaly detection per key (causal).

    Each point is scored against the exponentially weighted mean/variance
    of STRICTLY PRIOR points (so an outlier cannot mask itself), then
    folded in:

        delta  = x - mu_prev
        z      = delta / sqrt(var_prev)          (flag if |z| > threshold)
        mu     = mu_prev + alpha * delta
        var    = (1 - alpha) * (var_prev + alpha * delta^2)

    Unlike the rolling-window z-score, state is O(1) per key (mu, var,
    n) and old history decays smoothly — the standard drift-tolerant
    scorer. Runs as one ``applyInPandas`` pass per key group; at scale
    parallelism = #keys (chunk by time with state handoff if single keys
    dominate — same trick as ``rolling_zscore_chunked``)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("event_ts", df.schema[ts_col].dataType),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma_z", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        xs = pdf[value_col].to_numpy(dtype=float)
        mu, var, n = 0.0, 0.0, 0
        zs = np.full(len(xs), np.nan)
        flags = np.zeros(len(xs), dtype=bool)
        for i, x in enumerate(xs):
            if n >= min_points and var > 1e-24:
                zs[i] = (x - mu) / var**0.5
                flags[i] = abs(zs[i]) > threshold
            delta = x - mu if n else 0.0
            if n == 0:
                mu = x
            else:
                mu += alpha * delta
                var = (1.0 - alpha) * (var + alpha * delta * delta)
            n += 1
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_ts": pdf[ts_col],
                "value": xs,
                "ewma_z": zs,
                "is_anomaly": flags,
            }
        )

    return df.select(key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        score, schema=out_schema
    )
