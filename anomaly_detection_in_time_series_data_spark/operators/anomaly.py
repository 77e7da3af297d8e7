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


def _ewma_step(
    mu: float, var: float, n: int, x: float, alpha: float
) -> tuple[float, float, int]:
    """One EWMA state transition — THE single definition of the recurrence,
    shared by the sequential scorer, the chunked state pass, and the chunked
    chunk scorer so all three execute the identical float op sequence
    (bit-equal outputs)."""
    delta = x - mu if n else 0.0
    if n == 0:
        mu = x
    else:
        mu += alpha * delta
        var = (1.0 - alpha) * (var + alpha * delta * delta)
    return mu, var, n + 1


def ewma_anomaly(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.1,
    threshold: float = 3.0,
    min_points: int = 5,
    tiebreak_col: str | None = None,
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
    parallelism = #keys — use ``ewma_anomaly_chunked`` (bit-equal output,
    parallelism #keys x #chunks) when single keys dominate.

    ``tiebreak_col`` makes tied-timestamp scoring deterministic (rows with
    equal ``ts`` otherwise keep nondeterministic incoming order, so
    sequential scores could differ across runs)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    in_cols = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
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
        pdf = pdf.sort_values(sort_cols)
        xs = pdf[value_col].to_numpy(dtype=float)
        mu, var, n = 0.0, 0.0, 0
        zs = np.full(len(xs), np.nan)
        flags = np.zeros(len(xs), dtype=bool)
        for i, x in enumerate(xs):
            if n >= min_points and var > 1e-24:
                zs[i] = (x - mu) / var**0.5
                flags[i] = abs(zs[i]) > threshold
            mu, var, n = _ewma_step(mu, var, n, x, alpha)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_ts": pdf[ts_col],
                "value": xs,
                "ewma_z": zs,
                "is_anomaly": flags,
            }
        )

    return df.select(*in_cols).groupBy(key_col).applyInPandas(
        score, schema=out_schema
    )


def ewma_anomaly_chunked(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    alpha: float = 0.1,
    threshold: float = 3.0,
    min_points: int = 5,
    chunk: str = "7 days",
) -> DataFrame:
    """``ewma_anomaly`` with time-chunk + state-handoff execution —
    BIT-EQUAL scores, parallelism #keys x #chunks instead of #keys.

    EWMA is inherently a sequential recurrence, so exact (bit-equal)
    parallelism across chunks is impossible in one pass — instead the work
    is split so the unavoidable sequential part is minimal:

    1. **State pass** (parallel over keys): a bare scalar scan per key that
       only records the (mu, var, n) state at each chunk entry — no z
       computation, no per-row output assembly. Output: #keys x #chunks
       tiny state rows.
    2. **Score pass** (parallel over key x chunk): each (key, chunk) group
       re-runs the identical recurrence from its handed-off entry state
       and emits the scored rows.

    Both passes call ``_ewma_step`` — the same op sequence as the
    sequential scorer — so outputs are bit-equal (unit-asserted).  The
    per-row heavy part (scoring + Arrow assembly, the dominant constant)
    parallelizes #keys x #chunks; only the cheap state scan stays
    key-sequential.  ``tiebreak_col`` is required: both passes must agree
    on a TOTAL row order for the handoff to be exact.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    sort_cols = [ts_col, tiebreak_col]
    base = df.select(key_col, ts_col, value_col, tiebreak_col).withColumn(
        "_chunk", F.window(F.col(ts_col), chunk).start
    )

    state_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("_chunk", T.TimestampType()),
            T.StructField("_mu_in", T.DoubleType()),
            T.StructField("_var_in", T.DoubleType()),
            T.StructField("_n_in", T.LongType()),
        ]
    )

    def states(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        xs = pdf[value_col].to_numpy(dtype=float)
        chunks = pdf["_chunk"].to_numpy()
        mu, var, n = 0.0, 0.0, 0
        out = {"_chunk": [], "_mu_in": [], "_var_in": [], "_n_in": []}
        cur = None
        for c, x in zip(chunks, xs):
            if cur is None or c != cur:
                cur = c
                out["_chunk"].append(c)
                out["_mu_in"].append(mu)
                out["_var_in"].append(var)
                out["_n_in"].append(n)
            mu, var, n = _ewma_step(mu, var, n, x, alpha)
        out[key_col] = [pdf[key_col].iloc[0]] * len(out["_chunk"])
        return pd.DataFrame(out)

    entry_states = base.groupBy(key_col).applyInPandas(states, schema=state_schema)

    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("event_ts", df.schema[ts_col].dataType),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma_z", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )

    def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        xs = pdf[value_col].to_numpy(dtype=float)
        mu = float(pdf["_mu_in"].iloc[0])
        var = float(pdf["_var_in"].iloc[0])
        n = int(pdf["_n_in"].iloc[0])
        zs = np.full(len(xs), np.nan)
        flags = np.zeros(len(xs), dtype=bool)
        for i, x in enumerate(xs):
            if n >= min_points and var > 1e-24:
                zs[i] = (x - mu) / var**0.5
                flags[i] = abs(zs[i]) > threshold
            mu, var, n = _ewma_step(mu, var, n, x, alpha)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_ts": pdf[ts_col],
                "value": xs,
                "ewma_z": zs,
                "is_anomaly": flags,
            }
        )

    # #keys x #chunks state rows: broadcast onto the chunked data, then
    # score each (key, chunk) group independently.
    joined = base.join(F.broadcast(entry_states), on=[key_col, "_chunk"])
    return joined.groupBy(key_col, "_chunk").applyInPandas(
        score_chunk, schema=out_schema
    )


def _holt_step(
    l: float, b: float, r: float, n: int, x: float, alpha: float, beta: float,
    gamma: float,
) -> tuple[float, float, float, int]:
    """One Holt (double-exponential) state transition — the single
    definition of the recurrence, shared by the sequential scorer, the
    chunked state pass, the chunked scorer, and (textually mirrored) the
    DuckDB recursive-CTE oracle, so every path executes the identical
    float op sequence (bit-equal outputs).

    State: level ``l``, trend ``b``, EWMA of absolute one-step-ahead
    forecast residuals ``r`` (the adaptive scale the flag threshold is
    relative to), count ``n``."""
    if n == 0:
        l, b, r = x, 0.0, 0.0
    else:
        forecast = l + b
        l_next = alpha * x + (1.0 - alpha) * forecast
        b_next = beta * (l_next - l) + (1.0 - beta) * b
        r = gamma * abs(x - forecast) + (1.0 - gamma) * r
        l, b = l_next, b_next
    return l, b, r, n + 1


def holt_forecast_anomaly_chunked(
    df: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.2,
    threshold: float = 4.0,
    min_points: int = 10,
    chunk: str = "7 days",
) -> DataFrame:
    """Holt linear-trend forecasting with residual-based anomaly flags —
    the forecast-driven scorer the reference's title implies but never
    ships (its only models are Keras reconstruction nets,
    ``Week#12_Assignment.ipynb:132-186``).

    Each point is scored against the one-step-ahead forecast (level +
    trend) from STRICTLY PRIOR state; the residual is compared to an
    exponentially weighted mean absolute residual, so the flag adapts to
    each key's own noise floor and survives level shifts and trends that
    break the static z-score.

    Execution is the same time-chunk + state-handoff scheme as
    ``ewma_anomaly_chunked`` (state pass per key -> tiny entry-state rows
    -> parallel (key, chunk) scoring; bit-equal to a sequential pass,
    parallelism #keys x #chunks).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    sort_cols = [ts_col, tiebreak_col]
    base = df.select(key_col, ts_col, value_col, tiebreak_col).withColumn(
        "_chunk", F.window(F.col(ts_col), chunk).start
    )

    state_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("_chunk", T.TimestampType()),
            T.StructField("_l_in", T.DoubleType()),
            T.StructField("_b_in", T.DoubleType()),
            T.StructField("_r_in", T.DoubleType()),
            T.StructField("_n_in", T.LongType()),
        ]
    )

    def states(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        xs = pdf[value_col].to_numpy(dtype=float)
        chunks = pdf["_chunk"].to_numpy()
        l, b, r, n = 0.0, 0.0, 0.0, 0
        out = {"_chunk": [], "_l_in": [], "_b_in": [], "_r_in": [], "_n_in": []}
        cur = None
        for c, x in zip(chunks, xs):
            if cur is None or c != cur:
                cur = c
                out["_chunk"].append(c)
                out["_l_in"].append(l)
                out["_b_in"].append(b)
                out["_r_in"].append(r)
                out["_n_in"].append(n)
            l, b, r, n = _holt_step(l, b, r, n, x, alpha, beta, gamma)
        out[key_col] = [pdf[key_col].iloc[0]] * len(out["_chunk"])
        return pd.DataFrame(out)

    entry_states = base.groupBy(key_col).applyInPandas(states, schema=state_schema)

    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("event_ts", df.schema[ts_col].dataType),
            T.StructField("value", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )

    def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        xs = pdf[value_col].to_numpy(dtype=float)
        l = float(pdf["_l_in"].iloc[0])
        b = float(pdf["_b_in"].iloc[0])
        r = float(pdf["_r_in"].iloc[0])
        n = int(pdf["_n_in"].iloc[0])
        fcs = np.full(len(xs), np.nan)
        flags = np.zeros(len(xs), dtype=bool)
        for i, x in enumerate(xs):
            if n > 0:
                fcs[i] = l + b
            if n >= min_points and r > 1e-24:
                flags[i] = abs(x - (l + b)) > threshold * r
            l, b, r, n = _holt_step(l, b, r, n, x, alpha, beta, gamma)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_ts": pdf[ts_col],
                "value": xs,
                "forecast": fcs,
                "is_anomaly": flags,
            }
        )

    joined = base.join(F.broadcast(entry_states), on=[key_col, "_chunk"])
    return joined.groupBy(key_col, "_chunk").applyInPandas(
        score_chunk, schema=out_schema
    )
