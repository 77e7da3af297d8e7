"""Streaming anomaly detection (SURVEY.md §2.8 final row, §7 Phase 5) —
the capability the reference's title names, built on the consumer side it
never implemented.

Two scorers:

- ``windowed_stats``: watermarked tumbling/sliding window aggregation —
  pure built-in streaming aggs (per-window mean/stddev/extremes), append
  mode on window close. The scalable default: state is bounded by the
  watermark, partial aggregation happens map-side.
- ``streaming_zscore``: per-key *running* z-score with
  ``applyInPandasWithState`` — Welford accumulators (count/mean/M2) as
  typed state, each event scored against the statistics of all prior
  events for its key, then folded in. This is the custom stateful operator
  path (SURVEY §2.8 'where the repo-title capability gets built').
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def zscore_output_schema(key_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("event_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )


def streaming_zscore(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str = "event_ts",
    value_col: str = "value",
    threshold: float = 3.0,
    min_points: int = 5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key running z-score over a stream via Welford state.

    Each event is scored against the running (mean, std) of *previous*
    events for its key (causal, replay-stable given per-key event-time
    order within batches), then merged into the state. Keys with fewer than
    ``min_points`` prior events never flag.

    Pass ``tiebreak_col`` (it must be selected into the stream) when
    timestamps can repeat within a key: rows with equal ``ts`` otherwise
    keep nondeterministic incoming order, so sequential scores could
    differ across runs.
    """
    out_schema = zscore_output_schema(key_col)
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values(sort_cols)
            zs: list[float | None] = []
            flags: list[bool] = []
            for v in pdf[value_col]:
                v = float(v)
                if n >= min_points and m2 > 0:
                    std = (m2 / (n - 1)) ** 0.5
                    z = (v - mean) / std if std > 1e-12 else None
                else:
                    z = None
                zs.append(z)
                flags.append(bool(z is not None and abs(z) > threshold))
                # Welford update
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
            frames.append(
                pd.DataFrame(
                    {
                        key_col: key[0],
                        "event_ts": pdf[ts_col],
                        "value": pdf[value_col].astype(float),
                        "zscore": pd.Series(zs, index=pdf.index, dtype="float64"),
                        "is_anomaly": flags,
                    }
                )
            )
        state.update((n, mean, m2))
        yield from frames

    return (
        stream.groupBy(F.col(key_col))
        .applyInPandasWithState(
            score,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_stats(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str = "event_ts",
    value_col: str = "value",
    window: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Watermarked (sliding) window statistics per key — the built-in-only
    streaming aggregation: bounded state, map-side partial aggs, append
    output on window close. Downstream, a z-score against the *previous*
    window's stats is a plain batch join on window boundaries."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.avg(value_col).alias("mu"),
            F.stddev_samp(value_col).alias("sigma"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "mu",
            "sigma",
            "vmin",
            "vmax",
        )
    )


def streaming_ewma(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str = "event_ts",
    value_col: str = "value",
    alpha: float = 0.1,
    threshold: float = 3.0,
    min_points: int = 5,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """EWMA control chart on the Spark 4 stateful API
    (``transformWithStateInPandas``): O(1) typed value state (mu, var, n)
    per key, each event scored against strictly-prior state then folded in
    — the exact math of the batch ``operators.anomaly.ewma_anomaly``, so
    replaying a stream reproduces the batch scores bit-for-bit.

    vs ``applyInPandasWithState`` (``streaming_zscore``): the processor
    object owns named state handles (value/list/map state, timers, TTL)
    instead of one opaque tuple — this is the API new stateful operators
    should target; the Welford twin stays as the legacy-API reference.

    Environment gate: executing TWS requires google.protobuf in the Python
    workers (the state-server wire protocol); absent here, so execution is
    covered by an importorskip-gated test, like the Kafka sink.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("event_ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma_z", T.DoubleType()),
            T.StructField("is_anomaly", T.BooleanType()),
        ]
    )

    class EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ewma", "mu DOUBLE, var DOUBLE, n BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            got = self._state.get()
            mu, var, n = got if got is not None else (0.0, 0.0, 0)
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            for pdf in rows:
                pdf = pdf.sort_values(sort_cols)
                zs: list[float | None] = []
                flags: list[bool] = []
                for x in pdf[value_col]:
                    x = float(x)
                    if n >= min_points and var > 1e-24:
                        z = (x - mu) / var**0.5
                    else:
                        z = None
                    zs.append(z)
                    flags.append(bool(z is not None and abs(z) > threshold))
                    delta = x - mu if n else 0.0
                    if n == 0:
                        mu = x
                    else:
                        mu += alpha * delta
                        var = (1.0 - alpha) * (var + alpha * delta * delta)
                    n += 1
                yield pd.DataFrame(
                    {
                        key_col: pdf[key_col].astype(str),
                        "event_ts": pdf[ts_col],
                        "value": pdf[value_col].astype(float),
                        "ewma_z": pd.Series(zs, index=pdf.index, dtype="float64"),
                        "is_anomaly": flags,
                    }
                )
            self._state.update((mu, var, n))

        def close(self) -> None:
            pass

    return stream.groupBy(F.col(key_col)).transformWithStateInPandas(
        statefulProcessor=EwmaProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="None",
    )
