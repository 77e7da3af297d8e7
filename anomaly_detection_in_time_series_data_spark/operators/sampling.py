"""Deterministic sampling and source-mixing operators for corpus curation.

No RNG anywhere: every keep/drop decision is a pure function of document
CONTENT (md5 of an optional seed prefix + the text), so samples are
reproducible across runs, engines, partitionings, and re-ingestions, and a
re-run with a different seed draws an independent-looking but equally
deterministic sample. This is the same content-hash discipline as the
train/val/test split operator (`deterministic_split_counts`) — exact
duplicates always sample identically, so sampling can never split a
duplicate pair across kept/dropped.

Scale shape: the keep predicate is a scalar JVM expression evaluated at the
scan (no shuffle, no state); per-stratum thresholds compile to a CASE chain
(strata counts are small by definition). The mixture planner aggregates one
small row per stratum; its only wide operation is a window over #strata
rows, which is bounded regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_by_hash(
    text_col: str = "text", threshold_hex: str = "8", seed: str = ""
) -> Column:
    """True iff md5(seed + text) sorts below ``threshold_hex``.

    The hex prefix IS the rate: '8' keeps ~50%, '4' ~25%, 'c0' ~75%,
    2-char thresholds give 1/256 granularity. Changing ``seed`` redraws
    the sample without touching the rate.
    """
    h = F.md5(F.concat(F.lit(seed), F.col(text_col))) if seed else F.md5(
        F.col(text_col)
    )
    return h < threshold_hex


def stratified_keep(
    df: DataFrame,
    strata_col: str,
    thresholds: dict[str, str],
    text_col: str = "text",
    seed: str = "",
    default_threshold: str = "0",
) -> DataFrame:
    """Adds a boolean ``_keep``: per-stratum hash sampling at the stratum's
    hex-threshold rate (strata absent from ``thresholds`` keep nothing by
    default). A CASE chain over literal thresholds — no join, no shuffle.
    """
    thr = F.lit(default_threshold)
    for value, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(t)).otherwise(thr)
    h = F.md5(F.concat(F.lit(seed), F.col(text_col))) if seed else F.md5(
        F.col(text_col)
    )
    return df.withColumn("_keep", h < thr)


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    target_frac: float = 0.5,
) -> DataFrame:
    """Per-stratum sampling plan to hit a target mixture.

    For corpus size N and target sample size ``target_frac * N``, stratum s
    with weight w_s should contribute ``w_s * target_frac * N`` docs, so
    its rate is ``min(1, w_s * target_frac * N / n_s)`` (capped when the
    stratum is too small to meet its quota — the standard under-resourced
    source case). Returns (stratum, n_docs, weight, rate, expected_kept).

    The global N is a window-sum over the per-stratum counts — #strata
    rows, bounded at any corpus size.
    """
    w_expr = F.lit(0.0)
    for value, w in sorted(weights.items()):
        w_expr = F.when(F.col(strata_col) == value, F.lit(float(w))).otherwise(
            w_expr
        )
    counts = df.groupBy(strata_col).agg(F.count("*").cast("bigint").alias("n_docs"))
    n_total = F.sum("n_docs").over(
        Window.partitionBy()
    )  # #strata rows only — bounded
    rate = F.least(
        F.lit(1.0),
        F.col("weight")
        * F.lit(float(target_frac))
        * F.col("n_total").cast("double")
        / F.col("n_docs").cast("double"),
    )
    return (
        counts.withColumn("weight", w_expr)
        .withColumn("n_total", n_total)
        .withColumn("rate", rate)
        .withColumn("expected_kept", F.col("rate") * F.col("n_docs").cast("double"))
        .select(strata_col, "n_docs", "weight", "rate", "expected_kept")
    )
