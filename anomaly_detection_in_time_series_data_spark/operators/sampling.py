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


def contrastive_pairs(
    df: DataFrame, label_col: str = "label", id_col: str = "vec_id"
) -> DataFrame:
    """Deterministic contrastive-pair mining: per label, anchor/positive are
    the two lowest salted-hash members; the negative is the globally lowest
    'neg'-salted id belonging to a DIFFERENT label.

    No RNG — the same content-hash discipline as the samplers above, so
    pair assignments are identical across runs, engines, and
    partitionings. The cross-label negative needs only TWO global
    candidates: the overall salted-hash minimum, and the minimum among
    rows whose label DIFFERS from the first's (so every label is
    guaranteed a candidate from another label, even if the raw global
    top-2 shares one label). The plan is one per-label rank window plus
    two TakeOrderedAndProject(1) passes and a 2-row literal — never a
    per-label pass over the corpus. Labels with a single member are
    dropped (no positive exists).
    """
    h = F.md5(F.concat(F.lit("cp|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(label_col).orderBy(h, id_col)
    ranked = df.select(label_col, id_col).withColumn("rn", F.row_number().over(w))
    anchors = (
        ranked.filter(F.col("rn") <= 2)
        .groupBy(label_col)
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col(id_col))).alias("anchor_id"),
            F.min(F.when(F.col("rn") == 2, F.col(id_col))).alias("positive_id"),
        )
        .filter(F.col("positive_id").isNotNull())
    )
    gh = F.md5(F.concat(F.lit("neg|"), F.col(id_col).cast("string")))
    base = df.select(label_col, id_col, gh.alias("_h"))
    g1_rows = base.orderBy("_h", id_col).limit(1).collect()
    if not g1_rows:
        # empty input: no anchors exist either -> empty result frame
        return anchors.select(
            label_col,
            F.col("anchor_id").cast("bigint").alias("anchor_id"),
            F.col("positive_id").cast("bigint").alias("positive_id"),
            F.lit(None).cast("bigint").alias("negative_id"),
        )
    g1 = g1_rows[0]
    g2_rows = (
        base.filter(F.col(label_col) != g1[label_col])
        .orderBy("_h", id_col)
        .limit(1)
        .collect()
    )
    # single-label corpus: no cross-label negative exists -> null
    g2_id = F.lit(g2_rows[0][id_col]) if g2_rows else F.lit(None)
    neg = F.when(
        F.lit(g1[label_col]) != F.col(label_col), F.lit(g1[id_col])
    ).otherwise(g2_id)
    return anchors.select(
        label_col,
        F.col("anchor_id").cast("bigint").alias("anchor_id"),
        F.col("positive_id").cast("bigint").alias("positive_id"),
        neg.cast("bigint").alias("negative_id"),
    )
