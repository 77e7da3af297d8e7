"""Skew-handling aggregation (SURVEY.md 'Optimize for scale' checklist).

AQE's skew-join splitting handles joins; for *aggregations* with hot keys
(one key holding most rows), pre-splitting on a salt bounds the largest
partial-aggregate partition. Two-phase: groupBy(key, salt) partial ->
groupBy(key) final. Only decomposable aggregates apply (sum/count/min/max);
averages compose from sum+count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, str]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name -> (phase-1 aggregate column over raw rows,
    phase-2 combiner name: 'sum'|'min'|'max'). Example::

        salted_agg(df, ["k"], {
            "total": (F.sum("v"), "sum"),
            "n":     (F.count("*"), "sum"),
            "mx":    (F.max("v"), "max"),
        })

    The salt is a deterministic hash of a high-cardinality expression
    (monotonically spread), so results are reproducible and the hot key's
    rows split across ``salt_buckets`` partial groups.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()]
    )
    combiners = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    phase2 = phase1.groupBy(*group_cols).agg(
        *[
            combiners[comb](F.col(f"_p_{name}")).alias(name)
            for name, (_, comb) in aggs.items()
        ]
    )
    return phase2


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    keys: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for a skewed fact side joining a small-ish dim.

    The fact side gets a deterministic salt in ``[0, salt_buckets)``; the
    dim side is replicated once per salt value (rows x salt_buckets), and
    the join key becomes ``(keys..., salt)`` — the hot key's rows spread
    over ``salt_buckets`` shuffle partitions instead of one straggler.
    Result is EXACTLY the plain join (salt never changes matching, only
    placement). Use when the dim is too big to broadcast outright but
    replication by ``salt_buckets`` is still cheap; otherwise prefer
    ``F.broadcast`` or AQE skew-join (both also shipped by this engine).
    """
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)),
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_fact.join(replicated_dim, [*keys, "_salt"], how)
    return out.drop("_salt")
