"""Round-6 operator properties: the algebraic identities behind the new
backlog operators, checked the cheap way (hypothesis over pure-Python
models) plus one Spark end-to-end invariant each."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark import queries as q


@given(st.lists(st.integers(min_value=-50, max_value=50), max_size=60))
@settings(max_examples=200, deadline=None)
def test_reflection_identity_matches_sequential_fold(deltas):
    """s_t = prefix_t - min(0, runmin(prefix)_t)  ==  the sequential
    fold s_t = max(0, s_{t-1} + d_t) — the identity `clamped_running_stock`
    rests on, over arbitrary integer delta sequences."""
    s = 0
    folded = []
    for d in deltas:
        s = max(0, s + d)
        folded.append(s)
    prefix = 0
    runmin = 0
    closed = []
    for d in deltas:
        prefix += d
        runmin = min(runmin, prefix)
        closed.append(prefix - min(runmin, 0))
    assert closed == folded


@given(
    st.integers(min_value=0, max_value=10**9),
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=12),
)
@settings(max_examples=200, deadline=None)
def test_largest_remainder_preserves_total_and_bounds(total, weights):
    """Hamilton allocation: sum == total exactly, and every share is
    floor or floor+1 of the exact proportional value."""
    wsum = sum(weights)
    base = [(total * w) // wsum for w in weights]
    rems = sorted(
        range(len(weights)),
        key=lambda i: (-((total * weights[i]) % wsum), i),
    )
    shortfall = total - sum(base)
    assert 0 <= shortfall < len(weights) or total == 0
    alloc = list(base)
    for i in rems[:shortfall]:
        alloc[i] += 1
    assert sum(alloc) == total
    for a, b in zip(alloc, base):
        assert a in (b, b + 1)


def test_allocation_sums_preserved_on_fixture(spark, sf_dir):
    """Spark end-to-end: every order's allocated cents sum EXACTLY to its
    total cents."""
    out = q.QUERIES["largest_remainder_allocation"](spark, sf_dir)
    bad = (
        out.groupBy("orderkey", "total_cents")
        .agg(F.sum("alloc_cents").alias("s"))
        .filter(F.col("s") != F.col("total_cents"))
        .count()
    )
    assert bad == 0


def test_distributed_rank_matches_naive_window(spark, sf_dir):
    """The two-phase rank's FULL output (not just the witness rows)
    equals the naive global window on the same data."""
    from pyspark.sql import Window

    from anomaly_detection_in_time_series_data_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_id", F.floor(F.col("value") * 1000.0).cast("bigint").alias("vm")
    )
    naive = v.withColumn(
        "rnk", F.row_number().over(Window.orderBy("vm", "event_id"))
    )
    witness = q.QUERIES["distributed_exact_rank"](spark, sf_dir)
    n = naive.select(
        F.col("event_id").alias("eid"), F.col("rnk").alias("naive_rnk")
    )
    joined = witness.join(n, witness["event_id"] == n["eid"], "left")
    assert joined.filter(F.col("naive_rnk").isNull()).count() == 0
    mism = joined.filter(F.col("rnk") != F.col("naive_rnk")).count()
    assert mism == 0
