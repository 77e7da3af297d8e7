"""Distributed exact global ranking — the scale path for every global
``row_number`` / ``ntile`` in the engine.

A partition-less ``Window.orderBy(...)`` moves the WHOLE frame into one
task (Spark's ``WindowExec`` warns exactly this), which is fine for a
grouped 10-row result but a single-node sort of the fact table at 100 TB.
This module is the house replacement, terasort-shaped:

1. ``repartitionByRange`` on the sort key spreads the total order across
   range partitions (a parallel range shuffle — the same shuffle ANY
   engine pays for a global sort);
2. ``sortWithinPartitions`` + an Arrow-batched ``mapInPandas`` assigns
   per-partition LOCAL row numbers (no per-row Python — a ``range`` per
   Arrow batch);
3. per-partition counts (a partitions-count-sized frame, NOT data-sized)
   fold through a tiny running-sum window into OFFSETS, broadcast back;
   ``local + offset`` is the exact global rank.

No stage ever sorts more than one range partition.  ``ntile_from_rank``
then derives SQL-standard ntile bins from (rank, total) with pure bigint
arithmetic — floor distribution, first ``n % k`` buckets one row larger —
bit-identical to ``ntile(k) OVER (ORDER BY ...)`` on any engine.

Proof of equivalence lives in the driver gate: the ``distributed_exact_rank``
query hash-matches this pipeline against DuckDB's single-window
``row_number``, and the ntile consumers (``woe_iv_binning``,
``rfm_user_segments``, ``gini_split_gain_deciles``, ``vocab_growth_curve``)
hash-match against DuckDB ``ntile``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Below this OPTIMIZER-ESTIMATED input size, keyed_exact_rank falls back to
# the native per-key window (optimization r13, VERDICT r12 item 3): the
# two-phase path exists so no single task ever sorts a whole key's frame,
# but its fixed costs (Arrow mapInPandas round-trip, eager localCheckpoint,
# offset broadcast join) are pure overhead when the WHOLE frame fits one
# task comfortably — measured +0.8 s on borda_rank_aggregation and +1.5 s
# on gmm_anomaly_scores at sf0.1.  256 MB is a size a single window task
# sorts in seconds; at 100 TB the estimate (derived by Catalyst from scan
# bytes) exceeds it by orders of magnitude and the scale path engages.
# Both paths are proven row-identical (tests/test_plans.py parity + the
# distributed_keyed_rank driver oracle).  Env-tunable for cluster profiles.
KEYED_RANK_SMALL_BYTES = int(
    os.environ.get("ADTS_KEYED_RANK_SMALL_BYTES", str(256 * 1024 * 1024))
)


def _plan_size_bytes(df: DataFrame) -> "int | None":
    """Catalyst's estimated output size of ``df`` in bytes (no job is
    run — this reads the optimized logical plan's statistics, the same
    estimate AQE/broadcast planning uses).  None when the estimate is
    unavailable."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j returns small BigInts as Python ints; huge estimates
        # (unknown-stats subtrees propagate Long.Max-ish sentinels) come
        # back as JavaObjects — str() covers both.
        return int(str(size))
    except Exception:  # noqa: BLE001 — estimate only; caller defaults to scale path
        return None


def global_exact_rank(
    df: DataFrame,
    order_cols: "list[Column | str]",
    *,
    parts: int = 16,
    rank_col: str = "rnk",
    total_col: str = "n",
) -> DataFrame:
    """Return ``df`` with two added bigint columns: ``rank_col`` — the
    exact 1-based global rank under ``order_cols`` — and ``total_col``
    — the frame's total row count.

    ``order_cols`` accepts strings or Column sort expressions
    (``F.col("x").desc()``); together they must be a TOTAL order (add a
    unique tie-break key — ties split across range partitions would
    otherwise make ranks depend on partitioning).

    The result is ``localCheckpoint``-ed: the rank assignment is a
    phase boundary (counts and the offset join both reuse it), and the
    checkpoint pins rank determinism for downstream self-joins.
    """
    clash = {rank_col, total_col, "_ger_pid", "_ger_local", "_ger_off"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"global_exact_rank: output/internal column names {sorted(clash)} "
            "already exist on the input frame; pass rank_col=/total_col= "
            "overrides (an AMBIGUOUS_REFERENCE would surface only at "
            "action time otherwise)"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    rp = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    payload = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    names = [f.name for f in df.schema.fields]

    def local_rank(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for b in batches:
            k = len(b)
            out = b[names].copy()
            out.insert(0, "_ger_pid", pid)
            out.insert(1, "_ger_local", range(seen + 1, seen + k + 1))
            yield out
            seen += k

    ranked = rp.mapInPandas(
        local_rank, schema=f"_ger_pid int, _ger_local bigint, {payload}"
    ).localCheckpoint(eager=True)
    counts = ranked.groupBy("_ger_pid").agg(F.count("*").alias("_ger_c"))
    # Both windows below run over the PARTITION-COUNT frame (<= `parts`
    # rows), never the data — the single-task shape is bounded and right.
    woff = Window.orderBy("_ger_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_ger_off", F.coalesce(F.sum("_ger_c").over(woff), F.lit(0))
    ).withColumn(
        total_col, F.sum("_ger_c").over(Window.partitionBy()).cast("bigint")
    )
    out = ranked.join(
        F.broadcast(offsets.select("_ger_pid", "_ger_off", total_col)),
        "_ger_pid",
    )
    return (
        out.withColumn(
            rank_col,
            (F.col("_ger_local") + F.col("_ger_off")).cast("bigint"),
        )
        .drop("_ger_pid", "_ger_local", "_ger_off")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: "list[Column | str]",
    value_col: str,
    *,
    parts: int = 16,
    cum_col: str = "cum",
    total_col: str = "total",
) -> DataFrame:
    """Return ``df`` with two added bigint columns: ``cum_col`` — the
    exact INCLUSIVE global running sum of ``value_col`` under
    ``order_cols`` — and ``total_col`` — the grand total.  The
    prefix-sum sibling of ``global_exact_rank`` (round-10, from the
    grouped-window audit): a partition-less
    ``sum(v) OVER (ORDER BY ...)`` single-tasks its whole input frame,
    which is wrong whenever that frame scales (cumulative revenue over a
    PART dimension that grows with SF — the `abc_inventory_classification`
    shape); this runs the identical three-phase plan — range shuffle,
    per-partition local cumulative sums (Arrow-batched, no per-row
    Python), a partitions-sized offset window broadcast back.

    ``order_cols`` must be a TOTAL order (unique tie-break), for the
    same rank-determinism reason as ``global_exact_rank``."""
    clash = {cum_col, total_col, "_gps_pid", "_gps_local", "_gps_off"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"global_prefix_sum: output/internal column names {sorted(clash)} "
            "already exist on the input frame; pass cum_col=/total_col= "
            "overrides"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    rp = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    payload = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    names = [f.name for f in df.schema.fields]

    def local_cumsum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for b in batches:
            out = b[names].copy()
            cs = b[value_col].cumsum() + seen
            out.insert(0, "_gps_pid", pid)
            out.insert(1, "_gps_local", cs.astype("int64"))
            yield out
            seen = int(cs.iloc[-1]) if len(cs) else seen

    cumd = rp.mapInPandas(
        local_cumsum, schema=f"_gps_pid int, _gps_local bigint, {payload}"
    ).localCheckpoint(eager=True)
    totals = cumd.groupBy("_gps_pid").agg(
        F.sum(value_col).cast("bigint").alias("_gps_c")
    )
    # Offset windows run over the PARTITION-COUNT frame (<= `parts` rows).
    woff = Window.orderBy("_gps_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_gps_off", F.coalesce(F.sum("_gps_c").over(woff), F.lit(0))
    ).withColumn(
        total_col, F.sum("_gps_c").over(Window.partitionBy()).cast("bigint")
    )
    out = cumd.join(
        F.broadcast(offsets.select("_gps_pid", "_gps_off", total_col)),
        "_gps_pid",
    )
    return (
        out.withColumn(
            cum_col, (F.col("_gps_local") + F.col("_gps_off")).cast("bigint")
        )
        .drop("_gps_pid", "_gps_local", "_gps_off")
    )


def keyed_exact_rank(
    df: DataFrame,
    key_cols: "list[str]",
    order_cols: "list[Column | str]",
    *,
    parts: int = 16,
    rank_col: str = "rnk",
    total_col: str = "n",
    small_bytes: "int | None" = None,
    size_probe: "DataFrame | None" = None,
) -> DataFrame:
    """Return ``df`` with two added bigint columns: ``rank_col`` — the
    exact 1-based rank WITHIN each ``key_cols`` group under
    ``order_cols`` — and ``total_col`` — the group's row count.  The
    keyed sibling of ``global_exact_rank`` (round-12, from the
    partitioned-subgrain-window audit): ``row_number() OVER (PARTITION
    BY key ORDER BY ...)`` single-tasks each KEY's whole frame, which is
    wrong whenever the key domain is tiny while per-key frames scale
    (the weekly-leaderboard shape: 52 weeks x millions of users = 52
    tasks each sorting millions).  This runs the same three-phase plan —
    range shuffle over (key, order), per-partition local ranks per key
    (Arrow-batched ``cumcount``, no per-row Python), then per-(range,
    key) counts fold through a tiny prefix window (frame <= ``parts``
    rows PER KEY, metadata-sized) into incoming offsets, broadcast back.

    ``order_cols`` must start with the key columns and be a TOTAL order
    within each key (unique tie-break), for the same rank-determinism
    reason as ``global_exact_rank``.

    Intended for PROVABLY-TINY key domains (weeks, types, status codes):
    the offset frame it broadcasts is (partitions x keys) rows.  A
    wide/id-grain partition key does not need this operator — its native
    window already parallelizes across keys.

    SIZE GATE (optimization r13): when Catalyst's estimate of the input
    is at most ``small_bytes`` (default ``KEYED_RANK_SMALL_BYTES``),
    the native per-key window runs instead — identical rows, none of the
    two-phase fixed costs (Arrow boundary, eager checkpoint, offset
    join).  Pass ``small_bytes=-1`` to force the two-phase path (the
    parity query/tests do, to keep exercising it at fixture scale)."""
    clash = {rank_col, total_col, "_ker_pid", "_ker_local", "_ker_off"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"keyed_exact_rank: output/internal column names {sorted(clash)} "
            "already exist on the input frame; pass rank_col=/total_col= "
            "overrides"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # Size gate (optimization r13): when Catalyst estimates the WHOLE
    # input under KEYED_RANK_SMALL_BYTES, the per-key frames cannot be
    # large enough to justify the two-phase machinery — use the native
    # window (same rank/total values by definition; same column order as
    # the two-phase output below).  An unavailable estimate takes the
    # scale path: wrong-direction failure is a slow small job, never a
    # single-task sort of a 100 TB key.
    gate = KEYED_RANK_SMALL_BYTES if small_bytes is None else small_bytes
    # ``size_probe``: a frame whose optimizer estimate PROXIES the input
    # scale (e.g. the base-table scan feeding ``df``).  Needed when
    # ``df``'s own lineage crosses an eagerly-checkpointed/opaque subtree
    # whose statistics degrade to the unknown-size sentinel (~Long.Max),
    # which would otherwise pin the scale path at every SF.
    est = _plan_size_bytes(df if size_probe is None else size_probe)
    if est is not None and est <= gate:
        others = [c for c in df.columns if c not in set(key_cols)]
        return (
            df.withColumn(
                total_col,
                F.count("*")
                .over(Window.partitionBy(*key_cols))
                .cast("bigint"),
            )
            .withColumn(
                rank_col,
                F.row_number()
                .over(Window.partitionBy(*key_cols).orderBy(*cols))
                .cast("bigint"),
            )
            .select(*key_cols, *others, total_col, rank_col)
        )
    rp = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    payload = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    names = [f.name for f in df.schema.fields]

    def local_rank(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen: dict = {}  # key -> rows already ranked in this partition
        for b in batches:
            out = b[names].copy()
            if len(key_cols) == 1:
                kser = b[key_cols[0]]
            else:
                kser = pd.Series(
                    list(zip(*(b[k] for k in key_cols))), index=b.index
                )
            local = kser.groupby(kser, sort=False).cumcount() + 1
            carry = kser.map(seen).fillna(0).astype("int64")
            out.insert(0, "_ker_pid", pid)
            out.insert(1, "_ker_local", (local + carry).astype("int64"))
            for k, c in kser.value_counts(sort=False).items():
                seen[k] = seen.get(k, 0) + int(c)
            yield out

    ranked = rp.mapInPandas(
        local_rank, schema=f"_ker_pid int, _ker_local bigint, {payload}"
    ).localCheckpoint(eager=True)
    counts = ranked.groupBy("_ker_pid", *key_cols).agg(
        F.count("*").alias("_ker_c")
    )
    # Offset windows run over the (partitions x keys) frame — <= `parts`
    # rows per key, never data-sized.
    woff = (
        Window.partitionBy(*key_cols)
        .orderBy("_ker_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_ker_off", F.coalesce(F.sum("_ker_c").over(woff), F.lit(0))
    ).withColumn(
        total_col,
        F.sum("_ker_c").over(Window.partitionBy(*key_cols)).cast("bigint"),
    )
    out = ranked.join(
        F.broadcast(offsets.select("_ker_pid", *key_cols, "_ker_off", total_col)),
        ["_ker_pid", *key_cols],
    )
    return (
        out.withColumn(
            rank_col,
            (F.col("_ker_local") + F.col("_ker_off")).cast("bigint"),
        )
        .drop("_ker_pid", "_ker_local", "_ker_off")
    )


def keyed_record_scan(
    df: DataFrame,
    key_cols: "list[str]",
    order_cols: "list[Column | str]",
    value_col: str,
    *,
    parts: int = 16,
    record_col: str = "is_record",
) -> DataFrame:
    """Mark, per key, every row whose ``value_col`` STRICTLY exceeds all
    prior values under ``order_cols`` (the extreme-value 'record
    process') — without ever single-tasking a key's full history.

    The naive form is ``v > max(v) OVER (PARTITION BY key ORDER BY ...
    ROWS ... 1 PRECEDING)``: one task per key sorts that key's entire
    timeline, which at 100 TB with few keys is the round-8 weak class in
    per-key clothing.  This is the two-phase decomposition instead
    (the ``global_prefix_sum`` idiom, with max as the monoid):

    1. range-shuffle on (key, order) and scan each range ONCE in Arrow
       batches, keeping per-(range, key) state: the local running max,
       each row's local-record flag, and the range's final max;
    2. the per-(range, key) maxima (a partitions x keys frame, never
       data-sized) fold through a tiny prefix-max window into incoming
       OFFSET maxima, broadcast back;
    3. a global record = a LOCAL record whose value strictly exceeds its
       range's incoming offset (a row beaten locally is beaten globally
       — its local predecessor is earlier in the total order).

    ``order_cols`` must start with the key columns and be a TOTAL order.
    Returns ``df`` plus the boolean ``record_col``."""
    clash = {record_col, "_krs_pid", "_krs_loc", "_krs_off"} & set(df.columns)
    if clash:
        raise ValueError(
            f"keyed_record_scan: output/internal column names {sorted(clash)} "
            "already exist on the input frame; pass record_col= override"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    rp = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    payload = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    names = [f.name for f in df.schema.fields]

    def local_scan(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run: dict = {}  # key tuple/scalar -> running max across batches
        for b in batches:
            out = b[names].copy()
            # Vectorized batch body (ADVICE r10: the per-row Python loop
            # rode billion-row fact scans): a row is a local record iff
            # its value strictly exceeds BOTH the max of earlier rows in
            # this batch for its key (grouped cummax shifted by one) AND
            # the carry from earlier batches of this partition (dict
            # map).  Integer values ride the nullable Int64 dtype so the
            # missing-value slots never force a float64 upcast — cents
            # near 2^63 must compare exactly, not at float53 precision.
            if len(key_cols) == 1:
                kser = b[key_cols[0]]
            else:
                kser = pd.Series(
                    list(zip(*(b[k] for k in key_cols))), index=b.index
                )
            integer = pd.api.types.is_integer_dtype(b[value_col])
            vals = b[value_col].astype("Int64" if integer else "float64")
            cmax = vals.groupby(kser, sort=False).cummax()
            prior = cmax.groupby(kser, sort=False).shift(1)
            carry = kser.map(run).astype("Int64" if integer else "float64")
            loc = (prior.isna() | (vals > prior)) & (
                carry.isna() | (vals > carry)
            )
            out.insert(0, "_krs_pid", pid)
            out.insert(1, "_krs_loc", loc.astype(bool).to_numpy())
            # cross-batch carry: fold this batch's per-key max into run.
            # NaN never enters the carry (ADVICE r11): an all-NaN key
            # batch would store NaN, making carry.isna() true for later
            # batches and flagging non-records; dropna keeps the fold's
            # "no prior finite value" semantics identical to the window
            # form, where max() ignores NULL/NaN.
            finite = vals.dropna()
            for k, m in finite.groupby(kser[finite.index], sort=False).max().items():
                prev = run.get(k)
                if prev is None or pd.isna(prev) or m > prev:
                    run[k] = m
            yield out

    scanned = rp.mapInPandas(
        local_scan, schema=f"_krs_pid int, _krs_loc boolean, {payload}"
    ).localCheckpoint(eager=True)
    # per-(range, key) maxima -> incoming offset = prefix max of EARLIER
    # ranges for the same key (partitions x keys rows — metadata-sized)
    gmax = scanned.groupBy("_krs_pid", *key_cols).agg(
        F.max(value_col).alias("_krs_m")
    )
    woff = (
        Window.partitionBy(*key_cols)
        .orderBy("_krs_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = gmax.withColumn("_krs_off", F.max("_krs_m").over(woff)).select(
        "_krs_pid", *key_cols, "_krs_off"
    )
    out = scanned.join(F.broadcast(offsets), ["_krs_pid", *key_cols])
    return out.withColumn(
        record_col,
        F.col("_krs_loc")
        & (F.col("_krs_off").isNull() | (F.col(value_col) > F.col("_krs_off"))),
    ).drop("_krs_pid", "_krs_loc", "_krs_off")


def ntile_from_rank(
    k: int, *, rank_col: str = "rnk", total_col: str = "n"
) -> Column:
    """SQL-standard ``ntile(k)`` bin (1-based) from an exact global rank
    and frame total — pure bigint arithmetic, no window: the first
    ``n % k`` buckets hold ``n DIV k + 1`` rows, the rest ``n DIV k``
    (floor distribution; both Spark and DuckDB implement exactly this).

    The CASE's else-branch divides by ``n DIV k``; when that is 0
    (n < k) the when-branch covers every row (``rem*(q+1) = n``), and
    CASE evaluates lazily per row, so no divide-by-zero is reachable.
    """
    r, n = rank_col, total_col
    q = f"({n} DIV {k})"
    rem = f"({n} % {k})"
    big = f"({rem} * ({q} + 1))"
    return F.expr(
        f"CASE WHEN {r} <= {big} THEN ({r} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {rem} + ({r} - {big} - 1) DIV {q} + 1 END"
    ).cast("bigint")
