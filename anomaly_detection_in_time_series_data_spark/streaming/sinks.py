"""foreachBatch sinks: custom merge logic per micro-batch.

``upsert_foreach_batch`` is the keep-latest-per-key (upsert/compact) sink
the built-in file sink can't express — the standard pattern for streaming
CDC/dedup into a queryable table. Each micro-batch:

1. union the batch with the current table state,
2. keep the newest row per key (row_number over ``order_col`` desc),
3. write to a staging dir, then atomically swap it in.

foreachBatch gives at-least-once delivery per checkpointed batch; the
merge is idempotent (re-processing a batch converges to the same table),
which upgrades the end-to-end result to effectively-once.

At scale the swap-directory step becomes a transactional table commit
(Iceberg/Delta `MERGE INTO`); the micro-batch merge shape is identical —
this module keeps the dependency-free parquet form.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _recover_store(out: Path) -> None:
    """If a previous ``_swap_in`` crashed between renaming the live table
    aside and renaming staging in, the live dir is missing but a
    ``.old-<batch>`` sibling still holds the last committed state —
    restore the newest one.  Called before every read of the store so a
    checkpoint replay resumes from the preserved history instead of
    silently rebuilding from an empty table (ADVICE r6: the
    rmtree-then-rename window permanently deleted the dimension)."""
    if out.exists():
        return
    olds = sorted(
        out.parent.glob(out.name + ".old-*"),
        key=lambda q: int(q.name.rsplit("-", 1)[1]),
    )
    if olds:
        olds[-1].rename(out)
        for stale in olds[:-1]:
            shutil.rmtree(stale, ignore_errors=True)


def _swap_in(staging: Path, out: Path, batch_id: int) -> None:
    """Crash-safe table swap: rename the live dir ASIDE (never delete it
    before its replacement is in place), rename staging in, then drop the
    aside copy.  At no instant do zero on-disk copies of the table exist,
    so a crash at any point is recoverable: either ``out`` survives, or
    ``_recover_store`` restores it from the ``.old-*`` sibling on the
    next batch/replay.  At scale this step IS the transactional commit
    (Iceberg/Delta snapshot swap); this is the dependency-free parquet
    equivalent with the same no-torn-state guarantee."""
    old = Path(f"{out}.old-{batch_id}")
    shutil.rmtree(old, ignore_errors=True)  # stale copy from a replayed batch
    if out.exists():
        out.rename(old)
    staging.rename(out)
    shutil.rmtree(old, ignore_errors=True)


def merge_latest(
    current: DataFrame | None,
    batch: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Keep the newest row per key across current state + new batch.

    Ties on ``order_col`` break toward the incoming batch (a `_src` rank
    column, dropped on output) so replayed batches overwrite cleanly.
    """
    tagged = batch.withColumn("_src", F.lit(1))
    if current is not None:
        tagged = current.withColumn("_src", F.lit(0)).unionByName(tagged)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col), F.desc("_src"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def upsert_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    key_cols: list[str],
    order_col: str,
    checkpoint: str,
):
    """Start a foreachBatch streaming query that upserts into ``path``.

    Returns the StreamingQuery (caller awaits termination / stops it).
    """

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        current = spark.read.parquet(str(out)) if out.exists() else None
        latest = merge_latest(current, batch_df, key_cols, order_col)
        staging = Path(f"{path}.stage-{batch_id}")
        # Materialize staging BEFORE touching the live dir (the `latest`
        # plan still reads it), then crash-safe swap.
        latest.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def scd2_foreach_batch(
    stream: DataFrame,
    path: str,
    *,
    keys: list[str],
    tracked: list[str],
    ts_col: str,
    checkpoint: str,
    seq_col: str | None = None,
):
    """Start a foreachBatch streaming query that folds each micro-batch
    into a TYPE-2 slowly-changing dimension at ``path`` via
    ``cdc.scd2_merge`` — the streaming upsert unified with the batch CDC
    operator (one merge implementation, two runtimes).

    Each micro-batch is a CDC delivery (one row per key, or per
    (key, seq) when ``seq_col`` is given): unseen keys open a version,
    unchanged re-deliveries are no-ops, changes close the open row at the
    update timestamp and insert a new open version.  Because the no-op
    case makes ``scd2_merge`` idempotent on re-delivered batches,
    foreachBatch's at-least-once replay converges — the same
    effectively-once argument as ``upsert_foreach_batch``, with history
    preserved instead of overwritten.

    ``seq_col``: optional integer column giving the CDC sequence ORDER of
    sub-batches; if one trigger coalesces several deliveries (file-source
    backlog), they are folded in ascending ``seq_col`` order so the
    resulting history is independent of trigger boundaries.  The distinct
    sub-batch list is a driver-side collect bounded by the number of CDC
    deliveries per trigger (single-digit), never by data size.

    State lives as a plain parquet table with staging-dir swap (the
    transactional-table commit at scale — Iceberg/Delta MERGE — keeps the
    identical micro-batch merge shape).
    """
    from ..operators.cdc import scd2_merge

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = Path(path)
        _recover_store(out)
        if out.exists():
            current = spark.read.parquet(str(out))
        else:
            # Build the empty-store schema programmatically: dropping a
            # None seq_col crashes (PySparkTypeError), and string-joined
            # DDL breaks on non-identifier column names (ADVICE r6).
            base = (
                batch_df.drop(seq_col) if seq_col is not None else batch_df
            )
            fields = [f for f in base.schema.fields if f.name != ts_col]
            current = spark.createDataFrame(
                [],
                schema=T.StructType(
                    fields
                    + [
                        T.StructField("valid_from", T.TimestampType()),
                        T.StructField("valid_to", T.TimestampType()),
                    ]
                ),
            )
        if seq_col is not None:
            seqs = sorted(
                r[0] for r in batch_df.select(seq_col).distinct().collect()
            )
            subs = [
                batch_df.filter(F.col(seq_col) == s).drop(seq_col)
                for s in seqs
            ]
        else:
            subs = [batch_df]
        for upd in subs:
            current = scd2_merge(
                current, upd, keys=keys, tracked=tracked, ts_col=ts_col
            )
            # scd2_merge fans current into 4 branches; materialize per fold
            # so a multi-delivery trigger stays one-merge-deep (the
            # scd2_event_type_history plan-depth lesson).
            current = current.localCheckpoint(eager=True)
        staging = Path(f"{path}.stage-{batch_id}")
        current.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, out, batch_id)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
