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
        current = spark.read.parquet(str(out)) if out.exists() else None
        latest = merge_latest(current, batch_df, key_cols, order_col)
        staging = Path(f"{path}.stage-{batch_id}")
        # Materialize staging BEFORE touching the live dir (the `latest`
        # plan still reads it), then swap.
        latest.write.mode("overwrite").parquet(str(staging))
        shutil.rmtree(out, ignore_errors=True)
        staging.rename(out)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
