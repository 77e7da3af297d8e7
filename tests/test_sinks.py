"""foreachBatch upsert sink: keep-latest-per-key merge across micro-batches,
idempotent under batch replay (the streaming CDC/compaction pattern)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark.streaming.sinks import (
    merge_latest,
    upsert_foreach_batch,
)


def test_merge_latest_keeps_newest_and_prefers_batch_on_tie(spark):
    cur = spark.createDataFrame(
        [(1, 10, "old"), (2, 20, "cur2")], "k int, v int, tag string"
    )
    batch = spark.createDataFrame(
        [(1, 11, "new"), (2, 20, "batch2"), (3, 5, "ins")], "k int, v int, tag string"
    )
    out = {
        r["k"]: r["tag"]
        for r in merge_latest(cur, batch, ["k"], "v").collect()
    }
    assert out == {1: "new", 2: "batch2", 3: "ins"}  # tie on k=2 -> batch wins


def test_streaming_upsert_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    s1 = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b")], "k long, seq long, payload string"
    )
    s2 = spark.createDataFrame(
        [(2, 2, "b2"), (3, 1, "c")], "k long, seq long, payload string"
    )
    s1.coalesce(1).write.parquet(str(src / "batch1"))
    s2.coalesce(1).write.parquet(str(src / "batch2"))

    stream = (
        spark.readStream.schema("k long, seq long, payload string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = str(tmp_path / "table")
    q = upsert_foreach_batch(
        stream,
        out,
        key_cols=["k"],
        order_col="seq",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    final = {r["k"]: (r["seq"], r["payload"]) for r in spark.read.parquet(out).collect()}
    assert final == {1: (1, "a"), 2: (2, "b2"), 3: (1, "c")}

    # Replaying a batch converges to the same table (idempotent merge).
    q2 = upsert_foreach_batch(
        spark.readStream.schema("k long, seq long, payload string")
        .option("recursiveFileLookup", "true")
        .parquet(str(src)),
        out,
        key_cols=["k"],
        order_col="seq",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination()
    final2 = {r["k"]: (r["seq"], r["payload"]) for r in spark.read.parquet(out).collect()}
    assert final2 == final
