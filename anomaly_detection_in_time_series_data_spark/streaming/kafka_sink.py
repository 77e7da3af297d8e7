"""K1/K2: Kafka-shaped sink surface (SURVEY.md §2.1).

The reference's producer sends JSON-serialized values with explicit keys
and per-message callbacks (`Week#8_Assignment.ipynb:132-180`), one pandas
frame per message — an anti-pattern we replace with per-row messages
(SURVEY §1.2). No Kafka broker (or connector jar) exists in this
environment, so the *message shaping* — the part with engine semantics —
is a pure DataFrame transform, testable everywhere, and the broker write
is availability-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_kafka_frame(
    df: DataFrame, *, key_col: str | None = None, value_cols: list[str] | None = None
) -> DataFrame:
    """Shape rows into Kafka (key, value) binary columns.

    value = JSON of the selected columns (``to_json(struct(...))`` — one
    message per row, F12); key = the given column as string bytes, or a
    uuid per row (F14, the reference's ``uuid.uuid4().hex`` default key).
    """
    value = F.to_json(
        F.struct(*[F.col(c) for c in value_cols]) if value_cols else F.struct("*")
    ).cast("binary")
    if key_col is not None:
        key = F.col(key_col).cast("string").cast("binary")
    else:
        key = F.regexp_replace(F.expr("uuid()"), "-", "").cast("binary")
    return df.select(key.alias("key"), value.alias("value"))


def write_stream_to_kafka(
    df: DataFrame,
    *,
    topic: str,
    bootstrap_servers: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """K1: start the Kafka sink (at-least-once per checkpoint). Requires the
    spark-sql-kafka connector on the classpath; raises a clear error when it
    is absent (this environment has no broker — integration-gated as
    SURVEY §7 Phase 5 specifies)."""
    shaped = to_kafka_frame(df, key_col=key_col)
    try:
        return (
            shaped.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "Kafka sink unavailable (spark-sql-kafka connector/broker missing); "
            "message shaping is still testable via to_kafka_frame"
        ) from e
