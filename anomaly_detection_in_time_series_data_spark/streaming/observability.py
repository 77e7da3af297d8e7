"""T4: delivery observability (SURVEY.md §2.1 K1 callbacks).

The reference attaches per-message success/error callbacks to its Kafka
producer (`Week#8_Assignment.ipynb:153-177`). Structured Streaming's unit of
delivery is the micro-batch, so the engine's equivalent is a
``StreamingQueryListener`` recording per-batch progress (rows, sources,
sink, timestamps) and terminations — the same signals, at the granularity
the runtime actually guarantees (at-least-once per checkpointed batch).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class DeliveryLog:
    """Accumulated per-batch delivery records (driver-side, small)."""

    progresses: list[dict] = field(default_factory=list)
    terminations: list[dict] = field(default_factory=list)

    @property
    def rows_delivered(self) -> int:
        return int(sum(p.get("numInputRows", 0) for p in self.progresses))


class DeliveryListener(StreamingQueryListener):
    """Per-batch success/failure callbacks (the streaming analogue of the
    reference's producer callbacks)."""

    def __init__(self) -> None:
        self.log = DeliveryLog()

    def onQueryStarted(self, event) -> None:  # noqa: N802 — Spark API
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.log.progresses.append(
            {
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "timestamp": p.timestamp,
                "sink": p.sink.description,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.log.terminations.append(
            {"id": str(event.id), "exception": event.exception}
        )


def attach_delivery_listener(spark: SparkSession) -> DeliveryListener:
    listener = DeliveryListener()
    spark.streams.addListener(listener)
    return listener
