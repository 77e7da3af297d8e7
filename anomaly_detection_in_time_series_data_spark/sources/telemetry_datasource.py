"""Custom Spark data source (Python Data Source API, Spark 4) for the
reference's time-partitioned telemetry layout (SURVEY.md §2.8 T1/T2:
``<signal>/t=<elapsed-s>/*.parquet``, `Week#8_Assignment.ipynb:252-289`).

Where ``streaming/replay.py`` assembles replay from the built-in file
source, this module makes the layout a *first-class source*:

- **batch**: one Spark input partition per ``t=`` directory — the batch
  boundaries of the original capture become the units of parallelism, and
  the relative offset ``t`` is materialized as a column.
- **streaming**: one micro-batch per ``t=`` directory in ascending order
  (the reference's batch-at-a-time replay, with its unordered-``set``
  replay bug O3 fixed by construction) — offsets are just indices into the
  sorted directory list, so a restart resumes exactly where it stopped.

Rows are handed to Spark as Arrow ``RecordBatch``es (zero-copy into the
JVM), not Python tuples. The directory listing runs driver-side; each
partition read opens only its own directory — on a cluster, executors
therefore read disjoint file sets in parallel (works for any fsspec-style
local/posix path; distributed object stores would plug in here).
"""

from __future__ import annotations

import ast
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "telemetry_replay"


def _list_offset_dirs(path: str) -> list[tuple[float, str]]:
    """Sorted (offset, absolute-dir) pairs for every ``t=`` partition."""
    out = []
    for name in os.listdir(path):
        if name.startswith("t="):
            out.append((float(name.split("=", 1)[1]), os.path.join(path, name)))
    return sorted(out)


def _read_dir_batches(directory: str, t_value: float):
    """Yield Arrow RecordBatches for one ``t=`` dir with ``t`` appended."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(directory)
    t_col = pa.array([t_value] * table.num_rows, type=pa.float64())
    table = table.append_column("t", t_col)
    yield from table.to_batches()


class _OffsetPartition(InputPartition):
    def __init__(self, t_value: float, directory: str):
        self.t_value = t_value
        self.directory = directory


class TelemetryReplayBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [_OffsetPartition(t, d) for t, d in _list_offset_dirs(self.path)]

    def read(self, partition: _OffsetPartition):
        yield from _read_dir_batches(partition.directory, partition.t_value)


class TelemetryReplayStreamReader(DataSourceStreamReader):
    """One micro-batch per captured ``t=`` directory, ascending."""

    def __init__(self, options):
        self.path = options["path"]
        self._dirs = _list_offset_dirs(self.path)

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._dirs)}

    def partitions(self, start: dict, end: dict):
        s = start["index"] if isinstance(start, dict) else ast.literal_eval(start)["index"]
        e = end["index"] if isinstance(end, dict) else ast.literal_eval(end)["index"]
        return [_OffsetPartition(t, d) for t, d in self._dirs[s:e]]

    def read(self, partition: _OffsetPartition):
        yield from _read_dir_batches(partition.directory, partition.t_value)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class TelemetryReplayDataSource(DataSource):
    """Register with ``spark.dataSource.register(TelemetryReplayDataSource)``
    then ``spark.read.format('telemetry_replay').schema(ddl).option('path',
    p)`` (or ``readStream`` for the micro-batch replay)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        # Infer from one footer + the derived t column; callers may still
        # pass an explicit schema (engine policy prefers it).
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        dirs = _list_offset_dirs(self.options["path"])
        first_dir = dirs[0][1]
        fname = next(f for f in os.listdir(first_dir) if f.endswith(".parquet"))
        arrow_schema = pq.read_schema(os.path.join(first_dir, fname))
        spark_schema = from_arrow_schema(arrow_schema)
        return spark_schema.add("t", "double")

    def reader(self, schema) -> TelemetryReplayBatchReader:
        return TelemetryReplayBatchReader(self.options)

    def streamReader(self, schema) -> TelemetryReplayStreamReader:
        return TelemetryReplayStreamReader(self.options)
