"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): the
file-corpus scan as a first-class pluggable source.

`readers.read_file_corpus` maps the reference's driver-side ``os.walk``
loop (Assignment 4.py:168-194) onto the JVM ``binaryFile`` source; this
module exposes the SAME table through Spark's Python DataSource V2 API —
``spark.read.format("filecorpus")`` — demonstrating the engine's source
extension seam end-to-end:

- ``partitions()`` returns one ``InputPartition`` per file, so reads
  parallelize across executors exactly like ``binaryFile`` (each task
  opens only its own file; no driver-side content reads).  File
  DISCOVERY is a driver-side walk — metadata-only, same cost class as
  any file-listing planner; at object-store scale the documented swap is
  a manifest table feeding the same partition list.
- ``read(partition)`` runs ON THE EXECUTOR and yields
  (path, id, username, content, length) tuples matching
  ``read_file_corpus``'s projection, so the two sources are
  row-for-row interchangeable (the parity unit test pins this).

A paired ``DataSourceWriter`` writes each row back out as one file under
the target root (the inverse mapping), committing per-task results only
through Spark's commit protocol messages.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

CORPUS_SCHEMA = (
    "path string, id string, username string, content binary, length bigint"
)


class FilePartition(InputPartition):
    def __init__(self, root: str, rel: str):
        self.root = root
        self.rel = rel


class FileCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path", "").rstrip("/")
        if not self.root:
            raise ValueError("filecorpus: option 'path' is required")
        self.pattern = options.get("pattern", "*")

    def partitions(self):
        parts = []
        for dirpath, _dirs, files in os.walk(self.root):
            for name in sorted(files):
                if not fnmatch.fnmatch(name, self.pattern):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.root)
                parts.append(FilePartition(self.root, rel))
        parts.sort(key=lambda p: p.rel)
        return parts

    def read(self, partition: FilePartition):
        full = os.path.join(partition.root, partition.rel)
        with open(full, "rb") as f:
            content = f.read()
        username = partition.rel.split(os.sep)[0]
        yield (
            f"file:{full}",
            partition.rel.replace(os.sep, "/"),
            username,
            content,
            len(content),
        )


class FileCorpusCommit(WriterCommitMessage):
    def __init__(self, n_files: int):
        self.n_files = n_files


class FileCorpusWriter(DataSourceWriter):
    """One output file per input row: ``{path}/{id}`` gets ``content``.
    Each task writes its own rows and reports a commit message; global
    success is Spark's job-level commit."""

    def __init__(self, options: dict):
        self.root = options.get("path", "").rstrip("/")
        if not self.root:
            raise ValueError("filecorpus: option 'path' is required")

    def write(self, rows):
        n = 0
        for row in rows:
            rel = row.id
            dst = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as f:
                f.write(bytes(row.content))
            n += 1
        return FileCorpusCommit(n)


class FileCorpusDataSource(DataSource):
    """``spark.read.format("filecorpus").option("path", root)`` — register
    with ``spark.dataSource.register(FileCorpusDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "filecorpus"

    def schema(self) -> str:
        return CORPUS_SCHEMA

    def reader(self, schema):
        return FileCorpusReader(self.options)

    def writer(self, schema, overwrite: bool):
        return FileCorpusWriter(self.options)
