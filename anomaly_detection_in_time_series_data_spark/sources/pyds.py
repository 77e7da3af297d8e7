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
    def __init__(self, attempt: str, rels: list[str]):
        self.attempt = attempt  # task-attempt-unique staging subdir
        self.rels = rels


class FileCorpusWriter(DataSourceWriter):
    """One output file per input row: ``{path}/{id}`` gets ``content``.

    Tasks never touch final destination paths: each task ATTEMPT writes
    its rows under an attempt-unique subdirectory of the job staging tree
    (``{root}/_stage_<token>/<attempt>``, where ``<attempt>`` comes from
    ``TaskContext.taskAttemptId()``) and reports that subdirectory plus
    its relative paths in its commit message; only ``commit()`` — which
    Spark calls once, after every task succeeded, with exactly one
    winning commit message per task — moves staged files into place, and
    ``abort()`` removes the whole staging tree.  Because no two attempts
    ever share a staged path (speculative or retried attempts of the SAME
    task get distinct ``taskAttemptId``s), a failed, killed, or losing
    speculative attempt can never leave partial output visible, and a
    half-written file from a killed attempt can never be promoted —
    ``commit()`` only touches paths named by winning attempts.
    (Atomicity assumption: staging and destination share a filesystem, so
    ``os.replace`` is an atomic rename; on an object store this seam is
    where a manifest-commit would slot in.)

    Row ids are validated to stay under the target root — an id whose
    normalized path is absolute or escapes via ``..`` fails the task.

    ``overwrite`` semantics are explicit: ``mode("overwrite")`` replaces
    the target's existing file tree at commit time (staging excluded);
    append mode refuses to clobber an existing destination file.
    """

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.root = options.get("path", "").rstrip("/")
        if not self.root:
            raise ValueError("filecorpus: option 'path' is required")
        self.overwrite = overwrite
        # Job-unique staging token, minted ONCE on the driver; the pickled
        # writer carries it to every task, so all tasks stage under the
        # same tree and commit()/abort() can find it.
        self.stage = os.path.join(self.root, f"_stage_{uuid.uuid4().hex}")

    def _safe_rel(self, rel: str) -> str:
        norm = os.path.normpath(rel)
        if os.path.isabs(norm) or norm.startswith("..") or norm in (".", ""):
            raise ValueError(
                f"filecorpus: row id {rel!r} escapes the target root"
            )
        return norm

    def write(self, rows):
        import uuid

        from pyspark import TaskContext

        tc = TaskContext.get()
        # taskAttemptId is unique per attempt within the application, so
        # a retried or speculative attempt of the same task stages into a
        # DIFFERENT directory than the attempt it races with.
        attempt = (
            f"attempt-{tc.taskAttemptId()}"
            if tc is not None
            else f"local-{uuid.uuid4().hex}"
        )
        rels = []
        for row in rows:
            rel = self._safe_rel(row.id)
            dst = os.path.join(self.stage, attempt, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            with open(dst, "wb") as f:
                f.write(bytes(row.content))
            rels.append(rel)
        return FileCorpusCommit(attempt, rels)

    def commit(self, messages):
        import shutil

        if self.overwrite:
            stage_name = os.path.basename(self.stage)
            for entry in os.listdir(self.root) if os.path.isdir(self.root) else []:
                if entry == stage_name:
                    continue
                full = os.path.join(self.root, entry)
                shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)
        # Promote ONLY paths named by the winning attempts' messages —
        # staged files from losing/killed attempts are never looked at.
        for m in messages:
            for rel in m.rels:
                src = os.path.join(self.stage, m.attempt, rel)
                dst = os.path.join(self.root, rel)
                if not self.overwrite and os.path.exists(dst):
                    raise FileExistsError(
                        f"filecorpus: {dst} already exists (append mode "
                        "does not clobber; use mode('overwrite'))"
                    )
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
        shutil.rmtree(self.stage, ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.stage, ignore_errors=True)


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
        return FileCorpusWriter(self.options, overwrite)
