"""Python DataSource (Spark 4 datasource API) tests: the filecorpus
source must be row-for-row interchangeable with the JVM binaryFile-based
`read_file_corpus`, parallelize one partition per file, honor the glob
pattern, and round-trip through its paired writer."""

from __future__ import annotations

import os

import pytest

from anomaly_detection_in_time_series_data_spark.sources.pyds import (
    FileCorpusDataSource,
    FileCorpusReader,
)
from anomaly_detection_in_time_series_data_spark.sources.readers import (
    read_file_corpus,
)


@pytest.fixture()
def corpus(tmp_path):
    files = [
        ("alice", "a.txt", b"hello"),
        ("alice", "b.txt", b"world!"),
        ("bob", "notes/c.txt", b"deep file"),
        ("bob", "skip.log", b"not matched by *.txt"),
    ]
    for user, rel, body in files:
        p = tmp_path / user / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(body)
    return str(tmp_path)


def test_filecorpus_matches_binaryfile_reader(spark, corpus):
    spark.dataSource.register(FileCorpusDataSource)
    py = (
        spark.read.format("filecorpus")
        .option("path", corpus)
        .load()
        .select("id", "username", "content", "length")
    )
    jvm = read_file_corpus(spark, corpus).select(
        "id", "username", "content", "length"
    )
    assert py.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(py).count() == 0
    assert py.count() == 4


def test_filecorpus_pattern_and_partitioning(spark, corpus):
    spark.dataSource.register(FileCorpusDataSource)
    df = (
        spark.read.format("filecorpus")
        .option("path", corpus)
        .option("pattern", "*.txt")
        .load()
    )
    ids = sorted(r.id for r in df.collect())
    assert ids == ["alice/a.txt", "alice/b.txt", "bob/notes/c.txt"]
    # one InputPartition per matched file -> executor-side parallel reads
    parts = FileCorpusReader({"path": corpus, "pattern": "*.txt"}).partitions()
    assert [p.rel.replace(os.sep, "/") for p in parts] == ids


def test_filecorpus_writer_round_trips(spark, corpus, tmp_path):
    spark.dataSource.register(FileCorpusDataSource)
    src = spark.read.format("filecorpus").option("path", corpus).load()
    out = str(tmp_path / "out")
    src.write.format("filecorpus").option("path", out).mode("append").save()
    back = (
        spark.read.format("filecorpus")
        .option("path", out)
        .load()
        .select("id", "username", "content", "length")
    )
    orig = src.select("id", "username", "content", "length")
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_filecorpus_requires_path(spark):
    with pytest.raises(Exception, match="path"):
        FileCorpusReader({})


def test_filecorpus_writer_commit_protocol(spark, corpus, tmp_path):
    """Results become visible only through commit(): after save() no
    staging residue remains; overwrite mode replaces the target tree;
    append mode refuses to clobber an existing destination file."""
    spark.dataSource.register(FileCorpusDataSource)
    src = spark.read.format("filecorpus").option("path", corpus).load()
    out = str(tmp_path / "out")
    src.write.format("filecorpus").option("path", out).mode("append").save()
    assert not [d for d in os.listdir(out) if d.startswith("_stage_")]

    # stale file that overwrite must clear
    with open(os.path.join(out, "stale.txt"), "wb") as f:
        f.write(b"old")
    src.write.format("filecorpus").option("path", out).mode(
        "overwrite"
    ).save()
    assert not os.path.exists(os.path.join(out, "stale.txt"))
    assert not [d for d in os.listdir(out) if d.startswith("_stage_")]
    back = spark.read.format("filecorpus").option("path", out).load()
    assert back.count() == src.count()

    # append over existing destinations must fail loudly, not clobber
    with pytest.raises(Exception, match="already exists"):
        src.write.format("filecorpus").option("path", out).mode(
            "append"
        ).save()


def test_filecorpus_writer_rejects_path_escape(spark, tmp_path):
    """A row id that normalizes outside the target root fails the task
    instead of writing outside the tree."""
    spark.dataSource.register(FileCorpusDataSource)
    out = str(tmp_path / "out")
    evil = spark.createDataFrame(
        [("p", "../escape.txt", "u", bytearray(b"x"), 1)],
        "path string, id string, username string, content binary, length bigint",
    )
    with pytest.raises(Exception, match="escapes the target root"):
        evil.write.format("filecorpus").option("path", out).mode(
            "append"
        ).save()
    assert not os.path.exists(str(tmp_path / "escape.txt"))


def test_filecorpus_writer_attempt_isolated_staging(tmp_path):
    """Speculative/retried attempts of the SAME task must never share a
    staged path: two write() calls for the same logical rows stage into
    distinct attempt directories, and commit() promotes only the file
    bytes named by the winning attempt's message — a killed attempt's
    truncated twin is never promoted."""
    from anomaly_detection_in_time_series_data_spark.sources.pyds import (
        FileCorpusWriter,
    )

    class Row:
        def __init__(self, id, content):
            self.id, self.content = id, content

    out = str(tmp_path / "out")
    w = FileCorpusWriter({"path": out}, overwrite=False)
    # attempt 1: the loser — killed mid-write, left truncated bytes
    m_lost = w.write([Row("doc.txt", b"TRUNC")])
    # attempt 2 of the same task: the winner
    m_won = w.write([Row("doc.txt", b"full contents")])
    assert m_lost.attempt != m_won.attempt  # attempt-unique staging
    lost_path = os.path.join(w.stage, m_lost.attempt, "doc.txt")
    won_path = os.path.join(w.stage, m_won.attempt, "doc.txt")
    assert os.path.exists(lost_path) and os.path.exists(won_path)
    # Spark passes exactly one winning message per task to commit()
    w.commit([m_won])
    with open(os.path.join(out, "doc.txt"), "rb") as f:
        assert f.read() == b"full contents"
    assert not os.path.exists(w.stage)  # staging tree fully cleaned
