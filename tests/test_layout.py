"""Z-order layout: files must be clustered in EVERY participating
dimension (the property single-column sort cannot give), so min-max
skipping works for filters on any of them."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark.operators.layout import (
    interleave_bits,
    write_zordered,
)
from anomaly_detection_in_time_series_data_spark.tables import load_table


def test_interleave_bits_known_values(spark):
    df = spark.range(1).select(
        interleave_bits([F.lit(0b101), F.lit(0b011)], 3).alias("z")
    )
    # x=101, y=011 -> bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    assert df.collect()[0]["z"] == 0b011011


def _avg_normalized_file_range(path: str, col: str) -> float:
    lohi = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            lohi.append((min(mins), max(maxs)))
    glo = min(lo for lo, _ in lohi)
    ghi = max(hi for _, hi in lohi)
    span = ghi - glo or 1
    return sum((hi - lo) / span for lo, hi in lohi) / len(lohi)


def test_zorder_clusters_both_dimensions(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")

    zpath = str(tmp_path / "zorder")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], bits=8, num_files=16)

    # baseline: single-column sort clusters only the sorted column
    spath = str(tmp_path / "sorted")
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    z_part = _avg_normalized_file_range(zpath, "l_partkey")
    z_supp = _avg_normalized_file_range(zpath, "l_suppkey")
    s_part = _avg_normalized_file_range(spath, "l_partkey")
    s_supp = _avg_normalized_file_range(spath, "l_suppkey")

    assert s_part < 0.2          # sort clusters its own column tightly
    assert s_supp > 0.8          # ...and leaves the other unclustered
    assert z_part < 0.6 and z_supp < 0.6   # z-order clusters BOTH
    assert max(z_part, z_supp) < s_supp    # strictly better on the 2nd dim


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        compact_small_files,
    )

    path = str(tmp_path / "frag")
    # 40 tiny files.
    spark.range(4000).selectExpr("id", "id % 7 AS k").repartition(40).write.parquet(
        path
    )
    import os

    def parquet_files():
        return [f for f in os.listdir(path) if f.endswith(".parquet")]

    assert len(parquet_files()) == 40
    before = spark.read.parquet(path)
    before_sum = before.agg({"id": "sum"}).collect()[0][0]
    n = compact_small_files(spark, path, target_file_bytes=10**9, sort_cols=["id"])
    assert n == 1 and len(parquet_files()) == 1
    after = spark.read.parquet(path)
    assert after.count() == 4000
    assert after.agg({"id": "sum"}).collect()[0][0] == before_sum


def test_compact_refuses_hive_partitioned_tree(spark, tmp_path):
    """A Hive-partitioned table must not be silently flattened: sizing is
    recursive (a flat listing would see 0 bytes) and the partitioned
    layout is refused with a clear error."""
    import pytest

    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        compact_small_files,
    )

    path = str(tmp_path / "parts")
    spark.range(100).selectExpr("id", "id % 3 AS k").write.partitionBy(
        "k"
    ).parquet(path)
    with pytest.raises(ValueError, match="partition subdirectories"):
        compact_small_files(spark, path, target_file_bytes=10**9)
    # the refused table is untouched
    assert spark.read.parquet(path).count() == 100


def test_optimize_table_compacts_and_prunes_both_dimensions(spark, tmp_path):
    """The OPTIMIZE ZORDER BY command (VERDICT r6 item 7c): rewrite a
    many-small-files table clustered on two independent columns and
    return MEASURED before/after zone-map scan metrics.  Claims pinned:
    (1) file count collapses to the size-derived target, (2) the content
    is byte-for-byte the same multiset of rows, (3) the central range
    probe touches FEWER files after on BOTH dimensions — the multi-dim
    pruning single-column sort cannot give, (4) no staging/aside residue."""
    from pathlib import Path

    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        optimize_table,
    )

    path = str(tmp_path / "t")
    # 40k rows, two independent uniform dims, written as 64 tiny files in
    # ingestion (id) order -> every file spans ~the full range of both.
    df = spark.range(40_000).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 100_000).cast("long").alias("u"),
        (F.col("id") * 40503 % 65_536 % 100_000).cast("long").alias("v"),
    )
    df.repartition(64).write.parquet(path)
    before_rows = {(r.id, r.u, r.v) for r in spark.read.parquet(path).collect()}

    # Off-center probe (70th-80th pct): a range straddling the exact
    # midpoint of the value domain crosses the TOP Morton-bit boundary of
    # every dimension at once — the one predicate position even a perfect
    # Z-layout cannot prune when the file count is small.
    report = optimize_table(
        spark, path, zorder_by=["u", "v"], target_file_bytes=32 * 1024,
        bits=8, probe_quantiles=(0.70, 0.80),
    )

    assert report["files_before"] == 64
    assert report["files_after"] < 64
    assert {(r.id, r.u, r.v) for r in spark.read.parquet(path).collect()} == (
        before_rows
    )
    for c in ("u", "v"):
        p = report["probes"][c]
        # Ingestion order: the central 10% range overlaps ~every file.
        assert p["files_scanned_before"] >= report["files_before"] * 3 // 4
        assert p["files_scanned_after"] < p["files_scanned_before"]
        assert p["rows_scanned_after"] < p["rows_scanned_before"]
    assert not Path(path + "__optimize_stage").exists()
    assert not Path(path + "__optimize_old").exists()


def test_optimize_table_refuses_hive_partitioned_tree(spark, tmp_path):
    import pytest

    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        optimize_table,
    )

    path = str(tmp_path / "pt")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    ).write.partitionBy("p").parquet(path)
    with pytest.raises(ValueError, match="partition"):
        optimize_table(spark, path, zorder_by=["id"])


def test_optimize_table_recovers_aside_on_entry(spark, tmp_path):
    """ADVICE r7: a crash between the two swap renames leaves the table
    path missing with only the __optimize_old aside.  The next
    optimize_table call must rename the aside back before proceeding
    (mirroring the streaming sinks' _recover_store) instead of failing
    on the missing path."""
    import os

    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        optimize_table,
    )

    path = str(tmp_path / "t")
    spark.range(10_000).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 1000).cast("long").alias("u"),
    ).repartition(8).write.parquet(path)
    rows = {(r.id, r.u) for r in spark.read.parquet(path).collect()}

    # Simulate the crash window: live dir renamed aside, swap-in never ran.
    os.rename(path, path + "__optimize_old")
    assert not os.path.exists(path)

    report = optimize_table(
        spark, path, zorder_by=["u"], target_file_bytes=64 * 1024
    )
    assert report["files_before"] == 8
    assert {(r.id, r.u) for r in spark.read.parquet(path).collect()} == rows
    assert not os.path.exists(path + "__optimize_old")


def test_optimize_table_rejects_non_numeric_zorder_column(spark, tmp_path):
    """ADVICE r7: probe construction assumed numeric bounds; a string (or
    date) zorder column must raise a clear TypeError, and an all-null
    column a ValueError — not an opaque float(None)/TypeError deep in
    probe math."""
    import pytest

    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        optimize_table,
    )

    path = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("s")
    ).write.parquet(path)
    with pytest.raises(TypeError, match="non-numeric"):
        optimize_table(spark, path, zorder_by=["s"])

    path2 = str(tmp_path / "t2")
    spark.range(100).select(
        F.col("id"), F.lit(None).cast("long").alias("n")
    ).write.parquet(path2)
    with pytest.raises(ValueError, match="all-null"):
        optimize_table(spark, path2, zorder_by=["n"])


def test_vacuum_residue_cleans_crash_siblings(spark, tmp_path):
    """vacuum_residue removes swap residue (staging, aside-with-live,
    sink .stage-/.old- siblings), reports reclaimed bytes, honors
    dry_run, and REFUSES to delete an aside when the live table is
    missing (that aside is the recovery artifact)."""
    import os

    import pytest

    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        vacuum_residue,
    )

    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.write.parquet(path)
    for sib in ("t__optimize_stage", "t__optimize_old", "t.stage-3", "t.old-7"):
        df.write.parquet(str(tmp_path / sib))
    # Unrelated sibling must survive.
    df.write.parquet(str(tmp_path / "t2"))

    # Default age guard: the just-written staging dirs may belong to an
    # in-flight _swap_in / OPTIMIZE rewrite, so they are skipped.
    guarded = vacuum_residue(spark, path, dry_run=True)
    assert guarded["skipped_recent"] == ["t.stage-3", "t__optimize_stage"]
    assert "t.stage-3" not in guarded["removed"]

    dry = vacuum_residue(spark, path, dry_run=True, min_stage_age_seconds=0.0)
    assert sorted(dry["removed"]) == [
        "t.old-7", "t.stage-3", "t__optimize_old", "t__optimize_stage",
    ]
    assert dry["bytes_reclaimed"] > 0
    assert os.path.exists(str(tmp_path / "t__optimize_old"))  # dry run

    rep = vacuum_residue(spark, path, min_stage_age_seconds=0.0)
    assert rep["removed"] == dry["removed"]
    for sib in rep["removed"]:
        assert not os.path.exists(str(tmp_path / sib))
    assert os.path.exists(path) and os.path.exists(str(tmp_path / "t2"))

    # Missing live dir + aside present -> refuse.
    df.write.parquet(str(tmp_path / "t__optimize_old"))
    import shutil

    shutil.rmtree(path)
    with pytest.raises(RuntimeError, match="recovery artifact"):
        vacuum_residue(spark, path)


def test_write_with_bloom_adds_filter_bytes_and_preserves_data(spark, tmp_path):
    """Bloom-filter writes must (1) round-trip the data exactly and
    (2) actually embed the filters — asserted as a strictly positive
    size overhead vs the plain twin of the same data and layout."""
    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        write_with_bloom,
    )

    df = spark.range(50_000).selectExpr(
        "id", "CAST(id * 2654435761 % 1000000 AS LONG) AS k"
    ).coalesce(2)
    path = str(tmp_path / "b")
    rep = write_with_bloom(df, path, ["k"], expected_ndv=50_000)
    assert rep["bloom_overhead_bytes"] > 0, rep
    got = spark.read.parquet(path)
    assert got.count() == 50_000
    assert got.selectExpr("sum(k)").collect()[0][0] == (
        df.selectExpr("sum(k)").collect()[0][0]
    )


def test_codec_size_audit_orders_and_verifies(spark, tmp_path):
    from anomaly_detection_in_time_series_data_spark.operators.layout import (
        codec_size_audit,
    )

    df = spark.range(20_000).selectExpr(
        "id", "concat('text-', id % 100) AS s"
    ).coalesce(1)
    rep = codec_size_audit(df, str(tmp_path / "c"))
    assert [r["codec"] for r in rep] == ["snappy", "zstd", "gzip"]
    assert all(r["rows"] == 20_000 for r in rep)
    assert all(r["bytes"] > 0 for r in rep)
    # zstd and gzip both beat snappy on this repetitive column
    assert rep[1]["bytes"] < rep[0]["bytes"]
    assert rep[2]["bytes"] < rep[0]["bytes"]
