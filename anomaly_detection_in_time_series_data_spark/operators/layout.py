"""Multi-dimensional data layout: Z-order (Morton) clustering.

A single-column sort clusters parquet min/max statistics on that column
only — a filter on any OTHER column still reads every file. Z-ordering
interleaves the bits of several (bucketized) columns so files are
clustered in ALL of them at once; row-group/file skipping then works for
filters on any participating column.

Bucketization here is equal-width over the observed min/max
(``width_bucket`` — JVM expression, no UDF), which matches roughly
uniform keys; for heavily skewed columns substitute rank buckets
(repartitionByRange ids) before interleaving — the interleave step is
identical. The min/max bounds are a 2-value-per-column aggregate: at any
scale that is a tiny driver-side collect, computed once per write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fs_parquet_bytes(spark, path: str) -> int:
    """Total bytes of ``*.parquet`` files under ``path``, measured through
    the Hadoop FileSystem API so the number is correct for ANY scheme the
    write went to (hdfs://, s3a://, file:). A local ``glob`` here would
    silently report 0 for remote paths — size audits would then claim a
    100 TB table costs nothing."""
    jvm_path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = 0
    it = fs.listFiles(jvm_path, True)
    while it.hasNext():
        s = it.next()
        if s.getPath().getName().endswith(".parquet"):
            total += s.getLen()
    return total


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each integer column
    (column j contributes bit i to output position i*len(cols)+j) —
    a pure bitwise JVM expression chain, fully codegen'd."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def with_zorder(
    df: DataFrame, cols: list[str], *, bits: int = 8, out_col: str = "_zorder"
) -> DataFrame:
    """Add a Morton key over ``cols`` (equal-width bucketized to
    ``2**bits`` cells per dimension using the observed min/max)."""
    bounds = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    cells = 2**bits
    bucketed = []
    for c in cols:
        lo, hi = float(bounds[f"_min_{c}"]), float(bounds[f"_max_{c}"])
        # width_bucket returns 1..cells inside [lo, hi); clamp the max value
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(cells))
        bucketed.append(F.least(b - 1, F.lit(cells - 1)).cast("long"))
    return df.withColumn(out_col, interleave_bits(bucketed, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Write ``df`` parquet clustered by the Z-order of ``cols``: range
    partition on the Morton key (so each file owns a contiguous Z range)
    and sort within partitions (so row groups inside a file are clustered
    too). Readers then skip files/row groups on min-max stats for filters
    on ANY of ``cols``."""
    (
        with_zorder(df, cols, bits=bits)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction — the table-maintenance pass every long-lived
    100 TB dataset needs (streaming sinks and fine-grained partitionBy
    writes accrete kilobyte files; scans then pay an open/footer cost per
    file and lose row-group skipping).

    Rewrites ``path`` in place with file count = ceil(bytes/target): sizes
    come from the filesystem (no data pass), the rewrite is one
    repartition — range-partitioned over ``sort_cols`` when given (keeps
    min/max clustering; pair with ``with_zorder`` for multi-dim layouts),
    hash otherwise. Returns the new file count. The temp-dir swap keeps
    the window of inconsistency to a rename; table formats with atomic
    commits (Iceberg/Delta) replace the swap, not the strategy.
    """
    import math

    jvm_path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    # Recursive listing: on a Hive-partitioned tree the parquet files live
    # in partition SUBDIRS — a flat listStatus would size the table at 0
    # bytes and collapse it to one file.  Partitioned layouts are refused
    # outright: a flat rewrite would silently flatten the partition dirs
    # (re-partitioning maintenance belongs to a partition-aware pass).
    total = 0
    it = fs.listFiles(jvm_path, True)
    while it.hasNext():
        s = it.next()
        p = s.getPath()
        if p.getName().endswith(".parquet"):
            if "=" in p.getParent().getName():
                raise ValueError(
                    f"compact_small_files: {path} contains Hive partition "
                    "subdirectories; compacting would flatten the layout — "
                    "compact each partition directory instead"
                )
            total += s.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
    else:
        df = df.repartition(n_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    df.write.mode("overwrite").parquet(tmp)
    fs.delete(jvm_path, True)
    fs.rename(spark.sparkContext._jvm.org.apache.hadoop.fs.Path(tmp), jvm_path)
    return n_files


def zone_map_stats(
    spark, path: str, cols: list[str]
) -> "list[dict]":
    """Measure the table's REAL zone maps: per parquet file, the min/max of
    each of ``cols`` plus the row count, keyed by ``input_file_name()``.
    One column-pruned scan (only ``cols`` are read); the result is
    file-count-sized — the same metadata a lakehouse reader gets from
    parquet footers, here measured engine-side so the audit has no
    footer-parsing dependency."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    rows = (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .collect()
    )
    return [r.asDict() for r in rows]


def _scan_fraction(stats: "list[dict]", col: str, lo, hi) -> "tuple[int, int]":
    """(files_scanned, rows_scanned) for a ``col >= lo AND col < hi``
    predicate under min/max skipping: a file is touched iff its zone
    overlaps the half-open range."""
    files = rows = 0
    for s in stats:
        mn, mx = s[f"min_{col}"], s[f"max_{col}"]
        if mn is None or mx is None:
            continue
        if mx >= lo and mn < hi:
            files += 1
            rows += s["n_rows"]
    return files, rows


def optimize_table(
    spark,
    path: str,
    *,
    zorder_by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 8,
    probe_quantiles: "tuple[float, float]" = (0.45, 0.55),
) -> dict:
    """``OPTIMIZE <table> ZORDER BY (cols)`` — the table-maintenance pass
    that graduates ``with_zorder``/``write_zordered`` from a layout
    primitive into an operational command (Delta/Iceberg OPTIMIZE): it
    rewrites ``path`` in place, compacted to ``ceil(bytes/target)`` files
    and clustered on the Morton interleave of ``zorder_by``, and returns
    MEASURED before/after scan metrics so the caller sees exactly what
    the rewrite bought.

    The report probes each ``zorder_by`` column with a central
    ``probe_quantiles`` range predicate (default: the middle 10% of the
    observed value range) against the REAL per-file zone maps
    (``zone_map_stats``) — files/rows a min-max-skipping reader would
    touch before vs after.  A single-column sort would ace its own column
    and do nothing for the others; the Z-order layout prunes on EVERY
    participating column, which is the quantitative claim
    `zone_map_skipping_audit` simulates and this operator realizes.

    Crash-safe swap: the staging dir is renamed in only after the live
    dir is renamed ASIDE (same no-zero-copies discipline as the
    streaming sinks' ``_swap_in``).  Every rename's boolean return is
    checked — Hadoop ``FileSystem.rename`` reports failure by returning
    false, not by throwing, and an unchecked false on the aside rename
    would let the staging rename move staging INTO the still-live
    directory (local-FS rename-onto-existing-dir semantics).  On a
    failed swap-in the aside copy is restored so the table is never
    lost; on entry, a crash between the two renames (path missing,
    ``__optimize_old`` present) is recovered by renaming the aside back
    before proceeding — mirroring the sinks' ``_recover_store``.

    Scale: the rewrite is one range-shuffle over the Morton key (the same
    shuffle OPTIMIZE pays on any engine); metrics are two column-pruned
    aggregates sized by file count.  On a 100 TB table, run per
    partition: the operator takes the directory it is pointed at.
    """
    import math

    jvm = spark.sparkContext._jvm
    jvm_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())

    # Recovery from a prior crash between the two swap renames: the live
    # dir is missing and only the __optimize_old aside exists.  Restore
    # the aside before doing anything else (same discipline as the
    # streaming sinks' _recover_store).
    old_path = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__optimize_old")
    if not fs.exists(jvm_path) and fs.exists(old_path):
        if not fs.rename(old_path, jvm_path):
            raise IOError(
                f"optimize_table: recovery rename {old_path} -> {path} "
                "failed; table left as-is for manual inspection"
            )

    total_bytes = 0
    n_before = 0
    it = fs.listFiles(jvm_path, True)
    while it.hasNext():
        s = it.next()
        p = s.getPath()
        if p.getName().endswith(".parquet"):
            if "=" in p.getParent().getName():
                raise ValueError(
                    f"optimize_table: {path} contains Hive partition "
                    "subdirectories; optimize each partition directory "
                    "instead (a flat rewrite would flatten the layout)"
                )
            total_bytes += s.getLen()
            n_before += 1
    before = zone_map_stats(spark, path, zorder_by)

    # Probe ranges from the observed global bounds (quantile-positioned).
    df = spark.read.parquet(path)
    bounds = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in zorder_by],
        *[F.max(c).alias(f"_max_{c}") for c in zorder_by],
    ).collect()[0]
    qlo, qhi = probe_quantiles
    probes = {}
    for c in zorder_by:
        lo, hi = bounds[f"_min_{c}"], bounds[f"_max_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"optimize_table: zorder column {c!r} is empty or all-null "
                f"in {path!r}; cannot position probe ranges"
            )
        if not isinstance(lo, (int, float)) or isinstance(lo, bool):
            raise TypeError(
                f"optimize_table: zorder column {c!r} has non-numeric type "
                f"{type(lo).__name__}; zorder_by currently supports numeric "
                "columns only (encode dates/timestamps to epoch days/micros "
                "first)"
            )
        span = float(hi) - float(lo)
        probes[c] = (
            type(lo)(float(lo) + qlo * span),
            type(hi)(float(lo) + qhi * span),
        )

    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    staging = path.rstrip("/") + "__optimize_stage"
    (
        with_zorder(df, zorder_by, bits=bits)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(staging)
    )
    staging_path = jvm.org.apache.hadoop.fs.Path(staging)
    fs.delete(old_path, True)
    if fs.exists(jvm_path):
        if not fs.rename(jvm_path, old_path):
            fs.delete(staging_path, True)
            raise IOError(
                f"optimize_table: aside rename {path} -> {old_path} failed; "
                "original table left intact, staging discarded"
            )
    if not fs.rename(staging_path, jvm_path):
        # Restore the aside copy so the table is never left missing.
        if fs.exists(old_path) and not fs.rename(old_path, jvm_path):
            raise IOError(
                f"optimize_table: swap-in failed AND restore of {old_path} "
                f"failed; recover manually by renaming it back to {path}"
            )
        fs.delete(staging_path, True)
        raise IOError(
            f"optimize_table: swap-in rename {staging} -> {path} failed; "
            "previous layout restored, staging discarded"
        )
    fs.delete(old_path, True)

    after = zone_map_stats(spark, path, zorder_by)
    report: dict = {
        "path": path,
        "zorder_by": list(zorder_by),
        "files_before": n_before,
        "files_after": len(after),
        "bytes_before": total_bytes,
        "probes": {},
    }
    for c in zorder_by:
        lo, hi = probes[c]
        fb, rb = _scan_fraction(before, c, lo, hi)
        fa, ra = _scan_fraction(after, c, lo, hi)
        report["probes"][c] = {
            "range": (lo, hi),
            "files_scanned_before": fb,
            "files_scanned_after": fa,
            "rows_scanned_before": rb,
            "rows_scanned_after": ra,
        }
    return report


def vacuum_residue(
    spark,
    path: str,
    *,
    dry_run: bool = False,
    min_stage_age_seconds: float = 600.0,
) -> dict:
    """``VACUUM``-style cleanup of crash residue beside a table — the
    operational complement of ``optimize_table``'s and the streaming
    sinks' rename-aside swap discipline.  Both leave deterministic
    sibling names behind when a job dies mid-swap:

    - ``{path}__optimize_stage`` — an OPTIMIZE rewrite that never swapped
      in (always safe to delete: the live table was untouched);
    - ``{path}__optimize_old`` / ``{path}.old-<n>`` — the renamed-aside
      previous layout (residue ONLY while the live table exists);
    - ``{path}.stage-<n>`` — a foreachBatch store staging dir.

    Safety rule: when the live table directory is MISSING, an aside copy
    is not residue — it is the recovery artifact ``optimize_table`` /
    ``_recover_store`` would rename back — so vacuum REFUSES to run
    rather than deleting the only copy of the data.

    Concurrency rule: a staging dir (``.stage-<n>`` or
    ``__optimize_stage``) younger than ``min_stage_age_seconds``
    (default 10 min) may belong to an IN-FLIGHT foreachBatch
    ``_swap_in`` or OPTIMIZE rewrite — deleting it would fail that
    commit — so recent stage dirs are skipped (reported under
    ``"skipped_recent"``) and only stale ones are reclaimed.  Prefer not
    running vacuum at all against a store with an active streaming
    query; the age guard is the backstop, not the policy.

    Returns ``{"removed": [...], "bytes_reclaimed": n}`` (with
    ``dry_run=True`` nothing is deleted and the same report is returned).

    Scale: one parent-directory listing plus per-residue recursive
    deletes — metadata-only, no data scan."""
    jvm = spark.sparkContext._jvm
    jvm_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())

    base = path.rstrip("/")
    name = base.rsplit("/", 1)[-1]
    parent = jvm_path.getParent()

    import re

    aside_pat = re.compile(
        re.escape(name) + r"(__optimize_old|\.old-\d+)$"
    )
    stage_pat = re.compile(
        re.escape(name) + r"(__optimize_stage|\.stage-\d+)$"
    )

    # "Now" must come from the FILESYSTEM's clock domain, not the
    # driver's: on a remote FS (hdfs://, s3a://) with clock skew greater
    # than min_stage_age_seconds, a driver-clock compare can classify a
    # just-created staging dir as stale and delete it mid-commit — the
    # exact failure this guard exists to prevent.  Write-and-stat a probe
    # file beside the table so age is mtime-vs-mtime on the same clock;
    # fall back to the driver clock (documented skew assumption) only if
    # the probe cannot be written (e.g. read-only mount + dry_run).
    import time as _time

    now_ms = None
    probe = jvm.org.apache.hadoop.fs.Path(
        parent, f"._vacuum_probe_{int(_time.time() * 1e6)}"
    )
    try:
        fs.create(probe, True).close()
        now_ms = float(fs.getFileStatus(probe).getModificationTime())
    except Exception:
        pass
    finally:
        try:
            fs.delete(probe, False)
        except Exception:
            pass
    if now_ms is None:
        now_ms = _time.time() * 1000.0
    residue, skipped_recent = [], []
    for st in fs.listStatus(parent):
        n = st.getPath().getName()
        if stage_pat.match(n):
            age_s = (now_ms - st.getModificationTime()) / 1000.0
            if age_s < min_stage_age_seconds:
                skipped_recent.append(n)
                continue
            residue.append((n, st.getPath()))
        elif aside_pat.match(n):
            residue.append((n, st.getPath()))

    has_aside = any(aside_pat.match(n) for n, _ in residue)
    if has_aside and not fs.exists(jvm_path):
        raise RuntimeError(
            f"vacuum_residue: {path} is missing but an aside copy exists — "
            "that aside is the recovery artifact, not residue; run "
            "optimize_table/_recover_store recovery (rename it back) "
            "instead of vacuuming"
        )

    removed, reclaimed = [], 0
    for n, p in sorted(residue):
        summary = fs.getContentSummary(p)
        reclaimed += summary.getLength()
        if not dry_run:
            fs.delete(p, True)
        removed.append(n)
    return {
        "removed": removed,
        "bytes_reclaimed": reclaimed,
        "skipped_recent": sorted(skipped_recent),
    }


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: "list[str]",
    *,
    expected_ndv: int = 100_000,
) -> dict:
    """Write parquet with PER-COLUMN BLOOM FILTERS — the point-lookup
    complement of zone maps: min/max skipping (``zone_map_stats``)
    prunes RANGE predicates but is useless for ``key = x`` on a column
    the file is not sorted by; a parquet bloom filter answers
    "definitely absent" per row group for equality probes at ~1 byte
    per distinct value.  Uses the writer-side options the Spark parquet
    datasource already supports (``parquet.bloom.filter.enabled#col``),
    so readers (Spark, Trino, Impala) skip row groups with zero code
    changes.

    Returns ``{"bytes": n, "bytes_plain": m, "bloom_overhead_bytes":
    n - m}`` — the plain twin is written to a temp sibling and deleted;
    the measured overhead makes the space-for-skips trade visible the
    same way ``optimize_table`` measures its probe improvements.

    Scale: bloom filters are built streaming at write time (no extra
    pass); size them with ``expected_ndv`` per column — oversizing
    wastes the overhead, undersizing inflates the false-positive rate
    toward never-skipping."""
    import shutil as _sh
    import tempfile

    w = df.write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    w.parquet(path)

    tmp = tempfile.mkdtemp(prefix="adts_bloom_plain_")
    try:
        df.write.mode("overwrite").parquet(f"{tmp}/plain")
        spark = df.sparkSession
        n = _fs_parquet_bytes(spark, path)
        m = _fs_parquet_bytes(spark, f"{tmp}/plain")
        return {"bytes": n, "bytes_plain": m, "bloom_overhead_bytes": n - m}
    finally:
        _sh.rmtree(tmp, ignore_errors=True)


def codec_size_audit(
    df: DataFrame, base_path: str, codecs: "tuple[str, ...]" = (
        "snappy", "zstd", "gzip",
    )
) -> "list[dict]":
    """Storage-codec shootout for a representative sample of a table —
    the decision input for the 100 TB storage bill: write the SAME
    DataFrame under each parquet codec, report bytes + ratio vs the
    first codec, and verify row-count integrity of every variant.
    Spark's parquet codecs are JVM-side (no Python snappy/zstd needed).

    At scale this runs on a sampled partition, never the full table —
    compression ratios are stable under sampling while the write cost
    is not."""
    out = []
    base = None
    spark = df.sparkSession
    for codec in codecs:
        p = f"{base_path.rstrip('/')}_{codec}"
        df.write.mode("overwrite").option("compression", codec).parquet(p)
        n = _fs_parquet_bytes(spark, p)
        rows = spark.read.parquet(p).count()
        if base is None:
            base = n
        out.append(
            {
                "codec": codec,
                "bytes": n,
                "ratio_vs_first_pct": round(100 * n / base, 1),
                "rows": rows,
            }
        )
    return out
