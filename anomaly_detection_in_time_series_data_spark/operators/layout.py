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
