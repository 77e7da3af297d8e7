"""Partition-layout-preserving writers (SURVEY.md §2.1 W1-W3, §4).

The reference's three physical-design layouts — Hive-style range/hash
partition dirs (week7 PDF cells [36],[43],[104]), and the 3-level geohash
"geoindex" shard tree (`Assignment_3.ipynb:646-651`, golden output
`results/geoindex/**`) — are all ``write.partitionBy`` layouts here, which
makes partition *pruning* on them free at read time (Catalyst partition
discovery + pruning; no custom rule, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geohash as gh
from ..operators.relational import alpha_range_label, sha2_bucket


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """W1: plain parquet write (snappy, columnar — the default)."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """W2: Hive-partitioned parquet write — identical dir layout to the
    reference's ``to_parquet(partition_cols=...)`` (`kv_key=A/`, ...)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def with_partition_keys(
    df: DataFrame,
    key_col: str,
    *,
    ranges=None,
) -> DataFrame:
    """Derive the week7 partition-key trio on one pass: ``kv_key`` (alphabet
    range), ``hash_key`` (sha256 first hex char — byte-identical to the
    reference's hashlib use, F4)."""
    from ..queries import _ALPHA_RANGES

    return df.withColumn(
        "kv_key", alpha_range_label(key_col, ranges or _ALPHA_RANGES)
    ).withColumn("hash_key", sha2_bucket(key_col))


def write_geoindex(
    df: DataFrame,
    path: str,
    lat_col: str,
    lon_col: str,
    mode: str = "overwrite",
) -> None:
    """W3: geohash-sharded compressed JSON tree.

    Reference layout: ``results/geoindex/{g[0]}/{g[:2]}/{g[:3]}.jsonl.gz``
    (2,413 shards / 67,180 records). Spark-native equivalent: Hive dirs
    ``g1=<c>/g2=<cc>/g3=<ccc>/part-*.json.gz`` — same 3-level prefix tree,
    same pruning power (a probe with geohash prefix 'bcd' reads exactly one
    directory), produced in one distributed write instead of a driver loop.

    Rows with null/invalid coordinates are excluded, matching the
    reference's guard — but by explicit ``isNotNull`` (its falsy-zero skip
    of legitimate 0.0 coordinates is a documented bug we don't copy,
    SURVEY §2 P6).
    """
    encoded = (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .withColumn("geohash", gh.encode_udf(F.col(lat_col), F.col(lon_col)))
        .withColumn("g1", F.substring("geohash", 1, 1))
        .withColumn("g2", F.substring("geohash", 1, 2))
        .withColumn("g3", F.substring("geohash", 1, 3))
    )
    (
        encoded.write.mode(mode)
        .partitionBy("g1", "g2", "g3")
        .option("compression", "gzip")
        # The reference tree caps shards at 1,024 records (BASELINE.md);
        # maxRecordsPerFile reproduces the cap per part file.
        .option("maxRecordsPerFile", 1024)
        .json(path)
    )


def nearest_in_geoindex(
    spark: SparkSession,
    index_path: str,
    lat: float,
    lon: float,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> dict | None:
    """J3 with index awareness: nearest record to (lat, lon) using geohash
    prefix pruning over the W3 layout.

    The reference full-scans all 67k records per probe despite having built
    the geoindex (`Assignment_3.ipynb:692-720` — SURVEY §4 'anti-evidence').
    Here the probe's geohash prefix prunes to the probe cell PLUS its 8
    neighbors at each of the g3/g2/g1 levels — partition pruning on the
    Hive layout, visible as PartitionFilters in the scan. The search widens
    to the next level when the neighborhood is empty OR when the best
    candidate's haversine distance exceeds the minimum distance from the
    probe to the pruned region's outer boundary
    (``gh.min_distance_to_region_boundary``) — a nearer record could
    otherwise hide in an unscanned cell just across the region edge. The
    final distance is exact haversine, JVM-side.
    """
    probe = gh.encode(lat, lon, 12)
    df = spark.read.json(index_path)
    levels: list[tuple[str | None, list[str] | None, float]] = []
    for k, col in ((3, "g3"), (2, "g2"), (1, "g1")):
        cell = probe[:k]
        bound = gh.min_distance_to_region_boundary(lat, lon, cell)
        levels.append((col, [cell] + gh.neighbors(cell), bound))
    levels.append((None, None, float("inf")))
    for prefix_col, cells, bound in levels:
        cand = df if prefix_col is None else df.filter(F.col(prefix_col).isin(cells))
        scored = cand.withColumn(
            "_dist",
            gh.haversine_expr(
                F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon)
            ),
        )
        rows = scored.orderBy("_dist").limit(1).collect()
        # Accept only a candidate provably nearest: closer than any point
        # outside the scanned 3x3 region.  Otherwise widen a level.
        if rows and rows[0]["_dist"] <= bound:
            return rows[0].asDict()
    return None


def write_csv(
    df: DataFrame, path: str, *, mode: str = "overwrite", header: bool = True
) -> None:
    """CSV write (interchange format — no pushdown/pruning on re-read;
    parquet/ORC remain the engine-native rest formats)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC write — second columnar rest format; same partitionBy/codec
    surface as parquet."""
    df.write.mode(mode).orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    root_tag: str = "rows",
    row_tag: str = "row",
) -> None:
    """XML write (Spark 4 native) — interchange/edge format only; nested
    structs/arrays serialize as nested elements."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rootTag", root_tag)
        .option("rowTag", row_tag)
        .save(path)
    )
