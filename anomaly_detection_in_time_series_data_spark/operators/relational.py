"""Relational operator family (SURVEY.md §2.2-2.6) as DataFrame functions.

Everything here is built-in Catalyst expressions — no UDFs. Each function
cites the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def flatten_structs(df: DataFrame, struct_cols: list[str]) -> DataFrame:
    """Hoist struct children as ``{parent}_{child}`` flat columns.

    Reference: ``flatten_record`` (week7 PDF cell [3]) hoists
    ``airline/src_airport/dst_airport`` children and passes scalars through.
    Spark-native: one ``select`` — pure projection, zero shuffle, column
    pruning still reaches the scan.
    """
    cols: list[Column] = []
    for field in df.schema.fields:
        if field.name in struct_cols:
            for child in field.dataType.fieldNames():  # type: ignore[union-attr]
                cols.append(F.col(f"{field.name}.{child}").alias(f"{field.name}_{child}"))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def composite_key(*cols: str) -> Column:
    """String-concat composite key (week7 PDF: ``src_iata+dst_iata+airline_iata``)."""
    return F.concat(*[F.col(c) for c in cols])


def sha2_bucket(col: Column | str, buckets_hex_chars: int = 1) -> Column:
    """First hex char(s) of sha256 — the reference's 16-way hash partition key.

    Reference: ``hashlib.sha256(str(key).encode()).hexdigest()[0]`` (week7 PDF
    cells [40-41]). Spark built-in ``sha2`` computes the *identical* digest, so
    layouts are byte-compatible.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.sha2(c.cast("string"), 256), 1, buckets_hex_chars)


def alpha_range_label(col: Column | str, ranges: list[tuple[str, str, str]]) -> Column:
    """Map the first character of a key to a named alphabet range.

    Reference: ``get_key`` matches the first char against 16 ``(lo, hi)``
    ranges (week7 PDF cells [4],[10]). Expressed as a folded CASE WHEN —
    after constant folding this is a single codegen'd expression; for a
    dynamic range table use a broadcast BETWEEN join instead
    (``range_dim_join``).
    """
    c = F.upper(F.substring(F.col(col) if isinstance(col, str) else col, 1, 1))
    expr = F.lit(None).cast("string")
    # Build CASE from the last range backwards.
    for lo, hi, label in reversed(ranges):
        expr = F.when((c >= lo) & (c <= hi), F.lit(label)).otherwise(expr)
    return expr


def range_dim_join(df: DataFrame, dim: DataFrame, key_col: str) -> DataFrame:
    """Broadcast theta-join against a (lo, hi, label) range-dimension table.

    The dynamic-dimension variant of ``alpha_range_label`` (SURVEY §2.3 J1):
    a BETWEEN join against a tiny dim is always broadcast — no shuffle of the
    fact side at any scale.
    """
    c = F.upper(F.substring(F.col(key_col), 1, 1))
    return df.join(
        F.broadcast(dim),
        (c >= dim["lo"]) & (c <= dim["hi"]),
        "left",
    )


def nearest_center_label(
    df: DataFrame,
    centers: list[tuple[str, float, float]],
    lat_col: str,
    lon_col: str,
) -> DataFrame:
    """Tag each row with the nearest of a few fixed centers (week7 cell [104]).

    The reference's ``determine_location`` crashed (``KeyError: 'a'`` — it
    passed dict keys as geohashes); ours is a folded ``least()`` expression
    over squared-euclidean distances — constant-folded, no join, no shuffle.
    For large center sets use a broadcast cross join + ``min_by`` instead.
    """
    dists = [
        (
            (F.col(lat_col) - F.lit(lat)) ** 2 + (F.col(lon_col) - F.lit(lon)) ** 2
        ).alias(f"_d_{name}")
        for name, lat, lon in centers
    ]
    with_d = df.select("*", *dists)
    best = F.least(*[F.col(f"_d_{name}") for name, _, _ in centers])
    label = F.lit(None).cast("string")
    for name, _, _ in reversed(centers):
        label = F.when(F.col(f"_d_{name}") == best, F.lit(name)).otherwise(label)
    return with_d.withColumn("location", label).drop(
        *[f"_d_{name}" for name, _, _ in centers]
    )


def argmin_by(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Deterministic per-group argmin via row_number (SURVEY §2.4 A4, §2.5 O2).

    The reference's running-min loop has a first-record bug
    (`Assignment_3.ipynb:700-712`); we use an explicit total order
    (``order_cols`` must end with a unique tiebreaker) so results are
    reproducible under any physical plan.
    """
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k with deterministic tie-breaking: ``orderBy().limit(k)``.

    Catalyst plans this as TakeOrderedAndProject — per-partition heap then a
    single k-row merge on the driver; no global sort at any scale.
    """
    return df.orderBy(*order_cols).limit(k)
