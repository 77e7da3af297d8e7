"""Schema-on-read ingestion (SURVEY.md §2.1 S1-S4 and §2.2 V1).

The reference reads JSONL.gz line-by-line into Python lists
(`Assignment_3.ipynb:52-66`) and walks a corpus directory per file
(`Assignment 4.py:168-194`); both become single declarative reads here —
gzip + line-JSON and recursive binaryFile are native Spark sources, so the
scans are distributed, pushdown-capable, and never materialize on the
driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, *, multiline: bool = False
) -> DataFrame:
    """S1: JSONL(.gz) scan with an explicit schema (never inference).

    Gzip decompression is transparent; `columnNameOfCorruptRecord` keeps
    malformed lines as rows with a `_corrupt` payload instead of failing the
    job (the tolerant semantics of the reference's validator, V1).
    """
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt", T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("multiLine", multiline)
        .json(path)
    )


def with_validation_flags(
    df: DataFrame, required: list[str], checks: dict[str, F.Column] | None = None
) -> DataFrame:
    """V1: JSON-Schema-style validation as flag columns (tolerant — flag,
    never drop; the reference printed-and-continued,
    `Assignment_3.ipynb:262-277`, though it validated the wrong record — a
    bug we do not copy).

    ``valid`` is true when every required field is non-null, the row wasn't
    corrupt, and every extra named check passes.
    """
    cond = F.lit(True)
    if "_corrupt" in df.columns:
        cond = cond & F.col("_corrupt").isNull()
    for field in required:
        cond = cond & F.col(field).isNotNull()
    for _, check in (checks or {}).items():
        cond = cond & check
    out = df.withColumn("valid", cond)
    if checks:
        for name, check in checks.items():
            out = out.withColumn(f"valid_{name}", check)
    return out


def read_file_corpus(spark: SparkSession, root: str, pattern: str = "*") -> DataFrame:
    """S3: recursive file-corpus scan — one row per file with raw bytes.

    Replaces the reference's driver-side ``os.walk`` loop
    (`Assignment 4.py:168-194`): `binaryFile` is a distributed source, and
    the reference's derived identifiers (relative-path id, root-folder
    username) come from `input_file_name()` via regexp — all JVM-side.
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", pattern)
        .load(root)
    )
    root_clean = root.rstrip("/")
    rel = F.regexp_replace(F.col("path"), f"^file:{root_clean}/", "")
    return df.select(
        F.col("path"),
        rel.alias("id"),
        F.split(rel, "/").getItem(0).alias("username"),
        F.col("content"),
        F.col("length"),
    )


def decode_text(df: DataFrame, content_col: str = "content") -> DataFrame:
    """S4: charset-sniffing decode of raw bytes to text.

    The reference tries utf-8 then falls back to chardet
    (`Assignment 4.py:104-122`). chardet isn't available here; we decode
    utf-8 with replacement after trying strict utf-8 then latin-1 — total
    (never throws), which is the property the reference's pipeline lacked.
    Uses an Arrow-batched pandas UDF (decoding is genuinely Python work).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _decode(content: pd.Series) -> pd.Series:
        def one(b: bytes | None) -> str | None:
            if b is None:
                return None
            for enc in ("utf-8", "latin-1"):
                try:
                    return bytes(b).decode(enc)
                except (UnicodeDecodeError, ValueError):
                    continue
            return bytes(b).decode("utf-8", errors="replace")

        return content.map(one)

    return df.withColumn("original_msg", _decode(F.col(content_col)))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV scan with an explicit schema (schema-on-read policy, SURVEY §1.3:
    never inference in production paths — inference costs an extra full
    pass and can flip types between runs). Malformed lines land in
    ``_corrupt`` (PERMISSIVE), mirroring ``read_jsonl``."""
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt", T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet (schema from the file footer,
    predicate pushdown + column pruning native)."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str = "row",
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML scan (Spark 4 native, the spark-xml lineage upstreamed): one
    DataFrame row per ``row_tag`` element. Explicit schema preferred (same
    schema-on-read policy as CSV/JSONL); without one Spark samples the
    files for inference. XML rounds out the interchange formats next to
    CSV — like CSV it is a row-tag text format with no pushdown/pruning,
    so it stays an EDGE format: land it, convert to parquet/ORC, query
    those."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
