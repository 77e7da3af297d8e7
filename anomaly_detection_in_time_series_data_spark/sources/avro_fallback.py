"""W4: Avro write/read without the spark-avro jar (SURVEY.md §7 'Avro
offline' mitigation).

The reference's own Avro write produced zero records — both committed files
are header-only because its schema declared lat/lon as ``long`` while the
data was float (`Assignment_3.ipynb:286-456`; BASELINE.md). This module is
the engine's fenced fallback: a minimal, spec-correct Avro Object Container
File codec (null codec) implemented from the public Avro 1.11 spec —
zigzag-varint binary encoding, OCF magic/metadata/sync framing.

Preferred path is still ``df.write.format('avro')`` when the jar is present
(``write_avro`` tries it first). The fallback writes one ``part-N.avro``
per Spark partition via ``foreachPartition`` — distributed, no driver
collect; supported types cover the engine's canonical schemas: null bool
int long float double string bytes, nullable unions, arrays, and nested
records.
"""

from __future__ import annotations

import io
import json
import os
import struct

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"


# --- schema conversion ------------------------------------------------------


def spark_to_avro_schema(schema: T.StructType, name: str = "Record") -> dict:
    def field_type(dt: T.DataType, fname: str):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.IntegerType | T.ShortType | T.ByteType):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": field_type(dt.elementType, fname)}
        if isinstance(dt, T.StructType):
            return spark_to_avro_schema(dt, f"{name}_{fname}")
        raise TypeError(f"unsupported Spark type for Avro fallback: {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": ["null", field_type(f.dataType, f.name)]
                if f.nullable
                else field_type(f.dataType, f.name),
            }
            for f in schema.fields
        ],
    }


# --- binary encoding (Avro spec) -------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & ((1 << 64) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _write_value(buf: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):  # union — engine only emits ["null", X]
        if value is None:
            _write_long(buf, schema.index("null"))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        _write_long(buf, idx)
        _write_value(buf, schema[idx], value)
        return
    if isinstance(schema, dict):
        if schema["type"] == "record":
            for f in schema["fields"]:
                _write_value(buf, f["type"], _get_field(value, f["name"]))
            return
        if schema["type"] == "array":
            value = list(value or [])
            if value:
                _write_long(buf, len(value))
                for v in value:
                    _write_value(buf, schema["items"], v)
            _write_long(buf, 0)
            return
        raise TypeError(f"unsupported avro complex type {schema['type']}")
    if schema == "null":
        return
    if schema == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif schema in ("int", "long"):
        _write_long(buf, int(value))
    elif schema == "float":
        buf.write(struct.pack("<f", float(value)))
    elif schema == "double":
        buf.write(struct.pack("<d", float(value)))
    elif schema == "string":
        raw = str(value).encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
    elif schema == "bytes":
        raw = bytes(value)
        _write_long(buf, len(raw))
        buf.write(raw)
    else:
        raise TypeError(f"unsupported avro type {schema}")


def _get_field(value, name: str):
    if isinstance(value, Row):
        return value[name]
    if isinstance(value, dict):
        return value.get(name)
    return getattr(value, name)


class _Reader:
    def __init__(self, data: bytes):
        self.buf = memoryview(data)
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_value(self, schema):
        if isinstance(schema, list):
            idx = self.read_long()
            return self.read_value(schema[idx])
        if isinstance(schema, dict):
            if schema["type"] == "record":
                return {
                    f["name"]: self.read_value(f["type"]) for f in schema["fields"]
                }
            if schema["type"] == "array":
                out = []
                while True:
                    n = self.read_long()
                    if n == 0:
                        break
                    if n < 0:  # block with byte size prefix
                        self.read_long()
                        n = -n
                    for _ in range(n):
                        out.append(self.read_value(schema["items"]))
                return out
            raise TypeError(schema["type"])
        if schema == "null":
            return None
        if schema == "boolean":
            return self.read(1) == b"\x01"
        if schema in ("int", "long"):
            return self.read_long()
        if schema == "float":
            return struct.unpack("<f", self.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", self.read(8))[0]
        if schema == "string":
            return self.read(self.read_long()).decode("utf-8")
        if schema == "bytes":
            return self.read(self.read_long())
        raise TypeError(schema)


def _encode_container(records, avro_schema: dict) -> bytes:
    """One Avro OCF: header (magic, metadata map, sync) + one data block."""
    header = io.BytesIO()
    header.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": b"null",
    }
    _write_long(header, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(header, len(kb))
        header.write(kb)
        _write_long(header, len(v))
        header.write(v)
    _write_long(header, 0)
    header.write(SYNC)
    block = io.BytesIO()
    n = 0
    for rec in records:
        _write_value(block, avro_schema, rec)
        n += 1
    body = io.BytesIO()
    if n:
        _write_long(body, n)
        _write_long(body, len(block.getvalue()))
        body.write(block.getvalue())
        body.write(SYNC)
    return header.getvalue() + body.getvalue()


# --- public API -------------------------------------------------------------


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Write ``df`` as Avro: spark-avro if the jar is loaded, else the
    fenced pure-Python OCF fallback (one file per partition). Returns
    "spark-avro" or "fallback"."""
    try:
        df.write.format("avro").mode(mode).save(path)
        return "spark-avro"
    except Exception:  # noqa: BLE001 — jar missing; engage fallback
        pass
    avro_schema = spark_to_avro_schema(df.schema)
    os.makedirs(path, exist_ok=True)

    def write_partition_factory(out_dir: str, schema_json: str):
        schema_obj = json.loads(schema_json)

        def write_partition(idx_rows):
            idx, rows = idx_rows
            data = _encode_container(rows, schema_obj)
            with open(os.path.join(out_dir, f"part-{idx:05d}.avro"), "wb") as f:
                f.write(data)
            return []

        return write_partition

    fn = write_partition_factory(path, json.dumps(avro_schema))
    df.rdd.mapPartitionsWithIndex(
        lambda idx, rows: fn((idx, rows))
    ).count()
    return "fallback"


def avro_to_spark_schema(avro_schema: dict) -> T.StructType:
    """Inverse of ``spark_to_avro_schema``: rebuild the explicit StructType
    from the OCF-embedded schema so the fallback read needs NO inference —
    Avro ``float`` stays FloatType (inference would widen to double) and
    all-null columns keep their declared type (inference would fail)."""

    def field_type(ft) -> tuple[T.DataType, bool]:
        if isinstance(ft, list):  # ["null", X] nullable union
            inner = [t for t in ft if t != "null"]
            assert len(inner) == 1, f"unsupported Avro union: {ft}"
            dt, _ = field_type(inner[0])
            return dt, True
        if isinstance(ft, dict):
            if ft["type"] == "array":
                dt, _ = field_type(ft["items"])
                return T.ArrayType(dt), False
            if ft["type"] == "record":
                return (
                    T.StructType(
                        [
                            T.StructField(f["name"], *field_type(f["type"]))
                            for f in ft["fields"]
                        ]
                    ),
                    False,
                )
            raise TypeError(f"unsupported Avro complex type: {ft}")
        scalar = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "bytes": T.BinaryType(),
        }
        if ft in scalar:
            return scalar[ft], False
        raise TypeError(f"unsupported Avro type: {ft}")

    return T.StructType(
        [
            T.StructField(f["name"], *field_type(f["type"]))
            for f in avro_schema["fields"]
        ]
    )


def _decode_ocf_bytes(data: bytes, fp: str) -> list[dict]:
    """Decode one Avro OCF byte blob into python row dicts (pure spec)."""
    r = _Reader(data)
    assert r.read(4) == MAGIC, f"not an Avro OCF: {fp}"
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            k = r.read(r.read_long()).decode()
            v = r.read(r.read_long())
            meta[k] = v
    schema_obj = json.loads(meta["avro.schema"])
    assert meta.get("avro.codec", b"null") == b"null"
    r.read(16)  # sync
    rows: list[dict] = []
    while r.pos < len(data):
        cnt = r.read_long()
        r.read_long()  # byte length
        for _ in range(cnt):
            rows.append(r.read_value(schema_obj))
        r.read(16)  # sync
    return rows


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro written by either path. Tries spark-avro; falls back to
    the pure-Python decoder: the driver reads ONE file header for the
    embedded schema (converted to an explicit StructType — no inference),
    then files decode in parallel on executors via
    ``parallelize(files).flatMap``."""
    try:
        return spark.read.format("avro").load(path)
    except Exception:  # noqa: BLE001
        pass
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
    )
    if not files:
        return spark.createDataFrame([], schema="id long")
    with open(files[0], "rb") as f:
        head = _Reader(f.read())
    assert head.read(4) == MAGIC, f"not an Avro OCF: {files[0]}"
    meta: dict[str, bytes] = {}
    while True:
        n = head.read_long()
        if n == 0:
            break
        if n < 0:
            head.read_long()
            n = -n
        for _ in range(n):
            k = head.read(head.read_long()).decode()
            v = head.read(head.read_long())
            meta[k] = v
    avro_schema = json.loads(meta["avro.schema"])
    struct = avro_to_spark_schema(avro_schema)

    def decode_file(fp: str):
        with open(fp, "rb") as fh:
            return [
                tuple(row.get(f.name) for f in struct.fields)
                for row in _decode_ocf_bytes(fh.read(), fp)
            ]

    rdd = spark.sparkContext.parallelize(files, len(files)).flatMap(decode_file)
    return spark.createDataFrame(rdd, schema=struct)
