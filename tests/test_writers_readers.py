"""Partitioned-write layout + prefix-pruned search + schema-on-read tests
(SURVEY.md §2.1 W2/W3, §2.3 J3, §2.2 V1)."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from anomaly_detection_in_time_series_data_spark.functions import geohash as gh
from anomaly_detection_in_time_series_data_spark.sources import readers, writers


def _airports(spark):
    rows = [
        (1, "Omaha Eppley", 41.3032, -95.8941),
        (2, "Lincoln", 40.8510, -96.7592),
        (3, "Astrakhan", 46.2833, 48.0063),
        (4, "Sydney", -33.9461, 151.1772),
        (5, "NoCoords", None, None),
    ]
    return spark.createDataFrame(rows, ["airport_id", "name", "lat", "lon"])


def test_geoindex_layout_and_pruned_search(spark, tmp_path):
    path = str(tmp_path / "geoindex")
    writers.write_geoindex(_airports(spark), path, "lat", "lon")

    # Layout: 3-level Hive prefix tree g1=/g2=/g3=, gzip json leaves.
    leaves = glob.glob(f"{path}/g1=*/g2=*/g3=*/*.json.gz")
    assert leaves, "expected gzip json shards under g1=/g2=/g3= dirs"
    rec = json.loads(gzip.open(leaves[0], "rt").readline())
    assert len(rec["geohash"]) == 12

    # Null-coordinate rows excluded; others present exactly once.
    total = sum(
        1 for f in leaves for _ in gzip.open(f, "rt")
    )
    assert total == 4

    # Prefix-pruned nearest search: Omaha-area probe finds Eppley.
    hit = writers.nearest_in_geoindex(spark, path, 41.1499988, -95.91779)
    assert hit is not None and hit["name"] == "Omaha Eppley"
    # Probe near Astrakhan (reference's second known-answer call).
    hit2 = writers.nearest_in_geoindex(spark, path, 46.2832984924, 48.0063018799)
    assert hit2 is not None and hit2["name"] == "Astrakhan"


def test_partitioned_write_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [("Alpha", 1), ("Charlie", 2), ("Mike", 3)], ["key", "v"]
    )
    keyed = writers.with_partition_keys(df, "key")
    path = str(tmp_path / "bykv")
    writers.write_partitioned(keyed, path, ["kv_key"])
    dirs = {os.path.basename(p) for p in glob.glob(f"{path}/kv_key=*")}
    assert dirs == {"kv_key=A-B", "kv_key=C-D", "kv_key=M-N"}

    # hash_key is the sha256 first hex char — 16-way layout, F4 semantics.
    hpath = str(tmp_path / "byhash")
    writers.write_partitioned(keyed, hpath, ["hash_key"])
    hdirs = glob.glob(f"{hpath}/hash_key=*")
    assert 1 <= len(hdirs) <= 16

    # Partition pruning is visible in the read plan.
    read = spark.read.parquet(path).filter(F.col("kv_key") == "A-B")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "kv_key" in plan
    assert read.count() == 1


def test_jsonl_read_with_validation(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"name": "ok", "x": 1.5}\n'
        '{"name": null, "x": 2.0}\n'
        "this is not json\n"
    )
    schema = T.StructType(
        [T.StructField("name", T.StringType()), T.StructField("x", T.DoubleType())]
    )
    df = readers.read_jsonl(spark, str(p), schema)
    flagged = readers.with_validation_flags(df, required=["name"])
    rows = flagged.collect()
    assert len(rows) == 3  # tolerant: nothing dropped
    assert sum(1 for r in rows if r.valid) == 1


def test_file_corpus_scan_and_decode(spark, tmp_path):
    (tmp_path / "alice").mkdir()
    (tmp_path / "bob").mkdir()
    (tmp_path / "alice" / "1.txt").write_bytes("hello utf8".encode())
    (tmp_path / "bob" / "2.txt").write_bytes("caf\xe9 latin1".encode("latin-1"))
    df = readers.read_file_corpus(spark, str(tmp_path))
    decoded = readers.decode_text(df)
    rows = {r.username: r.original_msg for r in decoded.collect()}
    assert rows["alice"] == "hello utf8"
    assert "caf" in rows["bob"]  # latin-1 fallback decoded, never threw


def test_csv_roundtrip_with_corrupt_line(spark, tmp_path):
    from pyspark.sql import types as T

    from anomaly_detection_in_time_series_data_spark.sources.readers import read_csv

    p = tmp_path / "data.csv"
    p.write_text("k,v\na,1\nb,2\nbad-line-no-delim\n")
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
    )
    df = read_csv(spark, str(p), schema)
    rows = {r.k: (r.v, r._corrupt) for r in df.collect()}
    assert rows["a"] == (1, None) and rows["b"] == (2, None)
    # The malformed line survives as a corrupt-record row, not a job failure.
    assert any(c is not None for _, c in rows.values())


def test_orc_roundtrip(spark, tmp_path):
    from anomaly_detection_in_time_series_data_spark.sources.readers import read_orc
    from anomaly_detection_in_time_series_data_spark.sources.writers import write_orc

    src = spark.range(100).selectExpr("id", "id * 2 AS dbl", "uuid() AS u")
    path = str(tmp_path / "orc_out")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == 100
    assert {f.name for f in back.schema.fields} == {"id", "dbl", "u"}
    assert back.agg({"dbl": "sum"}).collect()[0][0] == sum(i * 2 for i in range(100))


def test_xml_roundtrip_flat_and_nested(spark, tmp_path):
    from anomaly_detection_in_time_series_data_spark.sources.readers import read_xml
    from anomaly_detection_in_time_series_data_spark.sources.writers import write_xml

    src = spark.createDataFrame(
        [(1, "a", (10, "x")), (2, "b", (20, "y"))],
        "id bigint, v string, nest struct<n: bigint, s: string>",
    )
    path = str(tmp_path / "xml_out")
    write_xml(src, path, row_tag="rec")
    back = read_xml(spark, str(path), row_tag="rec")
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["v"] == "a" and rows[2]["nest"]["s"] == "y"
    # explicit-schema read (schema-on-read policy) pins types with no sampling
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    pinned = read_xml(spark, str(path), row_tag="rec", schema=schema)
    assert [f.dataType for f in pinned.schema.fields] == [T.LongType(), T.StringType()]
    assert pinned.count() == 2


def test_proto_wire_format_known_answer():
    """Hand-computed wire bytes per the protobuf spec: field1 varint ->
    0x08, field2 len-delim -> 0x12, field8 bool -> 0x40."""
    from anomaly_detection_in_time_series_data_spark.sources.proto_routes import (
        encode_airline,
    )

    got = encode_airline({"airline_id": 1, "name": "A", "active": True})
    assert got == bytes([0x08, 0x01, 0x12, 0x01, 0x41, 0x40, 0x01])


def test_proto_routes_roundtrip_distributed(spark):
    """Distributed encode -> driver concat -> decode reproduces the records
    (W5 parity: the reference's Routes builder crashed before producing
    output; ours is total and parallel)."""
    from anomaly_detection_in_time_series_data_spark.sources.proto_routes import (
        decode_routes,
        routes_to_proto_bytes,
    )

    rows = [
        {
            "route": {
                "airline": {
                    "airline_id": 137,
                    "name": "Air Test",
                    "iata": "AT",
                    "active": True,
                },
                "src_airport": {
                    "airport_id": 1,
                    "name": "Alpha",
                    "latitude": 41.1499988,
                    "longitude": -95.91779,
                    "altitude": 300,
                    "timezone": -6.0,
                },
                "dst_airport": {
                    "airport_id": 2,
                    "name": "Beta",
                    "latitude": 46.2832984924,
                    "longitude": 48.0063018799,
                    "altitude": -65,
                    "timezone": 4.0,
                },
                "codeshare": False,
                "stops": 0,
                "equipment": ["CR2", "738"],
            }
        },
        {
            "route": {
                "airline": {"airline_id": 24, "name": "Other", "active": False},
                "src_airport": {"airport_id": 2, "name": "Beta",
                                "latitude": 1.5, "longitude": 2.5},
                "dst_airport": {"airport_id": 1, "name": "Alpha",
                                "latitude": 3.5, "longitude": 4.5},
                "codeshare": True,
                "stops": 1,
                "equipment": ["320"],
            }
        },
    ]
    schema = (
        "route struct<"
        "airline: struct<airline_id: int, name: string, iata: string, active: boolean>, "
        "src_airport: struct<airport_id: int, name: string, latitude: double, "
        "longitude: double, altitude: int, timezone: double>, "
        "dst_airport: struct<airport_id: int, name: string, latitude: double, "
        "longitude: double, altitude: int, timezone: double>, "
        "codeshare: boolean, stops: int, equipment: array<string>>"
    )
    df = spark.createDataFrame(rows, schema).repartition(2)
    blob = routes_to_proto_bytes(df)
    decoded = decode_routes(blob)
    assert len(decoded) == 2
    by_airline = {d["airline"]["airline_id"]: d for d in decoded}
    r1 = by_airline[137]
    assert r1["airline"]["name"] == "Air Test" and r1["airline"]["active"] is True
    assert r1["src_airport"]["latitude"] == 41.1499988
    assert r1["dst_airport"]["altitude"] == -65  # negative int32 varint
    assert r1["equipment"] == ["CR2", "738"] and r1["codeshare"] is False
    r2 = by_airline[24]
    assert r2["stops"] == 1 and r2["codeshare"] is True


def test_parquet_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution: files written before a column existed merge with
    newer files (mergeSchema) — old rows surface NULL for the added column
    instead of failing the scan (the additive-evolution contract a
    long-lived 100 TB dataset depends on)."""
    path = str(tmp_path / "evolving")
    spark.range(10).selectExpr("id", "id * 2 AS a").write.parquet(f"{path}/p=1")
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS a", "'new' AS b"
    ).write.parquet(f"{path}/p=2")
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert {f.name for f in df.schema.fields} == {"id", "a", "b", "p"}
    assert df.count() == 20
    old = df.filter("p = 1")
    assert old.filter(F.col("b").isNull()).count() == 10
    assert df.filter("p = 2").filter(F.col("b") == "new").count() == 10


def test_proto_routes_sharded_write_matches_single_blob(spark, tmp_path):
    """W5 scale fix (VERDICT r3): executor-side size-capped shards whose
    concatenated decode equals the single-message decode, and the
    driver-collect path refuses frames above its row gate."""
    import pytest

    from anomaly_detection_in_time_series_data_spark.sources.proto_routes import (
        decode_routes,
        routes_to_proto_bytes,
        write_routes_proto_shards,
    )

    rows = [
        {
            "route": {
                "airline": {"airline_id": i, "name": f"A{i}", "active": i % 2 == 0},
                "src_airport": {"airport_id": i, "name": f"S{i}",
                                "latitude": 1.0 + i, "longitude": 2.0 + i},
                "dst_airport": {"airport_id": i + 1, "name": f"D{i}",
                                "latitude": 3.0 + i, "longitude": 4.0 + i},
                "codeshare": False,
                "stops": i % 3,
                "equipment": [f"E{i}"],
            }
        }
        for i in range(20)
    ]
    schema = (
        "route struct<"
        "airline: struct<airline_id: int, name: string, active: boolean>, "
        "src_airport: struct<airport_id: int, name: string, latitude: double, "
        "longitude: double>, "
        "dst_airport: struct<airport_id: int, name: string, latitude: double, "
        "longitude: double>, "
        "codeshare: boolean, stops: int, equipment: array<string>>"
    )
    df = spark.createDataFrame(rows, schema).repartition(3)
    blob = routes_to_proto_bytes(df)

    out = tmp_path / "shards"
    # ~70-byte records + a 150-byte cap -> every partition rolls shards
    meta = write_routes_proto_shards(df, str(out), max_shard_bytes=150)
    assert len(meta) > 3, "cap did not force multiple shards per partition"
    assert sum(m["n_rows"] for m in meta) == 20
    concat = b"".join(open(m["path"], "rb").read() for m in sorted(
        meta, key=lambda m: m["path"]
    ))
    assert sum(m["n_bytes"] for m in meta) == len(concat) == len(blob)
    # decode equivalence is order-insensitive by route identity
    key = lambda r: r["airline"]["airline_id"]  # noqa: E731
    assert sorted(decode_routes(concat), key=key) == sorted(
        decode_routes(blob), key=key
    )

    with pytest.raises(ValueError, match="max_rows"):
        routes_to_proto_bytes(df, max_rows=5)
