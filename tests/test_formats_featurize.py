"""Avro fallback round-trip (W4), Kafka message shaping (K1/F12/F14), and
ML featurization (F8-F11) tests."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anomaly_detection_in_time_series_data_spark.operators import featurize
from anomaly_detection_in_time_series_data_spark.sources import avro_fallback
from anomaly_detection_in_time_series_data_spark.streaming.kafka_sink import (
    to_kafka_frame,
)


def test_avro_roundtrip_flat_and_nested(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("lat", T.DoubleType(), True),  # the type the
            T.StructField("active", T.BooleanType(), True),  # reference broke
            T.StructField("tags", T.ArrayType(T.StringType()), True),
            T.StructField(
                "nested",
                T.StructType([T.StructField("x", T.LongType(), True)]),
                True,
            ),
        ]
    )
    rows = [
        (1, "alpha", 41.1499988, True, ["a", "b"], Row(x=7)),
        (2, None, -95.91779, False, [], Row(x=None)),
        (3, "gamma", 0.0, None, ["c"], None),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "routes_avro")
    mode = avro_fallback.write_avro(df, path)
    assert mode in ("spark-avro", "fallback")
    back = avro_fallback.read_avro(spark, path)
    got = sorted(
        (r["id"], r["name"], r["lat"], r["active"], tuple(r["tags"] or []))
        for r in (x.asDict() for x in back.collect())
    )
    # Unlike the reference's header-only output, all rows round-trip —
    # including float coordinates and falsy 0.0.
    assert [g[0] for g in got] == [1, 2, 3]
    assert got[0][2] == 41.1499988 and got[2][2] == 0.0


def test_avro_fallback_read_exact_schema_no_inference(spark, tmp_path):
    """The fallback read must rebuild the EMBEDDED schema, not infer:
    Avro float stays FloatType (inference widens to double) and an
    all-null column keeps its declared type (inference would fail)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("score", T.FloatType(), True),
            T.StructField("always_null", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(1, 1.5, None), (2, None, None)], schema
    )
    path = str(tmp_path / "float_avro")
    if avro_fallback.write_avro(df, path) != "fallback":
        import pytest

        pytest.skip("spark-avro jar present; fallback path not exercised")
    back = avro_fallback.read_avro(spark, path)
    assert dict(back.dtypes) == {
        "id": "bigint", "score": "float", "always_null": "string"
    }
    got = {r["id"]: (r["score"], r["always_null"]) for r in back.collect()}
    assert got[1][0] == 1.5 and got[1][1] is None and got[2] == (None, None)


def test_avro_header_is_spec_correct(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], ["id", "s"])
    path = str(tmp_path / "hdr")
    if avro_fallback.write_avro(df, path) == "fallback":
        import glob

        f = open(glob.glob(f"{path}/part-*.avro")[0], "rb").read()
        assert f[:4] == avro_fallback.MAGIC
        assert b"avro.schema" in f[:512]


def test_kafka_frame_shape(spark):
    df = spark.createDataFrame([(1, "click", 2.5)], ["id", "etype", "v"])
    out = to_kafka_frame(df, key_col="id", value_cols=["etype", "v"])
    assert [f.name for f in out.schema.fields] == ["key", "value"]
    assert all(f.dataType.simpleString() == "binary" for f in out.schema.fields)
    row = out.collect()[0]
    assert bytes(row.key) == b"1"
    assert json.loads(bytes(row.value)) == {"etype": "click", "v": 2.5}
    # uuid keys: per-row, 32 hex chars (reference's uuid4().hex shape)
    keyed = to_kafka_frame(df.union(df)).collect()
    keys = {bytes(r.key) for r in keyed}
    assert len(keys) == 2 and all(len(k) == 32 for k in keys)


def test_multi_hot_and_one_hot(spark):
    df = spark.createDataFrame(
        [(0, ["a", "b", "a"], 0), (1, ["b", "c"], 2)], ["id", "words", "label"]
    )
    mh, vocab = featurize.multi_hot(df, "words", vocab_size=10)
    feats = {r.id: r.features for r in mh.collect()}
    assert set(vocab) == {"a", "b", "c"}
    # binary: repeated 'a' still contributes 1.0
    assert sorted(feats[0].toArray().tolist()) == [0.0, 1.0, 1.0]
    oh = featurize.one_hot(df, "label")
    vecs = {r.id: r.label_vec.toArray().tolist() for r in oh.collect()}
    assert vecs[0] == [1.0, 0.0, 0.0] and vecs[1] == [0.0, 0.0, 1.0]


def test_zscore_scale_uses_train_stats(spark):
    train = spark.createDataFrame([(i, [float(i)]) for i in range(5)], ["id", "v"])
    test = spark.createDataFrame([(100, [10.0])], ["id", "v"])
    tr, te = featurize.zscore_scale(train, test, "v")
    scaled = te.collect()[0]["v_scaled"].toArray()[0]
    import statistics

    mu, sd = 2.0, statistics.stdev([0, 1, 2, 3, 4])
    assert abs(scaled - (10.0 - mu) / sd) < 1e-9  # test scored by train stats


def test_index_to_word_decode(spark):
    df = spark.createDataFrame([(1, [3, 4, 99])], ["id", "idx"])
    out = df.select(
        featurize.index_to_word("idx", ["the", "cat"], offset=3).alias("words")
    ).collect()[0]
    assert out.words == ["the", "cat", "?"]
