"""Known-answer tests for the geohash family (FIXTURES.md §B5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_in_time_series_data_spark.functions import geohash as gh


def test_known_answer_approximate_distance():
    # Documented constant: Assignment_3.ipynb:662-670
    assert gh.approximate_distance("bcd3u", "bc83n") == 625441.0


def test_encode_known_points():
    # Public known answers for the standard base-32 algorithm.
    assert gh.encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert gh.encode(42.6, -5.6, 5) == "ezs42"
    # 12-char precision (the reference's geoindex records are 12 chars)
    assert len(gh.encode(41.1499988, -95.91779, 12)) == 12


def test_decode_roundtrip():
    for lat, lon in [(41.15, -95.92), (-33.86, 151.21), (0.0, 0.0), (69.9, -179.9)]:
        g = gh.encode(lat, lon, 12)
        dlat, dlon = gh.decode(g)
        assert abs(dlat - lat) < 1e-5 and abs(dlon - lon) < 1e-5


def test_udf_and_expr_match_python(spark):
    df = spark.createDataFrame(
        [(1, 41.1499988, -95.91779), (2, 46.2832984924, 48.0063018799), (3, None, 5.0)],
        ["id", "lat", "lon"],
    )
    rows = {
        r.id: r
        for r in df.select(
            "id", gh.encode_udf(F.col("lat"), F.col("lon")).alias("g")
        ).collect()
    }
    assert rows[1].g == gh.encode(41.1499988, -95.91779, 12)
    assert rows[3].g is None

    d = spark.createDataFrame([("bcd3u", "bc83n"), ("u4pru", "u4pru")], ["a", "b"])
    out = d.select(gh.approx_distance_expr("a", "b").alias("m")).collect()
    assert out[0].m == 625441.0
    assert out[1].m == gh.PRECISION_METERS[5]


def test_haversine_expr_matches_python(spark):
    df = spark.createDataFrame([(41.15, -95.92, 46.28, 48.0)], ["a", "b", "c", "d"])
    got = df.select(
        gh.haversine_expr(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).collect()[0].m
    assert abs(got - gh.haversine(41.15, -95.92, 46.28, 48.0)) < 1e-6
    assert 8_000_000 < got < 12_000_000  # Omaha -> Astrakhan ballpark


def test_neighbors_cover_adjacent_cells():
    from anomaly_detection_in_time_series_data_spark.functions import geohash as gh

    ns = gh.neighbors("u4p")
    assert len(ns) == 8 and "u4p" not in ns
    # Every neighbor's bounding box touches the center cell's box.
    lo1, hi1, glo1, ghi1 = gh.decode_bounds("u4p")
    for n in ns:
        lo2, hi2, glo2, ghi2 = gh.decode_bounds(n)
        assert hi2 >= lo1 - 1e-9 and lo2 <= hi1 + 1e-9
        assert ghi2 >= glo1 - 1e-9 and glo2 <= ghi1 + 1e-9
    # Pole clamp: top-latitude cells have < 8 neighbors.
    assert len(gh.neighbors(gh.encode(89.9, 0.0, 3))) < 8
