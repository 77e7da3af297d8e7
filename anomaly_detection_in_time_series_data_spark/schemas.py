"""Canonical explicit StructTypes (schema-on-read everywhere; SURVEY.md §1.3).

The reference declares four conflicting schemas for the same route entity
(SURVEY.md §1.2); the canonical one here follows the actual data / Parquet
footer (`/root/reference/routes.parquet` footer; `routes-schema.json:3-178`).
The email struct reproduces `Assignment 4.py:42-64,468-471` (19 string
fields, hyphens normalized to underscores).
"""

from __future__ import annotations

from pyspark.sql import types as T

_AIRPORT = T.StructType(
    [
        T.StructField("airport_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("iata", T.StringType()),
        T.StructField("icao", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("altitude", T.LongType()),
        T.StructField("timezone", T.DoubleType()),
        T.StructField("dst", T.StringType()),
        T.StructField("tz_id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

# Canonical nested route record (reference: routes-schema.json:3-178; actual
# types from the routes.parquet footer — lat/lon/timezone are double, the
# Avro `long` declaration was a reference bug we do not copy).
ROUTES = T.StructType(
    [
        T.StructField(
            "airline",
            T.StructType(
                [
                    T.StructField("airline_id", T.LongType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("alias", T.StringType()),
                    T.StructField("iata", T.StringType()),
                    T.StructField("icao", T.StringType()),
                    T.StructField("callsign", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("active", T.BooleanType()),
                ]
            ),
        ),
        T.StructField("src_airport", _AIRPORT),
        T.StructField("dst_airport", _AIRPORT),
        T.StructField("codeshare", T.BooleanType()),
        T.StructField("equipment", T.ArrayType(T.StringType())),
        T.StructField("geohash", T.StringType()),
    ]
)

# Email surface (Assignment 4.py:42-62 column list, :64 `-`->`_` rename,
# :468-471 all-string nullable struct built programmatically).
EMAIL_COLUMNS = [
    "payload",
    "text",
    "Message_ID",
    "Date",
    "From",
    "To",
    "Subject",
    "Mime_Version",
    "Content_Type",
    "Content_Transfer_Encoding",
    "X_From",
    "X_To",
    "X_cc",
    "X_bcc",
    "X_Folder",
    "X_Origin",
    "X_FileName",
    "Cc",
    "Bcc",
]
EMAILS = T.StructType([T.StructField(c, T.StringType(), True) for c in EMAIL_COLUMNS])

RAW_EMAILS = T.StructType(
    [
        T.StructField("username", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("original_msg", T.StringType()),
    ]
)

# Driver fixture tables (TESTDATA.md / FIXTURES.md §A).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Telemetry replay rows (FIXTURES.md §B4; the reference ships whole frames
# as JSON blobs — Week#8_Assignment.ipynb:268-270 — we define per-event rows).
TELEMETRY_LOCATIONS = T.StructType(
    [
        T.StructField("ride_id", T.StringType()),
        T.StructField("ts_offset", T.DoubleType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("speed", T.DoubleType()),
    ]
)

TELEMETRY_ACCELERATIONS = T.StructType(
    [
        T.StructField("ride_id", T.StringType()),
        T.StructField("ts_offset", T.DoubleType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("ax", T.DoubleType()),
        T.StructField("ay", T.DoubleType()),
        T.StructField("az", T.DoubleType()),
    ]
)
