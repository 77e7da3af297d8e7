"""Scalar function families (SURVEY.md §2.7) with no Spark built-in:
geohash encode/decode/distance (``geohash``), email parsing
(``email_parse``). Everything else in §2.7 maps to ``pyspark.sql.functions``
built-ins and lives inline in the operators that use it.
"""
