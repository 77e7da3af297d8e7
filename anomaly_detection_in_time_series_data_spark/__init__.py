"""PySpark-native analytics engine reproducing the capability surface of
``sthakur2019/Anomaly-detection-in-time-series-data`` (see SURVEY.md).

Design stance (SURVEY.md §7): a thin, well-typed PySpark library of
``DataFrame -> DataFrame`` operator functions. Catalyst is the optimizer,
Structured Streaming is the streaming runtime, MLlib supplies featurization
and anomaly models. Custom code concentrates only where Spark has no
primitive (geohash expression family, email parsing, replay pacing,
anomaly-scoring composition).
"""

__version__ = "0.1.0"
