"""Operator families from SURVEY.md §2, each a ``DataFrame -> DataFrame``
function (or a small family of them). Modules:

- ``anomaly``      — windowed z-score + model-based anomaly scoring (§2.10, §7 P1)
- ``relational``   — flatten / keys / range-hash-geo labels / argmin (§2.2-2.6)
- ``dedup``        — exact + near-duplicate detection (training-data pipeline)
- ``similarity``   — embedding ANN / brute-force cosine top-k
- ``text``         — language-ID, quality scoring, token stats, fingerprints
- ``partitioning`` — range / hash / geo partitioned writes (§2.1 W2/W3)
"""
