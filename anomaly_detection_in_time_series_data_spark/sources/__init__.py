"""Sources & sinks (SURVEY.md §2.1): schema-on-read ingestion (S1-S4) and
partition-layout-preserving writers (W1-W3).
"""
