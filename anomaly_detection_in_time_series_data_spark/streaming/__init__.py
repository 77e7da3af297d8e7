"""Structured Streaming surface (SURVEY.md §2.8, §3.3, §7 Phase 5):
time-partitioned replay sources (T1/T2), windowed stats with watermarks,
and the streaming z-score anomaly scorer — the consumer the reference never
implemented (its Week 8 notebook is producer-only).
"""
