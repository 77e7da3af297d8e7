"""CI guard: COVERAGE.md's "oracle `name`" claims cannot silently diverge
from driver-recorded results.

Round 1 shipped 77 registered queries whose oracle status was a claim with
no driver CORRECTNESS row (the driver checks only the first 50 registered
names per round).  This guard makes that state impossible to reintroduce:
every oracle claim must be (a) green in some recorded CORRECTNESS_r*.json,
(b) inside the current first-50 window (checked this round), or (c)
explicitly listed in the current pending-rotation list (scheduled for the
next rotation).  Anything else fails CI.
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

from anomaly_detection_in_time_series_data_spark import queries as q

REPO = Path(__file__).resolve().parents[1]


def _recorded_green() -> set[str]:
    green: set[str] = set()
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(f)).items():
            if row.get("hash_match"):
                green.add(name)
    return green


def _claimed_oracles() -> set[str]:
    text = (REPO / "COVERAGE.md").read_text()
    return set(re.findall(r"oracle `([a-z0-9_]+)`", text))


def test_every_claimed_oracle_is_registered_with_sql():
    claimed = _claimed_oracles()
    assert claimed, "COVERAGE.md parse produced no oracle claims"
    unregistered = sorted(claimed - set(q.QUERIES))
    missing_sql = sorted(n for n in claimed & set(q.QUERIES) if n not in q.ORACLE)
    assert not unregistered, f"claimed but not registered: {unregistered}"
    assert not missing_sql, f"claimed but no oracle_sql entry: {missing_sql}"


def test_every_claimed_oracle_is_verified_or_scheduled():
    claimed = _claimed_oracles() & set(q.QUERIES)
    green = _recorded_green()
    window = set(list(q.QUERIES)[:50])
    pending = set(q._PENDING_ROUND14)
    orphaned = sorted(
        n for n in claimed if n not in green and n not in window and n not in pending
    )
    assert not orphaned, (
        "oracle claims with no driver row, not in the current correctness "
        f"window, and not scheduled in _PENDING_ROUND14: {orphaned}"
    )


def test_pending_rotation_list_is_consistent():
    """_PENDING_ROUND14 names must exist, carry oracles, and actually need a
    rotation (drop them from the list once a green row is recorded AND
    they have left the front window)."""
    pending = list(q._PENDING_ROUND14)
    assert len(pending) == len(set(pending)), "duplicates in _PENDING_ROUND14"
    unknown = sorted(set(pending) - set(q.QUERIES))
    assert not unknown, f"unknown queries in _PENDING_ROUND14: {unknown}"
    no_sql = sorted(n for n in pending if n not in q.ORACLE)
    assert not no_sql, f"_PENDING_ROUND14 entries without oracle SQL: {no_sql}"


def test_round13_front_window_is_exact():
    """The rotation IS the round-to-round correctness mechanism: the front
    must be exactly the driver's 50-name window, every name must carry an
    oracle, and the registry must actually start with it (a typo or a
    re-registration after _rotate_front would silently shrink coverage)."""
    front = list(q._ROUND13_FRONT)
    assert len(front) == 50, f"front window must be exactly 50, got {len(front)}"
    assert len(set(front)) == 50, "duplicates in _ROUND13_FRONT"
    assert front[: len(q._PENDING_ROUND13)] == list(q._PENDING_ROUND13), (
        "round 12 had no reds, so the window must lead with the full "
        "7-name _PENDING_ROUND13 backlog in order"
    )
    no_sql = sorted(n for n in front if n not in q.ORACLE)
    assert not no_sql, f"_ROUND13_FRONT entries without oracle SQL: {no_sql}"
    assert set(q._PENDING_ROUND13) <= set(front) | set(q._PENDING_ROUND14), (
        "every round-12 backlog name must be in the round-13 window or "
        "explicitly deferred to _PENDING_ROUND14"
    )
    assert set(q._R13_IMPL_CHANGED) <= set(front) | set(q._PENDING_ROUND14), (
        "every query impl-touched in round 13 must be re-proven in the "
        "round-13 window or explicitly deferred to _PENDING_ROUND14"
    )
    assert list(q.QUERIES)[:50] == front, (
        "QUERIES does not start with _ROUND13_FRONT — was something "
        "registered after _rotate_front()?"
    )


def test_bench_headliners_are_registered_queries():
    """A typo in bench.py's HEADLINE list would crash the driver's bench
    run (KeyError at the first missing name) — fail here in seconds
    instead."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from anomaly_detection_in_time_series_data_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench headliners not in QUERIES: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headliner"


def test_no_shadowed_query_registrations():
    """@query registration is latest-wins: a duplicated name silently
    REPLACES the earlier query while its green CORRECTNESS history keeps
    pointing at the name — round 9 caught four such collisions
    (k_anonymity_audit, zipf_rank_frequency, l_diversity_audit,
    referential_integrity_audit). Pin decorator count == registry size."""
    import re
    from collections import Counter

    src = (
        REPO
        / "anomaly_detection_in_time_series_data_spark"
        / "queries.py"
    ).read_text()
    names = [
        a or b
        for a, b in re.findall(
            r'^@query\(\s*$\n\s+"([a-z0-9_]+)"|^@query\("([a-z0-9_]+)"',
            src,
            re.M,
        )
    ]
    dups = sorted(n for n, c in Counter(names).items() if c > 1)
    assert not dups, f"duplicate @query names (latest silently wins): {dups}"
    assert len(names) == len(q.QUERIES), (
        f"{len(names)} @query decorators but {len(q.QUERIES)} registered — "
        "a name is being shadowed"
    )
