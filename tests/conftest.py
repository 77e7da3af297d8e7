from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Suite wall-time discipline (VERDICT r12 item 2: the driver's pytest gate
# must FINISH).  The fixtures are sf0.001 (1000-row tables): a local[32]
# session schedules 32-way task waves for kilobyte jobs, and every
# streaming test opens/commits one state store per shuffle partition per
# trigger.  Cap the TEST session (only) at 8 cores / 4 shuffle partitions
# — plan shapes are partition-count-independent, and the plan-quality
# tests assert shapes, not counts.  Explicit env still wins (the bench
# contract's SPARK_GRAFT_CPUS is untouched outside pytest).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from anomaly_detection_in_time_series_data_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("adts-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
