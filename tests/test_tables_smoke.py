"""Fixture-drift smoke gate: the driver regenerates /root/testdata between
rounds and has already changed the physical type of ``events.ts`` once
(nanos in round 1, micros in round 2).  Load every table at sf0.001 first
thing so a fixture change fails in seconds, not at driver time.

Named test_000_* so pytest's default file ordering runs it early.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import TimestampNTZType, TimestampType

from anomaly_detection_in_time_series_data_spark.tables import TABLE_NAMES, load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_000_table_loads(spark, name):
    df = load_table(spark, SF_DIR, name)
    assert df.count() > 0, f"{name} is empty"


def test_000_events_ts_is_timestamp(spark):
    df = load_table(spark, SF_DIR, "events")
    dt = df.schema["ts"].dataType
    assert isinstance(dt, (TimestampType, TimestampNTZType)), (
        f"events.ts loaded as {dt}; load_table must normalize whatever "
        "physical type the regenerated fixture uses to a timestamp"
    )
    # and it must actually be scannable (analysis alone can pass while
    # execution throws for unsupported physical types)
    assert df.select("ts").limit(5).count() == 5
