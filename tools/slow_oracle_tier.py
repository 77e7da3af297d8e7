"""Half-scale oracle tier for the two recursive slow oracles.

``ewma_anomaly_scores`` and ``holt_forecast_anomaly`` are the only
registered oracles whose DuckDB twins are impractically slow at sf0.1:
their recursive CTEs advance ONE row per key per iteration and re-join
the full seq table each step (~20k iterations, >10 min each), and the
float op sequence under test cannot be batched without changing its bit
pattern.  sf0.01 alone, however, never crosses a scale boundary.

This tool builds a DETERMINISTIC DERIVED TIER — exactly the driver's
sf0.1 fixture with ``events`` filtered to ``user_id % 2 == 0`` (~half
the rows, so ~half the oracle iterations; both queries read only
``events``) — and runs the standard check_oracle gate against it.  The
derivation is pyarrow row filtering with the ORIGINAL schema preserved
byte-for-byte (no timestamp coercion, no column reordering), so Spark
and DuckDB read the tier exactly as they read the driver fixture; no
data is synthesized.  A PASS here is a genuine above-sf0.01 hash check:
5x the sf0.01 row count, same recurrences, same engines.

Usage: python tools/slow_oracle_tier.py [sf_dir=/root/testdata/sf0.1]
Writes the derived tier under /tmp (rebuilt each run) and delegates to
check_oracle.py; exit code is check_oracle's.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

SLOW = ["ewma_anomaly_scores", "holt_forecast_anomaly"]


def build_tier(src_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        if not name.endswith(".parquet"):
            continue
        dst = os.path.join(out_dir, name)
        if os.path.exists(dst):
            os.remove(dst)
        if name == "events.parquet":
            t = pq.read_table(os.path.join(src_dir, name))
            half = t.filter(
                pc.equal(pc.bit_wise_and(t["user_id"], 1), 0)
            )
            # version 2.6 + no coercion keeps the source's physical
            # timestamp type; store_schema keeps arrow metadata parity.
            pq.write_table(half, dst, version="2.6", coerce_timestamps=None)
            print(
                f"tier events: {t.num_rows} -> {half.num_rows} rows "
                f"(user_id % 2 == 0)"
            )
        else:
            os.link(os.path.join(src_dir, name), dst)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = f"/tmp/adts_slow_oracle_tier_{os.path.basename(src.rstrip('/'))}"
    if os.path.isdir(out):
        shutil.rmtree(out)
    build_tier(src, out)
    return subprocess.call(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "check_oracle.py"),
            out,
            *SLOW,
        ]
    )


if __name__ == "__main__":
    raise SystemExit(main())
