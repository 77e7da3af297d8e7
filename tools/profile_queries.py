"""Per-query optimization profiler (guide §1): isolate queries with the
noop sink, label jobs, capture explain("formatted"), and report N-run
timings (median) so before/after claims rest on more than one sample.

    python tools/profile_queries.py [--sf sf_dir] [--runs N] [--plans DIR] \
        [--suffix before] name [name ...]

Writes plans to plans/r12/<name>_<suffix>.txt when --plans/--suffix given.
Prints one JSON line: {"name": {"runs": [...], "median": s}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detection_in_time_series_data_spark.session import get_spark
from anomaly_detection_in_time_series_data_spark import queries as q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default=None)
    args = ap.parse_args()

    spark = get_spark("adts-profile")
    spark.range(1_000).selectExpr("sum(id)").collect()  # JVM warm
    out: dict[str, dict] = {}
    for name in args.names:
        fn = q.QUERIES[name]
        if args.plans and args.suffix:
            os.makedirs(args.plans, exist_ok=True)
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"run{i}: {name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"runs": runs, "median": statistics.median(runs)}
        print(f"# {name}: median {out[name]['median']}s {runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
