"""Benchmark harness: runs the declared query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Per-query time = full plan execution to a collected (small) result.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from ducklake_kafka_connect_spark.plans.queries import QUERIES
from ducklake_kafka_connect_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_session(app_name="ducklake-bench")
    # warm up JVM / parquet footer caches with a trivial action
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name, qd in QUERIES.items():
        # min of 2 runs: the first pass anywhere pays one-time JVM JIT /
        # codegen / parquet-footer costs that are not plan cost.
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                df = qd.fn(spark, sf_dir)
                df.collect()
                elapsed = time.perf_counter() - t0
                best = elapsed if best is None else min(best, elapsed)
            except Exception as e:  # record failures without killing the run
                best = -1.0
                print(f"BENCH ERROR {name}: {e}", file=sys.stderr)
                break
        timings[name] = round(best, 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "query_surface_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
