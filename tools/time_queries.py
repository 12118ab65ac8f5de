"""Ad-hoc timing harness: time named queries warm at a given SF dir.

Usage: python tools/time_queries.py q1 q2 ... [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import time

from ducklake_kafka_connect_spark.operators import dedup as dedup_ops
from ducklake_kafka_connect_spark.plans.queries import query_map
from ducklake_kafka_connect_spark.session import build_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    spark = build_session(app_name="time-queries")
    qm = query_map()
    for name in args.names:
        fn = qm[name]
        # bench protocol: min of N runs, cache cleared only BETWEEN queries
        best = None
        for r in range(args.runs):
            t0 = time.perf_counter()
            n = fn(spark, args.sf).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"{name} run{r}: {dt:.3f}s rows={len(n)}", flush=True)
        dedup_ops.release_cached()
        spark.catalog.clearCache()
        print(f"{name} BEST: {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
