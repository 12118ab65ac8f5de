"""r14 optimization-round profiler: per-query build-vs-execute split.

For each named query (or --top N from BENCH_LOCAL.json), measures:
  - build_s: time for QUERIES[name].fn(spark, sf_dir) to RETURN the
    DataFrame (fixture writes, driver-side setup, plan construction)
  - exec_s:  time for the returned frame's .collect()
  - jobs:    Spark job count the query issued (statusTracker delta)
run twice, both runs reported (run1 ~ warm).

Usage: python tools/r14_profile.py [names...] [--top N] [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ducklake_kafka_connect_spark.plans.queries import QUERIES  # noqa: E402
from ducklake_kafka_connect_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        bench = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "BENCH_LOCAL.json"))
        )
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    spark = build_session(app_name="r14-profile")
    spark.range(1000).count()
    tracker = spark.sparkContext.statusTracker()
    out: dict = {}
    for name in names:
        if name not in QUERIES:
            print(f"SKIP unknown {name}", flush=True)
            continue
        rec: list = []
        for r in range(args.runs):
            group = f"{name}-r{r}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, args.sf)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            spark.sparkContext.setJobGroup(None, None)
            try:
                jobs = len(tracker.getJobIdsForGroup(group) or [])
            except Exception:
                jobs = -1
            rec.append(
                {
                    "build_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "jobs": jobs,
                }
            )
            print(
                f"{name} run{r}: build={t1-t0:.3f}s exec={t2-t1:.3f}s "
                f"total={t2-t0:.3f}s jobs={jobs}",
                flush=True,
            )
        out[name] = rec
        spark.catalog.clearCache()
        try:
            from ducklake_kafka_connect_spark.operators import dedup as dd

            dd.release_cached()
        except Exception:
            pass
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
