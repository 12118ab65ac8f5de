"""Clean-JVM scale probe (SCALE.md JIT-phantom protocol).

One process = one fresh JVM. Builds an N-copy replication of the sf0.1
tables (same key-shift scheme as bench.build_sf1_dir, configurable
copies so sf1=10 and sf10=100 use the same code path), then runs the
requested queries: first execution = clean cold wall, second = warm.
Used to separate structural regressions from shared-session scheduler
noise in the driver bench's `queries_cold` section (VERDICT r7 #2) and
to extend the rehearsal one decade (sf10, VERDICT r7 #5).

Usage:
    python tools/sf_probe.py --copies 10 bigram_lm_quality
    python tools/sf_probe.py --copies 100 --tables events \
        merge_upsert_events
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bench import SF1_SHIFTS, SF1_LINKED, SF1_SINK_TO_PARQUET  # noqa: E402
from ducklake_kafka_connect_spark.plans.queries import QUERIES  # noqa: E402
from ducklake_kafka_connect_spark.session import build_session  # noqa: E402


def build_dir(spark, sf_dir: str, copies: int, tables: list[str] | None) -> str:
    from pyspark.sql import DataFrame, functions as F

    from ducklake_kafka_connect_spark.sources.parquet_loader import load_parquet

    out_dir = tempfile.mkdtemp(prefix=f"probe_sf{copies}_")
    for name, shifts in SF1_SHIFTS.items():
        if tables and name not in tables:
            # unneeded big table: symlink so loaders still resolve
            os.symlink(
                os.path.join(sf_dir, f"{name}.parquet"),
                os.path.join(out_dir, f"{name}.parquet"),
            )
            continue
        src = load_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
        parts = []
        for i in range(copies):
            d = src
            for col, span in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(i * span))
            parts.append(d)
        functools.reduce(DataFrame.unionByName, parts).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name in SF1_LINKED:
        os.symlink(
            os.path.join(sf_dir, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list of shifted tables to actually replicate "
        "(others symlink to sf0.1); default: all",
    )
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = build_session(app_name=f"probe-sf{args.copies}")
    spark.range(1000).count()
    t0 = time.perf_counter()
    data_dir = build_dir(
        spark, args.sf_dir, args.copies,
        args.tables.split(",") if args.tables else None,
    )
    out = {"copies": args.copies, "build_s": round(time.perf_counter() - t0, 3)}
    try:
        for name in args.queries:
            sink = data_dir if name in SF1_SINK_TO_PARQUET else None
            walls = []
            for r in range(args.runs):
                t0 = time.perf_counter()
                df = QUERIES[name].fn(spark, data_dir)
                if sink is not None:
                    df.write.mode("overwrite").parquet(
                        os.path.join(sink, f"__sink_{name}")
                    )
                else:
                    df.collect()
                walls.append(round(time.perf_counter() - t0, 3))
            out[name] = {"cold": walls[0], "warm": min(walls[1:]) if walls[1:] else None}
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
