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
        # queries persist diamond-DAG intermediates; drop them so later
        # queries aren't timed under another query's storage-memory churn
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "query_surface_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "split": split_harness(spark, sf_dir),
                "sf": sf,
                "ingest": ingest_harness(spark),
            }
        )
    )
    spark.stop()


def split_harness(spark, sf_dir: str) -> dict:
    """Build-vs-query split for the three queries whose combined number is
    dominated by one-time index/table construction (bench hygiene: a
    read-path regression must not hide under build cost). The combined
    numbers in ``queries`` stay directly comparable with earlier rounds."""
    from ducklake_kafka_connect_spark.plans.queries import (
        ivf_index_build,
        ivf_index_query,
        merge_upsert_build,
        merge_upsert_query,
        nested_roundtrip_build,
        nested_roundtrip_query,
        zorder_build,
        zorder_query,
    )

    out: dict = {}

    def timed(fn, *args):
        t0 = time.perf_counter()
        r = fn(*args)
        return r, round(time.perf_counter() - t0, 3)

    try:
        cat, b = timed(zorder_build, spark, sf_dir)
        _, q = timed(lambda: zorder_query(cat).collect())
        out["zorder_pruned_scan"] = {"build_s": b, "query_s": q}

        (t, qv), b = timed(ivf_index_build, spark, sf_dir)
        _, q = timed(lambda: ivf_index_query(t, qv).collect())
        out["ann_ivf_indexed_topk"] = {"build_s": b, "query_s": q}

        (w, batch, mcat), b = timed(merge_upsert_build, spark, sf_dir)
        _, q = timed(lambda: merge_upsert_query(w, batch, mcat).collect())
        out["merge_upsert_events"] = {"build_s": b, "query_s": q}

        ncat, b = timed(nested_roundtrip_build, spark, sf_dir)
        _, q = timed(lambda: nested_roundtrip_query(ncat).collect())
        out["nested_json_roundtrip"] = {"build_s": b, "query_s": q}
    except Exception as e:  # keep the bench line intact
        out["error"] = str(e)[:200]
    spark.catalog.clearCache()
    return out


def ingest_harness(spark) -> dict:
    """BASELINE.md targets 1-2: append throughput on a partitioned table
    and MERGE batches at PK-conflict rates, mirroring the reference's
    DucklakeWriterIntegrationTest harness (base=100k rows, batch=10k,
    conflicts 1/10/30%)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    out: dict[str, float] = {}
    lake_dir = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        cat = LakeCatalog(spark, lake_dir)
        # Steady-state warmup on a scratch table: the first merge anywhere
        # in a session pays one-time window/parquet codegen that is not
        # per-batch cost (the reference's 30-100 ms guidance is likewise a
        # steady-state JMX average, not a cold first batch).
        wu = LakeWriter(cat.table("bench_warmup"), pk=["id"],
                        partition_by="month(created_at)")
        warm = spark.range(1_000).select(
            F.col("id"),
            F.lit("w").alias("name"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("created_at"),
        )
        wu.write(warm)
        wu.write(warm)
        base = spark.range(100_000).select(
            F.col("id"),
            F.concat(F.lit("name_"), F.col("id")).alias("name"),
            (F.timestamp_seconds(1704067200 + F.col("id") % 2_592_000)).alias("created_at"),
        )
        w = LakeWriter(cat.table("bench_merge"), pk=["id"],
                       partition_by="month(created_at)")
        t0 = time.perf_counter()
        w.write(base)
        append_s = time.perf_counter() - t0
        out["append_100k_partitioned_s"] = round(append_s, 3)
        out["append_rows_per_s"] = round(100_000 / append_s)
        for rate in (1, 10, 30):
            n_conflict = 10_000 * rate // 100
            batch = spark.range(10_000).select(
                F.when(F.col("id") < n_conflict, F.col("id") * (100 // rate))
                .otherwise(F.col("id") + 1_000_000)
                .alias("id"),
                F.lit("updated").alias("name"),
                F.timestamp_seconds(1704067200 + F.col("id") % 2_592_000).alias("created_at"),
            )
            t0 = time.perf_counter()
            w.write(batch)
            out[f"merge_10k_conflict{rate}pct_s"] = round(time.perf_counter() - t0, 3)
        # group commit: 10 queued 2k-row micro-batches through ONE
        # merge_many (VERDICT r2 #1: amortized per-merge fixed overhead);
        # batches/s is the sustained ingest rate a coalescing sink sees
        n_batches = 10
        batches = [
            spark.range(2_000).select(
                (F.col("id") * 7 + i).alias("id"),
                F.lit(f"gc_{i}").alias("name"),
                F.timestamp_seconds(1704067200 + F.col("id") % 2_592_000).alias("created_at"),
            )
            for i in range(n_batches)
        ]
        t0 = time.perf_counter()
        w.merge_many(batches)
        many_s = time.perf_counter() - t0
        out["merge_many_10x2k_s"] = round(many_s, 3)
        out["merge_many_batches_per_s"] = round(n_batches / many_s, 1)
    except Exception as e:  # keep the bench line intact on harness failure
        out["error"] = str(e)[:200]
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
