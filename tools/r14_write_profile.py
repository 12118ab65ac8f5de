"""r14: microprofile the lake write/commit path on small fixture-sized
batches — the shape every e2e bench query pays repeatedly.

Times each op's wall and dumps the REGISTRY timer breakdown after.

Usage: python tools/r14_write_profile.py [--rows 17000]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter  # noqa: E402
from ducklake_kafka_connect_spark.metrics import REGISTRY  # noqa: E402
from ducklake_kafka_connect_spark.session import build_session  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label:45s} {time.perf_counter() - t0:7.3f}s", flush=True)
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=17000)
    args = ap.parse_args()
    spark = build_session(app_name="r14-write-profile")
    spark.range(1000).count()
    root = os.path.join(tempfile.gettempdir(), f"r14wp_{uuid.uuid4().hex[:8]}")
    cat = LakeCatalog(spark, root)

    df = spark.range(args.rows).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 7)).alias("event_type"),
        (F.col("id") % 9973).cast("long").alias("cents"),
    )
    batch = spark.range(args.rows // 10).select(
        (F.col("id") * 10).alias("event_id"),
        F.lit("upd").alias("event_type"),
        F.lit(1).cast("long").alias("cents"),
    )

    # warm: one throwaway table exercises codegen paths once
    warm = LakeWriter(cat.table("warm"), pk=["event_id"])
    warm.write(df.limit(1000))
    warm.write(batch.limit(100))

    for rep in range(2):
        tb = f"t{rep}"
        w = t(f"[{rep}] LakeWriter ctor", lambda: LakeWriter(cat.table(tb), pk=["event_id"]))
        t(f"[{rep}] write (create+append {args.rows})", lambda: w.write(df))
        t(f"[{rep}] append {args.rows}", lambda: w.append(df.withColumn("event_id", F.col("event_id") + 10_000_000)))
        t(f"[{rep}] merge {args.rows//10} (all-match)", lambda: w.write(batch))
        t(f"[{rep}] delete_where", lambda: w.delete_where("event_id % 66 = 0"))
        t(f"[{rep}] read.count", lambda: cat.table(tb).read().count())
        t(f"[{rep}] sql select 1 row", lambda: cat.sql(f"SELECT count(*) FROM {tb}").collect())

    # matview refresh cycle on rep-0 table
    t("create matview", lambda: cat.sql(
        "CREATE MATERIALIZED VIEW mv0 AS SELECT event_type, "
        "sum(cents) AS total, count(*) AS n FROM t0 GROUP BY event_type"
    ))
    w0 = LakeWriter(cat.table("t0"), pk=["event_id"])
    t("churn write", lambda: w0.write(batch.withColumn("cents", F.lit(7).cast("long"))))
    t("refresh incremental", lambda: cat.sql("REFRESH MATERIALIZED VIEW mv0").collect())
    t("refresh full", lambda: cat.sql("REFRESH MATERIALIZED VIEW mv0 FULL").collect())

    print("\n--- REGISTRY timers ---")
    for name, s in sorted(REGISTRY.ops.items()):
        print(
            f"{name:30s} n={s.count:4d} total={s.total_ms/1000:8.3f}s "
            f"avg={s.avg_ms:7.1f}ms max={s.max_ms:7.1f}ms"
        )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
