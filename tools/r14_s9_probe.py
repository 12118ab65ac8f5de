"""Session-9 probe: phase walls + job counts inside the remaining
mid-tier composites (mor_optimize_roundtrip, lake_sink_upsert_evolving,
sql_export_import_roundtrip fixtures).

Usage: python tools/r14_s9_probe.py [mor|sink|expimp]...
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter  # noqa: E402
from ducklake_kafka_connect_spark.metrics import REGISTRY  # noqa: E402
from ducklake_kafka_connect_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_phases(spark, which: str, rep: int) -> None:
    from ducklake_kafka_connect_spark.plans.queries import _t

    tracker = spark.sparkContext.statusTracker()

    def t(label, fn):
        j0 = len(tracker.getJobIdsForGroup(None) or []) or 0
        ids0 = set(spark.sparkContext.statusTracker().getActiveJobsIds() or [])
        t0 = time.perf_counter()
        r = fn()
        w = time.perf_counter() - t0
        print(f"  [{which} r{rep}] {label:32s} {w:7.3f}s", flush=True)
        return r

    ev = _t(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    base = ev.filter(F.col("event_id") % 10 < 8)
    batch = (
        ev.filter(F.col("event_id") % 10 >= 5)
        .withColumn("value", F.col("value") + F.lit(1000.0))
        .withColumn("event_type", F.lit("updated"))
    )

    if which == "mor":
        from ducklake_kafka_connect_spark.lake.maintenance import compact
        from ducklake_kafka_connect_spark.lake.mor import MODE_MOR

        lake_dir = os.path.join(
            tempfile.gettempdir(), f"s9mor_{uuid.uuid4().hex[:8]}"
        )
        cat = LakeCatalog(spark, lake_dir)
        tt = cat.table("events_morc")
        w = LakeWriter(tt, pk=["event_id"], merge_mode=MODE_MOR)
        t("base write", lambda: w.write(base))
        t("MOR merge write", lambda: w.write(batch))
        t("MOR delete_where", lambda: w.delete_where("event_id % 7 = 0"))
        t("compact", lambda: compact(tt))
        t("read+collect", lambda: tt.read().collect())
    elif which == "sink":
        from ducklake_kafka_connect_spark.lake import LakeTable
        from ducklake_kafka_connect_spark.sources.lake_datasource import (
            register_lake_datasource,
        )

        register_lake_datasource(spark)
        src = ev.select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        root = os.path.join(
            tempfile.gettempdir(), f"s9sink_{uuid.uuid4().hex[:8]}"
        )

        def sink(d):
            (
                d.write.format("ducklake").option("path", root)
                .option("table", "ev_evo").option("mergeKeys", "event_id")
                .mode("append").save()
            )

        w1 = src.filter(F.col("event_id") % 10 < 8)
        w2 = (
            src.filter(F.col("event_id") % 10 >= 5)
            .withColumn("cents", F.col("cents") + F.lit(1000))
            .withColumn("event_type", F.lit("updated"))
            .withColumn("score", F.col("event_id") * F.lit(3))
        )
        w3 = (
            src.filter(F.col("event_id") % 10 < 2)
            .withColumn("cents", F.col("cents") + F.lit(7))
            .withColumn("event_type", F.lit("late"))
        )
        t("sink write 1 (create)", lambda: sink(w1))
        t("sink write 2 (evolve)", lambda: sink(w2))
        t("sink write 3 (narrow)", lambda: sink(w3))
        tt = LakeTable(spark, root, "ev_evo")
        t("read+collect", lambda: tt.read().collect())
    elif which == "expimp":
        src = ev.filter(F.col("event_id") % 6 == 0).select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        root = os.path.join(
            tempfile.gettempdir(), f"s9exp_{uuid.uuid4().hex[:8]}"
        )
        cat = LakeCatalog(spark, os.path.join(root, "src"))
        t("base write", lambda: LakeWriter(cat.table("ev_exp"), pk=["event_id"]).write(src))
        t("macro+view DDL", lambda: (
            cat.sql("CREATE MACRO bucket(c) AS c % 97"),
            cat.sql(
                "CREATE VIEW v_bucket AS SELECT event_id, event_type, "
                "bucket(cents) AS b FROM ev_exp"
            ),
        ))
        t("CREATE MATERIALIZED VIEW", lambda: cat.sql(
            "CREATE MATERIALIZED VIEW mv_exp AS SELECT event_type, "
            "count(*) AS n, sum(cents) AS total_cents FROM ev_exp "
            "GROUP BY event_type"
        ))
        dump = os.path.join(root, "dump")
        t("EXPORT DATABASE", lambda: cat.sql(f"EXPORT DATABASE '{dump}'"))
        dst = LakeCatalog(spark, os.path.join(root, "dst"))
        t("IMPORT DATABASE", lambda: dst.sql(f"IMPORT DATABASE '{dump}'"))
        t("mv check collect", lambda: dst.sql("SELECT * FROM mv_exp").collect())
        t("base agg collect", lambda: dst.sql(
            "SELECT event_type, count(*) AS n, sum(cents) AS total_cents "
            "FROM ev_exp GROUP BY event_type"
        ).collect())
        t("count 1", lambda: dst.sql("SELECT count(*) AS n FROM ev_exp").collect())
        t("IMPORT rerun (0 files)", lambda: dst.sql(f"IMPORT DATABASE '{dump}'"))
        t("count 2", lambda: dst.sql("SELECT count(*) AS n FROM ev_exp").collect())
        t("final view agg", lambda: dst.sql(
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(b) AS BIGINT) AS total_b "
            "FROM v_bucket GROUP BY event_type"
        ).collect())


def main() -> None:
    which = sys.argv[1:] or ["mor", "sink", "expimp"]
    spark = build_session(app_name="r14-s9-probe")
    spark.range(1000).count()
    for w in which:
        for rep in range(2):
            REGISTRY.ops.clear()
            REGISTRY.counters.clear()
            run_phases(spark, w, rep)
            if rep == 1:
                print(f"--- REGISTRY timers for {w} (rep1) ---")
                for name, s in sorted(REGISTRY.ops.items()):
                    print(
                        f"    {name:30s} n={s.count:4d} "
                        f"total={s.total_ms/1000:8.3f}s avg={s.avg_ms:7.1f}ms"
                    )


if __name__ == "__main__":
    main()
