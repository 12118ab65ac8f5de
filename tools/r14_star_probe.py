"""r14: per-step wall + job-count decomposition of matview_star_join."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ducklake_kafka_connect_spark.lake import LakeWriter  # noqa: E402
from ducklake_kafka_connect_spark.plans.format_parity import (  # noqa: E402
    _event_source,
    _fresh_catalog,
)
from ducklake_kafka_connect_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="r14-star-probe")
    st = spark.sparkContext.statusTracker()

    def t(label, fn):
        j0 = len(st.getJobIdsForGroup(None) or []) or (st.getJobIdsForGroup() or [None])[0] or 0
        jid0 = (spark.sparkContext._jsc.sc().dagScheduler().nextJobId().id()
                if False else None)
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        print(f"{label:42s} {dt:7.3f}s", flush=True)
        return r

    for rep in range(2):
        print(f"--- rep {rep} ---")
        cat = _fresh_catalog(spark, f"mvstar{rep}")
        ev = t("event_source", lambda: _event_source(spark, sf_dir))
        fact0 = ev.filter(F.col("event_id") % 6 == 0).select(
            "event_id", "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        wf = LakeWriter(cat.table("fact_ev"), pk=["event_id"])
        t("write fact (held back %66)", lambda: wf.write(fact0.filter(F.col("event_id") % 66 != 0)))
        dim = ev.select("event_type").distinct().select(
            "event_type",
            F.when(F.length("event_type") % 2 == 0, F.lit("even"))
            .otherwise(F.lit("odd")).alias("bucket"),
        )
        t("write dim", lambda: LakeWriter(cat.table("dim_et"), pk=["event_type"]).write(dim))
        t("CREATE MATVIEW", lambda: cat.sql(
            "CREATE MATERIALIZED VIEW mv_star AS SELECT bucket, "
            "sum(cents) AS total, count(*) AS n FROM fact_ev "
            "JOIN dim_et ON fact_ev.event_type = dim_et.event_type "
            "GROUP BY bucket"))
        held = fact0.filter(F.col("event_id") % 66 == 0)
        t("write held", lambda: wf.write(held))
        t("REFRESH #1 (insert fold)", lambda: cat.sql("REFRESH MATERIALIZED VIEW mv_star").collect())
        t("delete_where %66", lambda: wf.delete_where("event_id % 66 = 0"))
        t("REFRESH #2 (delete fold)", lambda: cat.sql("REFRESH MATERIALIZED VIEW mv_star").collect())
        first = dim.orderBy("event_type").limit(1)
        t("dim merge flip", lambda: LakeWriter(cat.table("dim_et"), pk=["event_type"]).merge(
            first.withColumn("bucket", F.lit("flipped"))))
        def _refuse():
            try:
                cat.sql("REFRESH MATERIALIZED VIEW mv_star")
            except ValueError:
                pass
        t("REFRESH refuse (dim changed)", _refuse)
        t("dim merge restore", lambda: LakeWriter(cat.table("dim_et"), pk=["event_type"]).merge(first))
        t("REFRESH FULL", lambda: cat.sql("REFRESH MATERIALIZED VIEW mv_star FULL").collect())
        t("final read", lambda: cat.table("mv_star").read().select("bucket", "total", "n").collect())


if __name__ == "__main__":
    main()
