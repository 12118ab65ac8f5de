"""Isolate the MOR-span changes() feed of cdf_over_mor_merge: build the
fixture once, then time + explain ONLY the table_changes() frame."""

from __future__ import annotations

import io
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ducklake_kafka_connect_spark.lake.mor import MODE_MOR  # noqa: E402
from ducklake_kafka_connect_spark.lake.table import LakeCatalog  # noqa: E402
from ducklake_kafka_connect_spark.lake.writer import LakeWriter  # noqa: E402
from ducklake_kafka_connect_spark.plans.queries import _t  # noqa: E402
from ducklake_kafka_connect_spark.session import build_session  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
plan_out = sys.argv[2] if len(sys.argv) > 2 else ""

spark = build_session(app_name="r14-cdf-probe")
spark.range(1000).count()

ev = _t(spark, sf_dir, "events").select(
    "event_id",
    "event_type",
    F.floor(F.col("value") * 100).cast("long").alias("cents"),
)
lake_dir = os.path.join(tempfile.gettempdir(), f"ducklake_cdfprobe_{uuid.uuid4().hex[:8]}")
cat = LakeCatalog(spark, lake_dir)
t = cat.table("events_cdfmor")
w = LakeWriter(t, pk=["event_id"], merge_mode=MODE_MOR)
w.write(ev.filter(F.col("event_id") % 10 < 8))
v0 = t.current_version()
w.write(
    ev.filter(F.col("event_id") % 10 >= 5)
    .withColumn("cents", F.col("cents") + F.lit(1000))
    .withColumn("event_type", F.lit("updated"))
)
w.delete_where("event_id % 7 = 0")
v1 = t.current_version()

tracker = spark.sparkContext.statusTracker()
for r in range(3):
    j0 = len(tracker.getJobIdsForGroup() or [])
    spark.sparkContext.setJobGroup(f"feed-r{r}", "feed")
    t0 = time.perf_counter()
    feed = t.changes(v0, v1)
    n = feed.count()
    t1 = time.perf_counter()
    jobs = len(tracker.getJobIdsForGroup(f"feed-r{r}") or [])
    print(f"feed run{r}: {t1 - t0:.3f}s rows={n} jobs={jobs}", flush=True)

if plan_out:
    feed = t.changes(v0, v1)
    buf = io.StringIO()
    _stdout = sys.stdout
    sys.stdout = buf
    feed.explain("formatted")
    sys.stdout = _stdout
    with open(plan_out, "w") as fh:
        fh.write(buf.getvalue())
    print(f"plan -> {plan_out} ({len(buf.getvalue())} bytes)")
