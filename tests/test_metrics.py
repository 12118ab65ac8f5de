"""Metrics registry + write-path instrumentation + streaming listener
(reference operators F1-F3; ``connect/DucklakeMetricsTest.java`` is the
model)."""

import json

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.metrics import (
    REGISTRY,
    IngestMetricsListener,
    MetricsRegistry,
)


class TestRegistry:
    def test_timer_and_counters(self):
        reg = MetricsRegistry()
        with reg.timer("op_a"):
            pass
        with reg.timer("op_a"):
            pass
        reg.inc("records_processed", 42)
        snap = reg.snapshot()
        assert snap["operations"]["op_a"]["count"] == 2
        assert snap["operations"]["op_a"]["avg_ms"] >= 0
        assert snap["counters"]["records_processed"] == 42

    def test_timer_records_on_exception(self):
        reg = MetricsRegistry()
        try:
            with reg.timer("failing"):
                raise RuntimeError("x")
        except RuntimeError:
            pass
        assert reg.snapshot()["operations"]["failing"]["count"] == 1


class TestWritePathInstrumentation:
    def test_merge_and_insert_ops_recorded(self, spark, tmp_path):
        before = {
            op: s["count"]
            for op, s in REGISTRY.snapshot()["operations"].items()
        }
        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("m"), pk=["id"])
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        w.write(df)   # create + insert
        w.write(df)   # merge
        after = REGISTRY.snapshot()["operations"]
        assert after["createTable"]["count"] == before.get("createTable", 0) + 1
        assert after["simpleInsert"]["count"] == before.get("simpleInsert", 0) + 1
        assert after["upsertWithMergeInto"]["count"] == before.get("upsertWithMergeInto", 0) + 1


class TestStreamingListener:
    def test_listener_bridges_progress(self, spark, tmp_path):
        reg = MetricsRegistry()
        listener = IngestMetricsListener(reg)
        spark.streams.addListener(listener)
        try:
            src = tmp_path / "src"
            src.mkdir()
            (src / "a.json").write_text(
                "\n".join(json.dumps({"x": i}) for i in range(10))
            )
            q = (
                spark.readStream.format("json")
                .schema("x long")
                .load(str(src))
                .groupBy()
                .agg(F.count(F.lit(1)).alias("n"))
                .writeStream.format("memory")
                .queryName("metrics_probe")
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            # listener callbacks are async; give the bus a moment
            import time

            for _ in range(40):
                snap = reg.snapshot()
                if snap["counters"].get("records_processed", 0) >= 10:
                    break
                time.sleep(0.25)
            assert snap["counters"]["queries_started"] >= 1
            assert snap["counters"]["records_processed"] >= 10
            assert snap["operations"]["micro_batch"]["count"] >= 1
        finally:
            spark.streams.removeListener(listener)
