"""TableSpec(transform=...) — the B13 SMT hook."""

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog
from ducklake_kafka_connect_spark.streaming.ingest import (
    IngestConfig,
    IngestPipeline,
    TableSpec,
)


def _frame(spark, payloads):
    rows = [("t1", 0, i, p.encode()) for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows, "topic string, partition int, offset long, value binary"
    )


class TestSmtHook:
    def test_transform_rewrites_rows_before_write(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path / "lake"))

        def smt(df):
            return df.withColumn(
                "ts_iso",
                F.from_unixtime(
                    (F.col("ts_ms") / 1000).cast("long"), "yyyy-MM-dd HH:mm:ss"
                ),
            ).drop("ts_ms")

        cfg = IngestConfig(
            topic2table={"t1": "ev"},
            tables={"ev": TableSpec(auto_create=True, transform=smt)},
        )
        IngestPipeline(cat, cfg).process_batch(
            _frame(
                spark,
                [
                    '{"id": 1, "ts_ms": 1700000000000}',
                    '{"id": 2, "ts_ms": 1700000060000}',
                ],
            )
        )
        rows = {r["id"]: r for r in cat.table("ev").read().collect()}
        assert "ts_ms" not in cat.table("ev").read().columns
        assert rows[1]["ts_iso"] == "2023-11-14 22:13:20"
        assert rows[2]["ts_iso"] == "2023-11-14 22:14:20"

    def test_no_transform_is_identity(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path / "lake2"))
        cfg = IngestConfig(
            topic2table={"t1": "ev"},
            tables={"ev": TableSpec(auto_create=True)},
        )
        IngestPipeline(cat, cfg).process_batch(
            _frame(spark, ['{"id": 7, "v": 1}'])
        )
        rows = cat.table("ev").read().collect()
        assert rows[0]["id"] == 7 and rows[0]["v"] == 1

    def test_transform_composes_with_constraints(self, spark, tmp_path):
        # constraint routing runs BEFORE the transform: a violating row
        # reaches the DLQ in its pre-transform shape
        cat = LakeCatalog(spark, str(tmp_path / "lake3"))

        def smt(df):
            return df.withColumn("vv", F.col("v") * 10)

        cfg = IngestConfig(
            topic2table={"t1": "ev"},
            tables={
                "ev": TableSpec(
                    auto_create=True,
                    transform=smt,
                    check_constraints={"pos": "v > 0"},
                )
            },
        )
        IngestPipeline(cat, cfg).process_batch(
            _frame(spark, ['{"id": 1, "v": 5}', '{"id": 2, "v": -3}'])
        )
        landed = cat.table("ev").read().collect()
        assert len(landed) == 1 and landed[0]["vv"] == 50
        assert cat.table("ev_dlq").read().count() == 1
