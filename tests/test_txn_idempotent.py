"""Idempotent epoch commits (Delta txnAppId/txnVersion analogue):
``txn=(app_id, epoch)`` markers in manifest props make foreachBatch
replays exact no-ops — the E8 exactly-once upgrade for APPEND tables
(MERGE tables were already idempotent per key).
"""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.table import COMPACT_EVERY


@pytest.fixture()
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "lake"))


def _batch(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("payload")
    )


class TestTxnAppend:
    def test_replayed_append_epoch_is_skipped(self, spark, cat):
        w = LakeWriter(cat.table("t"), pk=[])
        w.append(_batch(spark, 0, 10), txn=("app", 7))
        v1 = cat.table("t").current_version()
        w.append(_batch(spark, 0, 10), txn=("app", 7))  # replay
        assert cat.table("t").current_version() == v1
        assert cat.table("t").read().count() == 10

    def test_next_epoch_still_lands(self, spark, cat):
        w = LakeWriter(cat.table("t"), pk=[])
        w.append(_batch(spark, 0, 10), txn=("app", 1))
        w.append(_batch(spark, 10, 20), txn=("app", 2))
        assert cat.table("t").read().count() == 20

    def test_earlier_epoch_also_skipped(self, spark, cat):
        """Marker is a high-water mark: any epoch <= recorded skips
        (restart from an old checkpoint must not re-append)."""
        w = LakeWriter(cat.table("t"), pk=[]); cat  # noqa: B018
        w.append(_batch(spark, 0, 10), txn=("app", 5))
        w.append(_batch(spark, 10, 20), txn=("app", 3))
        assert cat.table("t").read().count() == 10

    def test_independent_apps_do_not_interfere(self, spark, cat):
        w = LakeWriter(cat.table("t"), pk=[])
        w.append(_batch(spark, 0, 10), txn=("app_a", 1))
        w.append(_batch(spark, 10, 20), txn=("app_b", 1))
        assert cat.table("t").read().count() == 20

    def test_untagged_append_unchanged(self, spark, cat):
        w = LakeWriter(cat.table("t"), pk=[])
        w.append(_batch(spark, 0, 10))
        w.append(_batch(spark, 0, 10))
        assert cat.table("t").read().count() == 20


class TestTxnWriteAndGroup:
    def test_replayed_merge_epoch_skips_the_write(self, spark, cat):
        w = LakeWriter(cat.table("t"), pk=["k"])
        w.write(_batch(spark, 0, 10, "base"), txn=("app", 1))
        w.write(_batch(spark, 5, 15, "up"), txn=("app", 2))
        v = cat.table("t").current_version()
        w.write(_batch(spark, 5, 15, "up"), txn=("app", 2))  # replay
        assert cat.table("t").current_version() == v
        rows = {r.k: r.payload for r in cat.table("t").read().collect()}
        assert rows[3] == "base" and rows[7] == "up" and len(rows) == 15

    def test_write_many_group_marks_final_commit_only(self, spark, cat):
        w = LakeWriter(cat.table("t"), pk=[])
        w.write_many(
            [_batch(spark, 0, 5), _batch(spark, 5, 10)], txn=("app", 1)
        )
        assert cat.table("t").read().count() == 10
        w.write_many(
            [_batch(spark, 0, 5), _batch(spark, 5, 10)], txn=("app", 1)
        )  # replay: whole group skipped
        assert cat.table("t").read().count() == 10

    def test_marker_survives_delta_chain_and_compaction(self, spark, cat):
        w = LakeWriter(cat.table("t"), pk=[])
        w.append(_batch(spark, 0, 5), txn=("app", 1))
        # push the manifest chain through > one full compaction cycle
        for i in range(COMPACT_EVERY + 2):
            w.append(_batch(spark, 100 + i, 101 + i))
        assert w.txn_applied(("app", 1))
        w.append(_batch(spark, 0, 5), txn=("app", 1))  # replay after chain
        assert cat.table("t").read().count() == 5 + COMPACT_EVERY + 2


class TestIngestEpochIdempotence:
    def test_process_batch_replay_same_epoch_is_noop(self, spark, cat):
        from ducklake_kafka_connect_spark.streaming.ingest import (
            IngestConfig,
            IngestPipeline,
            TableSpec,
        )

        rows = [
            ("t1", 0, 0, bytearray(b'{"id": 1, "v": "x"}')),
            ("t1", 0, 1, bytearray(b'{"id": 2, "v": "y"}')),
            ("t1", 0, 2, bytearray(b"{corrupt")),
        ]
        batch = spark.createDataFrame(
            rows, "topic string, partition int, offset long, value binary"
        )
        cfg = IngestConfig(
            topic2table={"t1": "tbl"},
            tables={"tbl": TableSpec(id_columns=["id"], auto_create=True)},
        )
        pipe = IngestPipeline(cat, cfg)
        pipe.process_batch(batch, epoch_id=0)
        pipe.process_batch(batch, epoch_id=0)  # replayed epoch
        assert cat.table("tbl").read().count() == 2
        assert cat.table("tbl_dlq").read().count() == 1  # DLQ not doubled
        pipe.process_batch(batch, epoch_id=1)  # new epoch: merge absorbs,
        assert cat.table("tbl").read().count() == 2
        assert cat.table("tbl_dlq").read().count() == 2  # appends land again


def test_check_constraints_route_rows_to_dlq(spark, tmp_path):
    """TableSpec CHECK constraints: violating rows DLQ with the violated
    constraint names; clean rows land; the pipeline never raises."""
    from pyspark.sql import functions as F

    from ducklake_kafka_connect_spark.lake import LakeCatalog
    from ducklake_kafka_connect_spark.streaming.ingest import (
        IngestConfig,
        IngestPipeline,
        TableSpec,
    )

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cfg = IngestConfig(
        topic2table={"t1": "orders"},
        tables={
            "orders": TableSpec(
                id_columns=["id"],
                auto_create=True,
                check_constraints={"qty_pos": "qty > 0", "item_set": "item IS NOT NULL"},
            )
        },
    )
    payload = F.to_json(
        F.struct(
            F.col("id"),
            F.when(F.col("id") == 2, -5).otherwise(F.col("id") + 10).alias("qty"),
            F.when(F.col("id") == 3, F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("item_"), F.col("id")))
            .alias("item"),
        )
    )
    batch = spark.range(5).select(
        F.lit("t1").alias("topic"), F.col("id").alias("offset"), payload.alias("value")
    )
    IngestPipeline(cat, cfg).process_batch(batch)
    good = {r["id"] for r in cat.table("orders").read().collect()}
    assert good == {0, 1, 4}
    dlq = cat.table("orders_dlq").read().collect()
    errs = {r["error"] for r in dlq}
    assert len(dlq) == 2
    assert any("qty_pos" in e for e in errs)
    assert any("item_set" in e for e in errs)
