"""DLQ reprocessing (the reference's operational replay loop: fix the
schema/config, then replay the DLQ topic): corrupt/violating rows land
in <table>_dlq, the config is fixed, ``reprocess_dlq`` re-runs
decode + constraint routing + write, and the final table must be
byte-identical (modulo system timestamps) to a clean ingest."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog
from ducklake_kafka_connect_spark.streaming.ingest import (
    IngestConfig,
    IngestPipeline,
    TableSpec,
)


@pytest.fixture
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "lake"))


def _kafka_batch(spark, payloads, topic="t1"):
    rows = [
        (topic, 0, i, bytearray(p.encode())) for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows, "topic string, partition int, offset long, value binary"
    )


def _cfg(constraints=None):
    return IngestConfig(
        topic2table={"t1": "orders"},
        tables={
            "orders": TableSpec(
                id_columns=["id"],
                auto_create=True,
                check_constraints=constraints or {},
            )
        },
    )


PAYLOADS = [
    '{"id": 1, "qty": 5, "item": "a"}',
    '{"id": 2, "qty": -5, "item": "b"}',   # violates qty_pos
    '{"id": 3, "qty": 7, "item": "c"}',
    '{"id": 4, "qty": -1, "item": "d"}',   # violates qty_pos
]


def _rows(cat, table="orders"):
    return sorted(
        (r["id"], r["qty"], r["item"])
        for r in cat.table(table).read().collect()
    )


class TestReprocessDlq:
    def test_constraint_fix_then_reprocess_matches_clean_ingest(
        self, spark, cat, tmp_path
    ):
        batch = _kafka_batch(spark, PAYLOADS)
        # ingest with an over-strict constraint: 2 rows DLQ
        IngestPipeline(cat, _cfg({"qty_pos": "qty > 0"})).process_batch(batch)
        assert _rows(cat) == [(1, 5, "a"), (3, 7, "c")]
        assert cat.table("orders_dlq").read().count() == 2
        # fix the config (drop the constraint) and replay the DLQ
        fixed = IngestPipeline(cat, _cfg())
        out = fixed.reprocess_dlq("orders")
        assert out == {
            "attempted": 2,
            "landed": 2,
            "residual": 0,
            "dlq_version": out["dlq_version"],
        }
        # landed content identical to a clean ingest of the same batch
        clean_cat = LakeCatalog(spark, str(tmp_path / "clean"))
        IngestPipeline(clean_cat, _cfg()).process_batch(batch)
        assert _rows(cat) == _rows(clean_cat)
        assert cat.table("orders_dlq").read().count() == 0

    def test_still_corrupt_rows_stay_residual(self, spark, cat):
        payloads = PAYLOADS + ["{corrupt", "not json at all"]
        IngestPipeline(cat, _cfg({"qty_pos": "qty > 0"})).process_batch(
            _kafka_batch(spark, payloads)
        )
        assert cat.table("orders_dlq").read().count() == 4  # 2 viol + 2 corrupt
        out = IngestPipeline(cat, _cfg()).reprocess_dlq("orders")
        assert out["attempted"] == 4
        assert out["landed"] == 2
        assert out["residual"] == 2
        assert _rows(cat) == [(1, 5, "a"), (2, -5, "b"), (3, 7, "c"), (4, -1, "d")]
        dlq = cat.table("orders_dlq").read().collect()
        assert len(dlq) == 2
        assert all("corrupt" in r["error"] or "json" in r["error"].lower() for r in dlq)

    def test_reprocess_is_idempotent(self, spark, cat):
        payloads = PAYLOADS + ["{corrupt"]
        IngestPipeline(cat, _cfg({"qty_pos": "qty > 0"})).process_batch(
            _kafka_batch(spark, payloads)
        )
        fixed = IngestPipeline(cat, _cfg())
        first = fixed.reprocess_dlq("orders")
        again = fixed.reprocess_dlq("orders")
        # second run re-attempts only the residual and lands nothing new
        assert first["landed"] == 2 and first["residual"] == 1
        assert again["attempted"] == 1
        assert again["landed"] == 0 and again["residual"] == 1
        assert len(_rows(cat)) == 4
        assert cat.table("orders_dlq").read().count() == 1

    def test_unresolved_constraint_keeps_violations(self, spark, cat):
        IngestPipeline(cat, _cfg({"qty_pos": "qty > 0"})).process_batch(
            _kafka_batch(spark, PAYLOADS)
        )
        # reprocess WITHOUT fixing: violations re-detected, nothing lands
        out = IngestPipeline(cat, _cfg({"qty_pos": "qty > 0"})).reprocess_dlq(
            "orders"
        )
        assert out["attempted"] == 2
        assert out["landed"] == 0 and out["residual"] == 2
        assert _rows(cat) == [(1, 5, "a"), (3, 7, "c")]
        dlq = cat.table("orders_dlq").read().collect()
        assert len(dlq) == 2 and all("qty_pos" in r["error"] for r in dlq)

    def test_missing_or_empty_dlq_is_noop(self, spark, cat):
        pipe = IngestPipeline(cat, _cfg())
        assert pipe.reprocess_dlq("orders") == {
            "attempted": 0, "landed": 0, "residual": 0,
        }
        pipe.process_batch(_kafka_batch(spark, ['{"id": 1, "qty": 2, "item": "a"}']))
        assert pipe.reprocess_dlq("orders") == {
            "attempted": 0, "landed": 0, "residual": 0,
        }

    def test_crash_replay_between_write_and_swap(self, spark, cat):
        """A rerun whose main write already landed (txn marker at the DLQ
        snapshot version) must not duplicate rows, and must still swap."""
        IngestPipeline(cat, _cfg({"qty_pos": "qty > 0"})).process_batch(
            _kafka_batch(spark, PAYLOADS)
        )
        fixed = IngestPipeline(cat, _cfg())
        fixed.reprocess_dlq("orders")
        # simulate the pre-crash write having landed by replaying on the
        # (now-swapped) DLQ — with pk-merge + txn markers a full second
        # pass cannot duplicate
        fixed.reprocess_dlq("orders")
        assert len(_rows(cat)) == 4
        counts = (
            cat.table("orders").read().groupBy("id").count()
            .filter("count > 1").count()
        )
        assert counts == 0
