"""Error enrichment with sample values (reference
SinkRecordToArrowConverter.java:305-385 / ImprovedErrorMessageTest) and
multi-topic mixed-schema batches (SchemaMismatchIntegrationTest.java:92-179)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.schema.merge import (
    SchemaUnificationError,
    unify_types,
)
from ducklake_kafka_connect_spark.schema.reconcile import (
    ReconcileError,
    enriched_reconcile_message,
    plan_evolution,
)
from ducklake_kafka_connect_spark.streaming.ingest import (
    IngestConfig,
    IngestPipeline,
    TableSpec,
)


def test_unify_error_carries_field_types_and_samples():
    with pytest.raises(SchemaUnificationError) as ei:
        unify_types([T.StringType(), T.TimestampType()], field="ts")
    err = ei.value.with_samples(["hello", "2023-01-01T00:00:00Z", "x"] * 3)
    msg = str(err)
    assert "ts" in msg and "string" in msg and "timestamp" in msg
    assert "'hello'" in msg, "sample values must appear in the message"
    assert len(err.samples) == 5, "samples capped at 5"


def test_reconcile_error_attrs_and_message(spark):
    existing = T.StructType([T.StructField("v", T.DoubleType())])
    incoming = T.StructType([T.StructField("v", T.StringType())])
    with pytest.raises(ReconcileError) as ei:
        plan_evolution(existing, incoming)
    err = ei.value
    assert err.field == "v"
    assert isinstance(err.existing, T.DoubleType)
    assert isinstance(err.incoming, T.StringType)
    df = spark.createDataFrame([("abc",), ("def",)], "v string")
    msg = enriched_reconcile_message(err, df)
    assert "v" in msg and "double" in msg and "string" in msg
    assert "'abc'" in msg or "'def'" in msg


def _kafka_batch(spark, rows):
    return spark.createDataFrame(rows, "topic string, offset long, value string")


def test_reconcile_dlq_rows_carry_enriched_error(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    # pre-create table with v: double
    w = LakeWriter(cat.table("m"), pk=[])
    w.append(spark.createDataFrame([(1, 1.5)], "id int, v double"))
    cfg = IngestConfig(topic2table={"t": "m"}, tables={"m": TableSpec(auto_create=True)})
    pipe = IngestPipeline(cat, cfg)
    # incoming batch where v is an ISO timestamp → TimestampType → INCOMPATIBLE
    batch = _kafka_batch(
        spark,
        [("t", 0, json.dumps({"id": 2, "v": "2023-05-01T10:00:00Z"}))],
    )
    pipe.process_batch(batch)
    dlq = cat.table("m_dlq").read().collect()
    assert len(dlq) == 1
    msg = dlq[0]["error"]
    assert "v" in msg and "double" in msg and "timestamp" in msg
    assert "sample values" in msg and "2023, 5, 1" in msg  # datetime repr of the value
    # table unchanged
    assert cat.table("m").read().count() == 1


def test_json_inference_conflict_note_on_dlq(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cfg = IngestConfig(topic2table={"t": "j"}, tables={"j": TableSpec(auto_create=True)})
    pipe = IngestPipeline(cat, cfg)
    rows = [
        ("t", 0, json.dumps({"id": 1, "ts": "2023-01-01T00:00:00Z"})),
        ("t", 1, json.dumps({"id": 2, "ts": "definitely-not-a-time"})),
        ("t", 2, "{broken json"),
    ]
    pipe.process_batch(_kafka_batch(spark, rows))
    dlq = cat.table("j_dlq").read().collect()
    assert dlq, "corrupt row must be DLQ'd"
    msg = dlq[0]["error"]
    assert "ts" in msg and "schema_conflict" in msg
    assert "definitely-not-a-time" in msg, "conflicting sample value surfaces in the note"


def test_multi_topic_mixed_schema_batch(spark, tmp_path):
    """One micro-batch spanning two topics with different (conflicting)
    schemas per topic: both tables land correctly, corrupt rows DLQ per
    topic, no cross-topic schema contamination."""
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cfg = IngestConfig(
        topic2table={"users": "users_t", "orders": "orders_t"},
        tables={
            "users_t": TableSpec(id_columns=["id"], auto_create=True),
            "orders_t": TableSpec(id_columns=["id"], auto_create=True),
        },
    )
    pipe = IngestPipeline(cat, cfg)
    rows = [
        ("users", 0, json.dumps({"id": 1, "name": "ann"})),
        ("users", 1, json.dumps({"id": 2, "name": "bo"})),
        ("users", 2, "}corrupt-user"),
        ("orders", 0, json.dumps({"id": 10, "price": 9.5})),
        ("orders", 1, json.dumps({"id": 11, "price": 1.25})),
        ("orders", 2, "corrupt-order{"),
    ]
    pipe.process_batch(_kafka_batch(spark, rows))

    users = {r["id"]: r for r in cat.table("users_t").read().collect()}
    orders = {r["id"]: r for r in cat.table("orders_t").read().collect()}
    assert set(users) == {1, 2} and users[1]["name"] == "ann"
    assert set(orders) == {10, 11} and abs(orders[10]["price"] - 9.5) < 1e-9
    # schemas stay per-topic: no column bleed between tables
    assert "price" not in cat.table("users_t").read().columns
    assert "name" not in cat.table("orders_t").read().columns
    assert cat.table("users_t_dlq").read().count() == 1
    assert cat.table("orders_t_dlq").read().count() == 1
