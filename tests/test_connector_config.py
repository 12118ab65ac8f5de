"""build_from_properties: the reference's Kafka Connect properties dict
drives this engine unchanged (DucklakeSinkConfig.java key set)."""

import json

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.connector_config import (
    ConnectorDeployment,
    build_from_properties,
)
from ducklake_kafka_connect_spark.lake.storage import DataPathError

BASE_PROPS = {
    "name": "ducklake-sink",
    "connector.class": "com.inyo.ducklake.connect.DucklakeSinkConnector",
    "tasks.max": "2",
    "topics": "orders,events",
    "value.converter": "org.apache.kafka.connect.json.JsonConverter",
    "topic2table.map": "orders:orders_tbl,events:events_tbl",
    "ducklake.catalog_uri": "postgresql://pg:5432/catalog",
    "ducklake.table.orders_tbl.id-columns": "order_id, region",
    "ducklake.table.orders_tbl.partition-by": "year(ts)",
    "ducklake.table.orders_tbl.auto-create": "true",
    "ducklake.table.events_tbl.auto-create": "true",
    "ducklake.max_retry_count": "7",
    "data.inlining.row.limit": "5000",
    "flush.size": "50000",
    "flush.interval.ms": "5000",
    "file.size.bytes": "134217728",
    "duckdb.threads": "16",
    "parallel.partition.flush": "true",
    "spill.enabled": "false",
}


def test_full_properties_roundtrip(spark, tmp_path):
    props = dict(BASE_PROPS, **{"ducklake.data_path": str(tmp_path / "lake")})
    d = build_from_properties(spark, props)
    assert isinstance(d, ConnectorDeployment)
    assert d.backend_name == "posix" and d.catalog is not None
    spec = d.ingest.tables["orders_tbl"]
    assert spec.id_columns == ["order_id", "region"]
    assert spec.partition_by == "year(ts)" and spec.auto_create
    assert spec.format == "json"
    assert d.ingest.tables["events_tbl"].id_columns == []
    assert d.ingest.max_retry_count == 7
    assert d.ingest.table_for("orders") == "orders_tbl"
    assert d.ingest.table_for("unmapped") == "unmapped"  # identity fallback
    assert d.stream_options == {
        "topics": "orders,events",
        "bootstrap_servers": "localhost:9092",
        "max_offsets_per_trigger": 50000,
    }
    assert d.trigger == {"processingTime": "5000 milliseconds"}
    assert d.engine_conf == {
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "134217728",
    }
    assert "ducklake.catalog_uri" in d.native
    assert "parallel.partition.flush" in d.native and "spill.enabled" in d.native
    assert d.unknown == [] and d.hadoop_conf == {}


def test_pipeline_end_to_end_from_properties(spark, tmp_path):
    props = dict(BASE_PROPS, **{"ducklake.data_path": str(tmp_path / "lake")})
    d = build_from_properties(spark, props)
    pipe = d.pipeline()
    payloads = [
        (i, json.dumps({"order_id": i, "region": "eu", "v": i * 2,
                "ts": f"2024-03-{(i % 27) + 1:02d}T12:00:00Z"}))
        for i in range(20)
    ]
    frame = spark.createDataFrame(
        [("orders", 0, i, None, p, None, None) for i, p in payloads],
        "topic string, partition int, offset long, key binary, "
        "value string, timestamp timestamp, headers string",
    ).withColumn("value", F.col("value").cast("binary"))
    pipe.process_batch(frame)
    t = d.catalog.table("orders_tbl")
    assert t.read().count() == 20
    # the configured retry knob reached the writers
    assert d.ingest.max_retry_count == 7
    # MERGE semantics from id-columns: re-deliver with changed values
    frame2 = spark.createDataFrame(
        [
            ("orders", 0, 100 + i, None,
             json.dumps({"order_id": i, "region": "eu", "v": 999,
                         "ts": "2024-04-01T08:00:00Z"}), None, None)
            for i in range(10)
        ],
        "topic string, partition int, offset long, key binary, "
        "value string, timestamp timestamp, headers string",
    ).withColumn("value", F.col("value").cast("binary"))
    pipe.process_batch(frame2)
    rows = {r["order_id"]: r["v"] for r in t.read().collect()}
    assert len(rows) == 20 and rows[3] == 999 and rows[15] == 30


def test_s3_path_selects_cas_backend_and_conf(spark):
    props = {
        "ducklake.data_path": "s3://training-lake/corpora",
        "s3.endpoint": "minio.internal:9000",
        "s3.access_key_id": "AK",
        "s3.secret_access_key": "SK",
        "s3.url_style": "path",
        "s3.use_ssl": "false",
        "topic2table.map": "t:tbl",
    }
    d = build_from_properties(spark, props)
    assert d.backend_name == "cas"
    assert d.catalog is None  # needs a bucket-backed StorageBackend + jars
    assert d.hadoop_conf["fs.s3a.endpoint"] == "minio.internal:9000"
    assert d.hadoop_conf["fs.s3a.path.style.access"] == "true"
    assert d.hadoop_conf["fs.s3a.connection.ssl.enabled"] == "false"
    with pytest.raises(ValueError, match="object-store data path"):
        d.pipeline()


def test_avro_converter_selects_registry_format(spark, tmp_path):
    props = {
        "ducklake.data_path": str(tmp_path / "lake"),
        "topic2table.map": "t:tbl",
        "value.converter": "io.confluent.connect.avro.AvroConverter",
        "value.converter.schema.registry.url": "http://sr:8081",
    }
    d = build_from_properties(spark, props)
    spec = d.ingest.tables["tbl"]
    assert spec.format == "avro_registry" and spec.confluent_framing


def test_validation_errors_and_unknown_keys(spark, tmp_path):
    with pytest.raises(DataPathError):
        build_from_properties(spark, {"ducklake.data_path": "relative/path"})
    with pytest.raises(ValueError, match="Invalid integer"):
        build_from_properties(
            spark,
            {"ducklake.data_path": str(tmp_path), "ducklake.max_retry_count": "ten"},
        )
    with pytest.raises(ValueError, match="Invalid boolean"):
        build_from_properties(
            spark,
            {
                "ducklake.data_path": str(tmp_path),
                "topic2table.map": "t:tbl",
                "ducklake.table.tbl.auto-create": "maybe",
            },
        )
    d = build_from_properties(
        spark,
        {
            "ducklake.data_path": str(tmp_path),
            "ducklake.mystery_knob": "1",
            "s3.regionn": "typo",
        },
    )
    assert d.unknown == ["ducklake.mystery_knob", "s3.regionn"]
