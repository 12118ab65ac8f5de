"""Schema-registry Avro resolution (reference AvroIntegrationTest.java:
109-163): a topic whose records span multiple registered schema versions
decodes per-record by schema id and lands as ONE unified batch that
MERGEs cleanly."""

import json
import struct

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.sources.avro_lite import encode_avro
from ducklake_kafka_connect_spark.sources.schema_registry import (
    DictSchemaRegistry,
    HttpSchemaRegistry,
    decode_avro_registry,
    schema_id_col,
)

V1 = json.dumps(
    {
        "type": "record",
        "name": "User",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "name", "type": "string"},
        ],
    }
)
V2 = json.dumps(
    {
        "type": "record",
        "name": "User",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "email", "type": ["null", "string"], "default": None},
        ],
    }
)


def frame(schema_id: int, body: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", schema_id) + body


def payloads():
    return [
        frame(1, encode_avro(V1, {"id": 1, "name": "a"})),
        frame(1, encode_avro(V1, {"id": 2, "name": "b"})),
        frame(2, encode_avro(V2, {"id": 3, "name": "c", "email": "c@x.io"})),
        frame(2, encode_avro(V2, {"id": 2, "name": "b2", "email": None})),
    ]


@pytest.fixture()
def batch_df(spark):
    return spark.createDataFrame(
        [("t", i, p) for i, p in enumerate(payloads())],
        "topic string, offset long, value binary",
    )


def test_schema_id_extraction(spark, batch_df):
    ids = sorted(
        r[0]
        for r in batch_df.select(schema_id_col().alias("sid")).distinct().collect()
    )
    assert ids == [1, 2]


def test_multi_schema_batch_unifies(spark, batch_df):
    reg = DictSchemaRegistry({1: V1, 2: V2})
    out = decode_avro_registry(batch_df, reg, keep_cols=["topic", "offset"])
    rows = {(r["id"], r["offset"]): r for r in out.collect()}
    # unified schema: id promoted int→long, email present (null for v1 rows)
    assert dict(out.dtypes)["id"] == "bigint"
    assert "email" in out.columns
    assert rows[(1, 0)]["email"] is None
    assert rows[(3, 2)]["email"] == "c@x.io"
    assert all(r["_corrupt"] is None for r in rows.values())


def test_unknown_id_and_garbage_dlqd(spark):
    bad = [
        frame(99, b"\x02\x02"),        # unregistered schema id
        b"\x01not-framed-at-all",       # missing magic
    ]
    df = spark.createDataFrame(
        [("t", i, p) for i, p in enumerate(payloads()[:1] + bad)],
        "topic string, offset long, value binary",
    )
    reg = DictSchemaRegistry({1: V1, 2: V2})
    out = decode_avro_registry(df, reg).collect()
    corrupt = [r for r in out if r["_corrupt"] is not None]
    ok = [r for r in out if r["_corrupt"] is None]
    assert len(corrupt) == 2 and len(ok) == 1
    assert ok[0]["name"] == "a"


def test_decoded_batch_merges_cleanly(spark, tmp_path, batch_df):
    reg = DictSchemaRegistry({1: V1, 2: V2})
    decoded = decode_avro_registry(batch_df, reg, keep_cols=["offset"])
    clean = decoded.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    w = LakeWriter(cat.table("users"), pk=["id"])
    w.write(clean, order_col="offset")  # create + insert (offset becomes a column)
    w.write(clean, order_col="offset")  # idempotent MERGE, in-batch dup by offset
    rows = {r["id"]: r for r in cat.table("users").read().collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["name"] == "b2", "later offset wins for the duplicated key"
    assert rows[3]["email"] == "c@x.io"


def test_http_registry_caches(monkeypatch):
    calls = {"n": 0}

    class FakeResp:
        def __init__(self, body):
            self.body = body

        def read(self):
            return self.body

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        calls["n"] += 1
        assert req.full_url.endswith("/schemas/ids/7")
        return FakeResp(json.dumps({"schema": V1}).encode())

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    reg = HttpSchemaRegistry("http://registry:8081/")
    assert json.loads(reg.get_schema(7))["name"] == "User"
    assert json.loads(reg.get_schema(7))["name"] == "User"
    assert calls["n"] == 1, "immutable schemas are cached per id"

    def err_urlopen(req, timeout=None):
        raise OSError("connection refused")

    monkeypatch.setattr(urllib.request, "urlopen", err_urlopen)
    with pytest.raises(KeyError):
        reg.get_schema(8)
