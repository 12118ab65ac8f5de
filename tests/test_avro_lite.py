"""Pure-Python Avro binary codec: round-trips through the encoder, the
Spark mapInPandas decode path, nullable unions, nested structures,
logical timestamps, and Confluent registry framing
(``AvroIntegrationTest.java:101-163`` is the reference model)."""

import json

import pytest

from ducklake_kafka_connect_spark.sources.avro_lite import (
    _Reader,
    _decode,
    avro_to_spark_type,
    decode_avro_lite,
    decode_confluent_framing,
    encode_avro,
)

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "customer", "type": ["null", "string"]},
            {"name": "amount", "type": "double"},
            {"name": "flags", "type": {"type": "array", "items": "int"}},
            {"name": "attrs", "type": {"type": "map", "values": "string"}},
            {
                "name": "created_at",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {
                "name": "address",
                "type": {
                    "type": "record",
                    "name": "Addr",
                    "fields": [
                        {"name": "city", "type": "string"},
                        {"name": "zip", "type": ["null", "string"]},
                    ],
                },
            },
        ],
    }
)

REC = {
    "id": 42,
    "customer": "alice",
    "amount": 12.5,
    "flags": [1, -2, 3],
    "attrs": {"k1": "v1", "k2": "v2"},
    "created_at": 1704103200123,
    "address": {"city": "Springfield", "zip": None},
}


def test_binary_round_trip():
    payload = encode_avro(SCHEMA, REC)
    out = _decode(json.loads(SCHEMA), _Reader(payload))
    assert out == REC


def test_zigzag_negative_longs():
    s = json.dumps({"type": "record", "name": "R",
                    "fields": [{"name": "x", "type": "long"}]})
    for v in (0, -1, 1, -(2**40), 2**40, -(2**62)):
        assert _decode(json.loads(s), _Reader(encode_avro(s, {"x": v})))["x"] == v


def test_spark_schema_mapping():
    st = avro_to_spark_type(json.loads(SCHEMA))
    d = {f.name: f for f in st.fields}
    assert d["id"].dataType.simpleString() == "bigint" and not d["id"].nullable
    assert d["customer"].nullable
    assert d["created_at"].dataType.simpleString() == "timestamp"
    assert d["flags"].dataType.simpleString() == "array<int>"
    assert d["attrs"].dataType.simpleString() == "map<string,string>"
    assert d["address"].dataType.simpleString() == "struct<city:string,zip:string>"


def test_dataframe_decode(spark):
    recs = [
        REC,
        {**REC, "id": 43, "customer": None, "flags": [], "attrs": {}},
    ]
    rows = [(encode_avro(SCHEMA, r),) for r in recs] + [(None,)]
    df = spark.createDataFrame(rows, "value binary")
    out = decode_avro_lite(df, SCHEMA)
    got = {r["id"]: r for r in out.collect()}
    assert got[42]["customer"] == "alice"
    assert got[42]["address"]["city"] == "Springfield"
    assert str(got[42]["created_at"]).startswith("2024-01-01")
    assert got[43]["customer"] is None
    assert got[43]["flags"] == []
    assert None in got  # null payload → all-null row


def test_confluent_framing(spark):
    payload = encode_avro(SCHEMA, REC)
    framed = b"\x00" + (1234).to_bytes(4, "big") + payload
    assert decode_confluent_framing(framed) == payload
    df = spark.createDataFrame([(framed,)], "value binary")
    out = decode_avro_lite(df, SCHEMA, confluent_framing=True).collect()
    assert out[0]["id"] == 42


def test_top_level_must_be_record():
    with pytest.raises(ValueError):
        decode_avro_lite(None, json.dumps("string"))
