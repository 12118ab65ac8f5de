"""JVM fast-path selection (VERDICT r4 #6): the engine must prefer the
spark-avro / spark-sql-kafka jar paths when present and fall back to the
pure-Python / file-stream stand-ins when absent — and jar absence must
be VISIBLE in the pytest summary as a skip-with-reason, not silently
untested.

Selection logic is unit-tested with mocked capability probes; the
real-jar tests self-skip in jarless images (this one) and light up
unchanged on a cluster image that ships the jars.
"""

import json

import pytest

from ducklake_kafka_connect_spark.session import jvm_capabilities
from ducklake_kafka_connect_spark.sources import avro_decode as AD
from ducklake_kafka_connect_spark.sources import kafka_source as KS
from ducklake_kafka_connect_spark.sources.avro_lite import encode_avro

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
)


class TestCapabilityProbe:
    def test_mocked_probes_reported(self, spark):
        caps = jvm_capabilities(
            spark, probes={"avro": lambda s: True, "kafka": lambda s: False}
        )
        assert caps == {"avro": True, "kafka": False}

    def test_real_probe_cached(self, spark):
        first = jvm_capabilities(spark)
        assert set(first) == {"avro", "kafka"}
        # second call must hit the cache (same dict object)
        assert jvm_capabilities(spark) is first

    def test_mocked_probes_bypass_cache(self, spark):
        jvm_capabilities(spark)  # populate cache
        caps = jvm_capabilities(
            spark, probes={"avro": lambda s: True, "kafka": lambda s: True}
        )
        assert caps == {"avro": True, "kafka": True}
        # cache still holds the real probe result
        assert jvm_capabilities(spark)["avro"] in (True, False)


class TestAvroAutoSelection:
    def _df(self, spark):
        payload = encode_avro(SCHEMA, {"id": 7, "name": "x"})
        return spark.createDataFrame([(payload,)], "value binary")

    def test_prefers_jvm_when_capable(self, spark, monkeypatch):
        hit = {}

        def fake_jvm(df, schema_json, **kw):
            hit["called"] = True
            return df

        monkeypatch.setattr(AD, "decode_avro_jvm", fake_jvm)
        AD.decode_avro_auto(self._df(spark), SCHEMA, caps={"avro": True})
        assert hit.get("called")

    def test_falls_back_to_lite_and_decodes(self, spark):
        out = AD.decode_avro_auto(self._df(spark), SCHEMA, caps={"avro": False})
        rows = out.collect()
        assert rows[0]["id"] == 7 and rows[0]["name"] == "x"

    def test_auto_uses_session_probe_when_caps_omitted(self, spark):
        # whatever the probe says, the call must produce a decodable plan
        out = AD.decode_avro_auto(self._df(spark), SCHEMA)
        assert [f.name for f in out.schema] == ["id", "name"]


class TestKafkaAutoSelection:
    def test_falls_back_to_file_stream(self, spark, tmp_path):
        df = KS.stream_source_auto(
            spark, fallback_dir=str(tmp_path), caps={"kafka": False}
        )
        assert df.isStreaming
        assert set(KS.KAFKA_LIKE_SCHEMA.fieldNames()) <= set(df.schema.fieldNames())

    def test_prefers_kafka_when_capable(self, spark, monkeypatch):
        hit = {}

        def fake_kafka(s, servers, topics, **kw):
            hit["args"] = (servers, topics)
            return "sentinel"

        monkeypatch.setattr(KS, "kafka_stream", fake_kafka)
        out = KS.stream_source_auto(
            spark,
            bootstrap_servers="b:9092",
            topics="t",
            caps={"kafka": True},
        )
        assert out == "sentinel" and hit["args"] == ("b:9092", "t")

    def test_no_fallback_raises(self, spark):
        with pytest.raises(KS.KafkaNotAvailable):
            KS.stream_source_auto(spark, caps={"kafka": False})


# ---- real-jar tests: skip-with-reason in jarless images ----


def _caps(spark):
    return jvm_capabilities(spark)


class TestRealJars:
    def test_jvm_avro_roundtrip(self, spark):
        if not _caps(spark)["avro"]:
            pytest.skip("spark-avro jar not on classpath in this image")
        payload = encode_avro(SCHEMA, {"id": 9, "name": "jvm"})
        df = spark.createDataFrame([(payload,)], "value binary")
        rows = AD.decode_avro_jvm(df, SCHEMA).collect()
        assert rows[0]["id"] == 9 and rows[0]["name"] == "jvm"

    def test_jvm_avro_corrupt_routed(self, spark):
        if not _caps(spark)["avro"]:
            pytest.skip("spark-avro jar not on classpath in this image")
        df = spark.createDataFrame([(b"\xff\xfe garbage",)], "value binary")
        rows = AD.decode_avro_jvm(df, SCHEMA, with_corrupt_col=True).collect()
        assert rows[0]["_corrupt"] is not None

    def test_kafka_reader_constructs(self, spark):
        if not _caps(spark)["kafka"]:
            pytest.skip("spark-sql-kafka jar not on classpath in this image")
        df = KS.kafka_stream(spark, "localhost:9092", "probe_topic")
        assert df.isStreaming
