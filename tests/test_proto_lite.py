"""Pure-Python protobuf wire-format codec (sources/proto_lite.py):
roundtrip matrix over every scalar type, packed/unpacked repeated,
nested messages, unknown-field skip, proto3 defaults, corrupt-payload
DLQ routing, and the ingest pipeline's format='proto' leg.
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.sources.proto_lite import (
    ProtoField,
    decode_proto,
    decode_proto_lite,
    encode_proto,
    proto_schema,
    proto_to_spark_type,
)

SCALARS = proto_schema(
    [
        (1, "a_int32", "int32"),
        (2, "a_int64", "int64"),
        (3, "a_uint32", "uint32"),
        (4, "a_uint64", "uint64"),
        (5, "a_sint32", "sint32"),
        (6, "a_sint64", "sint64"),
        (7, "a_bool", "bool"),
        (8, "a_double", "double"),
        (9, "a_float", "float"),
        (10, "a_fixed32", "fixed32"),
        (11, "a_fixed64", "fixed64"),
        (12, "a_sfixed32", "sfixed32"),
        (13, "a_sfixed64", "sfixed64"),
        (14, "a_string", "string"),
        (15, "a_bytes", "bytes"),
    ]
)


class TestScalarRoundtrip:
    def test_all_scalar_types(self):
        rec = {
            "a_int32": -123,
            "a_int64": -(1 << 40),
            "a_uint32": (1 << 32) - 1,
            "a_uint64": (1 << 62),
            "a_sint32": -1,
            "a_sint64": -(1 << 50),
            "a_bool": True,
            "a_double": -2.5,
            "a_float": 0.5,
            "a_fixed32": (1 << 31) + 7,
            "a_fixed64": (1 << 40) + 9,
            "a_sfixed32": -77,
            "a_sfixed64": -(1 << 35),
            "a_string": "héllo wörld",
            "a_bytes": b"\x00\xff\x01",
        }
        assert decode_proto(SCALARS, encode_proto(SCALARS, rec)) == rec

    def test_negative_int_uses_ten_byte_varint(self):
        s = proto_schema([(1, "v", "int64")])
        wire = encode_proto(s, {"v": -1})
        assert len(wire) == 11  # 1 tag + 10 varint bytes
        assert decode_proto(s, wire)["v"] == -1

    def test_zigzag_is_compact_for_small_negatives(self):
        s = proto_schema([(1, "v", "sint64")])
        wire = encode_proto(s, {"v": -1})
        assert len(wire) == 2  # 1 tag + 1 zigzag byte
        assert decode_proto(s, wire)["v"] == -1

    def test_proto3_defaults_for_absent_fields(self):
        out = decode_proto(SCALARS, b"")
        assert out["a_int64"] == 0
        assert out["a_string"] == "" and out["a_bytes"] == b""
        assert out["a_bool"] is False and out["a_double"] == 0.0

    @given(
        st.integers(-(1 << 63), (1 << 63) - 1),
        st.integers(-(1 << 31), (1 << 31) - 1),
        st.text(max_size=40),
        st.binary(max_size=40),
        st.booleans(),
    )
    @settings(max_examples=120, deadline=None)
    def test_property_roundtrip(self, i64, s32, txt, blob, flag):
        s = proto_schema(
            [
                (1, "i", "int64"),
                (2, "z", "sint32"),
                (3, "t", "string"),
                (4, "b", "bytes"),
                (5, "f", "bool"),
            ]
        )
        rec = {"i": i64, "z": s32, "t": txt, "b": blob, "f": flag}
        assert decode_proto(s, encode_proto(s, rec)) == rec


class TestRepeatedAndNested:
    def test_packed_repeated_numerics(self):
        s = proto_schema(
            [(1, "xs", "sint64", "repeated"), (2, "ds", "double", "repeated")]
        )
        rec = {"xs": [-3, 0, 9, -(1 << 33)], "ds": [1.5, -0.25]}
        wire = encode_proto(s, rec)
        assert decode_proto(s, wire) == rec

    def test_unpacked_repeated_numeric_also_decodes(self):
        # writers may emit repeated numerics unpacked (proto2 style):
        # tag+value per element — the decoder must accept both
        s = proto_schema([(1, "xs", "int64", "repeated")])
        one = proto_schema([(1, "x", "int64")])
        wire = encode_proto(one, {"x": 5}) + encode_proto(one, {"x": 7})
        assert decode_proto(s, wire)["xs"] == [5, 7]

    def test_repeated_strings_and_messages(self):
        inner = proto_schema([(1, "k", "string"), (2, "n", "int32")])
        s = proto_schema(
            [(1, "tags", "string", "repeated"), (2, "items", inner, "repeated")]
        )
        rec = {
            "tags": ["a", "b", "a"],
            "items": [
                {"k": "x", "n": 1},
                {"k": "y", "n": -2},
            ],
        }
        assert decode_proto(s, encode_proto(s, rec)) == rec

    def test_nested_message_and_absent_is_none(self):
        inner = proto_schema([(1, "k", "string")])
        s = proto_schema([(1, "m", inner, "message"), (2, "v", "int64")])
        assert decode_proto(s, encode_proto(s, {"v": 3}))["m"] is None
        rec = {"m": {"k": "deep"}, "v": 3}
        assert decode_proto(s, encode_proto(s, rec)) == rec


class TestRobustness:
    def test_unknown_fields_are_skipped(self):
        wide = proto_schema(
            [
                (1, "keep", "int64"),
                (2, "drop_str", "string"),
                (3, "drop_fix", "double"),
                (4, "drop_var", "sint64"),
            ]
        )
        narrow = proto_schema([(1, "keep", "int64")])
        wire = encode_proto(
            wide,
            {"keep": 42, "drop_str": "gone", "drop_fix": 9.5, "drop_var": -8},
        )
        assert decode_proto(narrow, wire) == {"keep": 42}

    def test_truncated_payload_raises(self):
        s = proto_schema([(1, "t", "string")])
        wire = encode_proto(s, {"t": "hello"})
        with pytest.raises(Exception):
            decode_proto(s, wire[:-2])

    def test_wire_type_mismatch_raises(self):
        s_str = proto_schema([(1, "v", "string")])
        s_int = proto_schema([(1, "v", "int64")])
        wire = encode_proto(s_int, {"v": 1})
        with pytest.raises(ValueError):
            decode_proto(s_str, wire)

    def test_group_wire_types_rejected(self):
        s = proto_schema([(2, "v", "int64")])
        # tag for field 1 with wire type 3 (SGROUP)
        with pytest.raises(ValueError, match="deprecated"):
            decode_proto(s, bytes([(1 << 3) | 3]))


class TestSparkIntegration:
    def test_decode_frame_types_and_dlq(self, spark):
        s = proto_schema(
            [
                (1, "key_id", "int64"),
                (2, "name", "string"),
                (3, "scores", "double", "repeated"),
            ]
        )
        assert [f.dataType.simpleString() for f in proto_to_spark_type(s)] == [
            "bigint",
            "string",
            "array<double>",
        ]
        recs = [
            {"key_id": i, "name": f"n{i}", "scores": [i * 0.5, -1.0]}
            for i in range(20)
        ]
        rows = [
            (i, bytearray(encode_proto(s, r)))
            for i, r in enumerate(recs)
        ]
        # poison two payloads
        rows[3] = (3, bytearray(b"\xff\xff\xff"))
        rows[7] = (7, bytearray(rows[7][1][:-1]))
        df = spark.createDataFrame(rows, "offset long, value binary")
        out = decode_proto_lite(
            df, s, keep_cols=["offset"], with_corrupt_col=True
        ).cache()
        good = out.filter(F.col("_corrupt").isNull())
        bad = out.filter(F.col("_corrupt").isNotNull())
        assert bad.count() == 2
        assert good.count() == 18
        got = {r["key_id"]: (r["name"], list(r["scores"])) for r in good.collect()}
        assert got[5] == ("n5", [2.5, -1.0])

    def test_ingest_pipeline_proto_format(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake import LakeCatalog
        from ducklake_kafka_connect_spark.streaming.ingest import (
            IngestConfig,
            IngestPipeline,
            TableSpec,
        )

        s = proto_schema([(1, "key_id", "int64"), (2, "amount", "sint64")])
        payloads = [
            (
                "pt",
                0,
                i,
                bytearray(
                    encode_proto(s, {"key_id": i, "amount": -i * 10})
                    if i % 7
                    else b"\xff\xff"  # truncated varint → decode error
                ),
            )
            for i in range(1, 29)
        ]
        frame = spark.createDataFrame(
            payloads, "topic string, partition int, offset long, value binary"
        )
        cat = LakeCatalog(spark, str(tmp_path))
        cfg = IngestConfig(
            topic2table={"pt": "payments"},
            tables={
                "payments": TableSpec(auto_create=True, format="proto", proto_schema=s)
            },
        )
        IngestPipeline(cat, cfg).process_batch(frame)
        landed = cat.table("payments").read()
        n_bad = sum(1 for i in range(1, 29) if i % 7 == 0)
        assert landed.count() == 28 - n_bad
        assert landed.filter("amount = -50").count() == 1
        assert cat.table("payments_dlq").read().count() == n_bad

    def test_tablespec_requires_schema(self):
        from ducklake_kafka_connect_spark.streaming.ingest import TableSpec

        with pytest.raises(ValueError, match="proto_schema"):
            TableSpec(format="proto")


class TestFuzz:
    @given(st.binary(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_decode_never_hangs_or_corrupts(self, blob):
        # arbitrary bytes either raise cleanly or yield a complete dict
        # (unknown fields skipped, known fields typed) — never a crash,
        # never a partial record
        s = proto_schema(
            [(1, "a", "int64"), (2, "b", "string"), (3, "c", "double")]
        )
        try:
            out = decode_proto(s, blob)
        except (EOFError, ValueError, UnicodeDecodeError):
            return
        assert set(out) == {"a", "b", "c"}
        assert isinstance(out["a"], int)
        assert isinstance(out["b"], str)
        assert isinstance(out["c"], float)


class TestConfluentProtoFraming:
    def test_roundtrip_default_and_nested_indexes(self):
        from ducklake_kafka_connect_spark.sources.proto_lite import (
            frame_confluent_proto,
            strip_confluent_proto_framing,
        )

        body = encode_proto(proto_schema([(1, "v", "int64")]), {"v": 7})
        sid, idx, got = strip_confluent_proto_framing(
            frame_confluent_proto(42, body)
        )
        assert (sid, idx, got) == (42, [0], body)
        sid, idx, got = strip_confluent_proto_framing(
            frame_confluent_proto(7, body, [1, 3])
        )
        assert (sid, idx, got) == (7, [1, 3], body)

    def test_missing_magic_raises(self):
        from ducklake_kafka_connect_spark.sources.proto_lite import (
            strip_confluent_proto_framing,
        )

        with pytest.raises(ValueError, match="magic"):
            strip_confluent_proto_framing(b"\x01\x00\x00\x00\x01\x00rest")

    def test_framed_decode_and_unframed_dlq(self, spark):
        from ducklake_kafka_connect_spark.sources.proto_lite import (
            frame_confluent_proto,
        )

        s = proto_schema([(1, "k", "int64"), (2, "t", "string")])
        rows = []
        for i in range(12):
            body = encode_proto(s, {"k": i, "t": f"r{i}"})
            rows.append(
                (
                    i,
                    bytearray(
                        frame_confluent_proto(1, body) if i % 4 else body
                    ),
                )
            )
        df = spark.createDataFrame(rows, "offset long, value binary")
        out = decode_proto_lite(
            df,
            s,
            keep_cols=["offset"],
            with_corrupt_col=True,
            confluent_framing=True,
        ).cache()
        # unframed payloads (i%4==0) lack the magic byte → corrupt
        assert out.filter("_corrupt IS NOT NULL").count() == 3
        good = {r["k"]: r["t"] for r in out.filter("_corrupt IS NULL").collect()}
        assert good[5] == "r5" and len(good) == 9


class TestUint64Overflow:
    def test_uint64_past_bigint_routes_to_corrupt(self, spark):
        # a uint64 value above 2^63 cannot land in a Spark LongType —
        # clamping would be silent corruption, so the row must DLQ
        s = proto_schema([(1, "u", "uint64")])
        big = encode_proto(s, {"u": (1 << 63) + 5})
        ok = encode_proto(s, {"u": (1 << 62)})
        df = spark.createDataFrame(
            [(0, bytearray(big)), (1, bytearray(ok))],
            "offset long, value binary",
        )
        out = decode_proto_lite(
            df, s, keep_cols=["offset"], with_corrupt_col=True
        ).collect()
        by_off = {r["offset"]: r for r in out}
        assert by_off[0]["_corrupt"] is not None and by_off[0]["u"] is None
        assert by_off[1]["_corrupt"] is None and by_off[1]["u"] == 1 << 62


class TestStreamingProtoIngest:
    def test_readstream_proto_to_lake(self, spark, tmp_path):
        """format='proto' through the real readStream/foreachBatch
        dataflow (parquet file stream stands in for Kafka, as in
        test_streaming.py): framed payloads land, corrupt ones DLQ."""
        import os as _os

        from ducklake_kafka_connect_spark.lake import LakeCatalog
        from ducklake_kafka_connect_spark.streaming.ingest import (
            IngestConfig,
            IngestPipeline,
            TableSpec,
        )

        s = proto_schema([(1, "pk", "int64"), (2, "note", "string")])
        rows = [
            (
                "pstream",
                0,
                i,
                bytearray(
                    encode_proto(s, {"pk": i, "note": f"m{i}"})
                    if i != 4
                    else b"\xff\xff"
                ),
            )
            for i in range(9)
        ]
        src = str(tmp_path / "frames")
        spark.createDataFrame(
            rows, "topic string, partition int, offset long, value binary"
        ).write.parquet(src)
        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        cfg = IngestConfig(
            tables={
                "pstream": TableSpec(
                    id_columns=["pk"],
                    auto_create=True,
                    format="proto",
                    proto_schema=s,
                )
            }
        )
        pipe = IngestPipeline(cat, cfg)
        stream = spark.readStream.schema(
            "topic string, partition int, offset long, value binary"
        ).parquet(src)
        q = (
            stream.writeStream.foreachBatch(pipe.process_batch)
            .option("checkpointLocation", _os.path.join(str(tmp_path), "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        landed = cat.table("pstream").read()
        assert landed.count() == 8
        assert {r["note"] for r in landed.collect()} == {
            f"m{i}" for i in range(9) if i != 4
        }
        assert cat.table("pstream_dlq").read().count() == 1
