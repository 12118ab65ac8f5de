"""Timestamp sniff/parse matrix — mirrors the reference's
TimestampUtilsTest / SinkRecordToArrowConverterTimestampTest coverage
(FIXTURES.md F5)."""

import pytest

from ducklake_kafka_connect_spark.functions.timestamps import (
    is_id_like_field,
    is_iso_timestamp_str,
    parse_iso_timestamp,
    parse_iso_timestamp_ms,
)


class TestDriverSide:
    def test_iso_z(self):
        assert is_iso_timestamp_str("2023-10-03T14:30:00Z")
        assert parse_iso_timestamp_ms("2023-10-03T14:30:00Z") == 1696343400000

    def test_iso_offset_colon(self):
        # +03:00 normalizes to UTC: 14:30+03:00 == 11:30Z
        assert parse_iso_timestamp_ms("2023-10-03T14:30:00+03:00") == 1696332600000

    def test_iso_offset_compact(self):
        assert parse_iso_timestamp_ms("2023-10-03T14:30:00+0300") == 1696332600000

    def test_naive_is_utc(self):
        assert parse_iso_timestamp_ms("2023-10-03T14:30:00") == 1696343400000

    def test_fractional_millis(self):
        assert parse_iso_timestamp_ms("2023-10-03T14:30:00.123Z") == 1696343400123

    def test_fractional_nanos_kept_to_ms(self):
        assert parse_iso_timestamp_ms("2023-10-03T14:30:00.123456789Z") == 1696343400123

    @pytest.mark.parametrize(
        "bad", ["2023-10-03", "hello", "", "  ", None, "2023-13-03T14:30:00Z", "14:30:00"]
    )
    def test_non_timestamps(self, bad):
        assert not is_iso_timestamp_str(bad)

    def test_trailing_space_ok(self):
        assert is_iso_timestamp_str("  2023-10-03T14:30:00Z  ")

    def test_id_like(self):
        for name in ["order_id", "id", "ID", "user_UUID", "uuid", "partition_key", "key"]:
            assert is_id_like_field(name)
        for name in ["created_at", "identity_crisis_x", "name", None]:
            assert not is_id_like_field(name)


class TestCatalystSide:
    def test_parse_matrix(self, spark):
        rows = [
            ("2023-10-03T14:30:00Z", 1696343400000),
            ("2023-10-03T14:30:00+03:00", 1696332600000),
            ("2023-10-03T14:30:00+0300", 1696332600000),
            ("2023-10-03T14:30:00", 1696343400000),
            ("2023-10-03T14:30:00.123", 1696343400123),
            ("2023-10-03", None),
            ("hello", None),
            (None, None),
        ]
        df = spark.createDataFrame([(s,) for s, _ in rows], "v string")
        from pyspark.sql import functions as F

        out = (
            df.withColumn("ts", parse_iso_timestamp(F.col("v")))
            .withColumn("ms", (F.unix_micros(F.col("ts")) / 1000).cast("long"))
            .collect()
        )
        got = {r["v"]: r["ms"] for r in out}
        for s, expect in rows:
            assert got[s] == expect, f"{s}: {got[s]} != {expect}"
