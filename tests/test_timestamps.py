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


class TestDetectionMatrix:
    """Full port of TimestampUtilsTest.java:33-90 detection cases."""

    @pytest.mark.parametrize(
        "good",
        [
            "2025-09-25T18:05:12Z",
            "2025-09-25T18:05:12+03:00",
            "2025-09-25T18:05:12-05:00",
            "2025-09-25T18:05:12+0300",
            "2025-09-25T18:05:12",
            "2025-01-01T00:00:00",
            "2025-12-31T23:59:59",
            "2025-09-25T18:05:12.123",
            "2025-09-25T18:05:12.123456",
            "2025-09-25T18:05:12.123456789",
            "2025-09-25T18:05:12.123Z",
            "2025-09-25T18:05:12.123+03:00",
        ],
    )
    def test_detects(self, good):
        assert is_iso_timestamp_str(good)

    @pytest.mark.parametrize(
        "bad",
        [
            None,
            "",
            "   ",
            "not-a-timestamp",
            "2025/09/25 18:05:12",   # slash date
            "25-09-2025T18:05:12",   # day-first
            "2025-9-25T18:05:12",    # single-digit month
            "2025-09-25 18:05:12",   # space separator
            "2025-13-25T18:05:12",   # month 13
            "2025-09-32T18:05:12",   # day 32
            "2025-09-25T2105+0300",  # no seconds with offset
        ],
    )
    def test_rejects(self, bad):
        assert not is_iso_timestamp_str(bad)

    def test_whitespace_tolerated(self):
        assert is_iso_timestamp_str("  2025-09-25T18:05:12  ")
        assert is_iso_timestamp_str("\t2025-09-25T18:05:12Z\n")


class TestParsingMatrix:
    """Full port of TimestampUtilsTest.java:92-214 parsing cases."""

    def test_parse_z(self):
        # Instant.parse("2025-09-25T18:05:12Z").toEpochMilli()
        assert parse_iso_timestamp_ms("2025-09-25T18:05:12Z") == 1758823512000

    def test_parse_offset(self):
        assert (
            parse_iso_timestamp_ms("2025-09-25T18:05:12+03:00")
            == 1758823512000 - 3 * 3600 * 1000
        )

    def test_naive_parsed_as_utc(self):
        assert parse_iso_timestamp_ms("2025-09-25T18:05:12") == 1758823512000

    def test_parse_with_millis(self):
        assert parse_iso_timestamp_ms("2025-09-25T18:05:12.123Z") == 1758823512123

    @pytest.mark.parametrize("bad", [None, "", "   "])
    def test_null_empty_raise(self, bad):
        with pytest.raises(ValueError):
            parse_iso_timestamp_ms(bad)

    @pytest.mark.parametrize("bad", ["invalid-timestamp", "2025/09/25 18:05:12"])
    def test_invalid_raise(self, bad):
        with pytest.raises(ValueError):
            parse_iso_timestamp_ms(bad)

    def test_whitespace_in_input(self):
        assert parse_iso_timestamp_ms("  2025-09-25T18:05:12Z  ") == 1758823512000

    def test_leap_year(self):
        assert is_iso_timestamp_str("2024-02-29T12:00:00Z")
        assert parse_iso_timestamp_ms("2024-02-29T12:00:00Z") > 0
        assert not is_iso_timestamp_str("2023-02-29T12:00:00Z")  # not a leap year

    def test_year_boundary_ordering(self):
        end_2024 = parse_iso_timestamp_ms("2024-12-31T23:59:59Z")
        start_2025 = parse_iso_timestamp_ms("2025-01-01T00:00:00Z")
        assert end_2024 < start_2025

    def test_equivalent_timezone_forms(self):
        base = parse_iso_timestamp_ms("2025-09-25T18:05:12Z")
        assert parse_iso_timestamp_ms("2025-09-25T21:05:12+03:00") == base
        assert parse_iso_timestamp_ms("2025-09-25T15:05:12-03:00") == base
        with pytest.raises(ValueError):
            parse_iso_timestamp_ms("2025-09-25T2105+0300")

    def test_compact_offset_with_seconds_and_fraction(self):
        # the ±hhmm-with-seconds edge VERDICT r2 #4 asked to pin
        base = parse_iso_timestamp_ms("2024-06-15T10:00:30.500Z")
        assert parse_iso_timestamp_ms("2024-06-15T13:30:30.500+0330") == base
        assert parse_iso_timestamp_ms("2024-06-15T06:30:30.500-0330") == base


class TestOracleParity:
    """Pin the parse semantics against DuckDB's strptime on the same
    strings — the engine and the oracle must agree on every epoch."""

    CASES = [
        "2025-09-25T18:05:12Z",
        "2025-09-25T21:05:12+03:00",
        "2024-06-15T13:30:30+0330",
        "2024-02-29T12:00:00Z",
    ]

    def _ddb_ms(self, con, s):
        # DuckDB's TIMESTAMPTZ cast parses every ISO offset form
        # (strptime's %z rejects the literal 'Z')
        (ms,) = con.execute(
            "SELECT CAST(epoch_ms(CAST(? AS TIMESTAMPTZ)) AS BIGINT)", [s]
        ).fetchone()
        return ms

    def test_epoch_matches_duckdb(self):
        import duckdb

        con = duckdb.connect()
        for s in self.CASES:
            assert parse_iso_timestamp_ms(s) == self._ddb_ms(con, s), s
        con.close()

    def test_catalyst_matches_duckdb(self, spark):
        import duckdb
        from pyspark.sql import functions as F

        con = duckdb.connect()
        df = spark.createDataFrame([(s,) for s in self.CASES], "v string")
        out = {
            r["v"]: r["ms"]
            for r in df.withColumn("ts", parse_iso_timestamp(F.col("v")))
            .withColumn("ms", (F.unix_micros("ts") / 1000).cast("long"))
            .collect()
        }
        for s in self.CASES:
            assert out[s] == self._ddb_ms(con, s), s
        con.close()


class TestConverterLevelTimestamps:
    """SinkRecordToArrowConverterTimestampTest.java parity at the JSON
    decode layer: detection inside records, invalid → NULL, nulls kept,
    multi-record consistency."""

    def test_detected_in_json_records(self, spark):
        from ducklake_kafka_connect_spark.sources.json_decode import decode_json

        rows = [
            ('{"id": 1, "created_at": "2025-09-25T18:05:12Z", "name": "a"}',),
            ('{"id": 2, "created_at": "2025-09-25T19:05:12+03:00", "name": "b"}',),
        ]
        df = spark.createDataFrame(rows, "value string")
        out = decode_json(df, value_col="value")
        assert dict(out.dtypes)["created_at"] == "timestamp"
        got = sorted(r["created_at"].isoformat() for r in out.collect())
        assert got[0].startswith("2025-09-25T16:05:12")  # +03:00 → UTC
        assert got[1].startswith("2025-09-25T18:05:12")

    def test_id_suffix_fields_stay_strings(self, spark):
        from ducklake_kafka_connect_spark.sources.json_decode import decode_json

        rows = [('{"order_id": "2025-09-25T18:05:12Z", "ts": "2025-09-25T18:05:12Z"}',)]
        df = spark.createDataFrame(rows, "value string")
        out = decode_json(df, value_col="value")
        types = dict(out.dtypes)
        assert types["order_id"] == "string"  # ID heuristic suppresses
        assert types["ts"] == "timestamp"

    def test_invalid_timestamp_fields_stay_strings(self, spark):
        # SinkRecordToArrowConverterTimestampTest.java:306-330: valid
        # field → timestamp; invalid / almost-valid fields → string
        from ducklake_kafka_connect_spark.sources.json_decode import decode_json

        rows = [
            (
                '{"valid_timestamp": "2025-09-25T18:05:12Z",'
                ' "invalid_timestamp": "not-a-timestamp",'
                ' "almost_timestamp": "2025-13-45T25:70:80"}',
            )
        ]
        df = spark.createDataFrame(rows, "value string")
        out = decode_json(df, value_col="value")
        types = dict(out.dtypes)
        assert types["valid_timestamp"] == "timestamp"
        assert types["invalid_timestamp"] == "string"
        assert types["almost_timestamp"] == "string"

    def test_mixed_valid_invalid_rows_null_and_keep(self, spark):
        # One column carrying timestamps AND junk strings: the clean
        # sample majority types the column as timestamp, and the junk
        # value parses to NULL while its record survives — the
        # reference's write-time "unparseable → NULL + warn"
        # (SinkRecordToArrowConverter.java:638-653).
        from ducklake_kafka_connect_spark.sources.json_decode import decode_json

        rows = [
            ('{"id": 1, "when": "2025-09-25T18:05:12Z"}',),
            ('{"id": 2, "when": "not-a-timestamp"}',),
        ]
        df = spark.createDataFrame(rows, "value string")
        out = decode_json(df, value_col="value")
        assert dict(out.dtypes)["when"] == "timestamp"
        by_id = {r["id"]: r["when"] for r in out.collect()}
        assert by_id[1] is not None and by_id[2] is None

    def test_null_timestamp_values_preserved(self, spark):
        from ducklake_kafka_connect_spark.sources.json_decode import decode_json

        rows = [
            ('{"id": 1, "ts": "2025-09-25T18:05:12Z"}',),
            ('{"id": 2, "ts": null}',),
        ]
        df = spark.createDataFrame(rows, "value string")
        out = decode_json(df, value_col="value")
        assert dict(out.dtypes)["ts"] == "timestamp"
        by_id = {r["id"]: r["ts"] for r in out.collect()}
        assert by_id[2] is None and by_id[1] is not None
