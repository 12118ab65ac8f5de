"""CSV value decode (sources/csv_decode.py) and the ingest pipeline's
format='csv' leg — JVM-native from_csv with the JSON decoder's DLQ
contract.
"""

import pytest
from pyspark.sql import functions as F


class TestDecodeCsv:
    def test_typed_decode_and_corrupt_routing(self, spark):
        from ducklake_kafka_connect_spark.sources.csv_decode import decode_csv

        rows = [
            (0, b"1,alice,2.5"),
            (1, b"2,bob,-0.25"),
            (2, b"not|a|csv|line"),  # wrong delimiter → all-null → corrupt
            (3, b"3,carol,oops"),  # unconvertible field → corrupt (DLQ)
            (4, None),
        ]
        df = spark.createDataFrame(rows, "offset long, value binary")
        out = decode_csv(
            df,
            "pk long, name string, score double",
            keep_cols=["offset"],
        ).collect()
        by_off = {r["offset"]: r for r in out}
        assert (by_off[0]["pk"], by_off[0]["name"], by_off[0]["score"]) == (
            1,
            "alice",
            2.5,
        )
        assert by_off[1]["score"] == -0.25
        assert by_off[2]["_corrupt"] == "not|a|csv|line"
        # an unconvertible field marks the whole record corrupt
        # (PERMISSIVE sets the corrupt column) → DLQ, never silent nulls
        assert by_off[3]["_corrupt"] == "3,carol,oops"
        assert by_off[4]["pk"] is None and by_off[4]["_corrupt"] is None

    def test_custom_delimiter(self, spark):
        from ducklake_kafka_connect_spark.sources.csv_decode import decode_csv

        df = spark.createDataFrame([(b"7|x",)], "value binary")
        out = decode_csv(
            df, "pk long, name string", options={"sep": "|"}
        ).collect()
        assert (out[0]["pk"], out[0]["name"]) == (7, "x")

    def test_quoted_fields_with_embedded_commas(self, spark):
        from ducklake_kafka_connect_spark.sources.csv_decode import decode_csv

        df = spark.createDataFrame(
            [(b'5,"last, first",1.0',)], "value binary"
        )
        out = decode_csv(df, "pk long, name string, score double").collect()
        assert out[0]["name"] == "last, first"


class TestCsvIngest:
    def test_pipeline_csv_format_e2e(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake import LakeCatalog
        from ducklake_kafka_connect_spark.streaming.ingest import (
            IngestConfig,
            IngestPipeline,
            TableSpec,
        )

        rows = [
            (
                "csvt",
                0,
                i,
                bytearray(
                    f"{i},user{i},{i * 10}".encode()
                    if i % 5
                    else b"garbage with no commas"
                ),
            )
            for i in range(1, 21)
        ]
        frame = spark.createDataFrame(
            rows, "topic string, partition int, offset long, value binary"
        )
        cat = LakeCatalog(spark, str(tmp_path))
        cfg = IngestConfig(
            topic2table={"csvt": "csv_rows"},
            tables={
                "csv_rows": TableSpec(
                    id_columns=["pk"],
                    auto_create=True,
                    format="csv",
                    csv_schema="pk long, who string, amount long",
                )
            },
        )
        IngestPipeline(cat, cfg).process_batch(frame)
        landed = cat.table("csv_rows").read()
        n_bad = sum(1 for i in range(1, 21) if i % 5 == 0)
        assert landed.count() == 20 - n_bad
        assert landed.filter("amount = 70").count() == 1
        assert cat.table("csv_rows_dlq").read().count() == n_bad

    def test_tablespec_requires_schema(self):
        from ducklake_kafka_connect_spark.streaming.ingest import TableSpec

        with pytest.raises(ValueError, match="csv_schema"):
            TableSpec(format="csv")
