"""SQL function surface: dl_* temporary functions must agree with the
DataFrame-API column builders (same expressions, codegen-inlined)."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.functions.sql_registry import register_sql_functions
from ducklake_kafka_connect_spark.functions.timestamps import parse_iso_timestamp
from ducklake_kafka_connect_spark.operators.text import (
    lang_id_col,
    stopword_ratio_col,
    token_count_col,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = register_sql_functions(spark)
    assert "dl_token_count" in names


def test_text_functions_match_column_builders(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is in the yard",),
         ("el perro y la casa de que si",)],
        "text string",
    )
    df.createOrReplaceTempView("probe_docs")
    sql = spark.sql(
        "SELECT dl_token_count(text) AS n, "
        "dl_quality_stopword_ratio(text) AS r, dl_lang_id(text) AS lang "
        "FROM probe_docs"
    ).collect()
    api = df.select(
        token_count_col(F.col("text")).alias("n"),
        stopword_ratio_col(F.col("text")).alias("r"),
        lang_id_col(F.col("text")).alias("lang"),
    ).collect()
    assert [tuple(r) for r in sql] == [tuple(r) for r in api]
    assert sql[0]["lang"] == "en" and sql[1]["lang"] == "es"


def test_hash60_matches_duckdb_convention(spark):
    import duckdb

    got = spark.sql("SELECT dl_hash60('hello') AS h").collect()[0]["h"]
    want = duckdb.sql(
        "SELECT CAST(CONCAT('0x', substr(md5('hello'),1,15)) AS BIGINT)"
    ).fetchone()[0]
    assert got == want


def test_parse_iso_ts_matches_engine_parser(spark):
    cases = [
        "2024-06-01T12:00:00Z",
        "2024-06-01T12:00:00+02:30",
        "2024-06-01T12:00:00+0230",
        "2024-06-01T12:00:00",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    df.createOrReplaceTempView("probe_ts")
    sql = [r["t"] for r in spark.sql("SELECT dl_parse_iso_ts(s) AS t FROM probe_ts").collect()]
    api = [r["t"] for r in df.select(parse_iso_timestamp(F.col("s")).alias("t")).collect()]
    assert sql == api
    assert all(t is not None for t in sql)


def test_functions_are_codegen_not_python(spark):
    spark.createDataFrame([("x",)], "text string").createOrReplaceTempView("probe_one")
    plan = spark.sql(
        "SELECT dl_token_count(text) FROM probe_one"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
