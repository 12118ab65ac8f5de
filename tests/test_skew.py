"""Salted aggregation / salted join must be result-identical to their
plain counterparts — the salt only changes the physical distribution."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


@pytest.fixture()
def skewed(spark):
    # 5 hot keys, one of them 10x hotter, plus NULL keys
    return spark.range(2_000).select(
        F.when(F.col("id") % 20 < 10, "hot")
        .when(F.col("id") % 20 < 19, F.concat(F.lit("k"), (F.col("id") % 4).cast("string")))
        .otherwise(None)
        .alias("k"),
        (F.col("id") * 3 % 101).alias("v"),
        F.col("id"),
    )


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


class TestSaltedAggregate:
    def test_equals_plain_groupby(self, spark, skewed):
        plain = skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
        )
        salted = salted_aggregate(
            skewed,
            ["k"],
            {"n": ("count", "v"), "sv": ("sum", "v"),
             "lo": ("min", "id"), "hi": ("max", "id")},
            n_salt=8,
        )
        assert _rows(salted.select("k", "n", "sv", "lo", "hi")) == _rows(plain)

    def test_rejects_non_mergeable(self, skewed):
        with pytest.raises(ValueError, match="not partial-mergeable"):
            salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})

    def test_two_shuffle_plan(self, skewed):
        df = salted_aggregate(skewed, ["k"], {"n": ("count", "v")}, n_salt=4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") >= 2  # (keys, salt) then keys


class TestSaltedJoin:
    def test_inner_equals_plain(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", 1.5), ("k0", 2.0), ("k2", 3.0), ("missing", 9.9)],
            "k string, w double",
        )
        plain = skewed.join(dim, "k")
        salted = salted_join(skewed, dim, ["k"], n_salt=4)
        assert _rows(salted.select(*plain.columns)) == _rows(plain)

    def test_left_equals_plain(self, spark, skewed):
        dim = spark.createDataFrame([("hot", 1.5)], "k string, w double")
        plain = skewed.join(dim, "k", "left")
        salted = salted_join(skewed, dim, ["k"], n_salt=4, how="left")
        assert _rows(salted.select(*plain.columns)) == _rows(plain)

    def test_duplicate_build_rows_multiply_identically(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", 1.0), ("hot", 2.0)], "k string, w double"
        )
        plain = skewed.join(dim, "k")
        salted = salted_join(skewed, dim, ["k"], n_salt=3)
        assert salted.count() == plain.count()
        assert _rows(salted.select(*plain.columns)) == _rows(plain)

    def test_unsupported_how(self, spark, skewed):
        dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(skewed, dim, ["k"], how="full")
