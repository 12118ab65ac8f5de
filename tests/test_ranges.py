"""Bucketized interval join: BETWEEN semantics (inclusive both ends),
bucket-boundary correctness, equivalence with the naive theta-join."""

import datetime as dt
import random

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators.ranges import interval_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_inclusive_bounds_and_key_isolation(spark):
    points = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00")),   # == start → match
         (2, "a", _ts("2024-01-01 12:00:00")),   # == end → match
         (3, "a", _ts("2024-01-01 12:00:01")),   # past end → no
         (4, "b", _ts("2024-01-01 11:00:00"))],  # wrong key → no
        "pid long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("a", 100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"))],
        "k string, iid long, start timestamp, end timestamp",
    )
    got = sorted(r["pid"] for r in interval_join(points, intervals, key="k").collect())
    assert got == [1, 2]


def test_interval_shorter_than_bucket(spark):
    # 10-second interval, 1-hour buckets: still joins (covers one bucket)
    points = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:30:05"))], "pid long, k string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("a", 1, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:30:10"))],
        "k string, iid long, start timestamp, end timestamp",
    )
    assert interval_join(points, intervals, key="k").count() == 1


def test_no_duplicate_pairs_across_buckets(spark):
    # interval spanning many buckets must yield each matching point once
    points = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 13:00:00"))], "pid long, k string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("a", 1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "k string, iid long, start timestamp, end timestamp",
    )
    assert interval_join(points, intervals, key="k", bucket_seconds=600).count() == 1


def test_matches_naive_theta_join(spark):
    rng = random.Random(13)
    base = _ts("2024-01-01 00:00:00")
    points = spark.createDataFrame(
        [(i, f"k{rng.randrange(4)}", base + dt.timedelta(seconds=rng.randrange(50000)))
         for i in range(400)],
        "pid long, k string, ts timestamp",
    )
    ivs = []
    for i in range(60):
        s = rng.randrange(50000)
        ivs.append(
            (f"k{rng.randrange(4)}", i, base + dt.timedelta(seconds=s),
             base + dt.timedelta(seconds=s + rng.randrange(1, 8000)))
        )
    intervals = spark.createDataFrame(
        ivs, "k string, iid long, start timestamp, end timestamp"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, key="k", bucket_seconds=1800).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("p.ts") >= F.col("i.start"))
            & (F.col("p.ts") <= F.col("i.end")),
        )
        .collect()
    )
    assert got == naive and len(got) > 50
