"""As-of join semantics: backward-inclusive match, NULL-payload rows
shadow older matches, unmatched left rows get NULLs, multi-column keys."""

import datetime as dt

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")),
         (2, "u", _ts("2024-01-01 11:00:00")),
         (3, "u", _ts("2024-01-01 09:00:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:30:00"), 1.0),
         ("u", _ts("2024-01-01 10:00:00"), 2.0),   # equal ts → inclusive
         ("u", _ts("2024-01-01 10:30:00"), 3.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["id"]: r["v_right"] for r in asof_join(left, right, key="k").collect()}
    assert out == {1: 2.0, 2: 3.0, 3: None}


def test_null_payload_shadows_older(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 12:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00"), 7.0),
         ("u", _ts("2024-01-01 11:00:00"), None)],  # newer row, NULL value
        "k string, ts timestamp, v double",
    )
    (row,) = asof_join(left, right, key="k").collect()
    assert row["v_right"] is None, "a newer right row with NULL payload must win"


def test_key_isolation_and_multi_payload(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00")), (2, "b", _ts("2024-01-01 10:00:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 09:00:00"), 1.0, "x")],
        "k string, ts timestamp, v double, s string",
    )
    rows = {r["id"]: (r["v_right"], r["s_right"]) for r in asof_join(left, right, key="k").collect()}
    assert rows[1] == (1.0, "x")
    assert rows[2] == (None, None)


def test_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "a", 1, _ts("2024-01-01 10:00:00"))],
        "id long, k1 string, k2 long, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", 1, _ts("2024-01-01 09:00:00"), 5.0),
         ("a", 2, _ts("2024-01-01 09:30:00"), 9.0)],  # different k2 — must not match
        "k1 string, k2 long, ts timestamp, v double",
    )
    (row,) = asof_join(left, right, key=["k1", "k2"]).collect()
    assert row["v_right"] == 5.0


def test_matches_naive_theta_join(spark):
    """Property check vs the obviously-correct (but explosive) plan."""
    import random

    rng = random.Random(7)
    base = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame(
        [(i, f"k{rng.randrange(5)}", base + dt.timedelta(seconds=rng.randrange(10000)))
         for i in range(300)],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(f"k{rng.randrange(5)}", base + dt.timedelta(seconds=s), float(i))
         for i, s in enumerate(rng.sample(range(10000), 200))],
        "k string, ts timestamp, v double",
    )
    got = {r["id"]: r["v_right"] for r in asof_join(left, right, key="k").collect()}
    from pyspark.sql import Window as W

    naive = (
        left.alias("l")
        .join(right.alias("r"), (F.col("l.k") == F.col("r.k")) & (F.col("l.ts") >= F.col("r.ts")), "left")
        .withColumn("rn", F.row_number().over(
            W.partitionBy("l.id").orderBy(F.col("r.ts").desc_nulls_last())))
        .filter(F.col("rn") == 1)
        .select("l.id", "r.v")
    )
    expect = {r["id"]: r["v"] for r in naive.collect()}
    assert got == expect


def test_direction_strict_how_matrix(spark):
    """The four DuckDB comparison operators + inner/left row semantics."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00")),
         (2, "u", _ts("2024-01-01 11:00:00")),
         (3, "u", _ts("2024-01-01 09:00:00"))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:30:00"), 1.0),
         ("u", _ts("2024-01-01 10:00:00"), 2.0),
         ("u", _ts("2024-01-01 10:30:00"), 3.0)],
        "k string, ts timestamp, v double",
    )

    def run(**kw):
        return {
            r["id"]: r["v_right"]
            for r in asof_join(left, right, key="k", **kw).collect()
        }

    assert run(direction="backward", strict=False) == {1: 2.0, 2: 3.0, 3: None}
    assert run(direction="backward", strict=True) == {1: 1.0, 2: 3.0, 3: None}
    assert run(direction="forward", strict=False) == {1: 2.0, 2: None, 3: 1.0}
    assert run(direction="forward", strict=True) == {1: 3.0, 2: None, 3: 1.0}
    assert run(how="inner") == {1: 2.0, 2: 3.0}
    assert run(how="inner", direction="forward", strict=True) == {1: 3.0, 3: 1.0}


def test_null_right_ts_never_matches(spark):
    """A NULL right timestamp compares false against every probe in SQL
    — it must not shadow (backward) or leak into (forward) real rows."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", None, 99.0), ("u", _ts("2024-01-01 09:00:00"), 1.0)],
        "k string, ts timestamp, v double",
    )
    (row,) = asof_join(left, right, key="k").collect()
    assert row["v_right"] == 1.0
    (row,) = asof_join(left, right, key="k", direction="forward").collect()
    assert row["v_right"] is None


def test_null_left_ts_gets_null_payload_both_directions(spark):
    left = spark.createDataFrame(
        [(1, "u", None)], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 09:00:00"), 1.0)], "k string, ts timestamp, v double"
    )
    for d in ("backward", "forward"):
        (row,) = asof_join(left, right, key="k", direction=d).collect()
        assert row["v_right"] is None, d
    assert asof_join(left, right, key="k", how="inner").count() == 0
