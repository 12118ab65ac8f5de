"""Parquet loading that tolerates nanosecond timestamps.

Spark rejects INT64 TIMESTAMP(NANOS) parquet columns outright
(PARQUET_TYPE_ILLEGAL). With ``spark.sql.legacy.parquet.nanosAsLong=true``
(set by ``session.build_session``) they arrive as raw nanosecond longs;
this loader sniffs the parquet footer with pyarrow (driver-side, one
footer read — no data scan) and converts those columns to microsecond
timestamps, truncating like DuckDB's ``CAST(ts_ns AS TIMESTAMP)`` so
oracle comparisons agree.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ns_timestamp_columns(path: str) -> list[str]:
    schema = pq.read_schema(path)
    out = []
    for name, typ in zip(schema.names, schema.types):
        if str(typ).startswith("timestamp[ns"):
            out.append(name)
    return out


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet file/dir; ns-timestamp columns become µs timestamps.

    Self-ensures the session confs it depends on (both runtime-settable),
    so it works on a caller-provided vanilla SparkSession — e.g. the
    driver invoking ``queries()`` entries without ``entry()``:
    ns columns arrive as longs instead of erroring (PARQUET_TYPE_ILLEGAL),
    and timestamps render in UTC to match the DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    probe = path
    if os.path.isdir(path):
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not files:
            return df
        probe = os.path.join(path, files[0])
    for c in _ns_timestamp_columns(probe):
        # Integer division: epoch-ns (~1.7e18) exceeds double's 2^53 exact
        # range, so a float `/1000` would round the microsecond.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the testdata star schema from a scale-factor directory."""
    if names is None:
        names = [
            f[: -len(".parquet")]
            for f in sorted(os.listdir(sf_dir))
            if f.endswith(".parquet")
        ]
    return {n: load_parquet(spark, os.path.join(sf_dir, f"{n}.parquet")) for n in names}
