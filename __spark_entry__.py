"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full MERGE-upsert ingestion
through the lake engine) on sf0.001. ``queries()``/``oracle_sql()``
expose the named query surface from
``ducklake_kafka_connect_spark/plans/queries.py``; the driver compares
each against DuckDB at sf0.01 (row-count + schema + order-insensitive
value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ducklake_kafka_connect_spark.plans.queries import oracle_sql_map, query_map

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end MERGE-upsert ingestion on sf0.001 events."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return query_map()["merge_upsert_events"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
