"""Avro decode (reference operator A4).

The reference exercises Kafka Connect's AvroConverter with a schema
registry end-to-end (``src/integrationTest/.../AvroIntegrationTest.java:109-137``).
Spark's equivalent is ``from_avro(col, schema_json)``; the Python
wrapper exists in every build but execution needs the ``spark-avro``
module jar on the classpath, which this image does not ship — so the
capability is probed at call time and a clear error raised if absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class AvroNotAvailable(RuntimeError):
    pass


def avro_available(spark) -> bool:
    try:
        spark._jvm.org.apache.spark.sql.avro.functions  # noqa: B018
        df = spark.createDataFrame([(b"",)], "value binary")
        from pyspark.sql.avro.functions import from_avro

        df.select(from_avro(F.col("value"), '{"type":"string"}')).schema
        return True
    except Exception:
        return False


def decode_avro(
    df: DataFrame, avro_schema_json: str, value_col: str = "value"
) -> DataFrame:
    """Decode confluent-less Avro payloads with an explicit writer schema.

    Raises AvroNotAvailable when the spark-avro jar is absent (this
    image); callers should gate on ``avro_available``.
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise AvroNotAvailable(str(e)) from e
    spark = df.sparkSession
    if not avro_available(spark):
        raise AvroNotAvailable(
            "spark-avro module jar not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        )
    rec: Column = from_avro(F.col(value_col), avro_schema_json)
    return df.withColumn("__rec", rec).select("__rec.*")
