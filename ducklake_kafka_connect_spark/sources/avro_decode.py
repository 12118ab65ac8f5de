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


def decode_avro_jvm(
    df: DataFrame,
    writer_schema_json: str,
    value_col: str = "value",
    confluent_framing: bool = False,
    keep_cols: list[str] | None = None,
    with_corrupt_col: bool = False,
) -> DataFrame:
    """JVM ``from_avro`` decode with the SAME output contract as
    ``avro_lite.decode_avro_lite`` (keep_cols passthrough, all-null row
    for null payloads, optional ``_corrupt`` base64 column for DLQ
    routing) — the drop-in fast path when the spark-avro jar is present.

    Stays codegen'd end-to-end: framing strip is a substring expression,
    corrupt detection is "payload present but PERMISSIVE decode returned
    null record", and the whole decode is one JVM projection instead of
    an Arrow round-trip through Python.
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise AvroNotAvailable(str(e)) from e
    keep = list(keep_cols or [])
    narrow = df.select(*keep, value_col)
    payload = F.col(value_col)
    if confluent_framing:
        # magic byte (0) + 4-byte schema id; bad magic yields garbage
        # bytes that PERMISSIVE-decode to a null record → _corrupt
        payload = F.expr(
            f"substring({value_col}, 6, length({value_col}) - 5)"
        )
    rec = from_avro(payload, writer_schema_json, {"mode": "PERMISSIVE"})
    out = narrow.withColumn("__rec", rec)
    cols = [F.col(c) for c in keep] + [F.col("__rec.*")]
    if with_corrupt_col:
        corrupt = F.when(
            F.col(value_col).isNotNull() & F.col("__rec").isNull(),
            F.base64(F.col(value_col)),
        )
        return out.select(*cols, corrupt.alias("_corrupt"))
    return out.select(*cols)


def decode_avro_auto(
    df: DataFrame,
    writer_schema_json: str,
    value_col: str = "value",
    confluent_framing: bool = False,
    keep_cols: list[str] | None = None,
    with_corrupt_col: bool = False,
    caps: dict | None = None,
) -> DataFrame:
    """Pick the decode implementation for this session: JVM ``from_avro``
    when the spark-avro jar is on the classpath, else the pure-Python
    ``decode_avro_lite`` fallback. ``caps`` injects a precomputed
    capability dict (see ``session.jvm_capabilities``); when omitted the
    jar is probed directly."""
    from ..session import jvm_capabilities

    spark = df.sparkSession
    ok = caps["avro"] if caps is not None else jvm_capabilities(spark)["avro"]
    kw = dict(
        value_col=value_col,
        confluent_framing=confluent_framing,
        keep_cols=keep_cols,
        with_corrupt_col=with_corrupt_col,
    )
    if ok:
        return decode_avro_jvm(df, writer_schema_json, **kw)
    from .avro_lite import decode_avro_lite

    return decode_avro_lite(df, writer_schema_json, **kw)
