"""Kafka stream source (reference operator A1/E10).

The reference is a Kafka Connect sink: records arrive per
topic-partition with at-least-once delivery
(``connect/DucklakeSinkTask.java:469-487``, ``manifest.json:16-19``).

Spark shape: ``spark.readStream.format("kafka")`` — partition-parallel
by construction, offsets tracked in the checkpoint, which together with
the idempotent MERGE sink gives effectively-exactly-once per key
(strictly stronger than the reference, whose offset commits are
decoupled from buffer flushes — SURVEY §2.E8b).

The spark-sql-kafka jar is not in this image, so construction is gated;
`file_stream_source` provides the file-based stand-in used by tests and
local runs (same downstream pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class KafkaNotAvailable(RuntimeError):
    pass


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka").option("subscribe", "probe").option(
            "kafka.bootstrap.servers", "none:9092"
        ).load().schema
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """readStream from Kafka topics; raises KafkaNotAvailable without the jar.

    ``max_offsets_per_trigger`` is the flush.size analogue (E1/E10):
    bounds each micro-batch like ``consumer.override.max.poll.records``.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        raise KafkaNotAvailable(
            "spark-sql-kafka jar not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
        ) from e


KAFKA_LIKE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)


def file_stream_source(
    spark: SparkSession, path: str, fmt: str = "json", schema: T.StructType | None = None
) -> DataFrame:
    """File-based streaming stand-in for Kafka (tests / local smoke):
    drop files shaped like KAFKA_LIKE_SCHEMA into ``path`` and the same
    downstream decode→merge pipeline runs unchanged."""
    return (
        spark.readStream.format(fmt)
        .schema(schema or KAFKA_LIKE_SCHEMA)
        .load(path)
    )


def stream_source_auto(
    spark: SparkSession,
    bootstrap_servers: str | None = None,
    topics: str | None = None,
    fallback_dir: str | None = None,
    caps: dict | None = None,
    **kafka_kwargs,
) -> DataFrame:
    """Prefer the real Kafka source when the spark-sql-kafka jar is on
    the classpath (and broker/topics are configured); otherwise fall
    back to the file-stream stand-in reading ``fallback_dir``. ``caps``
    injects a precomputed capability dict (``session.jvm_capabilities``)
    so tests can pin the selection."""
    from ..session import jvm_capabilities

    ok = caps["kafka"] if caps is not None else jvm_capabilities(spark)["kafka"]
    if ok and bootstrap_servers and topics:
        return kafka_stream(spark, bootstrap_servers, topics, **kafka_kwargs)
    if fallback_dir is None:
        raise KafkaNotAvailable(
            "Kafka source unavailable (jar missing or no broker configured) "
            "and no fallback_dir given for the file-stream stand-in"
        )
    return file_stream_source(spark, fallback_dir)
