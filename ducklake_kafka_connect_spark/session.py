"""SparkSession factory tuned for the engine.

Local testing runs one JVM (``local[N]``); the configs below are chosen so
the same code scales to a multi-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), UTC session timezone so
results compare bit-for-bit with the DuckDB oracle, Arrow-accelerated
Python boundaries, and dynamic partition overwrite so MERGE rewrites only
the partitions it touched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state_store(spark: SparkSession) -> None:
    """Switch stateful streaming to the RocksDB state store (runtime SQL
    confs — picked up by queries started afterwards). The default
    HDFS-backed store keeps all state on the executor heap; at
    watermark-bounded state of ~1e9 keys that's tens of GB of JVM heap,
    while RocksDB keeps it off-heap on local SSD with changelog
    checkpointing uploading only per-batch deltas."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


# Capability probes are paid once per SparkContext, not per decode call:
# each probe constructs a throwaway reader/expression and catches the
# AnalysisException the missing jar raises, which costs a JVM round-trip.
_CAPS_CACHE: dict[str, dict[str, bool]] = {}


def jvm_capabilities(
    spark: SparkSession, probes: dict | None = None
) -> dict[str, bool]:
    """Which optional JVM fast paths this session can execute:

    - ``avro``: spark-avro module jar → ``sources.avro_decode`` (the
      codegen'd `from_avro` path) instead of the pure-Python
      ``sources.avro_lite`` fallback.
    - ``kafka``: spark-sql-kafka jar → ``sources.kafka_source.
      kafka_stream`` instead of the file-stream stand-in.

    ``probes`` overrides the probe functions (unit tests mock them);
    results are cached per SparkContext application id.
    """
    key = spark.sparkContext.applicationId
    if probes is None and key in _CAPS_CACHE:
        return _CAPS_CACHE[key]
    from .sources.avro_decode import avro_available
    from .sources.kafka_source import kafka_available

    p = {"avro": avro_available, "kafka": kafka_available, **(probes or {})}
    caps = {"avro": bool(p["avro"](spark)), "kafka": bool(p["kafka"](spark))}
    if probes is None:
        _CAPS_CACHE[key] = caps
    return caps


def build_session(
    app_name: str = "ducklake_kafka_connect_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # MERGE rewrites only partitions present in the output DataFrame.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Spark cannot read INT64 TIMESTAMP(NANOS) parquet columns as
        # timestamps; read them as raw nanos longs instead and let
        # sources.parquet_loader convert to µs timestamps (truncating,
        # which matches a DuckDB CAST(ns AS TIMESTAMP)).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # r14 (optimization guide §1/§7): HotSpot refuses to JIT-compile
        # methods over ~8 KB of bytecode (DontCompileHugeMethods), and
        # Spark's whole-stage codegen routinely emits such methods for
        # wide expressions (64-dim vector dot chains, wide aggregates,
        # big CASE ladders) — those then run in the BYTECODE INTERPRETER,
        # measured 5x slower on the all-pairs cosine kernels (2.6 s ->
        # 0.49 s on the 130k-pair micro). Lifting the cap is the
        # standard Spark production setting; the larger code-cache
        # reserve keeps the newly-compiled big methods from evicting
        # each other across a 253-query surface. Driver opts cover
        # local[] mode (tasks run in the driver JVM); executor opts make
        # the same true on a real cluster.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_JVM_OPTS",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
            ),
        )
        .config(
            "spark.executor.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_JVM_OPTS",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if rocksdb_state_store:
        enable_rocksdb_state_store(spark)
    return spark
