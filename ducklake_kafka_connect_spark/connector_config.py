"""Drop-in connector-properties entrypoint: build the engine from the
reference's EXACT Kafka Connect configuration keys.

A user of inyo-global/ducklake-kafka-connect configures a sink with
properties like ``ducklake.data_path``, ``topic2table.map``,
``ducklake.table.<t>.id-columns`` (``connect/DucklakeSinkConfig.java``).
:func:`build_from_properties` accepts that SAME dict and returns a ready
deployment: a LakeCatalog on the configured data path (object-store
paths select the CAS commit backend automatically), an IngestConfig
with per-table specs, the Kafka readStream options, the micro-batch
trigger, and the Spark conf the tuning keys translate to — so switching
engines is "paste your connector properties", not a rewrite.

Key-by-key mapping (reference line refs in ``_KEYMAP`` comments):

===============================  ===========================================
reference key                    engine meaning
===============================  ===========================================
ducklake.data_path               lake root (validated with the same
                                 path regexes); s3://, s3a://, gs:// select
                                 the CAS object-store backend, file:/// and
                                 bare paths the posix backend
ducklake.catalog_uri             accepted, recorded as native: the manifest
                                 chain IS the catalog in this engine
topic2table.map                  IngestConfig.topic2table ("t1:tbl1,t2:tbl2")
ducklake.table.<t>.id-columns    TableSpec.id_columns (MERGE keys)
ducklake.table.<t>.partition-by  TableSpec.partition_by
ducklake.table.<t>.auto-create   TableSpec.auto_create
ducklake.table.<t>.merge-mode    TableSpec.merge_mode (copy-on-write | merge-on-read)
data.inlining.row.limit          TableSpec.inlining_row_limit default
ducklake.max_retry_count         IngestConfig.max_retry_count (writer
                                 commit-conflict replans)
flush.size                       maxOffsetsPerTrigger bound (micro-batch
                                 record cap) unless the consumer override
                                 sets a tighter one
flush.interval.ms                processingTime trigger
consumer.override.max.poll.records  maxOffsetsPerTrigger
file.size.bytes                  spark.sql.adaptive.advisoryPartitionSizeInBytes
                                 (the optimized-write output file target)
duckdb.threads                   spark.sql.shuffle.partitions suggestion
s3.endpoint/access_key_id/       fs.s3a.* Hadoop conf (lake/storage.py)
  secret_access_key/url_style/
  use_ssl
parallel.partition.flush         native (partitionBy writes are parallel)
spill.enabled / spill.directory  native (Spark spills managed memory)
topics / value.converter /       worker-level keys: stream subscription and
  schema.registry.url            the per-table decode format family
===============================  ===========================================

Unknown ``ducklake.*`` / ``s3.*`` / table-pattern keys are surfaced in
``deployment.unknown`` (never silently dropped); value errors raise at
construction, matching the connector's ConfigException-at-start.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .lake import LakeCatalog
from .lake.storage import S3Config, hadoop_conf_for, storage_scheme, validate_data_path
from .streaming.ingest import IngestConfig, TableSpec

_TABLE_KEY_RE = re.compile(
    r"^ducklake\.table\.(?P<table>[A-Za-z0-9_.-]+)\.(?P<prop>id-columns|partition-by|auto-create|merge-mode)$"
)

# value.converter class → TableSpec.format family
_CONVERTER_FORMATS = {
    "org.apache.kafka.connect.json.jsonconverter": "json",
    "org.apache.kafka.connect.storage.stringconverter": "json",
    "io.confluent.connect.avro.avroconverter": "avro_registry",
    "io.confluent.connect.protobuf.protobufconverter": "proto",
}

_KNOWN_SCALARS = {
    "ducklake.data_path",
    "ducklake.catalog_uri",
    "topic2table.map",
    "data.inlining.row.limit",
    "ducklake.max_retry_count",
    "flush.size",
    "flush.interval.ms",
    "file.size.bytes",
    "duckdb.threads",
    "parallel.partition.flush",
    "spill.enabled",
    "spill.directory",
    "consumer.override.max.poll.records",
    "s3.endpoint",
    "s3.access_key_id",
    "s3.secret_access_key",
    "s3.url_style",
    "s3.use_ssl",
    # Kafka Connect worker-level keys users paste along with the rest
    "name",
    "connector.class",
    "tasks.max",
    "topics",
    "key.converter",
    "value.converter",
    "key.converter.schemas.enable",
    "value.converter.schemas.enable",
    "schema.registry.url",
    "value.converter.schema.registry.url",
}


def _parse_bool(key: str, v) -> bool:
    s = str(v).strip().lower()
    if s in ("true", "1", "yes"):
        return True
    if s in ("false", "0", "no"):
        return False
    raise ValueError(f"Invalid boolean for {key}: {v!r}")


def _parse_int(key: str, v) -> int:
    try:
        return int(str(v).strip())
    except ValueError:
        raise ValueError(f"Invalid integer for {key}: {v!r}") from None


@dataclass
class ConnectorDeployment:
    """Everything :func:`build_from_properties` derived from the props.

    ``catalog`` is constructed eagerly for local/file data paths. For
    s3://, s3a://, gs:// paths it is None on this image — the CAS
    backend implements the object-store COMMIT PROTOCOL (and is fully
    emulated/tested locally), but talking to a real bucket additionally
    needs a StorageBackend whose byte I/O targets that store (one
    conditional-PUT HTTP call per method; the interface maps 1:1) plus
    the hadoop jars for the parquet data plane — ``hadoop_conf`` carries
    the session settings those jars consume."""

    catalog: "LakeCatalog | None"
    ingest: IngestConfig
    data_path: str
    backend_name: str
    #: kafka readStream wiring (sources.kafka_source.kafka_stream kwargs)
    stream_options: dict = field(default_factory=dict)
    #: writeStream trigger kwargs ({"processingTime": "5 seconds"} or {})
    trigger: dict = field(default_factory=dict)
    #: Spark conf the tuning keys translate to (apply before starting)
    engine_conf: dict = field(default_factory=dict)
    #: fs.s3a.* / gs Hadoop conf for the data path
    hadoop_conf: dict = field(default_factory=dict)
    #: accepted keys whose job Spark/the lake already does natively
    native: list = field(default_factory=list)
    #: unrecognized keys in the connector namespaces (never silently dropped)
    unknown: list = field(default_factory=list)

    def open_stream(self, spark):
        """readStream per the configured subscription (jar-gated)."""
        from .sources.kafka_source import kafka_stream

        return kafka_stream(spark, **self.stream_options)

    def pipeline(self):
        from .streaming.ingest import IngestPipeline

        if self.catalog is None:
            raise ValueError(
                "object-store data path: supply a StorageBackend for the "
                "bucket (see CasObjectStoreBackend) and build LakeCatalog "
                "explicitly"
            )
        return IngestPipeline(self.catalog, self.ingest)


def build_from_properties(
    spark,
    props: dict,
    backend: str | None = None,
    apply_conf: bool = False,
) -> ConnectorDeployment:
    """Construct a deployment from a reference-connector properties dict.

    ``backend`` overrides the automatic posix/cas choice (local paths →
    posix, object-store schemes → cas). With ``apply_conf=True`` the
    derived Hadoop conf is applied to the live session
    (``storage.apply_storage_conf`` semantics); ``engine_conf`` is
    always returned for the caller to set where appropriate."""
    props = {str(k): v for k, v in props.items()}

    data_path = validate_data_path(props.get("ducklake.data_path"))
    scheme = storage_scheme(data_path)
    backend_name = backend or ("cas" if scheme in ("s3", "gs") else "posix")

    native: list[str] = []
    unknown: list[str] = []
    if "ducklake.catalog_uri" in props:
        # the reference attaches a PostgreSQL catalog; here the manifest
        # chain is the catalog — transactional commits come from the
        # storage backend (flock / conditional-PUT CAS)
        native.append("ducklake.catalog_uri")

    # ---- per-table specs ----
    topic2table = IngestConfig.parse_topic2table(
        str(props.get("topic2table.map", "") or "")
    )
    inlining_default = props.get("data.inlining.row.limit")
    fmt = _CONVERTER_FORMATS.get(
        str(props.get("value.converter", "")).strip().lower(), "json"
    )
    table_props: dict[str, dict[str, object]] = {}
    for k, v in props.items():
        m = _TABLE_KEY_RE.match(k)
        if m:
            table_props.setdefault(m.group("table"), {})[m.group("prop")] = v
        elif k not in _KNOWN_SCALARS and re.match(
            r"^(ducklake|s3|topic2table|data|flush|duckdb|spill|consumer)\.", k
        ):
            unknown.append(k)

    tables: dict[str, TableSpec] = {}
    all_tables = set(topic2table.values()) | set(table_props)
    for t in sorted(all_tables):
        tp = table_props.get(t, {})
        id_cols = [
            c.strip()
            for c in str(tp.get("id-columns", "") or "").split(",")
            if c.strip()
        ]
        tables[t] = TableSpec(
            id_columns=id_cols,
            partition_by=(str(tp["partition-by"]) if tp.get("partition-by") else None),
            auto_create=_parse_bool(
                f"ducklake.table.{t}.auto-create", tp.get("auto-create", False)
            ),
            format=fmt,
            confluent_framing=(fmt in ("avro_registry", "proto")),
            inlining_row_limit=inlining_default,
            merge_mode=(str(tp["merge-mode"]) if tp.get("merge-mode") else None),
        )

    ingest = IngestConfig(
        topic2table=topic2table,
        tables=tables,
        max_retry_count=_parse_int(
            "ducklake.max_retry_count", props.get("ducklake.max_retry_count", 10)
        ),
    )

    # ---- stream wiring ----
    stream_options: dict = {}
    if props.get("topics"):
        stream_options["topics"] = str(props["topics"])
        stream_options["bootstrap_servers"] = str(
            props.get("bootstrap.servers", "localhost:9092")
        )
        max_poll = props.get("consumer.override.max.poll.records") or props.get(
            "flush.size"
        )
        if max_poll is not None:
            stream_options["max_offsets_per_trigger"] = _parse_int(
                "consumer.override.max.poll.records / flush.size", max_poll
            )
    trigger: dict = {}
    if props.get("flush.interval.ms") is not None:
        ms = _parse_int("flush.interval.ms", props["flush.interval.ms"])
        trigger = {"processingTime": f"{ms} milliseconds"}

    # ---- engine conf from the tuning keys ----
    engine_conf: dict = {}
    if props.get("duckdb.threads") is not None:
        engine_conf["spark.sql.shuffle.partitions"] = str(
            _parse_int("duckdb.threads", props["duckdb.threads"])
        )
    if props.get("file.size.bytes") is not None:
        engine_conf["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = str(
            _parse_int("file.size.bytes", props["file.size.bytes"])
        )
    for k in ("parallel.partition.flush", "spill.enabled", "spill.directory"):
        if k in props:
            if k == "parallel.partition.flush":
                _parse_bool(k, props[k])
            native.append(k)  # SURVEY A11/E: Spark does these natively

    s3 = S3Config(
        endpoint=(str(props["s3.endpoint"]) if props.get("s3.endpoint") else None),
        access_key_id=(
            str(props["s3.access_key_id"]) if props.get("s3.access_key_id") else None
        ),
        secret_access_key=(
            str(props["s3.secret_access_key"])
            if props.get("s3.secret_access_key")
            else None
        ),
        path_style_access=(
            str(props.get("s3.url_style", "vhost")).strip().lower() == "path"
        ),
        use_ssl=_parse_bool("s3.use_ssl", props.get("s3.use_ssl", True)),
    )
    hadoop_conf = hadoop_conf_for(data_path, s3)
    if apply_conf and hadoop_conf:
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in hadoop_conf.items():
            hconf.set(k, v)

    if scheme == "file":
        root = data_path[len("file://"):] if data_path.startswith("file://") else data_path
        catalog = LakeCatalog(spark, root, backend=backend_name)
    else:
        catalog = None  # see ConnectorDeployment.catalog docstring
    return ConnectorDeployment(
        catalog=catalog,
        ingest=ingest,
        data_path=data_path,
        backend_name=backend_name,
        stream_options=stream_options,
        trigger=trigger,
        engine_conf=engine_conf,
        hadoop_conf=hadoop_conf,
        native=sorted(set(native)),
        unknown=sorted(set(unknown)),
    )
