"""Object-store path validation/conf (A9, DucklakeSinkConfig.java:446-476)
and Prometheus-format metrics export (F1, METRICS.md:125-189)."""

import pytest

from ducklake_kafka_connect_spark.lake.storage import (
    DataPathError,
    S3Config,
    apply_storage_conf,
    hadoop_conf_for,
    storage_scheme,
    validate_data_path,
)
from ducklake_kafka_connect_spark.metrics import (
    MetricsRegistry,
    to_prometheus,
)


class TestDataPathValidation:
    @pytest.mark.parametrize(
        "path",
        [
            "s3://my-bucket/warehouse/lake",
            "s3://bucket.dots_and-dashes",
            "s3a://bucket/prefix",
            "gs://bucket/path/deep",
            "file:///var/lake",
            "/var/lib/lake",
            "  s3://bucket/padded  ",
        ],
    )
    def test_accepts(self, path):
        assert validate_data_path(path) == path.strip()

    @pytest.mark.parametrize(
        "path",
        [
            None,
            "",
            "   ",
            "s3://",                      # no bucket
            "s3://bad bucket/space",      # space in bucket
            "hdfs://namenode/lake",       # unsupported scheme
            "relative/path",              # not absolute
            "file://missing-slash",       # file needs three slashes
            "gs:///nobucket",
        ],
    )
    def test_rejects(self, path):
        with pytest.raises(DataPathError):
            validate_data_path(path)

    def test_scheme(self):
        assert storage_scheme("s3://b/k") == "s3"
        assert storage_scheme("s3a://b/k") == "s3"
        assert storage_scheme("gs://b/k") == "gs"
        assert storage_scheme("/data/lake") == "file"
        assert storage_scheme("file:///data/lake") == "file"


class TestHadoopConf:
    def test_local_needs_nothing(self):
        assert hadoop_conf_for("/data/lake") == {}

    def test_s3_maps_reference_settings(self):
        conf = hadoop_conf_for(
            "s3://bucket/lake",
            S3Config(
                endpoint="minio:9000",
                access_key_id="ak",
                secret_access_key="sk",
                path_style_access=True,
                use_ssl=False,
            ),
        )
        assert conf["fs.s3a.endpoint"] == "minio:9000"
        assert conf["fs.s3a.access.key"] == "ak"
        assert conf["fs.s3a.secret.key"] == "sk"
        assert conf["fs.s3a.path.style.access"] == "true"
        assert conf["fs.s3a.connection.ssl.enabled"] == "false"

    def test_apply_to_session(self, spark):
        applied = apply_storage_conf(
            spark, "s3a://bucket/lake", S3Config(endpoint="minio:9000")
        )
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, v in applied.items():
            assert hconf.get(k) == v


class TestPrometheusExport:
    def test_exposition_for_timed_merge(self):
        reg = MetricsRegistry()
        reg.record_op("upsertWithMergeInto", 1500.0)
        reg.record_op("upsertWithMergeInto", 2500.0)
        reg.record_op("simpleInsert", 100.0)
        reg.inc("records_processed", 42)
        text = to_prometheus(reg, labels={"connector": "ducklake-sink"})
        # reference metric names → published alert rules work unchanged
        assert 'operation_time_avg{connector="ducklake-sink",operation="upsertWithMergeInto"} 2000.0' in text
        assert 'operation_count{connector="ducklake-sink",operation="upsertWithMergeInto"} 2' in text
        assert 'operation_time_max{connector="ducklake-sink",operation="upsertWithMergeInto"} 2500.0' in text
        # threshold annotation: merge avg 2000 > 1000 → slow=1; insert 100 < 500 → 0
        assert 'operation_slow{connector="ducklake-sink",operation="upsertWithMergeInto",threshold_ms="1000"} 1' in text
        assert 'operation_slow{connector="ducklake-sink",operation="simpleInsert",threshold_ms="500"} 0' in text
        assert 'records_counter{connector="ducklake-sink",counter="records_processed"} 42' in text
        assert text.count("# TYPE") == 5

    def test_empty_registry_still_valid(self):
        text = to_prometheus(MetricsRegistry())
        assert "# TYPE operation_time_avg gauge" in text
        assert 'operation_slow{operation="simpleInsert",threshold_ms="500"} 0' in text
