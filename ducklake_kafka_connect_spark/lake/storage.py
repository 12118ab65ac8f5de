"""Object-store configuration for the lake root (operator A9).

The reference validates DATA_PATH against s3://, s3a://, gs://, and
file:/// patterns (``connect/DucklakeSinkConfig.java:446-476``, regexes
:34-36) and, when an S3 path is configured, wires endpoint / keys /
url-style / ssl into the engine before attaching the catalog
(``connect/DucklakeConnectionFactory.java:54-62``). Spark's analogue is
Hadoop filesystem configuration: the same settings become ``fs.s3a.*``
(or ``fs.gs.*``) entries on the active session. Nothing here is
AWS-SDK-specific — the jars resolve at runtime on a real cluster; on
this image only the validation and conf-mapping are exercised.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_S3_RE = re.compile(r"^s3a?://[a-zA-Z0-9._-]+(/.*)?$")
_GCS_RE = re.compile(r"^gs://[a-zA-Z0-9._-]+(/.*)?$")
_FILE_RE = re.compile(r"^file:///.+$")
_LOCAL_RE = re.compile(r"^/.+$")  # bare absolute path (local deployments)


class DataPathError(ValueError):
    pass


def validate_data_path(path: str | None) -> str:
    """Reference DataPathValidator parity: accept s3://bucket/path,
    s3a://bucket/path, gs://bucket/path, file:///abs, or a bare absolute
    local path; reject everything else. Returns the trimmed path."""
    if path is None:
        raise DataPathError("Data path is required")
    p = path.strip()
    if not p:
        raise DataPathError("Data path cannot be empty")
    if not (
        _S3_RE.match(p) or _GCS_RE.match(p) or _FILE_RE.match(p) or _LOCAL_RE.match(p)
    ):
        raise DataPathError(
            "Invalid data path format. Expected one of: s3://bucket-name/path, "
            "s3a://bucket-name/path, gs://bucket-name/path, file:///absolute/path, "
            "or /absolute/local/path"
        )
    return p


def storage_scheme(path: str) -> str:
    p = validate_data_path(path)
    if _S3_RE.match(p):
        return "s3"
    if _GCS_RE.match(p):
        return "gs"
    return "file"


@dataclass
class S3Config:
    """The reference's S3 connection surface (endpoint/keys/url-style/ssl
    — ``DucklakeConnectionFactory.java:54-62``)."""

    endpoint: str | None = None
    access_key_id: str | None = None
    secret_access_key: str | None = None
    path_style_access: bool = False  # s3_url_style='path'
    use_ssl: bool = True


def hadoop_conf_for(path: str, s3: S3Config | None = None) -> dict[str, str]:
    """The Hadoop configuration entries a Spark session needs to read and
    write ``path``. Local paths need nothing; s3/gs map the reference's
    settings onto fs.s3a.* / google.cloud keys."""
    scheme = storage_scheme(path)
    if scheme == "file":
        return {}
    if scheme == "gs":
        return {
            "fs.gs.impl": "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
            "fs.AbstractFileSystem.gs.impl": "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS",
        }
    s3 = s3 or S3Config()
    out: dict[str, str] = {
        "fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "fs.s3a.path.style.access": "true" if s3.path_style_access else "false",
        "fs.s3a.connection.ssl.enabled": "true" if s3.use_ssl else "false",
    }
    if s3.endpoint:
        out["fs.s3a.endpoint"] = s3.endpoint
    if s3.access_key_id:
        out["fs.s3a.access.key"] = s3.access_key_id
    if s3.secret_access_key:
        out["fs.s3a.secret.key"] = s3.secret_access_key
    return out


def apply_storage_conf(spark, path: str, s3: S3Config | None = None) -> dict[str, str]:
    """Validate ``path`` and apply its Hadoop conf to the live session
    (sc.hadoopConfiguration — effective for subsequent reads/writes).
    Returns the applied entries."""
    conf = hadoop_conf_for(path, s3)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return conf
