"""ISO-8601 timestamp detection / parsing and the ID-field heuristic.

Behavioral parity with the reference's timestamp sniffing
(``connect/TimestampUtils.java:31-95``) and ID-like field suppression
(``connect/SinkRecordToArrowConverter.java:69-70,759-770``):

- A string is a timestamp iff it matches
  ``YYYY-MM-DDTHH:MM:SS[.fff{1,9}][Z|±hh:mm|±hhmm]`` AND parses.
- Compact offsets ``±hhmm`` are normalized to ``±hh:mm``.
- Naive timestamps (no zone) are interpreted as UTC.
- Fields whose lower-cased name ends in ``_id, id, _uuid, uuid, _key, key``
  are never timestamp-inferred (keeps ``order_id = "2023-..."`` a string).

Two layers: pure-Python (driver-side schema inference over sampled
values) and Catalyst column expressions (executor-side parsing of whole
columns without any Python UDF — regexp + try_to_timestamp stay inside
whole-stage codegen).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

ID_FIELD_SUFFIXES = ("_id", "id", "_uuid", "uuid", "_key", "key")

# YYYY-MM-DDTHH:MM:SS with optional .fractional{1,9} and optional zone.
_ISO8601_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{1,9})?(?:Z|[+-]\d{2}:?\d{2})?$"
)
_COMPACT_OFFSET_RE = re.compile(r"^(.*[+-]\d{2})(\d{2})$")

# Same pattern for Spark's regexp_like (no lookarounds needed).
ISO8601_SPARK_PATTERN = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,9})?(Z|[+-]\d{2}:?\d{2})?$"
)


def is_id_like_field(field_name: str | None) -> bool:
    """Case-insensitive suffix match against common ID field names."""
    if field_name is None:
        return False
    lower = field_name.lower()
    return any(lower.endswith(s) for s in ID_FIELD_SUFFIXES)


def parse_iso_timestamp_ms(value: str) -> int:
    """Parse an ISO-8601 string to epoch milliseconds (driver-side).

    Z / ±hh:mm / ±hhmm offsets; naive values are treated as UTC.
    Raises ValueError on anything unparseable.
    """
    if value is None or not value.strip():
        raise ValueError("Timestamp value cannot be null or empty")
    trimmed = value.strip()
    if not _ISO8601_RE.match(trimmed):
        raise ValueError(f"Invalid timestamp format: {trimmed}")
    s = trimmed
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    else:
        m = _COMPACT_OFFSET_RE.match(s)
        if m:
            s = f"{m.group(1)}:{m.group(2)}"
    # Python fromisoformat keeps at most µs; trim >6 fractional digits.
    s = re.sub(r"\.(\d{6})\d+", r".\1", s)
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def is_iso_timestamp_str(value: str | None) -> bool:
    """Driver-side sniff: regex + actually-parses (e.g. month 13 fails)."""
    if value is None or not value.strip():
        return False
    try:
        parse_iso_timestamp_ms(value)
        return True
    except ValueError:
        return False


def iso_timestamp_matches(col: Column) -> Column:
    """Catalyst predicate: does the (trimmed) string look ISO-8601?

    Combined with ``try_to_timestamp`` nullability this reproduces the
    reference's regex+parse check entirely JVM-side.
    """
    return F.regexp_like(F.trim(col), F.lit(ISO8601_SPARK_PATTERN))


def parse_iso_timestamp(col: Column) -> Column:
    """Catalyst expression: ISO-8601 string → TIMESTAMP (UTC session TZ).

    Handles Z, ±hh:mm, compact ±hhmm (normalized via one regexp_replace),
    and naive strings (interpreted as UTC because the engine pins
    ``spark.sql.session.timeZone=UTC``). Non-matching / unparseable
    values yield NULL — the reference's "unparseable → NULL + warn"
    write-time behavior (``connect/SinkRecordToArrowConverter.java:638-653``).
    """
    trimmed = F.trim(col)
    normalized = F.regexp_replace(
        trimmed, r"([+-]\d{2})(\d{2})$", r"$1:$2"
    )
    return F.when(
        iso_timestamp_matches(col), F.try_to_timestamp(normalized)
    ).otherwise(F.lit(None).cast("timestamp"))
