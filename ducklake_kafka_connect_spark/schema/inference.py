"""Schemaless-value schema inference (driver-side, over sampled values).

Behavioral parity with the reference's recursive inference
(``connect/SinkRecordToArrowConverter.java:772-832``):

- ``None`` contributes no type (field dropped if all-null).
- ``dict``  → StructType (children inferred recursively; all-null
  children dropped).
- ``list``  → ArrayType; element type unified across a bounded sample
  of non-null elements via the promotion ladder (array<string> on an
  unresolvable mix); all-null / empty arrays are dropped.
- ``bool → Boolean``, ``int → Integer/Long`` (by magnitude, matching
  Jackson's Integer-vs-Long), ``float → Double``, ``bytes → Binary``.
- ``str`` → Timestamp iff it sniffs ISO-8601 AND the field name is not
  ID-like (``SinkRecordToArrowConverter.java:823-827``); else String.

``infer_unified_schema`` folds per-record schemas through the promotion
ladder (``schema/merge.py``) — the per-batch unification the reference
does in ``ArrowSchemaMerge.unifySchemas``.

The output feeds ``from_json`` on the executors — inference itself runs
once per (sampled) batch on the driver, never per row.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import types as T

from ..functions.timestamps import is_id_like_field, is_iso_timestamp_str
from .merge import unify_schemas, unify_types

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1
_ARRAY_SAMPLE = 100  # element-type unification looks at most this many


def infer_schema_from_value(value: Any, field_name: str | None = None) -> T.DataType | None:
    """Infer a Spark DataType from one Python (JSON-decoded) value.

    Returns None when no type information can be derived (null values,
    empty/all-null collections, empty structs) — callers drop such fields.
    """
    if value is None:
        return None
    if isinstance(value, bool):  # before int: bool is an int subclass
        return T.BooleanType()
    if isinstance(value, dict):
        fields = []
        for k, v in value.items():
            child = infer_schema_from_value(v, str(k))
            if child is not None:
                fields.append(T.StructField(str(k), child, nullable=True))
        if not fields:
            return None  # empty-struct fields are dropped (KafkaSchemaToArrow.java:32-37)
        return T.StructType(fields)
    if isinstance(value, (list, tuple)):
        # Unify across elements (bounded sample), not just the first
        # non-null one: [1, 2.5] must type as array<double>, or the
        # int-typed from_json would silently truncate the 2.5. On an
        # unresolvable mix ([1, "a"]) fall back to array<string> (the
        # reference's STRING default for exotic values).
        elems: list[T.DataType] = []
        for item in value[:_ARRAY_SAMPLE]:
            if item is not None:
                e = infer_schema_from_value(item)
                if e is not None and e not in elems:
                    elems.append(e)
        if not elems:
            return None  # all-null arrays dropped
        if len(elems) == 1:
            return T.ArrayType(elems[0], containsNull=True)
        try:
            return T.ArrayType(unify_types(elems, field_name), containsNull=True)
        except Exception:
            return T.ArrayType(T.StringType(), containsNull=True)
    if isinstance(value, int):
        if _INT32_MIN <= value <= _INT32_MAX:
            return T.IntegerType()
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, str):
        if not is_id_like_field(field_name) and is_iso_timestamp_str(value):
            return T.TimestampType()
        return T.StringType()
    # Anything exotic → string (reference defaults to STRING_SCHEMA)
    return T.StringType()


def infer_record_schema(record: Any) -> T.StructType | None:
    """Schema of one top-level JSON record (must be an object to be typed)."""
    dt = infer_schema_from_value(record)
    if isinstance(dt, T.StructType):
        return dt
    return None


def infer_unified_schema(records: Iterable[Any]) -> T.StructType:
    """Infer per-record schemas and unify them via the promotion ladder."""
    schemas = []
    for rec in records:
        s = infer_record_schema(rec)
        if s is not None:
            schemas.append(s)
    if not schemas:
        return T.StructType([])
    return unify_schemas(schemas)
