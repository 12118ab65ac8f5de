"""Schema unification with the reference's type-promotion ladder.

Behavioral parity with ``ingestor/ArrowSchemaMerge.java:51-311``:

- Fields merged by name across N schemas; result columns **sorted by
  name** (:90).
- A merged field is nullable if any input field is nullable or the field
  is missing from any input schema (missing fields null-fill).
- Numeric promotion (Bool participates as numeric, :376-383):
  any Double → Double; else any Float → Float; else any Long → Long;
  else Integer (Byte/Short/Int/Bool collapse to Integer).
- Temporal-only sets promote Timestamp > Date/Time (:251-277).
- **String + Timestamp mixes are an error by design** (:407-417) — the
  caller routes offending records to the DLQ.
- String-like → String; binary-like → Binary.
- All-Array / all-Map / all-Struct → that complex type with children
  merged recursively; complex + scalar → error.
- Anything else → ``SchemaUnificationError`` with the offending types.

Pure driver-side Python over ``StructType``s — no Catalyst work, runs
once per micro-batch.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import types as T


class SchemaUnificationError(ValueError):
    """Cannot unify incompatible types (reference ArrowSchemaMerge.java:212).

    ``samples`` carries offending values from the actual records (the
    reference attaches per-field sample values to converter errors,
    ``connect/SinkRecordToArrowConverter.java:305-385``) so a user
    debugging a DLQ'd batch sees WHICH values conflicted, not just the
    type names."""

    def __init__(
        self,
        message: str,
        field: str | None = None,
        types: Sequence[T.DataType] = (),
        samples: Sequence = (),
    ):
        self.field = field
        self.types = list(types)
        self.samples = list(samples)
        super().__init__(message)

    def with_samples(self, samples: Sequence, max_samples: int = 5) -> "SchemaUnificationError":
        """Return a copy whose message (and .samples) carries up to
        ``max_samples`` offending values."""
        kept = list(samples)[:max_samples]
        shown = ", ".join(repr(s)[:80] for s in kept)
        return SchemaUnificationError(
            f"{self.args[0]}; sample values: [{shown}]",
            field=self.field,
            types=self.types,
            samples=kept,
        )


_INT_ORDER = {
    T.ByteType: 8,
    T.ShortType: 16,
    T.IntegerType: 32,
    T.LongType: 64,
}

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.BooleanType)
_STRING_LIKE = (T.StringType, T.VarcharType, T.CharType)
_TEMPORAL = (T.TimestampType, T.TimestampNTZType, T.DateType)


def _all_isinstance(types: Sequence[T.DataType], klass) -> bool:
    return all(isinstance(t, klass) for t in types)


def unify_types(types: Sequence[T.DataType], field: str | None = None) -> T.DataType:
    """Promote a set of DataTypes to one compatible type (see module doc)."""
    uniq: list[T.DataType] = []
    for t in types:
        if t not in uniq:
            uniq.append(t)
    if len(uniq) == 1:
        return uniq[0]

    if _all_isinstance(uniq, _TEMPORAL):
        # Prefer full timestamps over dates.
        for t in uniq:
            if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
                return t
        return uniq[0]

    if _all_isinstance(uniq, T.DecimalType):
        from .reconcile import combined_decimal

        out = uniq[0]
        for t in uniq[1:]:
            out = combined_decimal(out, t)
        return out

    if _all_isinstance(uniq, _NUMERIC):
        if any(isinstance(t, T.DoubleType) for t in uniq):
            return T.DoubleType()
        if any(isinstance(t, T.FloatType) for t in uniq):
            return T.FloatType()
        if any(isinstance(t, T.LongType) for t in uniq):
            return T.LongType()
        return T.IntegerType()

    if _all_isinstance(uniq, _STRING_LIKE):
        return T.StringType()

    if _all_isinstance(uniq, T.BinaryType):
        return T.BinaryType()

    if _all_isinstance(uniq, T.ArrayType):
        elem = unify_types([t.elementType for t in uniq], field=field)
        contains_null = any(t.containsNull for t in uniq)
        return T.ArrayType(elem, containsNull=contains_null)

    if _all_isinstance(uniq, T.MapType):
        key = unify_types([t.keyType for t in uniq], field=field)
        val = unify_types([t.valueType for t in uniq], field=field)
        value_nullable = any(t.valueContainsNull for t in uniq)
        return T.MapType(key, val, valueContainsNull=value_nullable)

    if _all_isinstance(uniq, T.StructType):
        return unify_schemas([t for t in uniq])

    # string+timestamp (and any other cross-domain mix) is a hard error —
    # caught upstream and routed to the DLQ.
    raise SchemaUnificationError(
        f"Cannot unify incompatible types for field '{field}': "
        f"{[t.simpleString() for t in uniq]}",
        field=field,
        types=uniq,
    )


def unify_schemas(schemas: Sequence[T.StructType]) -> T.StructType:
    """Merge N StructTypes by field name; columns sorted by name."""
    if not schemas:
        return T.StructType([])
    if len(schemas) == 1:
        return schemas[0]

    # Fast path: structural equality (ArrowSchemaMerge.java:317-366).
    first = schemas[0]
    if all(s == first for s in schemas[1:]):
        return first

    by_name: dict[str, list[T.StructField]] = {}
    for s in schemas:
        for f in s.fields:
            by_name.setdefault(f.name, []).append(f)

    n = len(schemas)
    merged: list[T.StructField] = []
    for name in sorted(by_name):
        fields = by_name[name]
        dtype = unify_types([f.dataType for f in fields], field=name)
        nullable = any(f.nullable for f in fields) or len(fields) < n
        merged.append(T.StructField(name, dtype, nullable=nullable))
    return T.StructType(merged)


def add_field(schema: T.StructType, field: T.StructField) -> T.StructType:
    """Single-field add (ArrowSchemaMerge.java:427-444)."""
    if any(f.name == field.name for f in schema.fields):
        raise ValueError(f"Field '{field.name}' already exists")
    return T.StructType(list(schema.fields) + [field])


def remove_field(schema: T.StructType, name: str) -> T.StructType:
    """Single-field remove (ArrowSchemaMerge.java:446-463)."""
    return T.StructType([f for f in schema.fields if f.name != name])


def unify_all(schemas: Sequence[T.StructType]) -> T.StructType:
    return reduce(lambda a, b: unify_schemas([a, b]), schemas)
