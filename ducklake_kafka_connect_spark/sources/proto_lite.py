"""Pure-Python Protobuf wire-format codec (source-format extension).

Kafka Connect deployments run ProtobufConverter alongside the Avro
converter the reference tests (A4, ``AvroIntegrationTest.java``); this
module adds the protobuf leg of that format family with zero native
dependencies, implementing the public proto3 wire format (varints,
zigzag sints, fixed32/64, length-delimited strings/bytes/messages,
packed repeated numerics, unknown-field skip).

The message shape is declared as a field-spec list — the decoded-schema
equivalent of a compiled descriptor:

    schema = proto_schema([
        (1, "key_id", "int64"),
        (2, "name", "string"),
        (3, "scores", "double", "repeated"),
        (4, "meta", proto_schema([(1, "k", "string")]), "message"),
    ])

Execution shape mirrors ``avro_lite``: the schema is built once
driver-side; decoding runs in ``mapInPandas`` over Arrow batches (one
Python call per batch). Undecodable payloads yield an all-null row plus
a ``_corrupt`` column (DLQ routing, same contract as the JSON/Avro
decoders).

proto3 presence semantics: absent scalar fields decode to their proto3
defaults (0 / "" / b"" / False), absent messages to None, absent
repeated fields to [] — matching what ProtobufConverter emits.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_WT_VARINT, _WT_FIXED64, _WT_LEN, _WT_SGROUP, _WT_EGROUP, _WT_FIXED32 = range(6)

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool", "enum"}
_FIXED64_TYPES = {"double", "fixed64", "sfixed64"}
_FIXED32_TYPES = {"float", "fixed32", "sfixed32"}
_LEN_TYPES = {"string", "bytes", "message"}
_NUMERIC_PACKABLE = _VARINT_TYPES | _FIXED64_TYPES | _FIXED32_TYPES


@dataclass(frozen=True)
class ProtoField:
    number: int
    name: str
    ptype: str  # one of the sets above, or "message"
    repeated: bool = False
    message: dict | None = None  # nested {number: ProtoField} for "message"

    def __post_init__(self):
        known = _VARINT_TYPES | _FIXED64_TYPES | _FIXED32_TYPES | _LEN_TYPES
        if self.ptype not in known:
            raise ValueError(f"unknown proto type {self.ptype!r}")
        if (self.ptype == "message") != (self.message is not None):
            raise ValueError("message fields (and only they) need a nested schema")


def proto_schema(fields: list[tuple]) -> dict[int, ProtoField]:
    """Build a schema from (number, name, ptype[, flags...]) tuples.
    ``"repeated"`` flags a repeated field; a dict ptype or the
    ``"message"`` flag with a dict third element declares nesting."""
    out: dict[int, ProtoField] = {}
    for spec in fields:
        number, name, ptype = spec[0], spec[1], spec[2]
        flags = set(spec[3:])
        nested = None
        if isinstance(ptype, dict):
            nested, ptype = ptype, "message"
        if number in out:
            raise ValueError(f"duplicate field number {number}")
        out[number] = ProtoField(
            number, name, ptype, repeated="repeated" in flags, message=nested
        )
    return out


# ---------------------------------------------------------------------------
# Wire primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise EOFError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _write_varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit, per the spec
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _from_varint(raw: int, ptype: str) -> Any:
    if ptype == "bool":
        return bool(raw)
    if ptype in ("sint32", "sint64"):
        return (raw >> 1) ^ -(raw & 1)
    if ptype in ("int32", "int64", "enum"):
        # negative ints travel as 64-bit two's complement
        return raw - (1 << 64) if raw >= (1 << 63) else raw
    return raw  # uint32/uint64


def _to_varint(value: Any, ptype: str) -> int:
    if ptype == "bool":
        return 1 if value else 0
    if ptype in ("sint32", "sint64"):
        v = int(value)
        return (v << 1) ^ (v >> 63)
    return int(value)


_FIXED_FMT = {
    "double": "<d",
    "fixed64": "<Q",
    "sfixed64": "<q",
    "float": "<f",
    "fixed32": "<I",
    "sfixed32": "<i",
}


def _skip_unknown(buf: bytes, pos: int, wt: int) -> int:
    """Spec behavior: unknown fields are skipped, not errors."""
    if wt == _WT_VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wt == _WT_FIXED64:
        return pos + 8
    if wt == _WT_LEN:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wt == _WT_FIXED32:
        return pos + 4
    raise ValueError(f"unsupported wire type {wt} (groups are deprecated)")


# ---------------------------------------------------------------------------
# Decode / encode
# ---------------------------------------------------------------------------


def decode_proto(schema: dict[int, ProtoField], data: bytes) -> dict[str, Any]:
    """Wire bytes → dict under proto3 presence semantics."""
    out: dict[str, Any] = {}
    for f in schema.values():
        if f.repeated:
            out[f.name] = []
        elif f.ptype == "message":
            out[f.name] = None
        elif f.ptype == "string":
            out[f.name] = ""
        elif f.ptype == "bytes":
            out[f.name] = b""
        elif f.ptype == "bool":
            out[f.name] = False
        elif f.ptype in ("double", "float"):
            out[f.name] = 0.0
        else:
            out[f.name] = 0
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        number, wt = tag >> 3, tag & 0x7
        f = schema.get(number)
        if f is None:
            pos = _skip_unknown(data, pos, wt)
            continue
        if f.ptype in _VARINT_TYPES and wt == _WT_VARINT:
            raw, pos = _read_varint(data, pos)
            v = _from_varint(raw, f.ptype)
        elif f.ptype in _FIXED64_TYPES and wt == _WT_FIXED64:
            if pos + 8 > n:
                raise EOFError("truncated fixed64")
            v = struct.unpack_from(_FIXED_FMT[f.ptype], data, pos)[0]
            pos += 8
        elif f.ptype in _FIXED32_TYPES and wt == _WT_FIXED32:
            if pos + 4 > n:
                raise EOFError("truncated fixed32")
            v = struct.unpack_from(_FIXED_FMT[f.ptype], data, pos)[0]
            pos += 4
        elif wt == _WT_LEN:
            ln, pos = _read_varint(data, pos)
            if pos + ln > n:
                raise EOFError("truncated length-delimited field")
            chunk = bytes(data[pos : pos + ln])
            pos += ln
            if f.ptype == "string":
                v = chunk.decode("utf-8")
            elif f.ptype == "bytes":
                v = chunk
            elif f.ptype == "message":
                v = decode_proto(f.message, chunk)
            elif f.repeated and f.ptype in _NUMERIC_PACKABLE:
                # packed repeated numerics (proto3 default encoding)
                vals = []
                p = 0
                while p < ln:
                    if f.ptype in _VARINT_TYPES:
                        raw, p = _read_varint(chunk, p)
                        vals.append(_from_varint(raw, f.ptype))
                    elif f.ptype in _FIXED64_TYPES:
                        vals.append(
                            struct.unpack_from(_FIXED_FMT[f.ptype], chunk, p)[0]
                        )
                        p += 8
                    else:
                        vals.append(
                            struct.unpack_from(_FIXED_FMT[f.ptype], chunk, p)[0]
                        )
                        p += 4
                out[f.name].extend(vals)
                continue
            else:
                raise ValueError(
                    f"field {f.name}: wire type 2 for scalar {f.ptype}"
                )
        else:
            raise ValueError(
                f"field {f.name}: wire type {wt} does not match {f.ptype}"
            )
        if f.repeated:
            out[f.name].append(v)
        else:
            out[f.name] = v
    return out


def encode_proto(schema: dict[int, ProtoField], record: dict[str, Any]) -> bytes:
    """Dict → wire bytes. None values (and empty repeated) are omitted,
    the proto3 not-serialized form."""
    out = bytearray()

    def emit_scalar(f: ProtoField, v: Any) -> None:
        if f.ptype in _VARINT_TYPES:
            out.extend(_write_varint((f.number << 3) | _WT_VARINT))
            out.extend(_write_varint(_to_varint(v, f.ptype)))
        elif f.ptype in _FIXED64_TYPES:
            out.extend(_write_varint((f.number << 3) | _WT_FIXED64))
            out.extend(struct.pack(_FIXED_FMT[f.ptype], v))
        elif f.ptype in _FIXED32_TYPES:
            out.extend(_write_varint((f.number << 3) | _WT_FIXED32))
            out.extend(struct.pack(_FIXED_FMT[f.ptype], v))
        else:
            if f.ptype == "string":
                chunk = v.encode("utf-8")
            elif f.ptype == "bytes":
                chunk = bytes(v)
            else:
                chunk = encode_proto(f.message, v)
            out.extend(_write_varint((f.number << 3) | _WT_LEN))
            out.extend(_write_varint(len(chunk)))
            out.extend(chunk)

    for f in sorted(schema.values(), key=lambda x: x.number):
        v = record.get(f.name)
        if v is None:
            continue
        if f.repeated:
            if not v:
                continue
            if f.ptype in _NUMERIC_PACKABLE:
                payload = bytearray()
                for item in v:
                    if f.ptype in _VARINT_TYPES:
                        payload.extend(_write_varint(_to_varint(item, f.ptype)))
                    else:
                        payload.extend(struct.pack(_FIXED_FMT[f.ptype], item))
                out.extend(_write_varint((f.number << 3) | _WT_LEN))
                out.extend(_write_varint(len(payload)))
                out.extend(payload)
            else:
                for item in v:
                    emit_scalar(f, item)
        else:
            emit_scalar(f, v)
    return bytes(out)


def strip_confluent_proto_framing(payload: bytes) -> tuple[int, list[int], bytes]:
    """Confluent's protobuf wire format: magic 0x00, 4-byte big-endian
    schema id, then a zigzag-varint message-index array (count followed
    by indexes; a single 0 means [0], the first/only message in the
    .proto). Returns (schema_id, message_indexes, body). Raises on a
    missing magic byte — callers route to the DLQ."""
    if len(payload) < 6 or payload[0] != 0:
        raise ValueError("not Confluent-framed (magic byte missing)")
    schema_id = struct.unpack(">I", payload[1:5])[0]
    pos = 5
    first, pos = _read_varint(payload, pos)
    count = (first >> 1) ^ -(first & 1)  # zigzag
    if count == 0:
        return schema_id, [0], payload[pos:]
    idx = []
    for _ in range(count):
        raw, pos = _read_varint(payload, pos)
        idx.append((raw >> 1) ^ -(raw & 1))
    return schema_id, idx, payload[pos:]


def frame_confluent_proto(
    schema_id: int, body: bytes, message_indexes: list[int] | None = None
) -> bytes:
    """Inverse of :func:`strip_confluent_proto_framing` (test fixtures
    and round-trip checks)."""
    out = bytearray(b"\x00" + struct.pack(">I", schema_id))
    idx = message_indexes or [0]
    if idx == [0]:
        out.extend(_write_varint(0))  # the compact single-0 form
    else:
        out.extend(_write_varint((len(idx) << 1) ^ (len(idx) >> 63)))
        for i in idx:
            out.extend(_write_varint((i << 1) ^ (i >> 63)))
    return bytes(out) + body


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

_SPARK_TYPES = {
    "int32": T.IntegerType(),
    "sint32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "uint32": T.LongType(),  # uint32 can exceed int32
    "fixed32": T.LongType(),
    "enum": T.IntegerType(),
    "int64": T.LongType(),
    "sint64": T.LongType(),
    "sfixed64": T.LongType(),
    "uint64": T.LongType(),  # >2^63 values would overflow; documented
    "fixed64": T.LongType(),
    "bool": T.BooleanType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def proto_to_spark_type(schema: dict[int, ProtoField]) -> T.StructType:
    fields = []
    for f in sorted(schema.values(), key=lambda x: x.number):
        if f.ptype == "message":
            dt: T.DataType = proto_to_spark_type(f.message)
        else:
            dt = _SPARK_TYPES[f.ptype]
        if f.repeated:
            dt = T.ArrayType(dt, True)
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)


def _coerce(v: Any, f: ProtoField) -> Any:
    """Row dict → Spark-friendly python values (nested dicts stay dicts;
    uint64 past int64 range would fail the Long column — clamp is wrong,
    so let it raise: the corrupt path catches it)."""
    if f.ptype in ("uint64", "fixed64") and isinstance(v, int) and v >= (1 << 63):
        raise OverflowError(f"{f.name}: uint64 value exceeds BIGINT")
    return v


def decode_proto_lite(
    df: DataFrame,
    schema: dict[int, ProtoField],
    value_col: str = "value",
    keep_cols: list[str] | None = None,
    with_corrupt_col: bool = False,
    confluent_framing: bool = False,
) -> DataFrame:
    """Decode a binary column of protobuf messages into typed columns
    via mapInPandas — one Python call per Arrow batch, the same
    execution shape (and DLQ contract) as ``decode_avro_lite``."""
    fields = list(proto_to_spark_type(schema).fields)
    keep = list(keep_cols or [])
    narrow = df.select(*keep, value_col)
    keep_fields = [narrow.schema[c] for c in keep]
    out_fields = keep_fields + fields
    if with_corrupt_col:
        out_fields = out_fields + [T.StructField("_corrupt", T.StringType(), True)]
    spark_schema = T.StructType(out_fields)
    by_name = {f.name: f for f in schema.values()}
    field_names = [f.name for f in fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import base64

        for pdf in batches:
            rows = []
            for i, payload in enumerate(pdf[value_col]):
                row = {c: pdf[c].iloc[i] for c in keep}
                corrupt = None
                if payload is None:
                    row.update({n: None for n in field_names})
                else:
                    try:
                        raw = bytes(payload)
                        if confluent_framing:
                            _, _, raw = strip_confluent_proto_framing(raw)
                        rec = decode_proto(schema, raw)
                        row.update(
                            {n: _coerce(rec[n], by_name[n]) for n in field_names}
                        )
                    except Exception:
                        if not with_corrupt_col:
                            raise
                        row.update({n: None for n in field_names})
                        corrupt = base64.b64encode(bytes(payload)).decode("ascii")
                if with_corrupt_col:
                    row["_corrupt"] = corrupt
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return narrow.mapInPandas(decode, spark_schema)
