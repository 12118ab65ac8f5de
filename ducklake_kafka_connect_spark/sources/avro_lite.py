"""Pure-Python Avro binary decode (reference operator A4, jar-free).

The reference ingests Avro via Kafka Connect's AvroConverter + schema
registry (``src/integrationTest/.../AvroIntegrationTest.java:109-137``).
Spark's ``from_avro`` needs the spark-avro jar, absent in this image —
so this module implements the Avro binary encoding itself (Apache Avro
spec §Binary Encoding: zigzag-varint longs, length-prefixed bytes/
strings, union index prefix, block-encoded arrays/maps) for the
record-of-primitives subset the reference exercises, plus nested
records, arrays, maps, nullable unions, and timestamp-millis.

Execution shape: schema parsing happens once driver-side; decoding runs
in ``mapInPandas`` over Arrow batches (one Python call per batch, not
per row). ``decode_confluent_framing`` strips the registry wire format
(magic 0 + 4-byte schema id) so registry-produced topics decode too.
When the spark-avro jar IS present, ``sources/avro_decode.py`` remains
the JVM-side fast path.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Binary primitives (Avro spec)
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise EOFError("truncated Avro payload")
        self.pos += n
        return b

    def read_long(self) -> int:
        """zigzag varint."""
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# ---------------------------------------------------------------------------
# Schema-driven decode
# ---------------------------------------------------------------------------


def _decode(schema: Any, r: _Reader) -> Any:
    if isinstance(schema, list):  # union: index prefix
        idx = r.read_long()
        return _decode(schema[idx], r)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(f["type"], r) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte size
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(_decode(schema["items"], r))
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read_bytes().decode("utf-8")
                    out[k] = _decode(schema["values"], r)
        if t == "enum":
            return schema["symbols"][r.read_long()]
        if t == "fixed":
            return r.read(schema["size"])
        return _decode(t, r)  # {"type": "long", "logicalType": ...}
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) != b"\x00"
    if schema in ("int", "long"):
        return r.read_long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "string":
        return r.read_bytes().decode("utf-8")
    if schema == "bytes":
        return r.read_bytes()
    raise ValueError(f"Unsupported Avro type: {schema!r}")


def _encode(schema: Any, value: Any, out: bytearray) -> None:
    """Inverse of _decode — test/producer side."""
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if (value is None) == (branch == "null"):
                out += _zigzag(i)
                _encode(branch, value, out)
                return
            if branch != "null" and value is not None:
                out += _zigzag(i)
                _encode(branch, value, out)
                return
        raise ValueError("no union branch matched")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], out)
            return
        if t == "array":
            if value:
                out += _zigzag(len(value))
                for v in value:
                    _encode(schema["items"], v, out)
            out += _zigzag(0)
            return
        if t == "map":
            if value:
                out += _zigzag(len(value))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    out += _zigzag(len(kb)) + kb
                    _encode(schema["values"], v, out)
            out += _zigzag(0)
            return
        _encode(t, value, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out += b"\x01" if value else b"\x00"
    elif schema in ("int", "long"):
        out += _zigzag(int(value))
    elif schema == "float":
        out += struct.pack("<f", value)
    elif schema == "double":
        out += struct.pack("<d", value)
    elif schema == "string":
        b = value.encode("utf-8")
        out += _zigzag(len(b)) + b
    elif schema == "bytes":
        out += _zigzag(len(value)) + bytes(value)
    else:
        raise ValueError(f"Unsupported Avro type: {schema!r}")


def encode_avro(schema_json: str, value: dict) -> bytes:
    out = bytearray()
    _encode(json.loads(schema_json), value, out)
    return bytes(out)


# ---------------------------------------------------------------------------
# Avro schema → Spark schema
# ---------------------------------------------------------------------------


def avro_to_spark_type(schema: Any) -> T.DataType:
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"Only nullable unions supported: {schema!r}")
        return avro_to_spark_type(non_null[0])
    if isinstance(schema, dict):
        t = schema["type"]
        if schema.get("logicalType") == "timestamp-millis":
            return T.TimestampType()
        if schema.get("logicalType") == "date":
            return T.DateType()
        if t == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], avro_to_spark_type(f["type"]), _nullable(f["type"])
                    )
                    for f in schema["fields"]
                ]
            )
        if t == "array":
            return T.ArrayType(avro_to_spark_type(schema["items"]), True)
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]), True)
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        return avro_to_spark_type(t)
    return {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }[schema]


def _nullable(schema: Any) -> bool:
    return isinstance(schema, list) and "null" in schema


# ---------------------------------------------------------------------------
# DataFrame decode
# ---------------------------------------------------------------------------


def decode_confluent_framing(payload: bytes) -> bytes:
    """Strip the schema-registry wire format (magic 0x00 + 4-byte
    schema id) when present."""
    if len(payload) > 5 and payload[0] == 0:
        return payload[5:]
    return payload


def _convert(value: Any, schema: Any):
    """Post-decode conversion for logical types (epoch-millis → pandas
    Timestamp) walking the same structure."""
    if value is None:
        return None
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        return _convert(value, non_null[0])
    if isinstance(schema, dict):
        if schema.get("logicalType") == "timestamp-millis":
            return pd.Timestamp(value, unit="ms")
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _convert(value[f["name"]], f["type"])
                for f in schema["fields"]
            }
        if t == "array":
            return [_convert(v, schema["items"]) for v in value]
        if t == "map":
            return {k: _convert(v, schema["values"]) for k, v in value.items()}
        return _convert(value, t)
    return value


def decode_avro_lite(
    df: DataFrame,
    writer_schema_json: str,
    value_col: str = "value",
    confluent_framing: bool = False,
    keep_cols: list[str] | None = None,
    with_corrupt_col: bool = False,
) -> DataFrame:
    """Decode a binary column of Avro records (top level must be a
    record) into typed columns via mapInPandas.

    ``keep_cols`` pass through untouched (kafka metadata). With
    ``with_corrupt_col``, undecodable payloads yield an all-null row
    plus a ``_corrupt`` column holding the payload base64 (DLQ routing,
    same contract as the JSON decoder); otherwise they raise."""
    schema = json.loads(writer_schema_json)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("top-level Avro schema must be a record")
    # null payloads decode to all-null rows → every output field nullable
    fields = [
        T.StructField(f.name, f.dataType, True)
        for f in avro_to_spark_type(schema).fields
    ]
    keep = list(keep_cols or [])
    narrow = df.select(*keep, value_col)
    keep_fields = [narrow.schema[c] for c in keep]
    out_fields = keep_fields + fields
    if with_corrupt_col:
        out_fields = out_fields + [T.StructField("_corrupt", T.StringType(), True)]
    spark_schema = T.StructType(out_fields)
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
                    raw = bytes(payload)
                    if confluent_framing:
                        raw = decode_confluent_framing(raw)
                    try:
                        rec = _decode(schema, _Reader(raw))
                        row.update(
                            {
                                n: _convert(rec[n], f["type"])
                                for n, f in zip(field_names, schema["fields"])
                            }
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
