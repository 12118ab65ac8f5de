"""Arrow IPC stream decode/encode (reference operators A5/A6).

The reference converts Kafka message bytes containing Arrow IPC streams
into rows (``connect/ArrowIpcConverter.java:77-88``,
``connect/ArrowToKafkaConverter.java:49-134``) and back (:56-74).

Spark shape: ``mapInArrow`` over the binary column — each executor
batch-decodes IPC payloads with pyarrow (Arrow end-to-end, zero
row-at-a-time Python). The output schema must be known up front
(Spark requires a static schema); ``infer_ipc_schema`` peeks at one
message driver-side.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def encode_ipc(batches: list[pa.RecordBatch] | pa.Table, schema: pa.Schema | None = None) -> bytes:
    """Arrow data → IPC stream bytes (test/producer side)."""
    if isinstance(batches, pa.Table):
        schema = batches.schema
        batches = batches.to_batches()
    if schema is None:
        if not batches:
            raise ValueError("encode_ipc needs a schema for an empty batch list")
        schema = batches[0].schema
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, schema) as writer:
        for b in batches:
            writer.write_batch(b)
    return sink.getvalue().to_pybytes()


def decode_ipc_bytes(payload: bytes) -> pa.Table:
    """One IPC stream payload → pyarrow Table (all batches combined)."""
    with pa.ipc.open_stream(payload) as reader:
        return reader.read_all()


def infer_ipc_schema(df: DataFrame, value_col: str = "value") -> pa.Schema:
    """Peek at the first non-null message to learn the stream schema."""
    row = df.select(value_col).filter(f"{value_col} IS NOT NULL").head()
    if row is None:
        raise ValueError("no non-null IPC payloads to infer a schema from")
    return pa.ipc.open_stream(row[0]).schema


def decode_arrow_ipc(
    df: DataFrame, value_col: str = "value", arrow_schema: pa.Schema | None = None
) -> DataFrame:
    """Explode a binary column of Arrow IPC stream payloads into rows.

    Runs as ``mapInArrow``: pyarrow batches in, pyarrow batches out —
    columnar the whole way, matching the reference's zero-copy path
    (``ingestor/DucklakeWriter.java:103-108``).
    """
    if arrow_schema is None:
        arrow_schema = infer_ipc_schema(df, value_col)
    # physical form: TIME columns carry their integer representation
    # (Spark has no TIME type; see _from_arrow_type)
    phys = pa.schema(
        [
            pa.field(
                f.name,
                (pa.int32() if f.type.bit_width == 32 else pa.int64())
                if pa.types.is_time(f.type)
                else f.type,
                f.nullable,
            )
            for f in arrow_schema
        ]
    )
    schema_capture = phys.serialize().to_pybytes()
    narrow = df.select(value_col)

    def explode(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .consolidate import consolidate_stream

        target = pa.ipc.read_schema(pa.py_buffer(schema_capture))

        def decoded() -> Iterator[pa.RecordBatch]:
            for batch in it:
                col = batch.column(0)
                for payload in col.to_pylist():
                    if payload is None:
                        continue
                    with pa.ipc.open_stream(payload) as reader:
                        for rb in reader:
                            if rb.num_rows == 0:
                                continue
                            if not rb.schema.equals(target) and list(rb.schema.names) == list(target.names):
                                # covers promoted widths AND time→int
                                # physical conversion in one cast
                                rb = pa.Table.from_batches([rb]).cast(target).to_batches()[0]
                            yield rb

        # thousands of tiny per-payload batches → right-sized batches
        # (D5 consolidation, executor-side; BatchConsolidator.java parity)
        yield from consolidate_stream(decoded())

    spark_schema = from_arrow_schema(arrow_schema)
    return narrow.mapInArrow(explode, spark_schema)


def from_arrow_schema(schema: pa.Schema) -> T.StructType:
    """Arrow schema → Spark StructType (mirror of the reference's
    Arrow→Connect mapping, ``connect/ArrowToKafkaConverter.java:137-257``)."""
    return T.StructType(
        [T.StructField(f.name, _from_arrow_type(f.type), f.nullable) for f in schema]
    )


def _from_arrow_type(t: pa.DataType) -> T.DataType:
    if pa.types.is_int8(t):
        return T.ByteType()
    if pa.types.is_int16(t):
        return T.ShortType()
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_int64(t):
        return T.LongType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType()
    if pa.types.is_timestamp(t):
        return T.TimestampType()
    if pa.types.is_date(t):
        return T.DateType()
    if pa.types.is_decimal(t):
        # Kafka Connect Decimal logical type → Arrow decimal → Spark
        # DecimalType (KafkaSchemaToArrow.java logical-type mapping)
        return T.DecimalType(t.precision, t.scale)
    if pa.types.is_time(t):
        # Spark has no TIME type; Kafka Time (millis past midnight) maps
        # to the integral micros/millis value, mirroring the reference's
        # storage of TIME as its integer representation
        return T.IntegerType() if t.bit_width == 32 else T.LongType()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return T.ArrayType(_from_arrow_type(t.value_type), True)
    if pa.types.is_map(t):
        return T.MapType(_from_arrow_type(t.key_type), _from_arrow_type(t.item_type), True)
    if pa.types.is_struct(t):
        return T.StructType(
            [T.StructField(f.name, _from_arrow_type(f.type), f.nullable) for f in t]
        )
    raise ValueError(f"Unsupported Arrow type: {t}")
