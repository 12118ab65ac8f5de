"""Ported matrix of the reference's BatchConsolidationTest.java (744 LoC):
contiguous-run grouping by compatible schema, ordering preservation, and
schema-compatibility edge cases — against sources/consolidate.py."""

import pyarrow as pa
import pytest

from ducklake_kafka_connect_spark.sources.consolidate import (
    consolidate,
    consolidate_stream,
    schemas_compatible,
)

INT_SCHEMA = pa.schema([pa.field("id", pa.int32())])
STRING_SCHEMA = pa.schema([pa.field("name", pa.string())])
BIGINT_SCHEMA = pa.schema([pa.field("id", pa.int64())])
MULTI_COL_SCHEMA = pa.schema(
    [
        pa.field("id", pa.int32()),
        pa.field("name", pa.string()),
        pa.field("score", pa.float64()),
    ]
)


def int_batch(*values):
    return pa.RecordBatch.from_pydict(
        {"id": pa.array(values, type=pa.int32())}, schema=INT_SCHEMA
    )


def int_batch_nulls(*values):
    return pa.RecordBatch.from_pydict(
        {"id": pa.array(list(values), type=pa.int32())}, schema=INT_SCHEMA
    )


def string_batch(*values):
    return pa.RecordBatch.from_pydict(
        {"name": pa.array(values, type=pa.string())}, schema=STRING_SCHEMA
    )


def bigint_batch(*values):
    return pa.RecordBatch.from_pydict(
        {"id": pa.array(values, type=pa.int64())}, schema=BIGINT_SCHEMA
    )


def multi_col_batch(ids, names, scores):
    return pa.RecordBatch.from_pydict(
        {
            "id": pa.array(ids, type=pa.int32()),
            "name": pa.array(names, type=pa.string()),
            "score": pa.array(scores, type=pa.float64()),
        },
        schema=MULTI_COL_SCHEMA,
    )


def int_values(tbl):
    return tbl.column("id").to_pylist()


class TestSameSchema:
    """BatchConsolidationTest.java:171-309."""

    def test_empty_list(self):
        assert consolidate([]) == []

    def test_single_batch(self):
        out = consolidate([int_batch(1, 2, 3)])
        assert len(out) == 1
        assert int_values(out[0]) == [1, 2, 3]

    def test_single_batch_zero_rows(self):
        out = consolidate([int_batch()])
        assert len(out) == 1
        assert out[0].num_rows == 0
        assert schemas_compatible(out[0].schema, INT_SCHEMA)

    def test_two_batches(self):
        out = consolidate([int_batch(1, 2), int_batch(3, 4)])
        assert len(out) == 1
        assert int_values(out[0]) == [1, 2, 3, 4]

    def test_many_batches(self):
        batches = [int_batch(i * 2, i * 2 + 1) for i in range(50)]
        out = consolidate(batches)
        assert len(out) == 1
        assert int_values(out[0]) == list(range(100))

    def test_data_integrity_preserved(self):
        vals = [7, -3, 0, 2**31 - 1, -(2**31)]
        out = consolidate([int_batch(*vals[:3]), int_batch(*vals[3:])])
        assert int_values(out[0]) == vals

    def test_multiple_columns_preserved(self):
        a = multi_col_batch([1, 2], ["x", "y"], [0.5, 1.5])
        b = multi_col_batch([3], ["z"], [2.5])
        out = consolidate([a, b])
        assert len(out) == 1
        assert out[0].column("id").to_pylist() == [1, 2, 3]
        assert out[0].column("name").to_pylist() == ["x", "y", "z"]
        assert out[0].column("score").to_pylist() == [0.5, 1.5, 2.5]

    def test_null_values_preserved(self):
        out = consolidate([int_batch_nulls(1, None, 3), int_batch_nulls(None, 5)])
        assert len(out) == 1
        assert int_values(out[0]) == [1, None, 3, None, 5]

    def test_all_null_column(self):
        out = consolidate([int_batch_nulls(None, None), int_batch_nulls(None)])
        assert len(out) == 1
        assert int_values(out[0]) == [None, None, None]


class TestDifferentSchemas:
    """Contiguous-run grouping (BatchConsolidationTest.java:311-425):
    a schema change splits runs; order is never reshuffled to repack."""

    def test_two_batches_different_schemas(self):
        out = consolidate([int_batch(1, 2), string_batch("a")])
        assert len(out) == 2
        assert int_values(out[0]) == [1, 2]
        assert out[1].column("name").to_pylist() == ["a"]

    def test_oddball_in_middle(self):
        out = consolidate([int_batch(1, 2), string_batch("x"), int_batch(3, 4)])
        assert len(out) == 3
        assert int_values(out[0]) == [1, 2]
        assert out[1].column("name").to_pylist() == ["x"]
        assert int_values(out[2]) == [3, 4]

    def test_alternating_schemas(self):
        out = consolidate(
            [int_batch(1), string_batch("a"), int_batch(2), string_batch("b")]
        )
        assert len(out) == 4

    def test_schema_change_at_end(self):
        out = consolidate([int_batch(1), int_batch(2), string_batch("z")])
        assert len(out) == 2
        assert int_values(out[0]) == [1, 2]

    def test_schema_change_at_start(self):
        out = consolidate([string_batch("z"), int_batch(1), int_batch(2)])
        assert len(out) == 2
        assert int_values(out[1]) == [1, 2]

    def test_three_different_schemas(self):
        out = consolidate([int_batch(1), string_batch("a"), bigint_batch(9)])
        assert len(out) == 3
        assert out[2].column("id").to_pylist() == [9]

    def test_single_oddball_among_many(self):
        batches = [int_batch(i) for i in range(5)]
        batches.insert(2, string_batch("odd"))
        out = consolidate(batches)
        assert len(out) == 3
        assert int_values(out[0]) == [0, 1]
        assert int_values(out[2]) == [2, 3, 4]


class TestOrdering:
    """BatchConsolidationTest.java:427-454."""

    def test_order_within_run(self):
        out = consolidate([int_batch(3, 1), int_batch(2), int_batch(9, 0)])
        assert int_values(out[0]) == [3, 1, 2, 9, 0]

    def test_order_across_runs(self):
        out = consolidate(
            [int_batch(1), string_batch("mid"), int_batch(2), int_batch(3)]
        )
        assert int_values(out[0]) == [1]
        assert out[1].column("name").to_pylist() == ["mid"]
        assert int_values(out[2]) == [2, 3]


class TestSchemaEdgeCases:
    """BatchConsolidationTest.java:456-635."""

    def test_different_nullability_splits(self):
        nn = pa.schema([pa.field("id", pa.int32(), nullable=False)])
        b = pa.RecordBatch.from_pydict(
            {"id": pa.array([5], type=pa.int32())}, schema=nn
        )
        out = consolidate([int_batch(1), b])
        assert len(out) == 2

    def test_different_field_names_split(self):
        key = pa.schema([pa.field("key", pa.int32())])
        b = pa.RecordBatch.from_pydict(
            {"key": pa.array([5], type=pa.int32())}, schema=key
        )
        out = consolidate([int_batch(1), b])
        assert len(out) == 2

    def test_different_field_order_splits(self):
        ab = pa.schema([pa.field("a", pa.int32()), pa.field("b", pa.string())])
        ba = pa.schema([pa.field("b", pa.string()), pa.field("a", pa.int32())])
        x = pa.RecordBatch.from_pydict(
            {"a": pa.array([1], pa.int32()), "b": pa.array(["s"])}, schema=ab
        )
        y = pa.RecordBatch.from_pydict(
            {"b": pa.array(["t"]), "a": pa.array([2], pa.int32())}, schema=ba
        )
        assert len(consolidate([x, y])) == 2

    def test_nested_struct_same_schema_merges(self):
        s = pa.schema([pa.field("who", pa.struct([pa.field("uid", pa.int64())]))])
        x = pa.RecordBatch.from_pydict({"who": [{"uid": 1}]}, schema=s)
        y = pa.RecordBatch.from_pydict({"who": [{"uid": 2}]}, schema=s)
        out = consolidate([x, y])
        assert len(out) == 1
        assert out[0].num_rows == 2

    def test_nested_struct_different_child_types_split(self):
        s1 = pa.schema([pa.field("who", pa.struct([pa.field("uid", pa.int64())]))])
        s2 = pa.schema([pa.field("who", pa.struct([pa.field("uid", pa.string())]))])
        x = pa.RecordBatch.from_pydict({"who": [{"uid": 1}]}, schema=s1)
        y = pa.RecordBatch.from_pydict({"who": [{"uid": "a"}]}, schema=s2)
        assert len(consolidate([x, y])) == 2

    def test_list_type_same_element_merges(self):
        s = pa.schema([pa.field("tags", pa.list_(pa.int64()))])
        x = pa.RecordBatch.from_pydict({"tags": [[1, 2]]}, schema=s)
        y = pa.RecordBatch.from_pydict({"tags": [[3]]}, schema=s)
        out = consolidate([x, y])
        assert len(out) == 1
        assert out[0].column("tags").to_pylist() == [[1, 2], [3]]

    def test_same_fields_different_metadata_merge(self):
        meta = pa.schema([pa.field("id", pa.int32(), metadata={b"k": b"v"})])
        b = pa.RecordBatch.from_pydict(
            {"id": pa.array([5], type=pa.int32())}, schema=meta
        )
        out = consolidate([int_batch(1), b])
        assert len(out) == 1
        assert int_values(out[0]) == [1, 5]

    def test_different_field_count_splits(self):
        two = pa.schema([pa.field("a", pa.int32()), pa.field("b", pa.int32())])
        b = pa.RecordBatch.from_pydict(
            {"a": pa.array([1], pa.int32()), "b": pa.array([2], pa.int32())},
            schema=two,
        )
        assert len(consolidate([int_batch(1), b])) == 2


class TestSchemasAreCompatible:
    """BatchConsolidationTest.java:637-706."""

    def test_identical(self):
        assert schemas_compatible(INT_SCHEMA, INT_SCHEMA)

    def test_reference_equality(self):
        s = pa.schema([pa.field("id", pa.int32())])
        assert schemas_compatible(s, s)

    def test_equal_but_distinct_objects(self):
        assert schemas_compatible(INT_SCHEMA, pa.schema([pa.field("id", pa.int32())]))

    def test_different_field_count(self):
        two = pa.schema([pa.field("a", pa.int32()), pa.field("b", pa.int32())])
        assert not schemas_compatible(INT_SCHEMA, two)

    def test_different_field_types(self):
        assert not schemas_compatible(INT_SCHEMA, STRING_SCHEMA)

    def test_different_nullability(self):
        nn = pa.schema([pa.field("id", pa.int32(), nullable=False)])
        assert not schemas_compatible(INT_SCHEMA, nn)

    def test_different_field_names(self):
        key = pa.schema([pa.field("key", pa.int32())])
        assert not schemas_compatible(INT_SCHEMA, key)

    def test_metadata_ignored(self):
        meta = pa.schema([pa.field("id", pa.int32(), metadata={b"k": b"v"})])
        assert schemas_compatible(INT_SCHEMA, meta)

    def test_same_type_different_bit_width(self):
        assert not schemas_compatible(INT_SCHEMA, BIGINT_SCHEMA)


class TestConsolidateStream:
    """The mapInArrow hot-path form: same run contract, bounded memory."""

    def test_combines_tiny_batches(self):
        out = list(consolidate_stream(int_batch(i) for i in range(100)))
        assert len(out) == 1
        assert out[0].column("id").to_pylist() == list(range(100))

    def test_respects_max_rows(self):
        out = list(
            consolidate_stream((int_batch(i, i) for i in range(100)), max_rows=50)
        )
        assert len(out) >= 2
        flat = [v for b in out for v in b.column("id").to_pylist()]
        assert flat == [v for i in range(100) for v in (i, i)]

    def test_schema_change_splits(self):
        seq = [int_batch(1), int_batch(2), string_batch("x"), int_batch(3)]
        out = list(consolidate_stream(iter(seq)))
        assert [b.schema.field(0).name for b in out] == ["id", "name", "id"]
        assert out[0].column(0).to_pylist() == [1, 2]


class TestDecodeIpcConsolidation:
    """End-to-end: many tiny IPC payloads through decode_arrow_ipc."""

    def test_many_payloads_one_pass(self, spark):
        from ducklake_kafka_connect_spark.sources.arrow_ipc import (
            decode_arrow_ipc,
            encode_ipc,
        )

        payloads = [
            (encode_ipc(pa.table({"id": pa.array([i, i + 1], pa.int64())})),)
            for i in range(0, 40, 2)
        ]
        df = spark.createDataFrame(payloads, "value binary")
        got = sorted(r["id"] for r in decode_arrow_ipc(df, "value").collect())
        expect = sorted(v for i in range(0, 40, 2) for v in (i, i + 1))
        assert got == expect
