"""Nested complex-type matrix: infer → unify → write → read round-trips
for map-of-struct, array-of-map, and deeply nested structs (reference
SinkRecordToArrowConverterTest.java:58-219 and
ArrowSchemaMergeNestedFieldsTest.java)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.table import to_physical_schema
from ducklake_kafka_connect_spark.schema.inference import (
    infer_record_schema,
    infer_unified_schema,
)
from ducklake_kafka_connect_spark.schema.merge import (
    SchemaUnificationError,
    unify_schemas,
)
from ducklake_kafka_connect_spark.schema.reconcile import plan_evolution, ReconcileError


def S(*fields):
    return T.StructType(list(fields))


def f(name, dtype, nullable=True):
    return T.StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# Inference over nested JSON records
# ---------------------------------------------------------------------------


class TestNestedInference:
    def test_struct_of_struct(self):
        s = infer_record_schema({"a": {"b": {"c": 1}}})
        assert s["a"].dataType["b"].dataType["c"].dataType == T.IntegerType()

    def test_array_of_struct(self):
        s = infer_record_schema({"xs": [{"u": 1, "v": "t"}, {"u": 2, "v": "s"}]})
        elem = s["xs"].dataType.elementType
        assert isinstance(elem, T.StructType)
        assert elem["u"].dataType == T.IntegerType()

    def test_array_of_array(self):
        s = infer_record_schema({"m": [[1, 2], [3]]})
        assert s["m"].dataType == T.ArrayType(T.ArrayType(T.IntegerType(), True), True)

    def test_empty_nested_struct_dropped(self):
        s = infer_record_schema({"a": {"empty": {}}, "b": 1})
        assert "a" not in s.fieldNames()  # only-empty children collapse away
        assert "b" in s.fieldNames()

    def test_deep_nesting_five_levels(self):
        rec = {"l1": {"l2": {"l3": {"l4": {"l5": 9_999_999_999}}}}}
        s = infer_record_schema(rec)
        d = s["l1"].dataType["l2"].dataType["l3"].dataType["l4"].dataType["l5"].dataType
        assert d == T.LongType()  # magnitude-based int vs long


# ---------------------------------------------------------------------------
# Unification at nested levels
# ---------------------------------------------------------------------------


class TestNestedUnify:
    def test_nested_field_added(self):
        a = S(f("o", S(f("x", T.IntegerType()))))
        b = S(f("o", S(f("x", T.IntegerType()), f("y", T.StringType()))))
        u = unify_schemas([a, b])
        o = u["o"].dataType
        assert set(o.fieldNames()) == {"x", "y"}
        assert o["y"].nullable, "field missing from one side must unify nullable"

    def test_nested_int_promotion(self):
        a = S(f("o", S(f("x", T.IntegerType()))))
        b = S(f("o", S(f("x", T.LongType()))))
        assert unify_schemas([a, b])["o"].dataType["x"].dataType == T.LongType()

    def test_array_element_promotion(self):
        a = S(f("xs", T.ArrayType(T.IntegerType())))
        b = S(f("xs", T.ArrayType(T.DoubleType())))
        assert unify_schemas([a, b])["xs"].dataType.elementType == T.DoubleType()

    def test_map_value_promotion(self):
        a = S(f("m", T.MapType(T.StringType(), T.FloatType())))
        b = S(f("m", T.MapType(T.StringType(), T.DoubleType())))
        assert unify_schemas([a, b])["m"].dataType.valueType == T.DoubleType()

    def test_map_of_struct_children_merge(self):
        a = S(f("m", T.MapType(T.StringType(), S(f("u", T.IntegerType())))))
        b = S(f("m", T.MapType(T.StringType(), S(f("w", T.StringType())))))
        v = unify_schemas([a, b])["m"].dataType.valueType
        assert set(v.fieldNames()) == {"u", "w"}

    def test_incompatible_nested_raises_with_field(self):
        a = S(f("o", S(f("x", T.StringType()))))
        b = S(f("o", S(f("x", T.TimestampType()))))
        with pytest.raises(SchemaUnificationError) as ei:
            unify_schemas([a, b])
        assert ei.value.field == "x"

    def test_struct_vs_scalar_is_error(self):
        a = S(f("o", S(f("x", T.IntegerType()))))
        b = S(f("o", T.IntegerType()))
        with pytest.raises(SchemaUnificationError):
            unify_schemas([a, b])


# ---------------------------------------------------------------------------
# Evolution guard: stored-JSON columns never convert
# ---------------------------------------------------------------------------


class TestNestedEvolution:
    def test_identical_nested_struct_keeps(self):
        t = S(f("o", S(f("x", T.IntegerType()))))
        assert plan_evolution(t, t).is_noop

    def test_different_nested_struct_incompatible(self):
        a = S(f("o", S(f("x", T.IntegerType()))))
        b = S(f("o", S(f("x", T.StringType()))))
        with pytest.raises(ReconcileError) as ei:
            plan_evolution(a, b)
        assert ei.value.field == "o"

    def test_scalar_to_json_incompatible(self):
        a = S(f("o", T.StringType()))
        b = S(f("o", T.ArrayType(T.IntegerType())))
        with pytest.raises(ReconcileError):
            plan_evolution(a, b)


# ---------------------------------------------------------------------------
# Write → read round-trips through the lake's JSON physicalization
# ---------------------------------------------------------------------------


class TestNestedWriteRead:
    def _roundtrip(self, spark, tmp_path, name, df):
        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        w = LakeWriter(cat.table(name), pk=[])
        w.append(df)
        t = cat.table(name)
        return t, t.read()

    def test_map_of_struct_roundtrip(self, spark, tmp_path):
        schema = T.StructType(
            [
                f("id", T.IntegerType()),
                f("m", T.MapType(T.StringType(), S(f("u", T.LongType()), f("s", T.StringType())))),
            ]
        )
        df = spark.createDataFrame(
            [(1, {"a": (7, "x")}), (2, {"b": (8, "y"), "c": (9, "z")})], schema
        )
        t, back = self._roundtrip(spark, tmp_path, "mos", df)
        # logical type preserved in the manifest; physical column is JSON text
        assert isinstance(t.manifest().schema["m"].dataType, T.MapType)
        assert dict(back.dtypes)["m"] == "string"
        rows = {r["id"]: json.loads(r["m"]) for r in back.collect()}
        assert rows[1]["a"] == {"u": 7, "s": "x"}
        assert rows[2]["c"]["u"] == 9

    def test_array_of_map_roundtrip(self, spark, tmp_path):
        schema = T.StructType(
            [
                f("id", T.IntegerType()),
                f("xs", T.ArrayType(T.MapType(T.StringType(), T.IntegerType()))),
            ]
        )
        df = spark.createDataFrame([(1, [{"a": 1}, {"b": 2}])], schema)
        t, back = self._roundtrip(spark, tmp_path, "aom", df)
        assert isinstance(t.manifest().schema["xs"].dataType, T.ArrayType)
        assert json.loads(back.collect()[0]["xs"]) == [{"a": 1}, {"b": 2}]

    def test_deep_struct_roundtrip_and_requery(self, spark, tmp_path):
        schema = T.StructType(
            [
                f("id", T.IntegerType()),
                f("o", S(f("p", S(f("q", S(f("r", T.LongType()))))))),
            ]
        )
        df = spark.createDataFrame([(1, ((  (42,),),)), (2, (((7,),),))], schema)
        t, back = self._roundtrip(spark, tmp_path, "deep", df)
        got = {
            r["id"]: r["r"]
            for r in back.select(
                "id", F.get_json_object("o", "$.p.q.r").cast("long").alias("r")
            ).collect()
        }
        assert got == {1: 42, 2: 7}

    def test_physical_schema_marks_json(self):
        logical = S(f("id", T.IntegerType()), f("o", S(f("x", T.IntegerType()))))
        phys = to_physical_schema(logical)
        assert phys["o"].dataType == T.StringType()
        assert phys["o"].metadata.get("ducklake.json") is True
        assert phys["id"].dataType == T.IntegerType()

    def test_nested_merge_upsert_preserves_payload(self, spark, tmp_path):
        schema = T.StructType(
            [f("id", T.IntegerType()), f("o", S(f("x", T.IntegerType())))]
        )
        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        w = LakeWriter(cat.table("nm"), pk=["id"])
        w.write(spark.createDataFrame([(1, (1,)), (2, (2,))], schema))
        w.write(spark.createDataFrame([(2, (22,)), (3, (3,))], schema))  # MERGE
        rows = {r["id"]: json.loads(r["o"]) for r in cat.table("nm").read().collect()}
        assert rows == {1: {"x": 1}, 2: {"x": 22}, 3: {"x": 3}}

    def test_unified_multi_record_json_batch_lands(self, spark, tmp_path):
        # records with different nested shapes unify, write, and read back
        records = [
            {"id": 1, "o": {"x": 1}},
            {"id": 2, "o": {"x": 2, "y": "t"}},
        ]
        unified = infer_unified_schema(records)
        assert set(unified["o"].dataType.fieldNames()) == {"x", "y"}
        df = spark.createDataFrame(
            [(1, (1, None)), (2, (2, "t"))],
            T.StructType(
                [
                    f("id", T.IntegerType()),
                    f("o", S(f("x", T.IntegerType()), f("y", T.StringType()))),
                ]
            ),
        )
        _, back = self._roundtrip(spark, tmp_path, "uni", df)
        rows = {r["id"]: json.loads(r["o"]) for r in back.collect()}
        assert rows[2] == {"x": 2, "y": "t"}
        assert rows[1]["x"] == 1 and rows[1].get("y") is None
