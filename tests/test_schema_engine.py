"""Schema inference / unification / reconciliation — mirrors the reference
test matrix (ArrowSchemaMergeTest, SinkRecordToArrowConverterTest,
DucklakeTableManagerTest; SURVEY §5)."""

import pytest
from pyspark.sql import types as T

from ducklake_kafka_connect_spark.schema import (
    EvolutionDecision,
    ReconcileError,
    SchemaUnificationError,
    infer_schema_from_value,
    infer_unified_schema,
    unify_schemas,
    unify_types,
)
from ducklake_kafka_connect_spark.schema.reconcile import decide_column, plan_evolution


def struct(**kv) -> T.StructType:
    return T.StructType([T.StructField(k, v, True) for k, v in kv.items()])


class TestInference:
    def test_primitives(self):
        assert infer_schema_from_value(True) == T.BooleanType()
        assert infer_schema_from_value(5) == T.IntegerType()
        assert infer_schema_from_value(2**40) == T.LongType()
        assert infer_schema_from_value(1.5) == T.DoubleType()
        assert infer_schema_from_value(b"x") == T.BinaryType()
        assert infer_schema_from_value("hi") == T.StringType()
        assert infer_schema_from_value(None) is None

    def test_timestamp_sniff_and_id_heuristic(self):
        assert infer_schema_from_value("2023-10-03T14:30:00Z", "created_at") == T.TimestampType()
        # ID-like names never become timestamps
        assert infer_schema_from_value("2023-10-03T14:30:00Z", "order_id") == T.StringType()
        assert infer_schema_from_value("2023-10-03T14:30:00Z", "UUID") == T.StringType()

    def test_struct_and_null_dropping(self):
        s = infer_schema_from_value({"a": 1, "b": None, "c": {"d": "x"}})
        assert s == struct(a=T.IntegerType(), c=struct(d=T.StringType()))

    def test_empty_struct_dropped(self):
        assert infer_schema_from_value({"a": {}}) is None
        assert infer_schema_from_value({}) is None

    def test_arrays(self):
        assert infer_schema_from_value([1, 2]) == T.ArrayType(T.IntegerType(), True)
        assert infer_schema_from_value([None, "x"]) == T.ArrayType(T.StringType(), True)
        assert infer_schema_from_value([None, None]) is None
        assert infer_schema_from_value([]) is None

    def test_unified_across_records(self):
        s = infer_unified_schema([{"id": 1, "v": "a"}, {"id": 2**40, "v": "b", "w": 1.0}])
        assert s == T.StructType(
            [
                T.StructField("id", T.LongType(), True),
                T.StructField("v", T.StringType(), True),
                T.StructField("w", T.DoubleType(), True),
            ]
        )


class TestPromotionLadder:
    def test_int_widening(self):
        assert unify_types([T.IntegerType(), T.LongType()]) == T.LongType()
        assert unify_types([T.ByteType(), T.ShortType()]) == T.IntegerType()
        assert unify_types([T.ShortType(), T.IntegerType()]) == T.IntegerType()

    def test_float_promotion(self):
        assert unify_types([T.FloatType(), T.DoubleType()]) == T.DoubleType()
        assert unify_types([T.IntegerType(), T.FloatType()]) == T.FloatType()
        assert unify_types([T.LongType(), T.DoubleType()]) == T.DoubleType()
        # int64 + float32 → FLOAT (reference promoteNumericTypes: any FP
        # and no double → SINGLE, ArrowSchemaMerge.java:225-242)
        assert unify_types([T.LongType(), T.FloatType()]) == T.FloatType()

    def test_bool_is_numeric(self):
        assert unify_types([T.BooleanType(), T.IntegerType()]) == T.IntegerType()
        assert unify_types([T.BooleanType(), T.LongType()]) == T.LongType()
        assert unify_types([T.BooleanType(), T.DoubleType()]) == T.DoubleType()

    def test_temporal(self):
        assert unify_types([T.DateType(), T.TimestampType()]) == T.TimestampType()

    def test_string_timestamp_mix_is_error(self):
        with pytest.raises(SchemaUnificationError):
            unify_types([T.StringType(), T.TimestampType()], field="ts")

    def test_string_int_mix_is_error(self):
        with pytest.raises(SchemaUnificationError):
            unify_types([T.StringType(), T.IntegerType()], field="v")

    def test_complex_recursive(self):
        a = T.ArrayType(T.IntegerType(), True)
        b = T.ArrayType(T.LongType(), True)
        assert unify_types([a, b]) == T.ArrayType(T.LongType(), True)
        sa = struct(x=T.IntegerType())
        sb = struct(x=T.LongType(), y=T.StringType())
        assert unify_types([sa, sb]) == T.StructType(
            [
                T.StructField("x", T.LongType(), True),
                T.StructField("y", T.StringType(), True),
            ]
        )

    def test_struct_scalar_mix_is_error(self):
        with pytest.raises(SchemaUnificationError):
            unify_types([struct(x=T.IntegerType()), T.IntegerType()])


class TestUnifySchemas:
    def test_sorted_by_name_and_missing_nullable(self):
        a = T.StructType([T.StructField("b", T.IntegerType(), False)])
        b = T.StructType(
            [
                T.StructField("a", T.StringType(), False),
                T.StructField("b", T.IntegerType(), False),
            ]
        )
        m = unify_schemas([a, b])
        assert [f.name for f in m.fields] == ["a", "b"]
        # 'a' missing from schema a → nullable; 'b' non-null everywhere → stays non-null
        assert m["a"].nullable is True
        assert m["b"].nullable is False

    def test_identical_fast_path_preserves_order(self):
        a = T.StructType(
            [T.StructField("z", T.IntegerType(), True), T.StructField("a", T.StringType(), True)]
        )
        assert unify_schemas([a, a]) == a  # no sorting when structurally equal


class TestReconcile:
    def test_decisions(self):
        D = EvolutionDecision
        assert decide_column(T.IntegerType(), T.LongType()) is D.UPGRADE
        assert decide_column(T.LongType(), T.IntegerType()) is D.COMPATIBLE_KEEP
        assert decide_column(T.FloatType(), T.DoubleType()) is D.UPGRADE
        assert decide_column(T.DoubleType(), T.FloatType()) is D.COMPATIBLE_KEEP
        assert decide_column(T.StringType(), T.StringType()) is D.COMPATIBLE_KEEP
        assert decide_column(T.StringType(), T.IntegerType()) is D.INCOMPATIBLE

    def test_json_guard(self):
        js = struct(a=T.IntegerType())
        assert decide_column(js, T.StringType()) is EvolutionDecision.INCOMPATIBLE
        assert decide_column(T.StringType(), js) is EvolutionDecision.INCOMPATIBLE
        assert decide_column(js, js) is EvolutionDecision.COMPATIBLE_KEEP

    def test_plan_add_and_widen(self):
        existing = struct(id=T.IntegerType(), v=T.StringType(), score=T.FloatType())
        incoming = struct(id=T.LongType(), v=T.StringType(), score=T.DoubleType(), region=T.StringType())
        plan = plan_evolution(existing, incoming)
        assert [f.name for f in plan.add_columns] == ["region"]
        assert plan.widen_columns == {"id": T.LongType(), "score": T.DoubleType()}
        assert plan.final_schema["id"].dataType == T.LongType()
        assert plan.final_schema["score"].dataType == T.DoubleType()
        assert plan.final_schema["region"].dataType == T.StringType()

    def test_incompatible_raises(self):
        with pytest.raises(ReconcileError):
            plan_evolution(struct(v=T.StringType()), struct(v=T.IntegerType()))


class TestDecimalLadder:
    """Decimal unification + widening (decimals arrive via the Arrow
    logical-type mapping; Kafka Connect Decimal parity)."""

    def test_unify_same(self):
        from pyspark.sql import types as T

        from ducklake_kafka_connect_spark.schema.merge import unify_types

        assert unify_types([T.DecimalType(10, 2), T.DecimalType(10, 2)]) == T.DecimalType(10, 2)

    def test_unify_widens_both_dimensions(self):
        from pyspark.sql import types as T

        from ducklake_kafka_connect_spark.schema.merge import unify_types

        # (10,2): 8 integral; (8,4): 4 integral → 8 integral + 4 scale
        assert unify_types([T.DecimalType(10, 2), T.DecimalType(8, 4)]) == T.DecimalType(12, 4)

    def test_unify_caps_at_38(self):
        from pyspark.sql import types as T

        from ducklake_kafka_connect_spark.schema.merge import unify_types

        out = unify_types([T.DecimalType(38, 0), T.DecimalType(20, 10)])
        assert out.precision == 38 and out.scale == 10

    def test_decimal_plus_double_is_error(self):
        import pytest as _pytest
        from pyspark.sql import types as T

        from ducklake_kafka_connect_spark.schema.merge import (
            SchemaUnificationError,
            unify_types,
        )

        with _pytest.raises(SchemaUnificationError):
            unify_types([T.DecimalType(10, 2), T.DoubleType()])

    def test_reconcile_keep_and_upgrade(self):
        from pyspark.sql import types as T

        from ducklake_kafka_connect_spark.schema.reconcile import (
            EvolutionDecision,
            decide_column,
            plan_evolution,
        )

        assert (
            decide_column(T.DecimalType(12, 4), T.DecimalType(10, 2))
            is EvolutionDecision.COMPATIBLE_KEEP
        )
        assert (
            decide_column(T.DecimalType(10, 2), T.DecimalType(8, 4))
            is EvolutionDecision.UPGRADE
        )
        plan = plan_evolution(
            T.StructType([T.StructField("v", T.DecimalType(10, 2))]),
            T.StructType([T.StructField("v", T.DecimalType(8, 4))]),
        )
        assert plan.widen_columns == {"v": T.DecimalType(12, 4)}
        assert plan.final_schema["v"].dataType == T.DecimalType(12, 4)
