"""Config-validation matrix ported from the reference's
DucklakeSinkConfigTest.java (data-inlining row limit semantics) and
DucklakeSinkConfigPartitionTest.java (partition-by expression parsing)."""

import pytest

from ducklake_kafka_connect_spark.lake.partitioning import parse_partition_exprs
from ducklake_kafka_connect_spark.streaming.ingest import (
    DEFAULT_INLINING_ROW_LIMIT,
    TableSpec,
    parse_inlining_limit,
)


class TestInliningRowLimit:
    """DucklakeSinkConfigTest.java:58-88."""

    def test_default_is_10000(self):
        assert parse_inlining_limit(None) == DEFAULT_INLINING_ROW_LIMIT == 10_000

    def test_numeric_value_returns_number(self):
        assert parse_inlining_limit("5000") == 5000
        assert parse_inlining_limit(5000) == 5000

    def test_off_disables_feature(self):
        assert parse_inlining_limit("off") is None
        assert parse_inlining_limit("OFF") is None
        assert parse_inlining_limit(" off ") is None

    @pytest.mark.parametrize("bad", ["notanumber", "12.5", "", "-3", -3, True])
    def test_invalid_value_throws(self, bad):
        with pytest.raises(ValueError):
            parse_inlining_limit(bad)

    def test_tablespec_wires_auto_compaction(self):
        assert TableSpec().inlining_rows == 10_000
        assert TableSpec(inlining_row_limit="off").inlining_rows is None
        assert TableSpec(inlining_row_limit="2500").inlining_rows == 2500
        with pytest.raises(ValueError):
            TableSpec(inlining_row_limit="nope")


class TestPartitionExpressionMatrix:
    """DucklakeSinkConfigPartitionTest.java:38-254."""

    def spec_strings(self, spec):
        return [e.spec_string() for e in parse_partition_exprs(spec)]

    def test_no_partition_expressions(self):
        assert parse_partition_exprs(None) == []

    def test_single_column(self):
        assert self.spec_strings("region") == ["region"]

    def test_single_temporal_function(self):
        assert self.spec_strings("year(created_at)") == ["year(created_at)"]

    def test_multiple_columns(self):
        assert self.spec_strings("region,status") == ["region", "status"]

    def test_multiple_temporal_functions(self):
        assert self.spec_strings("year(ts),month(ts)") == ["year(ts)", "month(ts)"]

    def test_mixed_expressions(self):
        assert self.spec_strings("year(timestamp),level,service_name") == [
            "year(timestamp)",
            "level",
            "service_name",
        ]

    def test_whitespace_handling(self):
        assert self.spec_strings(" region , status , year(created_at) ") == [
            "region",
            "status",
            "year(created_at)",
        ]

    def test_empty_expression(self):
        assert parse_partition_exprs("") == []

    def test_whitespace_only_expression(self):
        assert parse_partition_exprs("   ") == []

    def test_complex_temporal_combination(self):
        assert self.spec_strings("year(ts),month(ts),day(ts)") == [
            "year(ts)",
            "month(ts)",
            "day(ts)",
        ]

    def test_invalid_function_raises(self):
        with pytest.raises(ValueError):
            parse_partition_exprs("century(ts)")

    def test_malformed_expression_raises(self):
        with pytest.raises(ValueError):
            parse_partition_exprs("year(")

    def test_tablespec_validates_partition_by_eagerly(self):
        with pytest.raises(ValueError):
            TableSpec(partition_by="bogus_fn(x)")
        assert TableSpec(partition_by="year(ts),region").partition_by == "year(ts),region"
