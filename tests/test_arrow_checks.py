"""Arrow-sink CHECK compiler (sources/arrow_checks.py): the compilable
subset evaluates with SQL CHECK null semantics; everything outside the
grammar refuses at compile time; type mismatches refuse at dry-run.

No Spark needed — pure pyarrow unit coverage (the e2e sink behavior is
pinned in test_ddl.py::test_stored_check_constraints)."""

import pyarrow as pa
import pytest

from ducklake_kafka_connect_spark.sources.arrow_checks import (
    CheckCompileError,
    compile_check,
    violations,
)


@pytest.fixture()
def tbl():
    return pa.table(
        {
            "v": pa.array([1.0, -2.0, None, 5.0]),
            "name": pa.array(["a", None, "c", "d"]),
            "k": pa.array([1, 2, 3, 4]),
            "b": pa.array([True, False, None, True]),
        }
    )


def _viol(tbl, pred):
    node = compile_check(pred, set(tbl.column_names))
    return violations({"x": node}, tbl).get("x", 0)


@pytest.mark.parametrize(
    "pred,expect",
    [
        ("v >= 0", 1),  # -2 violates; NULL passes (SQL CHECK)
        ("name IS NOT NULL", 1),
        ("name IS NULL", 3),
        ("v >= 0 AND name IS NOT NULL", 1),  # Kleene AND: null AND T = null
        ("v >= 0 OR k > 3", 1),  # Kleene OR: null OR F = null -> passes
        ("NOT (v < 0)", 1),
        ("k IN (1, 2, 3)", 1),
        ("k NOT IN (4)", 1),
        ("k BETWEEN 1 AND 3", 1),
        ("k NOT BETWEEN 4 AND 9", 1),
        ("0 <= v", 1),  # flipped literal-first comparison
        ("name != 'a'", 1),
        ("name = 'it''s'", 3),  # quote-escaped literal; null passes
        ("v = 5.0", 2),
        ("b = true", 1),
        ("v >= 0 AND (k < 4 OR name = 'd')", 1),
        ("k = 1 OR k = 2 OR k = 3 OR k = 4", 0),
    ],
)
def test_semantics(tbl, pred, expect):
    assert _viol(tbl, pred) == expect


@pytest.mark.parametrize(
    "pred",
    [
        "length(name) > 0",  # function call
        "v + 1 > 0",  # arithmetic
        "v >= 0 AND",  # dangling
        "q > 0",  # unknown column
        "v IN (SELECT 1)",  # subquery
        "v > 'x' || 'y'",  # concat
        "v = v",  # col-col comparison (not in subset)
        "",  # empty
    ],
)
def test_refuses_non_compilable(tbl, pred):
    with pytest.raises(CheckCompileError):
        compile_check(pred, set(tbl.column_names))


def test_dry_run_type_mismatch_refuses(tbl):
    node = compile_check("name > 5", set(tbl.column_names))
    with pytest.raises(CheckCompileError, match="not castable"):
        violations({"x": node}, tbl.slice(0, 0))


def test_int_float_literal_coercion(tbl):
    # int literal against double column and float literal against int
    assert _viol(tbl, "v > 0") == 1
    assert _viol(tbl, "k >= 1.0") == 0


def test_empty_table_no_violations(tbl):
    node = compile_check("v >= 0", set(tbl.column_names))
    assert violations({"x": node}, tbl.slice(0, 0)) == {}


def test_ast_is_picklable(tbl):
    import pickle

    node = compile_check(
        "v >= 0 AND name IS NOT NULL AND k IN (1,2,3)", set(tbl.column_names)
    )
    node2 = pickle.loads(pickle.dumps(node))
    assert violations({"x": node2}, tbl) == violations({"x": node}, tbl)


def test_date_timestamp_literals():
    import datetime as dt

    tbl = pa.table(
        {
            "d": pa.array(
                [dt.date(2024, 1, 1), dt.date(2025, 6, 1), None], pa.date32()
            ),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 12), dt.datetime(2025, 6, 1), None],
                pa.timestamp("us"),
            ),
            "date": pa.array([1, 2, 3]),  # column NAMED date still works
        }
    )
    cols = set(tbl.column_names)
    assert _viol(tbl, "d >= DATE '2024-06-01'") == 1
    assert _viol(tbl, "ts < TIMESTAMP '2025-01-01 00:00:00'") == 1
    assert _viol(tbl, "date BETWEEN 1 AND 3") == 0
    with pytest.raises(CheckCompileError, match="bad DATE"):
        compile_check("d >= DATE 'not-a-date'", cols)
