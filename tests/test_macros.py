"""DuckDB CREATE MACRO parity: stored, parameterized SQL snippets
expanded textually before every other rewrite (lake/table.py
``_expand_macros`` / ``_subst_macro_params``)."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter


@pytest.fixture
def cat(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path))
    LakeWriter(cat.table("t"), pk=["id"]).append(
        spark.createDataFrame(
            [(1, 2.0), (2, 5.0), (3, 9.0)], "id long, v double"
        )
    )
    return cat


def test_scalar_macro_with_defaults(cat):
    cat.sql("CREATE MACRO pct(x, total) AS round(100.0 * x / total, 2)")
    cat.sql("CREATE MACRO bump(x, amt := 1) AS x + amt")
    rows = [
        tuple(r)
        for r in cat.sql(
            "SELECT id, pct(v, 16.0) AS p, bump(id) AS b, bump(id, 10) AS b10 "
            "FROM t ORDER BY id"
        ).collect()
    ]
    assert rows == [(1, 12.5, 2, 11), (2, 31.25, 3, 12), (3, 56.25, 4, 13)]


def test_parenthesized_substitution_precedence(cat):
    # a * b called with (1 + 1, 3) must be (1 + 1) * (3) = 6, not
    # 1 + 1 * 3 = 4 — arguments substitute parenthesized
    cat.sql("CREATE MACRO times(a, b) AS a * b")
    (row,) = cat.sql("SELECT times(1 + 1, 3) AS x").collect()
    assert row["x"] == 6


def test_macro_calls_macro_and_cycle_refusal(cat):
    cat.sql("CREATE MACRO pct(x, total) AS round(100.0 * x / total, 2)")
    cat.sql("CREATE MACRO double_pct(x, total) AS pct(x, total) * 2")
    got = [r["d"] for r in cat.sql(
        "SELECT double_pct(v, 16.0) AS d FROM t ORDER BY id"
    ).collect()]
    assert got == [25.0, 62.5, 112.5]
    cat.sql("CREATE MACRO a1(x) AS b1(x) + 1")
    cat.sql("CREATE MACRO b1(x) AS a1(x) + 1")
    with pytest.raises(ValueError, match="depth"):
        cat.sql("SELECT a1(1) AS s")


def test_table_macro(cat):
    cat.sql(
        "CREATE MACRO topv(k) AS TABLE "
        "SELECT id, v FROM t ORDER BY v DESC LIMIT k"
    )
    rows = [tuple(r) for r in cat.sql("SELECT * FROM topv(2) ORDER BY id").collect()]
    assert rows == [(2, 5.0), (3, 9.0)]


def test_macro_body_literals_protected(cat):
    # a parameter named x must not rewrite inside 'x marks' or "x"
    cat.sql("CREATE MACRO lab(x) AS concat('x=', CAST(x AS STRING))")
    (row,) = cat.sql("SELECT lab(7) AS s").collect()
    assert row["s"] == "x=7"
    # nor must a macro CALL inside a string literal expand
    (row,) = cat.sql("SELECT 'lab(7)' AS s").collect()
    assert row["s"] == "lab(7)"
    # dotted references never substitute (t.x is a column qualifier)
    cat.sql("CREATE MACRO vv(t) AS t * 2")
    (row,) = cat.sql("SELECT vv(3) AS s").collect()
    assert row["s"] == 6


def test_macro_dialect_composition(cat):
    # a macro body may use the DuckDB function surface — expansion runs
    # before the dialect rewrites
    cat.sql("CREATE MACRO day_of(ts0) AS strftime(ts0, '%Y-%m-%d')")
    (row,) = cat.sql(
        "SELECT day_of(TIMESTAMP '2024-03-05 06:07:08') AS d"
    ).collect()
    assert row["d"] == "2024-03-05"


def test_lifecycle_and_errors(cat):
    cat.sql("CREATE MACRO m1(x) AS x + 1")
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE MACRO m1(x) AS x + 2")
    cat.sql("CREATE OR REPLACE MACRO m1(x) AS x + 2")
    (row,) = cat.sql("SELECT m1(1) AS s").collect()
    assert row["s"] == 3
    with pytest.raises(ValueError, match="missing argument"):
        cat.sql("SELECT m1() AS s")
    with pytest.raises(ValueError, match="argument"):
        cat.sql("SELECT m1(1, 2) AS s")
    cat.sql("DROP MACRO m1")
    with pytest.raises(ValueError, match="does not exist"):
        cat.sql("DROP MACRO m1")
    cat.sql("DROP MACRO IF EXISTS m1")
    assert "m1" not in cat.list_macros()


def test_macro_inside_view_body(cat):
    # a VIEW may call a macro: the body inlines as a CTE during view
    # expansion, which happens AFTER the outer macro pass — so the
    # expansion must re-run over each inlined body (UNRESOLVED_ROUTINE
    # otherwise). DuckDB allows views over macros; so do we.
    cat.sql("CREATE MACRO dbl(x) AS x * 2")
    cat.sql("CREATE VIEW v_dbl AS SELECT id, dbl(v) AS v2 FROM t")
    rows = {r["id"]: r["v2"] for r in cat.sql("SELECT * FROM v_dbl").collect()}
    assert rows == {1: 4.0, 2: 10.0, 3: 18.0}
    # dialect features inside the view body rewrite on inline too
    cat.sql(
        "CREATE VIEW v_q AS SELECT id, v FROM t "
        "QUALIFY row_number() OVER (ORDER BY v DESC) = 1"
    )
    (row,) = cat.sql("SELECT id FROM v_q").collect()
    assert row["id"] == 3
