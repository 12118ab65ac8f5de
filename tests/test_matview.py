"""Materialized views (lake/matview.py): creation, incremental refresh
via the change feed, group death, markers, guards."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.matview import (
    PROP_BASE_VERSION,
    parse_mv_query,
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "lake"))
    w = LakeWriter(c.table("sales"), pk=["id"])
    w.write(
        spark.createDataFrame(
            [(i, f"r{i % 4}", (i % 10) * 100) for i in range(200)],
            "id int, region string, cents long",
        )
    )
    return c, w


MV_DDL = (
    "CREATE MATERIALIZED VIEW mv AS SELECT region, sum(cents) AS total, "
    "count(*) AS n FROM sales GROUP BY region"
)


def _content(cat):
    return {
        r["region"]: (r["total"], r["n"])
        for r in cat.table("mv").read().collect()
    }


def _expected(cat):
    return {
        r["region"]: (r["total"], r["n"])
        for r in cat.table("sales")
        .read()
        .groupBy("region")
        .agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
        .collect()
    }


def test_create_matches_full_aggregate(spark, cat):
    c, _ = cat
    c.sql(MV_DDL)
    assert _content(c) == _expected(c)
    props = c.table("mv").properties()
    assert props[PROP_BASE_VERSION] == str(c.table("sales").current_version())


def test_incremental_refresh_folds_churn(spark, cat):
    c, w = cat
    c.sql(MV_DDL)
    # update (moves a row across groups), insert into a NEW group, delete
    w.write(
        spark.createDataFrame(
            [(5, "r9", 777), (300, "r9", 5)], "id int, region string, cents long"
        )
    )
    w.delete_where("region = 'r2'")
    st = c.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert "incremental" in st["detail"]
    assert _content(c) == _expected(c)
    # marker advanced atomically with the merge
    assert c.table("mv").properties()[PROP_BASE_VERSION] == str(
        c.table("sales").current_version()
    )
    # noop when the base did not move
    assert "noop" in c.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["detail"]


def test_group_death_and_rebirth(spark, cat):
    c, w = cat
    c.sql(MV_DDL)
    w.delete_where("region = 'r3'")
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert "r3" not in _content(c) and _content(c) == _expected(c)
    w.write(
        spark.createDataFrame([(500, "r3", 42)], "id int, region string, cents long")
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c)["r3"] == (42, 1)


def test_where_clause_commutes(spark, cat):
    c, w = cat
    c.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT region, sum(cents) AS total, "
        "count(*) AS n FROM sales WHERE cents >= 500 GROUP BY region"
    )
    w.write(
        spark.createDataFrame(
            # id=6 had cents 600 (in view) -> drops below the predicate;
            # id=7 had 700 -> stays but value changes; insert above/below
            [(6, "r2", 100), (7, "r3", 900), (600, "r0", 50), (601, "r0", 999)],
            "id int, region string, cents long",
        )
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    exp = {
        r["region"]: (r["total"], r["n"])
        for r in c.table("sales")
        .read()
        .filter("cents >= 500")
        .groupBy("region")
        .agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert _content(c) == exp


def test_full_refresh_and_drop(spark, cat):
    c, w = cat
    c.sql(MV_DDL)
    w.write(
        spark.createDataFrame([(700, "r1", 1)], "id int, region string, cents long")
    )
    st = c.sql("REFRESH MATERIALIZED VIEW mv FULL").collect()[0]
    assert "full" in st["detail"] and _content(c) == _expected(c)
    c.sql("DROP MATERIALIZED VIEW mv")
    assert not c.table("mv").exists()
    with pytest.raises(ValueError, match="does not exist"):
        c.sql("DROP MATERIALIZED VIEW mv")
    c.sql("DROP MATERIALIZED VIEW IF EXISTS mv")
    # DROP MATERIALIZED VIEW refuses plain tables
    with pytest.raises(ValueError, match="not a materialized view"):
        c.sql("DROP MATERIALIZED VIEW sales")


def test_count_expr_and_or_replace(spark, cat):
    c, w = cat
    c.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT region, count(*) AS n, "
        "count(CASE WHEN cents > 500 THEN 1 END) AS n_big, "
        "sum(cents) AS total FROM sales GROUP BY region"
    )
    w.write(
        spark.createDataFrame([(3, "r3", 900)], "id int, region string, cents long")
    )
    c.sql("REFRESH MATERIALIZED VIEW mv")
    exp = {
        r["region"]: (r["n"], r["n_big"])
        for r in c.table("sales").read().groupBy("region").agg(
            F.count("*").alias("n"),
            F.count(F.expr("CASE WHEN cents > 500 THEN 1 END")).alias("n_big"),
        ).collect()
    }
    got = {
        r["region"]: (r["n"], r["n_big"])
        for r in c.table("mv").read().collect()
    }
    assert got == exp
    # OR REPLACE re-materializes with a new definition
    c.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW mv AS SELECT region, "
        "count(*) AS n FROM sales GROUP BY region"
    )
    assert set(c.table("mv").read().columns) >= {"region", "n"}


def test_definition_guards(spark, cat):
    c, _ = cat
    with pytest.raises(ValueError, match="self-maintainable"):
        parse_mv_query("SELECT region, min(cents) AS m, count(*) AS n FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="count\\(\\*\\)"):
        parse_mv_query("SELECT region, sum(cents) AS s FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="every GROUP BY"):
        parse_mv_query("SELECT sum(cents) AS s, count(*) AS n FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="unsupported select item"):
        parse_mv_query("SELECT region, cents, count(*) AS n FROM sales GROUP BY region")
    with pytest.raises(ValueError, match="is not a materialized view"):
        from ducklake_kafka_connect_spark.lake.matview import (
            refresh_materialized_view,
        )

        refresh_materialized_view(c, "sales")


def test_refresh_after_base_compaction(spark, cat):
    """OPTIMIZE on the base between refreshes is a content-identical
    rewrite: the change feed across it must fold to zero delta."""
    from ducklake_kafka_connect_spark.lake.maintenance import compact

    c, w = cat
    c.sql(MV_DDL)
    w.write(
        spark.createDataFrame([(9, "r1", 123)], "id int, region string, cents long")
    )
    compact(c.table("sales"))
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c) == _expected(c)


def test_refresh_over_mor_base(spark, cat):
    """A merge-on-read base: the change feed's MOR span path feeds the
    same signed fold."""
    c, _ = cat
    c.sql(MV_DDL)
    mor = LakeWriter(c.table("sales"), pk=["id"], merge_mode="merge-on-read")
    mor.merge(
        spark.createDataFrame(
            [(5, "r0", 1000), (800, "r8", 7)], "id int, region string, cents long"
        )
    )
    mor.delete_where("id = 10")
    c.sql("REFRESH MATERIALIZED VIEW mv")
    assert _content(c) == _expected(c)
