"""SQL views (LakeCatalog.create_view/_expand_views): macro-CTE
expansion, nesting, guards, rollback, interaction with WITH."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "lake"))
    w = LakeWriter(c.table("sales"), pk=["id"])
    w.write(
        spark.createDataFrame(
            [(i, f"r{i % 4}", (i % 10) * 100) for i in range(100)],
            "id int, region string, cents long",
        )
    )
    return c, w


def test_view_and_view_on_view(spark, cat):
    c, _ = cat
    c.sql("CREATE VIEW big AS SELECT * FROM sales WHERE cents >= 500")
    c.sql("CREATE VIEW big_n AS SELECT region, count(*) AS n FROM big GROUP BY region")
    got = {
        r["region"]: r["n"] for r in c.sql("SELECT * FROM big_n").collect()
    }
    exp = {
        r["region"]: r["count"]
        for r in c.table("sales").read().filter("cents >= 500")
        .groupBy("region").count().collect()
    }
    assert got == exp
    assert c.list_views() == ["big", "big_n"]
    rows = {r["view"]: r["query"] for r in c.sql("SHOW VIEWS").collect()}
    assert "cents >= 500" in rows["big"]


def test_user_with_merges_into_expansion(spark, cat):
    c, _ = cat
    c.sql("CREATE VIEW big AS SELECT * FROM sales WHERE cents >= 500")
    r = c.sql(
        "WITH top AS (SELECT region, count(*) AS n FROM big GROUP BY region) "
        "SELECT count(*) AS c FROM top WHERE n > 10"
    ).collect()
    assert r[0]["c"] == 2


def test_guards_and_rollback(spark, cat):
    c, _ = cat
    with pytest.raises(ValueError, match="table with that name"):
        c.sql("CREATE VIEW sales AS SELECT 1")
    with pytest.raises(Exception):
        c.sql("CREATE VIEW bad AS SELECT * FROM no_such_table")
    assert "bad" not in c.list_views()
    c.sql("CREATE VIEW a AS SELECT * FROM sales")
    c.sql("CREATE VIEW b AS SELECT id FROM a")
    with pytest.raises(ValueError, match="cycle"):
        c.sql("CREATE OR REPLACE VIEW a AS SELECT id FROM b")
    # failed OR REPLACE must restore the prior definition, not drop it
    assert "sales" in c.view_query("a")
    assert c.sql("SELECT count(*) AS n FROM b").collect()[0]["n"] == 100
    with pytest.raises(ValueError, match="already exists"):
        c.sql("CREATE VIEW a AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="does not exist"):
        c.sql("DROP VIEW nope")
    c.sql("DROP VIEW IF EXISTS nope")


def test_view_shadows_nothing_after_drop(spark, cat):
    c, _ = cat
    c.sql("CREATE VIEW v AS SELECT id FROM sales WHERE id < 5")
    assert c.sql("SELECT count(*) AS n FROM v").collect()[0]["n"] == 5
    c.sql("DROP VIEW v")
    assert c.list_views() == []


def test_pruning_reaches_through_views(spark, cat):
    """A point predicate on a view must prune base files like a direct
    table query — the CTE expansion keeps the WHERE visible to the
    conjunct extractor."""
    c, w = cat
    # several key-disjoint FILES (appends, not merges — a merge on a
    # small table rewrites everything into one file) so pruning has
    # something to skip
    for lo in (200, 300, 400):
        w.append(
            spark.createDataFrame(
                [(lo + i, "rx", 1) for i in range(50)],
                "id int, region string, cents long",
            )
        )
    c.sql("CREATE VIEW v AS SELECT * FROM sales")
    t = c.table("sales")
    kept, pruned = t.prune_files("id = 420")
    assert pruned > 0  # the manifest CAN prune this predicate
    got = c.sql("SELECT id, cents FROM v WHERE id = 420").collect()
    assert len(got) == 1 and got[0]["id"] == 420
