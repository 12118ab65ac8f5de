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


def test_dml_insert_from_view(spark, cat):
    """r13 fix: DML dispatches BEFORE view expansion — INSERT INTO dst
    SELECT * FROM v must not be rewritten into `WITH ... INSERT`."""
    c, _ = cat
    c.sql("CREATE VIEW big AS SELECT * FROM sales WHERE cents >= 500")
    c.sql("CREATE TABLE dst (id INT, region STRING, cents BIGINT)")
    c.sql("INSERT INTO dst SELECT id, region, cents FROM big")
    exp = c.table("sales").read().filter("cents >= 500").count()
    assert c.table("dst").read().count() == exp
    # and again via INSERT OVERWRITE
    c.sql("INSERT OVERWRITE dst SELECT id, region, cents FROM big WHERE id < 50")
    exp2 = c.table("sales").read().filter("cents >= 500 AND id < 50").count()
    assert c.table("dst").read().count() == exp2


def test_merge_using_view(spark, cat):
    """MERGE INTO t USING <view> — both as a bare name and inside the
    source subquery."""
    c, _ = cat
    c.sql("CREATE VIEW fresh AS SELECT id, region, cents + 1 AS cents FROM sales WHERE id < 3")
    c.sql(
        "MERGE INTO sales t USING fresh s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = {
        r["id"]: r["cents"]
        for r in c.table("sales").read().filter("id < 3").collect()
    }
    assert got == {0: 1, 1: 101, 2: 201}
    c.sql(
        "MERGE INTO sales t USING (SELECT id, region, cents FROM fresh) s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET *"
    )
    got = {
        r["id"]: r["cents"]
        for r in c.table("sales").read().filter("id < 3").collect()
    }
    assert got == {0: 2, 1: 102, 2: 202}


def test_view_refs_case_insensitive(spark, cat):
    c, _ = cat
    c.sql("CREATE VIEW big AS SELECT * FROM sales WHERE cents >= 500")
    n1 = c.sql("SELECT count(*) AS n FROM BIG").collect()[0]["n"]
    n2 = c.sql("SELECT count(*) AS n FROM Big").collect()[0]["n"]
    assert n1 == n2 == c.table("sales").read().filter("cents >= 500").count()


def test_view_name_in_string_literal_not_expanded(spark, cat):
    """A view name appearing only inside a '...' literal must not drag
    the view in (observable when the view's body no longer binds)."""
    c, w = cat
    w2 = type(w)(c.table("other"), pk=["id"])
    w2.write(spark.createDataFrame([(1, "x", 5)], "id int, region string, cents long"))
    c.sql("CREATE VIEW vv AS SELECT * FROM other")
    c.sql("DROP TABLE other")  # vv's body is now unresolvable
    # referencing vv raises ...
    with pytest.raises(Exception):
        c.sql("SELECT * FROM vv").collect()
    # ... but a literal mention must not
    r = c.sql("SELECT 'vv' AS tag, count(*) AS n FROM sales").collect()
    assert r[0]["tag"] == "vv" and r[0]["n"] == 100


def test_create_table_refuses_view_collision(spark, cat):
    c, _ = cat
    c.sql("CREATE VIEW taken AS SELECT * FROM sales")
    with pytest.raises(ValueError, match="view with that name"):
        c.sql("CREATE TABLE taken (id INT)")
    with pytest.raises(ValueError, match="view with that name"):
        c.sql("CREATE TABLE Taken AS SELECT id FROM sales")  # case-blind


def test_alter_view_and_show_create_view(spark, cat):
    c, _ = cat
    c.sql("CREATE VIEW v AS SELECT id FROM sales WHERE id < 5")
    c.sql("ALTER VIEW v AS SELECT id FROM sales WHERE id < 7")
    assert c.sql("SELECT count(*) AS n FROM v").collect()[0]["n"] == 7
    stmt = c.sql("SHOW CREATE VIEW v").collect()[0]["create_stmt"]
    assert stmt.startswith("CREATE VIEW") and "id < 7" in stmt
    with pytest.raises(ValueError, match="does not exist"):
        c.sql("ALTER VIEW nope AS SELECT 1 AS one")


def test_time_travel_through_view_is_named(spark, cat):
    c, _ = cat
    c.sql("CREATE VIEW v AS SELECT * FROM sales")
    with pytest.raises(ValueError, match="time travel through view"):
        c.sql("SELECT count(*) AS n FROM v VERSION AS OF 0")
    # travel on the BASE table inside a query that also uses the view is fine
    n = c.sql(
        "SELECT count(*) AS n FROM sales VERSION AS OF 1"
    ).collect()[0]["n"]
    assert n == 100


def test_view_over_matview(spark, cat):
    """Views referencing materialized views: the MV is a table, so a
    view body can aggregate it further."""
    c, w = cat
    c.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT region, sum(cents) AS total, "
        "count(*) AS n FROM sales GROUP BY region"
    )
    c.sql("CREATE VIEW busy AS SELECT region, total FROM mv WHERE n >= 25")
    got = {r["region"]: r["total"] for r in c.sql("SELECT * FROM busy").collect()}
    exp = {
        r["region"]: r["total"]
        for r in c.table("sales").read().groupBy("region")
        .agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
        .filter("n >= 25").collect()
    }
    assert got == exp
    stmt = c.sql("SHOW CREATE TABLE mv").collect()[0]["create_statement"]
    assert "MATERIALIZED VIEW" in stmt and "no join views" in stmt


def test_view_collision_case_insensitive(spark, cat):
    """r14 (ADVICE): view names resolve case-insensitively, so the
    view-vs-view collision check, ALTER VIEW lookup, and DROP VIEW are
    case-insensitive too — `Docs` beside `docs` must refuse, and OR
    REPLACE / ALTER on a case variant targets the canonical file."""
    c, _ = cat
    c.sql("CREATE VIEW docs AS SELECT * FROM sales WHERE cents >= 500")
    with pytest.raises(ValueError, match="already exists"):
        c.sql("CREATE VIEW Docs AS SELECT * FROM sales")
    # OR REPLACE through a case variant rewrites the canonical view —
    # no second file forks on disk
    c.sql("CREATE OR REPLACE VIEW DOCS AS SELECT * FROM sales WHERE cents >= 900")
    assert c.list_views() == ["docs"]
    assert "cents >= 900" in c.view_query("Docs")
    n = c.sql("SELECT count(*) AS n FROM docs").collect()[0]["n"]
    exp = c.table("sales").read().filter("cents >= 900").count()
    assert n == exp
    # ALTER VIEW through a case variant
    c.sql("ALTER VIEW Docs AS SELECT id FROM sales WHERE cents >= 800")
    assert c.list_views() == ["docs"]
    assert "cents >= 800" in c.view_query("docs")
    # DROP through a case variant
    c.sql("DROP VIEW DoCs")
    assert c.list_views() == []
    with pytest.raises(ValueError, match="does not exist"):
        c.sql("ALTER VIEW docs AS SELECT 1")
