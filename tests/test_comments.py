"""COMMENT ON TABLE / COLUMN / VIEW (DuckDB's comment DDL) and the
DuckLake metadata-function TVFs ``table_insertions`` /
``table_deletions`` (``ducklake_table_insertions/_deletions``).

Table and column comments are stored as versioned tblproperties
(`comment` / `comment.<col>`), so they time-travel, clone, replicate
and roll back with the table; view comments live in the view's
unversioned catalog file and survive ALTER VIEW redefinition.
"""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter


@pytest.fixture
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path))


def _fill(cat, name, n=5):
    w = LakeWriter(cat.table(name), auto_create=False)
    w.write(
        cat.spark.range(n).select(
            F.col("id").alias("pk"), (F.col("id") * 2).alias("v")
        )
    )


@pytest.fixture
def t(cat):
    cat.sql("CREATE TABLE t (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
    _fill(cat, "t")
    return cat


class TestTableComments:
    def test_set_show_clear(self, t):
        out = t.sql("COMMENT ON TABLE t IS 'fact table'").collect()[0]
        assert out["op"] == "COMMENT ON" and out["detail"].startswith("TABLE")
        assert t.table("t").properties()["comment"] == "fact table"
        # DESCRIBE DETAIL surfaces it through the properties JSON
        det = t.sql("DESCRIBE DETAIL t").collect()[0]
        assert "fact table" in det["properties"]
        t.sql("COMMENT ON TABLE t IS NULL")
        assert "comment" not in t.table("t").properties()

    def test_comment_is_versioned(self, t):
        v0 = t.table("t").manifest().version
        t.sql("COMMENT ON TABLE t IS 'later'")
        assert "comment" not in t.table("t").manifest(v0).props.get(
            "tblproperties", {}
        )

    def test_escaped_quote_roundtrip(self, t):
        t.sql("COMMENT ON TABLE t IS 'it''s quoted'")
        assert t.table("t").properties()["comment"] == "it's quoted"

    def test_unknown_table_raises(self, cat):
        with pytest.raises(ValueError, match="does not exist"):
            cat.sql("COMMENT ON TABLE ghost IS 'x'")

    def test_rolls_back_with_transaction(self, t):
        t.sql("BEGIN")
        t.sql("COMMENT ON TABLE t IS 'inside txn'")
        t.sql("ROLLBACK")
        assert "comment" not in t.table("t").properties()


class TestColumnComments:
    def test_describe_surfaces_column_comment(self, t):
        t.sql("COMMENT ON COLUMN t.v IS 'doubled id'")
        rows = {r["column_name"]: r for r in t.sql("DESCRIBE t").collect()}
        assert rows["v"]["comment"] == "doubled id"
        assert rows["pk"]["comment"] is None
        t.sql("COMMENT ON COLUMN t.v IS NULL")
        rows = {r["column_name"]: r for r in t.sql("DESCRIBE t").collect()}
        assert rows["v"]["comment"] is None

    def test_unknown_column_raises(self, t):
        with pytest.raises(ValueError, match="no column"):
            t.sql("COMMENT ON COLUMN t.ghost IS 'x'")

    def test_comment_follows_rename(self, t):
        t.sql("COMMENT ON COLUMN t.v IS 'keep me'")
        t.sql("ALTER TABLE t RENAME COLUMN v TO w")
        rows = {r["column_name"]: r for r in t.sql("DESCRIBE t").collect()}
        assert rows["w"]["comment"] == "keep me"
        assert "comment.v" not in t.table("t").properties()

    def test_comment_retired_on_drop(self, t):
        t.sql("COMMENT ON COLUMN t.v IS 'doomed'")
        t.sql("ALTER TABLE t DROP COLUMN v")
        assert "comment.v" not in t.table("t").properties()
        # re-adding the name must not resurrect the old comment
        t.sql("ALTER TABLE t ADD COLUMN v BIGINT")
        rows = {r["column_name"]: r for r in t.sql("DESCRIBE t").collect()}
        assert rows["v"]["comment"] is None


class TestViewComments:
    def test_set_clear_and_survives_alter(self, t):
        t.sql("CREATE VIEW pks AS SELECT pk FROM t")
        t.sql("COMMENT ON VIEW pks IS 'just pks'")
        import json
        import os

        doc = lambda: json.loads(  # noqa: E731
            t.fs.read_bytes(os.path.join(t._views_dir, "pks.json"))
        )
        assert doc()["comment"] == "just pks"
        # redefinition keeps the comment (it describes the view, not its body)
        t.sql("ALTER VIEW pks AS SELECT pk, v FROM t")
        assert doc()["comment"] == "just pks"
        assert "v" in doc()["query"]
        t.sql("COMMENT ON VIEW pks IS NULL")
        assert "comment" not in doc()

    def test_unknown_view_raises(self, t):
        with pytest.raises(ValueError, match="does not exist"):
            t.sql("COMMENT ON VIEW ghost IS 'x'")

    def test_refused_inside_transaction(self, t):
        t.sql("CREATE VIEW pks AS SELECT pk FROM t")
        t.sql("BEGIN")
        try:
            with pytest.raises(ValueError, match="unversioned"):
                t.sql("COMMENT ON VIEW pks IS 'x'")
        finally:
            t.sql("ROLLBACK")


class TestExplainNeverExecutes:
    """EXPLAIN over any statement with side effects must refuse, not
    execute — including the dispatches that don't start with a classic
    DML keyword (FLUSH INLINED DATA, EXPORT/IMPORT DATABASE, COMMENT)."""

    @pytest.mark.parametrize(
        "stmt",
        [
            "EXPLAIN FLUSH INLINED DATA t",
            "EXPLAIN COMMENT ON TABLE t IS 'x'",
            "EXPLAIN EXPORT DATABASE '/tmp/nope'",
            "EXPLAIN BEGIN",
        ],
    )
    def test_refuses(self, t, stmt):
        with pytest.raises(ValueError, match="SELECT queries only"):
            t.sql(stmt)
        # and nothing executed: no comment landed, no txn opened
        assert "comment" not in t.table("t").properties()
        assert t._txn.active is None


class TestInsertionsDeletionsTvf:
    def test_span_diff(self, t):
        v0 = t.table("t").manifest().version
        w = LakeWriter(t.table("t"), auto_create=False)
        # update pk=1, insert pk=100, delete pk=2
        w.write(
            t.spark.createDataFrame([(1, 99), (100, 0)], "pk bigint, v bigint")
        )
        t.sql("DELETE FROM t WHERE pk = 2")
        v2 = t.table("t").manifest().version
        ins = sorted(
            r["pk"]
            for r in t.sql(
                f"SELECT pk FROM table_insertions('t', {v0}, {v2})"
            ).collect()
        )
        # new row + the NEW image of the updated row
        assert ins == [1, 100]
        dels = {
            r["pk"]: r["v"]
            for r in t.sql(
                f"SELECT pk, v FROM table_deletions('t', {v0}, {v2})"
            ).collect()
        }
        # deleted row + the OLD image of the updated row
        assert set(dels) == {1, 2}
        assert dels[1] == 2  # pre-update value of pk=1 (v = pk*2)
        # neither TVF exposes _change_type — the direction IS the function
        cols = t.sql(f"SELECT * FROM table_insertions('t', {v0}, {v2})").columns
        assert "_change_type" not in cols

    def test_open_ended_span_and_aggregate(self, t):
        v0 = t.table("t").manifest().version
        w = LakeWriter(t.table("t"), auto_create=False)
        w.write(t.spark.createDataFrame([(50, 1)], "pk bigint, v bigint"))
        n = t.sql(
            f"SELECT count(*) AS n FROM table_insertions('t', {v0})"
        ).collect()[0]["n"]
        assert n == 1
        assert (
            t.sql(
                f"SELECT count(*) AS n FROM table_deletions('t', {v0})"
            ).collect()[0]["n"]
            == 0
        )

    def test_unknown_table_raises(self, cat):
        with pytest.raises(ValueError, match="unknown table"):
            cat.sql("SELECT * FROM table_insertions('ghost', 1)")


class TestCatalogIntrospection:
    """duckdb_tables() / duckdb_columns() / PRAGMA table_info — pure
    metadata TVFs (zero data scan) that surface COMMENT ON output the
    way DuckDB's catalog functions do."""

    @pytest.fixture
    def cat2(self, t):
        t.sql("CREATE TABLE other (x INT DEFAULT 7, y STRING)")
        t.sql("COMMENT ON TABLE t IS 'events'")
        t.sql("COMMENT ON COLUMN t.v IS 'doubled'")
        return t

    def test_duckdb_tables(self, cat2):
        rows = {
            r["table_name"]: r
            for r in cat2.sql("SELECT * FROM duckdb_tables()").collect()
        }
        assert set(rows) == {"t", "other"}
        assert rows["t"]["comment"] == "events"
        assert rows["t"]["has_primary_key"] is True
        assert rows["other"]["has_primary_key"] is False
        assert rows["other"]["column_count"] == 3  # x, y, _inserted_at

    def test_duckdb_columns_and_join(self, cat2):
        cols = {
            (r["table_name"], r["column_name"]): r
            for r in cat2.sql("SELECT * FROM duckdb_columns()").collect()
        }
        assert cols[("t", "v")]["comment"] == "doubled"
        assert cols[("t", "pk")]["data_type"] == "BIGINT"
        # the TVFs are real relations: joins work
        n = cat2.sql(
            "SELECT count(*) AS n FROM duckdb_columns() c "
            "JOIN duckdb_tables() tt ON c.table_name = tt.table_name "
            "WHERE tt.has_primary_key"
        ).collect()[0]["n"]
        assert n == 3  # pk, v, _inserted_at

    def test_pragma_table_info(self, cat2):
        rows = {r["name"]: r for r in cat2.sql("PRAGMA table_info('other')").collect()}
        assert rows["x"]["dflt_value"] == "7"
        assert rows["x"]["type"] == "INT"
        assert rows["x"]["pk"] is False
        with pytest.raises(ValueError, match="does not exist"):
            cat2.sql("PRAGMA table_info('ghost')")


class TestInformationSchema:
    def test_tables_lists_tables_and_views(self, t):
        t.sql("CREATE VIEW tv AS SELECT pk FROM t")
        rows = sorted(
            (r["table_name"], r["table_type"])
            for r in t.sql(
                "SELECT table_name, table_type FROM information_schema.tables"
            ).collect()
        )
        assert rows == [("t", "BASE TABLE"), ("tv", "VIEW")]

    def test_columns_shape(self, t):
        rows = [
            tuple(r)
            for r in t.sql(
                "SELECT column_name, ordinal_position, is_nullable "
                "FROM information_schema.columns WHERE table_name = 't' "
                "ORDER BY ordinal_position"
            ).collect()
        ]
        assert rows[0] == ("pk", 1, "YES")
        assert rows[-1][0] == "_inserted_at"


class TestNextvalDmlRefusal:
    def test_update_with_nextval_guided(self, t):
        t.sql("CREATE SEQUENCE sq")
        with pytest.raises(ValueError, match="INSERT ... VALUES"):
            t.sql("UPDATE t SET v = nextval('sq') WHERE pk = 1")

    def test_direct_dml_insert_values_works(self, t):
        t.sql("CREATE SEQUENCE sq2")
        t.dml("INSERT INTO t VALUES (nextval('sq2') + 500, 0)")
        # substitution happened at dml entry: 1 + 500
        assert (
            t.sql("SELECT count(*) AS n FROM t WHERE pk = 501").collect()[0]["n"]
            == 1
        )
