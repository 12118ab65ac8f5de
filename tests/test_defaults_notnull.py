"""Column DEFAULT values and NOT NULL constraints.

DuckDB-dialect column options on CREATE TABLE / ALTER COLUMN, stored as
``default.<col>`` / ``notnull.<col>`` table properties. Defaults apply
where SQL applies them — a write that OMITS the column; an explicit
NULL in a present column stays NULL (and violates NOT NULL). ADD
COLUMN ... DEFAULT follows Delta semantics (future writes only, no
backfill) — the DuckDB divergence is named in the DDL docstring.
"""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.writer import ConstraintViolation


@pytest.fixture
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path))


class TestDefaults:
    def test_create_parse_and_fill_on_insert(self, cat, spark):
        cat.sql(
            "CREATE TABLE t (pk BIGINT, status STRING DEFAULT 'new', "
            "score BIGINT DEFAULT 7 NOT NULL, PRIMARY KEY (pk))"
        )
        props = cat.table("t").properties()
        assert props["default.status"] == "'new'"
        assert props["default.score"] == "7"
        assert props["notnull.score"] == "true"
        # INSERT with an explicit column list omitting defaulted columns
        cat.sql("INSERT INTO t (pk) VALUES (1), (2)")
        rows = {
            r["pk"]: (r["status"], r["score"])
            for r in cat.sql("SELECT * FROM t").collect()
        }
        assert rows == {1: ("new", 7), 2: ("new", 7)}

    def test_writer_fill_and_explicit_null_stays(self, cat, spark):
        cat.sql(
            "CREATE TABLE t2 (pk BIGINT, grp STRING DEFAULT 'g0', "
            "v BIGINT, PRIMARY KEY (pk))"
        )
        # batch omits grp entirely -> default fills
        LakeWriter(cat.table("t2"), auto_create=False).write(
            spark.range(3).select(
                F.col("id").alias("pk"), (F.col("id") * 2).alias("v")
            )
        )
        got = {r["pk"]: r["grp"] for r in cat.table("t2").read().collect()}
        assert got == {0: "g0", 1: "g0", 2: "g0"}
        # batch INCLUDES grp with NULLs -> explicit NULL stays NULL
        LakeWriter(cat.table("t2"), auto_create=False).write(
            spark.range(3, 5).select(
                F.col("id").alias("pk"),
                F.lit(None).cast("string").alias("grp"),
                F.col("id").alias("v"),
            )
        )
        got = {r["pk"]: r["grp"] for r in cat.table("t2").read().collect()}
        assert got[3] is None and got[4] is None and got[0] == "g0"

    def test_default_expression_not_just_literal(self, cat, spark):
        cat.sql(
            "CREATE TABLE t3 (pk BIGINT, tag STRING DEFAULT upper('ab' || 'c'))"
        )
        cat.sql("INSERT INTO t3 (pk) VALUES (1)")
        (row,) = cat.sql("SELECT tag FROM t3").collect()
        assert row["tag"] == "ABC"

    def test_alter_set_drop_default(self, cat, spark):
        cat.sql("CREATE TABLE t4 (pk BIGINT, v BIGINT)")
        cat.sql("ALTER TABLE t4 ALTER COLUMN v SET DEFAULT 42")
        cat.sql("INSERT INTO t4 (pk) VALUES (1)")
        cat.sql("ALTER TABLE t4 ALTER COLUMN v DROP DEFAULT")
        cat.sql("INSERT INTO t4 (pk) VALUES (2)")
        rows = {r["pk"]: r["v"] for r in cat.sql("SELECT * FROM t4").collect()}
        assert rows == {1: 42, 2: None}
        with pytest.raises(ValueError, match="no column"):
            cat.sql("ALTER TABLE t4 ALTER COLUMN ghost SET DEFAULT 1")

    def test_add_column_default_future_writes_only(self, cat, spark):
        cat.sql("CREATE TABLE t5 (pk BIGINT, PRIMARY KEY (pk))")
        cat.sql("INSERT INTO t5 (pk) VALUES (1)")
        cat.sql("ALTER TABLE t5 ADD COLUMN note STRING DEFAULT 'later'")
        cat.sql("INSERT INTO t5 (pk) VALUES (2)")
        rows = {r["pk"]: r["note"] for r in cat.sql("SELECT * FROM t5").collect()}
        # Delta semantics: no backfill for pre-existing rows
        assert rows == {1: None, 2: "later"}

    def test_show_create_and_export_round_trip(self, cat, spark, tmp_path):
        cat.sql(
            "CREATE TABLE t6 (pk BIGINT, status STRING DEFAULT 'new' NOT NULL)"
        )
        (row,) = cat.sql("SHOW CREATE TABLE t6").collect()
        stmt = row["create_statement"]
        assert "DEFAULT 'new'" in stmt and "NOT NULL" in stmt
        cat.sql("INSERT INTO t6 (pk) VALUES (1)")
        out = str(tmp_path / "dump")
        cat.sql(f"EXPORT DATABASE '{out}'")
        dst = LakeCatalog(spark, str(tmp_path / "dst"))
        dst.sql(f"IMPORT DATABASE '{out}'")
        assert dst.table("t6").properties()["default.status"] == "'new'"
        dst.sql("INSERT INTO t6 (pk) VALUES (2)")
        rows = {r["pk"]: r["status"] for r in dst.sql("SELECT * FROM t6").collect()}
        assert rows == {1: "new", 2: "new"}

    def test_rename_and_drop_migrate_props(self, cat, spark):
        cat.sql("CREATE TABLE t7 (pk BIGINT, v BIGINT DEFAULT 5 NOT NULL)")
        cat.sql("ALTER TABLE t7 RENAME COLUMN v TO score")
        props = cat.table("t7").properties()
        assert props["default.score"] == "5" and "default.v" not in props
        assert props["notnull.score"] == "true"
        cat.sql("ALTER TABLE t7 DROP COLUMN score")
        props = cat.table("t7").properties()
        assert "default.score" not in props and "notnull.score" not in props

    def test_literal_containing_keywords_not_mangled(self, cat, spark):
        cat.sql(
            "CREATE TABLE t8 (pk BIGINT, a STRING DEFAULT 'NOT NULL', "
            "b STRING DEFAULT 'x DEFAULT y')"
        )
        cat.sql("INSERT INTO t8 (pk) VALUES (1)")
        (row,) = cat.sql("SELECT a, b FROM t8").collect()
        assert row["a"] == "NOT NULL" and row["b"] == "x DEFAULT y"


class TestNotNull:
    def test_null_rows_rejected(self, cat, spark):
        cat.sql("CREATE TABLE n1 (pk BIGINT, v BIGINT NOT NULL)")
        w = LakeWriter(cat.table("n1"), auto_create=False)
        with pytest.raises(ConstraintViolation, match="notnull_v"):
            w.write(
                spark.range(3).select(
                    F.col("id").alias("pk"),
                    F.when(F.col("id") < 2, F.col("id")).alias("v"),
                )
            )
        # all-non-null batch lands
        w.write(
            spark.range(3).select(
                F.col("id").alias("pk"), F.col("id").alias("v")
            )
        )
        assert cat.table("n1").read().count() == 3

    def test_missing_column_without_default_refused(self, cat, spark):
        cat.sql("CREATE TABLE n2 (pk BIGINT, v BIGINT NOT NULL)")
        with pytest.raises(ConstraintViolation, match="notnull_v"):
            LakeWriter(cat.table("n2"), auto_create=False).write(
                spark.range(2).select(F.col("id").alias("pk"))
            )
        # with a default, the omission is fine
        cat.sql("ALTER TABLE n2 ALTER COLUMN v SET DEFAULT 9")
        LakeWriter(cat.table("n2"), auto_create=False).write(
            spark.range(2).select(F.col("id").alias("pk"))
        )
        assert {r["v"] for r in cat.table("n2").read().collect()} == {9}

    def test_set_not_null_validates_existing(self, cat, spark):
        cat.sql("CREATE TABLE n3 (pk BIGINT, v BIGINT)")
        cat.sql("INSERT INTO n3 (pk) VALUES (1)")  # v lands NULL
        with pytest.raises(ValueError, match="hold NULL"):
            cat.sql("ALTER TABLE n3 ALTER COLUMN v SET NOT NULL")
        cat.sql("UPDATE n3 SET v = 0 WHERE v IS NULL")
        cat.sql("ALTER TABLE n3 ALTER COLUMN v SET NOT NULL")
        with pytest.raises(ConstraintViolation):
            cat.sql("INSERT INTO n3 (pk) VALUES (2)")
        cat.sql("ALTER TABLE n3 ALTER COLUMN v DROP NOT NULL")
        cat.sql("INSERT INTO n3 (pk) VALUES (2)")
        assert cat.table("n3").read().count() == 2

    def test_add_column_not_null_refused(self, cat, spark):
        cat.sql("CREATE TABLE n4 (pk BIGINT)")
        cat.sql("INSERT INTO n4 (pk) VALUES (1)")
        with pytest.raises(ValueError, match="NOT NULL is not supported"):
            cat.sql("ALTER TABLE n4 ADD COLUMN v BIGINT NOT NULL")

    def test_describe_reflects_not_null(self, cat, spark):
        cat.sql("CREATE TABLE n5 (pk BIGINT, v BIGINT NOT NULL)")
        rows = {
            r["column_name"]: r["null"]
            for r in cat.sql("DESCRIBE n5").collect()
        }
        assert rows["v"] == "NO" and rows["pk"] == "YES"


class TestInlineCheck:
    """Inline CHECK constraints in CREATE TABLE — column-level suffix
    and table-level [CONSTRAINT name] CHECK items — stored in the same
    constraint.* namespace ALTER TABLE ADD CONSTRAINT uses, so every
    writer (and the Arrow sink's compiled subset) enforces them."""

    def test_column_and_table_level(self, cat, spark):
        cat.sql(
            "CREATE TABLE c1 (pk BIGINT, v BIGINT CHECK (v >= 0), "
            "w BIGINT, CONSTRAINT w_cap CHECK (w < 100), "
            "CHECK (pk IS NOT NULL))"
        )
        props = cat.table("c1").properties()
        assert props["constraint.v_check"] == "v >= 0"
        assert props["constraint.w_cap"] == "w < 100"
        assert props["constraint.check_1"] == "pk IS NOT NULL"
        w = LakeWriter(cat.table("c1"), auto_create=False)
        with pytest.raises(ConstraintViolation, match="v_check"):
            w.write(spark.createDataFrame([(1, -5, 3)], "pk long, v long, w long"))
        with pytest.raises(ConstraintViolation, match="w_cap"):
            w.write(spark.createDataFrame([(1, 5, 300)], "pk long, v long, w long"))
        w.write(spark.createDataFrame([(1, 5, 30)], "pk long, v long, w long"))
        assert cat.table("c1").read().count() == 1

    def test_check_composes_with_default_and_notnull(self, cat, spark):
        cat.sql(
            "CREATE TABLE c2 (pk BIGINT, "
            "v BIGINT DEFAULT 5 NOT NULL CHECK (v > 0))"
        )
        props = cat.table("c2").properties()
        assert props["default.v"] == "5"
        assert props["notnull.v"] == "true"
        assert props["constraint.v_check"] == "v > 0"
        cat.sql("INSERT INTO c2 (pk) VALUES (1)")  # default 5 passes CHECK
        (row,) = cat.sql("SELECT v FROM c2").collect()
        assert row["v"] == 5

    def test_bad_predicate_refused_at_create(self, cat):
        with pytest.raises(ValueError, match="invalid CHECK"):
            cat.sql("CREATE TABLE c3 (pk BIGINT, CHECK (ghost > 0))")
        assert not cat.table("c3").exists()

    def test_show_create_round_trips_checks(self, cat, spark, tmp_path):
        cat.sql(
            "CREATE TABLE c4 (pk BIGINT, v BIGINT CHECK (v >= 0))"
        )
        (row,) = cat.sql("SHOW CREATE TABLE c4").collect()
        assert "CHECK (v >= 0)" in row["create_statement"]
        cat.sql("INSERT INTO c4 VALUES (1, 2)")
        out = str(tmp_path / "dump")
        cat.sql(f"EXPORT DATABASE '{out}'")
        dst = LakeCatalog(spark, str(tmp_path / "dst"))
        dst.sql(f"IMPORT DATABASE '{out}'")
        assert dst.table("c4").properties()["constraint.v_check"] == "v >= 0"
        with pytest.raises(ConstraintViolation):
            dst.sql("INSERT INTO c4 VALUES (2, -1)")


def test_tombstone_delete_batch_skips_constraints(cat, spark):
    # a MOR delete batch carrying only (pk, flag) must not be judged by
    # NOT NULL / CHECK — deletes have no insertable values
    cat.sql(
        "CREATE TABLE td (pk BIGINT, v BIGINT NOT NULL CHECK (v >= 0), "
        "PRIMARY KEY (pk))"
    )
    w = LakeWriter(cat.table("td"), auto_create=False)
    w.write(
        spark.createDataFrame([(1, 5), (2, 7)], "pk long, v long")
    )
    w2 = LakeWriter(cat.table("td"), pk=["pk"], auto_create=False)
    w2.merge(
        spark.createDataFrame([(1, True)], "pk long, _deleted boolean"),
        tombstone_col="_deleted",
    )
    assert {r["pk"] for r in cat.table("td").read().collect()} == {2}
