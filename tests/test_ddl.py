"""SQL DDL surface over the lake API (LakeCatalog.ddl / sql routing) —
the engine-side equivalent of managing ducklake tables with DuckDB DDL.
"""

import os

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter


@pytest.fixture
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path))


def _fill(cat, name, n=20):
    w = LakeWriter(cat.table(name), auto_create=False)
    w.write(
        cat.spark.range(n).select(
            F.col("id").alias("pk"), (F.col("id") * 2).alias("v")
        )
    )


class TestDdl:
    def test_create_insert_query_roundtrip(self, cat):
        out = cat.sql(
            "CREATE TABLE t1 (pk BIGINT, v BIGINT, PRIMARY KEY (pk))"
        ).collect()
        assert out[0]["op"] == "CREATE TABLE"
        assert cat.table("t1").manifest().pk == ["pk"]
        _fill(cat, "t1")
        assert cat.sql("SELECT count(*) AS n FROM t1").collect()[0]["n"] == 20

    def test_create_partitioned_and_if_not_exists(self, cat):
        cat.sql(
            "CREATE TABLE t2 (pk BIGINT, grp STRING) PARTITIONED BY (grp)"
        )
        assert cat.table("t2").manifest().partition_spec == ["grp"]
        # idempotent with IF NOT EXISTS; error without
        assert (
            cat.sql("CREATE TABLE IF NOT EXISTS t2 (pk BIGINT, grp STRING)")
            .collect()[0]["detail"]
            == "exists"
        )
        with pytest.raises(ValueError, match="already exists"):
            cat.sql("CREATE TABLE t2 (pk BIGINT, grp STRING)")

    def test_alter_rename_add_drop_column(self, cat):
        cat.sql("CREATE TABLE t3 (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        _fill(cat, "t3")
        cat.sql("ALTER TABLE t3 RENAME COLUMN v TO score")
        assert (
            cat.sql("SELECT sum(score) AS s FROM t3").collect()[0]["s"]
            == sum(i * 2 for i in range(20))
        )
        cat.sql("ALTER TABLE t3 ADD COLUMN note STRING")
        got = cat.table("t3").read()
        assert "note" in got.columns
        assert got.filter("note IS NULL").count() == 20  # null backfill
        cat.sql("ALTER TABLE t3 DROP COLUMN note")
        assert "note" not in cat.table("t3").read().columns

    def test_drop_table(self, cat):
        cat.sql("CREATE TABLE t4 (pk BIGINT)")
        cat.sql("DROP TABLE t4")
        assert not cat.table_exists("t4")
        assert (
            cat.sql("DROP TABLE IF EXISTS t4").collect()[0]["detail"]
            == "absent"
        )
        with pytest.raises(ValueError, match="does not exist"):
            cat.sql("DROP TABLE t4")

    def test_vacuum_and_optimize(self, cat):
        cat.sql("CREATE TABLE t5 (pk BIGINT, v BIGINT)")
        w = LakeWriter(cat.table("t5"), auto_create=False)
        for k in range(4):  # pile up files and versions
            w.write(
                cat.spark.range(k * 10, k * 10 + 10).select(
                    F.col("id").alias("pk"), F.col("id").alias("v")
                )
            )
        r = cat.sql("OPTIMIZE t5").collect()[0]
        assert r["op"] == "OPTIMIZE"
        r = cat.sql("VACUUM t5 RETAIN 1 VERSIONS").collect()[0]
        assert r["op"] == "VACUUM"
        assert cat.table("t5").read().count() == 40

    def test_namespace_prefix_and_trailing_semicolon(self, cat):
        cat.sql("CREATE TABLE lake.main.t6 (pk BIGINT);")
        assert cat.table_exists("t6")

    def test_truncate_is_metadata_only_and_time_travels(self, cat):
        cat.sql("CREATE TABLE t8 (pk BIGINT, v BIGINT)")
        _fill(cat, "t8")
        v_full = cat.table("t8").current_version()
        files = sorted(cat.table("t8").manifest().all_files())
        cat.sql("TRUNCATE TABLE t8")
        t = cat.table("t8")
        assert t.read().count() == 0
        assert t.read(version=v_full).count() == 20  # snapshot survives
        # bytes untouched until vacuum
        assert all(os.path.exists(os.path.join(t.dir, f)) for f in files)
        # table remains writable with the same schema/pk
        _fill(cat, "t8")
        assert t.read().count() == 20

    def test_unsupported_statement_raises(self, cat):
        with pytest.raises(ValueError, match="unsupported DDL"):
            cat.ddl("MSCK REPAIR TABLE nope")

    def test_metadata_only_alter_never_rewrites(self, cat):
        cat.sql("CREATE TABLE t7 (pk BIGINT, v BIGINT)")
        _fill(cat, "t7")
        files = sorted(cat.table("t7").manifest().all_files())
        cat.sql("ALTER TABLE t7 RENAME COLUMN v TO w")
        cat.sql("ALTER TABLE t7 ADD COLUMN extra BIGINT")
        assert sorted(cat.table("t7").manifest().all_files()) == files


class TestDml:
    def test_insert_select_delete_update_roundtrip(self, cat):
        cat.sql("CREATE TABLE src (pk BIGINT, v BIGINT)")
        _fill(cat, "src")
        cat.sql("CREATE TABLE dst (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        cat.sql("INSERT INTO dst SELECT pk, v FROM src WHERE pk < 10")
        assert cat.sql("SELECT count(*) AS n FROM dst").collect()[0]["n"] == 10
        # INSERT on a PK table = connector UPSERT semantics
        cat.sql("INSERT INTO dst SELECT pk, v + 1000 AS v FROM src WHERE pk < 3")
        got = {r["pk"]: r["v"] for r in cat.table("dst").read().collect()}
        assert got[1] == 1002 and got[5] == 10 and len(got) == 10
        cat.sql("DELETE FROM dst WHERE pk >= 8")
        assert cat.table("dst").read().count() == 8
        cat.sql("UPDATE dst SET v = v * 10 WHERE pk = 0")
        got = {r["pk"]: r["v"] for r in cat.table("dst").read().collect()}
        assert got[0] == 10000  # (0*2 + 1000) * 10
        assert got[5] == 10  # untouched

    def test_update_with_function_commas(self, cat):
        cat.sql("CREATE TABLE t9 (pk BIGINT, v BIGINT, w STRING)")
        w = LakeWriter(cat.table("t9"), auto_create=False)
        w.write(
            cat.spark.range(5).select(
                F.col("id").alias("pk"),
                F.col("id").alias("v"),
                F.lit("x").alias("w"),
            )
        )
        cat.sql(
            "UPDATE t9 SET v = greatest(v, 3), w = concat(w, '!') WHERE pk >= 2"
        )
        got = {r["pk"]: (r["v"], r["w"]) for r in cat.table("t9").read().collect()}
        assert got[4] == (4, "x!") and got[2] == (3, "x!") and got[0] == (0, "x")

    def test_plain_select_not_routed(self, cat):
        cat.sql("CREATE TABLE t10 (pk BIGINT)")
        # a SELECT whose text merely CONTAINS dml-ish words is a query
        out = cat.sql(
            "SELECT count(*) AS n FROM t10 WHERE 'INSERT INTO' != 'DELETE FROM'"
        ).collect()
        assert out[0]["n"] == 0

    def test_unsupported_dml_raises(self, cat):
        with pytest.raises(ValueError, match="unsupported DML"):
            cat.dml("MERGE INTO t USING s ON 1=1")
