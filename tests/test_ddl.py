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
            cat.dml("UPSERT INTO t VALUES (1)")
        # MERGE is dispatched now, but a malformed one still fails loudly
        with pytest.raises(ValueError, match="WHEN clause"):
            cat.dml("MERGE INTO t USING s ON 1=1")


class TestQuotedIdentifiers:
    """Parity with the reference's identifier quoting
    (ingestor/SqlIdentifierUtil.java:32-39): names outside
    [A-Za-z_][A-Za-z0-9_]* travel double-quoted with "" escaping;
    the Spark-flavored backtick form is accepted too. Every dispatched
    DDL/DML op must reach tables/columns with hostile names."""

    def test_create_with_keyword_and_spaced_columns(self, cat):
        cat.sql(
            'CREATE TABLE "order items" (pk BIGINT, "select" BIGINT, '
            '"weird ""name""" STRING, PRIMARY KEY (pk))'
        )
        t = cat.table("order items")
        assert t.exists()
        assert t.manifest().schema.fieldNames() == [
            "pk", "select", 'weird "name"', "_inserted_at",
        ]
        assert t.manifest().pk == ["pk"]

    def test_full_dml_matrix_on_keyword_column(self, cat):
        cat.sql('CREATE TABLE "from" (pk BIGINT, "select" BIGINT, PRIMARY KEY (pk))')
        LakeWriter(cat.table("from"), pk=["pk"], auto_create=False).write(
            cat.spark.range(10).select(
                F.col("id").alias("pk"), (F.col("id") * 2).alias("select")
            )
        )
        # INSERT INTO quoted table (upsert routing via PK)
        cat.sql(
            'INSERT INTO "from" '
            "SELECT CAST(id + 5 AS BIGINT) AS pk, CAST(99 AS BIGINT) AS `select` "
            "FROM range(5)"
        )
        got = {r["pk"]: r["select"] for r in cat.table("from").read().collect()}
        assert got[6] == 99 and got[4] == 8
        # UPDATE SET on the quoted keyword column
        cat.sql('UPDATE "from" SET "select" = `select` + 1 WHERE pk < 2')
        got = {r["pk"]: r["select"] for r in cat.table("from").read().collect()}
        assert got[0] == 1 and got[1] == 3
        # DELETE FROM the quoted table
        cat.sql('DELETE FROM "from" WHERE pk >= 8')
        assert cat.table("from").read().count() == 8
        # ALTER ops on quoted identifiers (both quoting flavors)
        cat.sql('ALTER TABLE "from" ADD COLUMN "group by" STRING')
        assert "group by" in cat.table("from").manifest().schema.fieldNames()
        cat.sql('ALTER TABLE `from` RENAME COLUMN "select" TO "order"')
        assert "order" in cat.table("from").manifest().schema.fieldNames()
        cat.sql('ALTER TABLE "from" DROP COLUMN "group by"')
        assert "group by" not in cat.table("from").manifest().schema.fieldNames()
        cat.sql('TRUNCATE TABLE "from"')
        assert cat.table("from").read().count() == 0
        cat.sql('DROP TABLE "from"')
        assert not cat.table_exists("from")

    def test_partitioned_by_function_exprs_parse(self, cat):
        """ADVICE r9: PARTITIONED BY (year(ts)) used to backtrack the
        column-list capture into garbage — the partition clause is now
        peeled off rightmost-first."""
        cat.sql(
            "CREATE TABLE pq (a INT, ts TIMESTAMP) PARTITIONED BY (year(ts), month(ts))"
        )
        m = cat.table("pq").manifest()
        assert m.partition_spec == ["year(ts)", "month(ts)"]
        assert m.schema.fieldNames() == ["a", "ts", "_inserted_at"]

    def test_update_set_literals_with_commas_and_parens(self, cat):
        """ADVICE r9: the SET splitter must ignore commas/parens inside
        string literals."""
        cat.sql("CREATE TABLE lits (pk BIGINT, tag STRING, note STRING, PRIMARY KEY (pk))")
        LakeWriter(cat.table("lits"), pk=["pk"], auto_create=False).write(
            cat.spark.range(4).select(
                F.col("id").alias("pk"),
                F.lit("t").alias("tag"),
                F.lit("n").alias("note"),
            )
        )
        cat.sql("UPDATE lits SET tag = 'a,b', note = concat('(', note, ')') WHERE pk < 2")
        got = {r["pk"]: (r["tag"], r["note"]) for r in cat.table("lits").read().collect()}
        assert got[0] == ("a,b", "(n)") and got[3] == ("t", "n")
        cat.sql("UPDATE lits SET note = '(' WHERE pk = 3")
        got = {r["pk"]: r["note"] for r in cat.table("lits").read().collect()}
        assert got[3] == "(" and got[0] == "(n)"

    def test_vacuum_optimize_on_quoted_table(self, cat):
        cat.sql('CREATE TABLE "v t" (pk BIGINT, v BIGINT)')
        w = LakeWriter(cat.table("v t"), auto_create=False)
        for i in range(3):
            w.write(
                cat.spark.range(i * 10, (i + 1) * 10).select(
                    F.col("id").alias("pk"), F.col("id").alias("v")
                )
            )
        out = cat.sql('OPTIMIZE "v t"').collect()[0]
        assert out["op"] == "OPTIMIZE"
        out = cat.sql('VACUUM "v t" RETAIN 1 VERSIONS').collect()[0]
        assert out["op"] == "VACUUM"
        assert cat.table("v t").read().count() == 30


class TestShowDescribe:
    def test_show_tables_and_describe(self, cat):
        assert cat.sql("SHOW TABLES").collect() == []
        cat.sql("CREATE TABLE alpha (pk BIGINT, v STRING, PRIMARY KEY (pk))")
        cat.sql('CREATE TABLE "order by" (a INT)')
        names = [r["name"] for r in cat.sql("SHOW TABLES;").collect()]
        assert names == ["alpha", "order by"]
        rows = {r["column_name"]: r for r in cat.sql("DESCRIBE alpha").collect()}
        assert rows["pk"]["column_type"] == "BIGINT" and rows["pk"]["key"] == "PRI"
        assert rows["v"]["key"] == "" and rows["v"]["null"] == "YES"
        assert "_inserted_at" in rows
        # quoted hostile name + DESC shorthand
        cols = [r["column_name"] for r in cat.sql('DESC "order by"').collect()]
        assert cols == ["a", "_inserted_at"]

    def test_describe_missing_raises(self, cat):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="does not exist"):
            cat.sql("DESCRIBE ghost")


class TestSqlClone:
    def test_create_table_clone_shallow_and_deep(self, cat):
        cat.sql("CREATE TABLE src (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        _fill(cat, "src")
        v0 = cat.table("src").current_version()
        # mutate after the snapshot point
        LakeWriter(cat.table("src"), pk=["pk"], auto_create=False).write(
            cat.spark.range(20, 40).select(
                F.col("id").alias("pk"), (F.col("id") * 3).alias("v")
            )
        )
        out = cat.sql(f"CREATE TABLE snap SHALLOW CLONE src AT VERSION {v0}")
        assert out.collect()[0]["op"] == "CREATE TABLE CLONE"
        assert cat.table("snap").read().count() == 20  # pre-mutation snapshot
        assert cat.table("src").read().count() == 40
        cat.sql("CREATE TABLE snap_deep DEEP CLONE src")
        assert cat.table("snap_deep").read().count() == 40
        # deep clone owns its files: dropping src leaves it readable
        cat.sql("DROP TABLE src")
        assert cat.table("snap_deep").read().count() == 40

    def test_clone_if_not_exists_and_errors(self, cat):
        cat.sql("CREATE TABLE a (pk BIGINT)")
        cat.sql("CREATE TABLE b CLONE a")
        out = cat.sql("CREATE TABLE IF NOT EXISTS b CLONE a").collect()[0]
        assert out["detail"] == "exists"
        with pytest.raises(ValueError, match="already exists"):
            cat.sql("CREATE TABLE b CLONE a")
        with pytest.raises(ValueError, match="does not exist"):
            cat.sql("CREATE TABLE c CLONE ghost")


def test_cross_backend_deep_clone(spark, tmp_path):
    """posix table deep-cloned onto the CAS backend: the migration path
    (files copied, commit protocol switched, history restarts at v0)."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "nfs"), backend="posix")
    t = cat.table("t")
    LakeWriter(t, pk=["id"]).write(
        spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    )
    dest = t.clone(
        str(tmp_path / "bucket"), "t", deep=True, dest_backend="cas"
    )
    assert dest.fs.name == "cas"
    assert dest.read().count() == 100
    # writes on the clone commit through the CAS protocol
    LakeWriter(dest, pk=["id"]).write(
        spark.range(100, 150).select(F.col("id"), F.lit(0).alias("v"))
    )
    assert dest.read().count() == 150
    assert dest.current_version() == 1
    # source untouched, still posix
    assert t.read().count() == 100 and t.fs.name == "posix"


class TestIdentQuoting:
    def test_quote_matches_reference_discipline(self):
        from ducklake_kafka_connect_spark.lake.table import quote_ident, unquote_ident

        assert quote_ident("plain_name") == "plain_name"
        assert quote_ident("_lead") == "_lead"
        assert quote_ident("0start") == '"0start"'
        assert quote_ident("has space") == '"has space"'
        assert quote_ident('has"quote') == '"has""quote"'
        with pytest.raises(ValueError):
            quote_ident(None)
        for name in ("x", "0start", "has space", 'a"b"c', 'tricky""'):
            assert unquote_ident(quote_ident(name)) == name

    def test_hypothesis_roundtrip(self):
        from hypothesis import given, settings, strategies as st

        from ducklake_kafka_connect_spark.lake.table import quote_ident, unquote_ident

        @settings(max_examples=300, deadline=None)
        @given(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), min_codepoint=32
                ),
                min_size=1,
                max_size=40,
            )
        )
        def roundtrip(name):
            assert unquote_ident(quote_ident(name)) == name

        roundtrip()

    def test_quoted_ddl_roundtrip_via_quote_ident(self, cat):
        from ducklake_kafka_connect_spark.lake.table import quote_ident

        for name in ("normal", "0weird", "two words", 'emb"edded'):
            q = quote_ident(name)
            cat.sql(f"CREATE TABLE {q} (pk BIGINT)")
            assert cat.table_exists(name), name
            cols = [r["column_name"] for r in cat.sql(f"DESCRIBE {q}").collect()]
            assert cols == ["pk", "_inserted_at"]
            cat.sql(f"DROP TABLE {q}")
            assert not cat.table_exists(name)


class TestShowCreateTable:
    def test_round_trips_through_ddl(self, cat, spark, tmp_path):
        cat.sql(
            'CREATE TABLE sct (pk BIGINT, "weird col" STRING, ts TIMESTAMP, '
            "PRIMARY KEY (pk)) PARTITIONED BY (month(ts))"
        )
        row = cat.sql("SHOW CREATE TABLE sct").collect()[0]
        stmt = row["create_statement"]
        assert '"weird col"' in stmt and "PRIMARY KEY (pk)" in stmt
        assert "PARTITIONED BY (month(ts))" in stmt
        assert "_inserted_at" not in stmt and "_p_month_ts" not in stmt
        # the emitted statement re-creates an equivalent table
        from ducklake_kafka_connect_spark.lake import LakeCatalog

        cat2 = LakeCatalog(spark, str(tmp_path / "roundtrip"))
        cat2.ddl(stmt)
        m1, m2 = cat.table("sct").manifest(), cat2.table("sct").manifest()
        assert m1.pk == m2.pk and m1.partition_spec == m2.partition_spec
        assert [
            (f.name, f.dataType) for f in m1.schema.fields
        ] == [(f.name, f.dataType) for f in m2.schema.fields]

    def test_unknown_table_raises(self, cat):
        with pytest.raises(ValueError, match="does not exist"):
            cat.sql("SHOW CREATE TABLE ghost")


class TestTblProperties:
    def test_set_show_unset_and_time_travel(self, cat):
        cat.sql("CREATE TABLE tp (pk BIGINT)")
        _fill_nopk = LakeWriter(cat.table("tp"), auto_create=False)
        _fill_nopk.write(cat.spark.range(3).select(F.col("id").alias("pk")))
        r = cat.sql(
            "ALTER TABLE tp SET TBLPROPERTIES ('owner'='data-eng', "
            "'retention.days'='30', 'note'='it''s fine, really')"
        ).collect()[0]
        assert r["op"] == "SET TBLPROPERTIES"
        props = {
            row["key"]: row["value"]
            for row in cat.sql("SHOW TBLPROPERTIES tp").collect()
        }
        assert props == {
            "owner": "data-eng",
            "retention.days": "30",
            "note": "it's fine, really",
        }
        v_full = cat.table("tp").current_version()
        cat.sql("ALTER TABLE tp UNSET TBLPROPERTIES ('note')")
        t = cat.table("tp")
        assert t.properties() == {"owner": "data-eng", "retention.days": "30"}
        # properties time-travel with the manifest chain
        assert t.manifest(v_full).props["tblproperties"]["note"] == "it's fine, really"
        # data untouched by property commits
        assert t.read().count() == 3

    def test_unset_unknown_and_if_exists(self, cat):
        cat.sql("CREATE TABLE tp2 (pk BIGINT)")
        with pytest.raises(ValueError, match="unknown table propert"):
            cat.sql("ALTER TABLE tp2 UNSET TBLPROPERTIES ('ghost')")
        v = cat.table("tp2").current_version()
        cat.sql("ALTER TABLE tp2 UNSET TBLPROPERTIES IF EXISTS ('ghost')")
        assert cat.table("tp2").current_version() == v + 1

    def test_engine_state_isolated_from_user_props(self, cat):
        """User properties can never clobber engine state keys: they
        live under their own namespace in manifest props."""
        cat.sql("CREATE TABLE tp3 (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        _fill(cat, "tp3")
        cat.sql(
            "ALTER TABLE tp3 SET TBLPROPERTIES ('column_renames'='evil', "
            "'txns'='evil', 'last_op'='evil')"
        )
        t = cat.table("tp3")
        assert t.manifest().column_renames == {}
        assert t.properties()["column_renames"] == "evil"  # plain user key
        # engine ops still work on top
        cat.sql("ALTER TABLE tp3 RENAME COLUMN v TO w")
        assert cat.table("tp3").manifest().column_renames == {"w": "v"}
        assert cat.table("tp3").properties()["txns"] == "evil"

    def test_bad_pairs_raise(self, cat):
        cat.sql("CREATE TABLE tp4 (pk BIGINT)")
        with pytest.raises(ValueError, match="string literal|TBLPROPERTIES pair"):
            cat.sql("ALTER TABLE tp4 SET TBLPROPERTIES (owner='x')")
        with pytest.raises(ValueError, match="at least one"):
            cat.table("tp4").set_properties({})


def test_describe_history_routed(cat):
    cat.sql("CREATE TABLE hist (pk BIGINT, PRIMARY KEY (pk))")
    _fill(cat, "hist", n=5)
    rows = cat.sql("DESCRIBE HISTORY hist").collect()
    assert len(rows) >= 2  # create + write
    assert {r["version"] for r in rows} == set(range(len(rows)))
    with pytest.raises(ValueError, match="does not exist"):
        cat.sql("DESCRIBE HISTORY ghost")


class TestInsertValues:
    def test_values_positional(self, cat):
        cat.sql("CREATE TABLE iv (pk BIGINT, v BIGINT, s STRING, PRIMARY KEY (pk))")
        cat.sql("INSERT INTO iv VALUES (1, 10, 'a'), (2, 20, 'b,c'), (3, NULL, 'd')")
        got = {r["pk"]: (r["v"], r["s"]) for r in cat.table("iv").read().collect()}
        assert got == {1: (10, "a"), 2: (20, "b,c"), 3: (None, "d")}
        # PK table: VALUES upserts like the connector INSERT
        cat.sql("INSERT INTO iv VALUES (2, 999, 'upd')")
        got = {r["pk"]: (r["v"], r["s"]) for r in cat.table("iv").read().collect()}
        assert got[2] == (999, "upd") and len(got) == 3

    def test_explicit_column_list_and_nullfill(self, cat):
        cat.sql("CREATE TABLE iv2 (pk BIGINT, v BIGINT, s STRING)")
        cat.sql("INSERT INTO iv2 (s, pk) VALUES ('x', 7)")
        row = cat.table("iv2").read().collect()[0]
        assert (row["pk"], row["v"], row["s"]) == (7, None, "x")
        # explicit list with a SELECT too
        cat.sql("INSERT INTO iv2 (pk, v) SELECT pk + 100, pk * 2 FROM iv2")
        got = {r["pk"]: (r["v"], r["s"]) for r in cat.table("iv2").read().collect()}
        assert got[107] == (14, None) and len(got) == 2

    def test_arity_errors(self, cat):
        cat.sql("CREATE TABLE iv3 (pk BIGINT, v BIGINT)")
        with pytest.raises(Exception, match="arity|column"):
            cat.sql("INSERT INTO iv3 VALUES (1)")
        with pytest.raises(ValueError, match="fed by"):
            cat.sql("INSERT INTO iv3 (pk) VALUES (1, 2)")


class TestTimeTravelSql:
    """SQL-dialect time travel (VERDICT r11 'What's missing #5'):
    `VERSION AS OF` / `TIMESTAMP AS OF` / `FOR TAG` in SELECT, RESTORE
    TABLE as a statement, and CTAS — each previously API-only."""

    def _three_versions(self, cat, name="tt"):
        t = cat.table(name)
        w = LakeWriter(t, pk=["pk"])
        for i in range(3):
            w.write(
                cat.spark.range(10).select(
                    F.col("id").alias("pk"), F.lit(i).alias("gen")
                )
            )
        return t

    def test_version_as_of_select(self, cat):
        t = self._three_versions(cat)
        assert (
            cat.sql("SELECT max(gen) AS g FROM tt VERSION AS OF 1").collect()[0]["g"]
            == 0
        )
        assert (
            cat.sql("SELECT max(gen) AS g FROM tt FOR VERSION AS OF 2")
            .collect()[0]["g"]
            == 1
        )
        assert cat.sql("SELECT max(gen) AS g FROM tt").collect()[0]["g"] == 2
        with pytest.raises(ValueError, match="does not exist"):
            cat.sql("SELECT * FROM tt VERSION AS OF 99").collect()

    def test_for_tag_select_and_snapshot_join(self, cat):
        t = self._three_versions(cat)
        t.tag("first", 1)
        assert (
            cat.sql("SELECT max(gen) AS g FROM tt FOR TAG first").collect()[0]["g"]
            == 0
        )
        # snapshot diff: one statement joins TWO versions of ONE table
        diff = cat.sql(
            "SELECT count(*) AS changed FROM tt VERSION AS OF 3 a "
            "JOIN tt VERSION AS OF 1 b ON a.pk = b.pk AND a.gen <> b.gen"
        ).collect()[0]["changed"]
        assert diff == 10

    def test_timestamp_as_of_select(self, cat):
        t = self._three_versions(cat)
        # commit stamps are wall-clock; read them back and query between
        ts1 = float(t.manifest(1).props["committed_at"])
        ts3 = float(t.manifest(3).props["committed_at"])
        assert (
            cat.sql(f"SELECT max(gen) AS g FROM tt TIMESTAMP AS OF '{ts1}'")
            .collect()[0]["g"]
            == 0
        )
        from datetime import datetime, timezone

        iso = datetime.fromtimestamp(ts3 + 0.5, tz=timezone.utc).isoformat()
        assert (
            cat.sql(f"SELECT max(gen) AS g FROM tt TIMESTAMP AS OF '{iso}'")
            .collect()[0]["g"]
            == 2
        )
        with pytest.raises(ValueError, match="at or before"):
            t.resolve_timestamp(0.5)
        # API twin
        assert t.read(timestamp=ts1).count() == 10
        with pytest.raises(ValueError, match="not both"):
            t.read(version=1, timestamp=ts1)

    def test_restore_table_statement(self, cat):
        t = self._three_versions(cat)
        t.tag("good", 2)
        out = cat.sql("RESTORE TABLE tt TO VERSION AS OF 1").collect()[0]
        assert out["op"] == "RESTORE TABLE"
        assert cat.sql("SELECT max(gen) AS g FROM tt").collect()[0]["g"] == 0
        cat.sql("RESTORE TABLE tt TO TAG good")
        assert cat.sql("SELECT max(gen) AS g FROM tt").collect()[0]["g"] == 1
        hist = {r["version"]: r["op"] for r in cat.sql("DESCRIBE HISTORY tt").collect()}
        assert hist[4] == "RESTORE(1)" and hist[5] == "RESTORE(2)"

    def test_ctas_basic_partitioned_and_guards(self, cat):
        self._three_versions(cat, "src_t")
        cat.sql(
            "CREATE TABLE agg1 AS SELECT pk % 3 AS bucket, count(*) AS n "
            "FROM src_t GROUP BY pk % 3"
        )
        assert cat.sql("SELECT sum(n) AS s FROM agg1").collect()[0]["s"] == 10
        cat.sql(
            "CREATE TABLE part1 PARTITIONED BY (bucket) AS "
            "SELECT pk % 2 AS bucket, gen FROM src_t"
        )
        assert cat.table("part1").manifest().partition_spec == ["bucket"]
        assert cat.sql("SELECT count(*) AS n FROM part1").collect()[0]["n"] == 10
        assert (
            cat.sql("CREATE TABLE IF NOT EXISTS agg1 AS SELECT 1 AS x")
            .collect()[0]["detail"]
            == "exists"
        )
        with pytest.raises(ValueError, match="already exists"):
            cat.sql("CREATE TABLE agg1 AS SELECT 1 AS x")

    def test_ctas_from_time_travel(self, cat):
        self._three_versions(cat, "src_tt")
        cat.sql(
            "CREATE TABLE snap1 AS SELECT * FROM src_tt VERSION AS OF 1"
        )
        assert (
            cat.sql("SELECT max(gen) AS g FROM snap1").collect()[0]["g"] == 0
        )

    def test_hostile_identifier_time_travel(self, cat):
        # a reserved keyword as table name (valid temp-view name, but
        # must be backtick-quoted in SQL; spaces are out — Spark temp
        # views reject them independent of this engine)
        t = cat.table("union")
        LakeWriter(t, pk=["pk"]).write(
            cat.spark.range(5).select(F.col("id").alias("pk"))
        )
        LakeWriter(t, pk=["pk"]).write(
            cat.spark.range(5, 9).select(F.col("id").alias("pk"))
        )
        assert (
            cat.sql("SELECT count(*) AS n FROM `union` VERSION AS OF 1")
            .collect()[0]["n"]
            == 5
        )
        assert (
            cat.sql("SELECT count(*) AS n FROM `union`").collect()[0]["n"] == 9
        )

    def test_alias_named_version_not_rewritten(self, cat):
        """An alias/column literally named like a table followed by the
        words VERSION AS OF must not break unrelated queries — only
        existing table names trigger the rewrite."""
        self._three_versions(cat)
        # 'nope' is not a table: the reference passes through untouched
        with pytest.raises(Exception):
            cat.sql("SELECT * FROM nope VERSION AS OF 1").collect()


class TestDialectWave12:
    """Round-12 dialect completion: INSERT OVERWRITE, CREATE OR REPLACE
    (plain + CTAS), tags through SQL (Iceberg extension shape), the
    table_changes CDF TVF, SHOW TAGS."""

    def test_insert_overwrite_atomic_replace(self, cat):
        cat.sql("CREATE TABLE io1 (pk BIGINT, v BIGINT)")
        cat.sql("INSERT INTO io1 VALUES (1, 10), (2, 20), (3, 30)")
        v_before = cat.table("io1").current_version()
        out = cat.sql(
            "INSERT OVERWRITE io1 SELECT pk, v * 100 AS v FROM io1 WHERE pk <= 2"
        ).collect()[0]
        assert out["op"] == "INSERT OVERWRITE"
        t = cat.table("io1")
        # ONE commit: old content or new, never an empty in-between
        assert t.current_version() == v_before + 1
        assert {r["pk"]: r["v"] for r in t.read().collect()} == {1: 1000, 2: 2000}
        # history preserved
        assert t.read(version=v_before).count() == 3
        hist = {r["version"]: r["op"] for r in t.history().collect()}
        assert hist[t.current_version()] == "INSERT_OVERWRITE"

    def test_insert_overwrite_with_column_list(self, cat):
        cat.sql("CREATE TABLE io2 (a BIGINT, b STRING)")
        cat.sql("INSERT INTO io2 VALUES (1, 'x')")
        cat.sql("INSERT OVERWRITE TABLE io2 (b, a) VALUES ('y', 9)")
        assert [(r["a"], r["b"]) for r in cat.table("io2").read().collect()] == [
            (9, "y")
        ]

    def test_create_or_replace_plain(self, cat):
        cat.sql("CREATE TABLE r1 (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        _fill(cat, "r1")
        t = cat.table("r1")
        t.tag("old", t.current_version())
        v_before = t.current_version()
        cat.sql("CREATE OR REPLACE TABLE r1 (name STRING, score DOUBLE)")
        t = cat.table("r1")
        assert t.read().count() == 0
        assert [f.name for f in t.read().schema.fields] == [
            "name",
            "score",
            "_inserted_at",
        ]
        assert t.manifest().pk == []
        # history preserved: the pre-replace snapshot still reads
        assert t.read(version=v_before).count() == 20
        assert t.read(tag="old").count() == 20
        hist = {r["version"]: r["op"] for r in t.history().collect()}
        assert hist[t.current_version()] == "REPLACE"
        # OR REPLACE on a missing table just creates
        cat.sql("CREATE OR REPLACE TABLE r1b (x BIGINT)")
        assert cat.table("r1b").exists()

    def test_create_or_replace_as_select(self, cat):
        cat.sql("CREATE TABLE r2 (pk BIGINT, v BIGINT)")
        cat.sql("INSERT INTO r2 VALUES (1, 10), (2, 20)")
        cat.sql(
            "CREATE OR REPLACE TABLE r2 AS "
            "SELECT CAST(pk AS STRING) AS label, v + 5 AS w FROM r2"
        )
        got = {r["label"]: r["w"] for r in cat.table("r2").read().collect()}
        assert got == {"1": 15, "2": 25}

    def test_sql_tags_roundtrip(self, cat):
        cat.sql("CREATE TABLE tg (pk BIGINT)")
        cat.sql("INSERT INTO tg VALUES (1)")
        cat.sql("INSERT INTO tg VALUES (2)")
        t = cat.table("tg")
        cat.sql("ALTER TABLE tg CREATE TAG stable AS OF VERSION 1")
        cat.sql("ALTER TABLE tg CREATE TAG head")
        tags = {r["tag"]: r["version"] for r in cat.sql("SHOW TAGS tg").collect()}
        assert tags == {"stable": 1, "head": t.current_version()}
        assert (
            cat.sql("SELECT count(*) AS n FROM tg FOR TAG stable").collect()[0]["n"]
            == 1
        )
        cat.sql("ALTER TABLE tg DROP TAG stable")
        assert [r["tag"] for r in cat.sql("SHOW TAGS tg").collect()] == ["head"]

    def test_table_changes_tvf(self, cat):
        cat.sql("CREATE TABLE cdf (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        cat.sql("INSERT INTO cdf VALUES (1, 10), (2, 20)")  # v1
        v1 = cat.table("cdf").current_version()
        cat.sql("INSERT INTO cdf VALUES (2, 99), (3, 30)")  # v2: update + insert
        changed = cat.sql(
            f"SELECT _change_type, count(*) AS n "
            f"FROM table_changes('cdf', {v1}) "
            f"GROUP BY _change_type ORDER BY _change_type"
        ).collect()
        assert {r["_change_type"]: r["n"] for r in changed} == {
            "insert": 1,
            "update": 1,
        }

    def test_insert_overwrite_txn_idempotence(self, cat):
        from ducklake_kafka_connect_spark.lake import LakeWriter

        cat.sql("CREATE TABLE io3 (pk BIGINT)")
        w = LakeWriter(cat.table("io3"), auto_create=False)
        df = cat.spark.range(4).select(F.col("id").alias("pk"))
        w.overwrite(df, txn=("app1", 7))
        w.overwrite(df.limit(1), txn=("app1", 7))  # replayed epoch: no-op
        assert cat.table("io3").read().count() == 4


class TestDialectWave12b:
    def test_delete_all_rows_is_metadata_only(self, cat):
        cat.sql("CREATE TABLE da (pk BIGINT)")
        cat.sql("INSERT INTO da VALUES (1), (2), (3)")
        v = cat.table("da").current_version()
        out = cat.sql("DELETE FROM da").collect()[0]
        assert out["detail"].startswith("all rows")
        t = cat.table("da")
        assert t.read().count() == 0
        assert t.read(version=v).count() == 3  # history preserved
        hist = {r["version"]: r["op"] for r in t.history().collect()}
        assert hist[t.current_version()] == "TRUNCATE"

    def test_update_without_where_touches_every_row(self, cat):
        cat.sql("CREATE TABLE ua (pk BIGINT, v BIGINT)")
        cat.sql("INSERT INTO ua VALUES (1, 10), (2, 20)")
        cat.sql("UPDATE ua SET v = v + 1")
        assert {r["pk"]: r["v"] for r in cat.table("ua").read().collect()} == {
            1: 11,
            2: 21,
        }

    def test_show_partitions(self, cat):
        cat.sql(
            "CREATE TABLE sp (pk BIGINT, grp STRING) PARTITIONED BY (grp)"
        )
        cat.sql("INSERT INTO sp VALUES (1, 'a'), (2, 'b'), (3, 'a'), (4, NULL)")
        rows = {r["partition"]: r["n_files"] for r in
                cat.sql("SHOW PARTITIONS sp").collect()}
        assert set(rows) == {"grp=a", "grp=b", "grp=null"}
        assert all(n >= 1 for n in rows.values())
        with pytest.raises(ValueError, match="not partitioned"):
            cat.sql("CREATE TABLE sp2 (x BIGINT)")
            cat.sql("SHOW PARTITIONS sp2")

    def test_merge_with_time_traveled_source(self, cat):
        """MERGE USING (<subquery>) runs through catalog.sql, so a
        time-traveled source snapshot works with zero extra machinery."""
        _fill_versions = cat.sql
        cat.sql("CREATE TABLE mt (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        cat.sql("INSERT INTO mt VALUES (1, 10), (2, 20)")   # v1
        cat.sql("UPDATE mt SET v = v * 100 WHERE pk = 1")   # v2
        cat.sql("CREATE TABLE dst (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        cat.sql(
            "MERGE INTO dst USING (SELECT pk, v FROM mt VERSION AS OF 1) AS s "
            "ON dst.pk = s.pk "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        assert {r["pk"]: r["v"] for r in cat.table("dst").read().collect()} == {
            1: 10,
            2: 20,
        }, "the PRE-update snapshot must be what merged"


def test_copy_into_idempotent(spark, tmp_path):
    """r13: COPY INTO — idempotent bulk ingestion; loaded files are
    remembered in the SAME commit as their rows, re-runs skip them,
    PATTERN filters, and new files load incrementally."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog
    from pyspark.sql import functions as F

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cat.sql("CREATE TABLE imports (id BIGINT, v BIGINT)")
    src = tmp_path / "src"
    spark.range(10).select("id", (F.col("id") * 2).alias("v")) \
        .coalesce(1).write.parquet(str(src / "b1"))
    spark.range(10, 15).select("id", (F.col("id") * 2).alias("v")) \
        .coalesce(1).write.parquet(str(src / "b2"))
    r = cat.sql(f"COPY INTO imports FROM '{src}'").collect()[0]
    assert "file(s)" in r["detail"] and not r["detail"].startswith("0")
    assert cat.table("imports").read().count() == 15
    # re-run: nothing new, no new version
    v = cat.table("imports").current_version()
    r = cat.sql(f"COPY INTO imports FROM '{src}'").collect()[0]
    assert r["detail"].startswith("0 new")
    assert cat.table("imports").current_version() == v
    # a new file arrives: only it loads
    spark.range(15, 18).select("id", (F.col("id") * 2).alias("v")) \
        .coalesce(1).write.parquet(str(src / "b3"))
    cat.sql(f"COPY INTO imports FROM '{src}'")
    assert cat.table("imports").read().count() == 18
    got = {r["id"]: r["v"] for r in cat.table("imports").read().collect()}
    assert got == {i: i * 2 for i in range(18)}
    # PATTERN restricts; CSV format reads headered files
    csvdir = tmp_path / "csv"
    csvdir.mkdir()
    (csvdir / "a.csv").write_text("id,v\n100,200\n")
    (csvdir / "skip.csv").write_text("id,v\n999,999\n")
    cat.sql(
        f"COPY INTO imports FROM '{csvdir}' FILEFORMAT = CSV PATTERN = 'a.csv'"
    )
    got = cat.table("imports").read().filter("id >= 100").collect()
    assert [(r["id"], r["v"]) for r in got] == [(100, 200)]


def test_delete_update_with_subquery_predicate(spark, tmp_path):
    """r13: DELETE/UPDATE ... WHERE <subquery> compiles onto MERGE —
    IN (SELECT ...) across tables and views works; non-pk tables raise
    a descriptive error."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    LakeWriter(cat.table("t"), pk=["id"]).write(
        spark.createDataFrame(
            [(i, f"v{i}", i % 3) for i in range(20)],
            "id long, val string, grp int",
        )
    )
    LakeWriter(cat.table("bad")).append(
        spark.createDataFrame([(5,), (7,), (11,)], "id long")
    )
    cat.sql("DELETE FROM t WHERE id IN (SELECT id FROM bad)")
    ids = {r["id"] for r in cat.table("t").read().collect()}
    assert ids == set(range(20)) - {5, 7, 11}
    # UPDATE via a view-wrapped subquery
    cat.sql("CREATE VIEW bads AS SELECT id + 1 AS id FROM bad")
    cat.sql("UPDATE t SET val = 'flagged' WHERE id IN (SELECT id FROM bads)")
    got = {r["id"]: r["val"] for r in cat.table("t").read().collect()}
    assert got[6] == "flagged" and got[8] == "flagged" and got[12] == "flagged"
    assert got[9] == "v9"
    # NOT IN / correlated-free scalar subquery also routes through MERGE
    cat.sql("DELETE FROM t WHERE grp = (SELECT min(grp) FROM t) AND id < 3")
    assert 0 not in {r["id"] for r in cat.table("t").read().collect()}
    # non-pk table refuses with a named remedy
    import pytest as _pytest

    with _pytest.raises(ValueError, match="PRIMARY KEY"):
        cat.sql("DELETE FROM bad WHERE id IN (SELECT id FROM bad)")


def test_explain_statement(spark, tmp_path):
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    LakeWriter(cat.table("e"), pk=["id"]).write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    plan = cat.sql("EXPLAIN SELECT v, count(*) AS n FROM e GROUP BY v").collect()[0]["plan"]
    assert "HashAggregate" in plan or "Aggregate" in plan
    plan2 = cat.sql("EXPLAIN EXTENDED SELECT * FROM e WHERE id = 1").collect()[0]["plan"]
    assert "Parsed Logical Plan" in plan2 or "== Physical Plan ==" in plan2


def test_table_files_tvf(spark, tmp_path):
    """r13: table_files('t'[, v]) — the manifest file inventory as SQL
    rows, metadata-only; aggregates answer fragmentation/debt questions."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    t = cat.table("f")
    w = LakeWriter(t, pk=["id"], partition_by="grp")
    for lo in (0, 50):
        w.append(
            spark.createDataFrame(
                [(lo + i, i % 2) for i in range(20)], "id long, grp int"
            )
        )
    rows = cat.sql(
        "SELECT partition, count(*) AS n_files, sum(rows) AS n_rows "
        "FROM table_files('f') GROUP BY partition ORDER BY partition"
    ).collect()
    assert len(rows) == 2
    assert sum(r["n_rows"] for r in rows) == 40
    assert all(r["n_files"] >= 2 for r in rows)
    # version pin: v1 (first append) holds half the rows
    total_v1 = cat.sql(
        "SELECT sum(rows) AS r FROM table_files('f', 1)"
    ).collect()[0]["r"]
    assert total_v1 == 20
    # MOR debt shows up as seq > 0 delta files
    mor = LakeWriter(t, pk=["id"], merge_mode="merge-on-read")
    mor.merge(spark.createDataFrame([(1, 1)], "id long, grp int"))
    n_delta = cat.sql(
        "SELECT count(*) AS n FROM table_files('f') WHERE seq > 0"
    ).collect()[0]["n"]
    assert n_delta == 1


def test_stored_check_constraints(spark, tmp_path):
    """r13: ALTER TABLE ADD CONSTRAINT persists a CHECK in table props;
    EVERY writer enforces it from then on; existing violations refuse
    the ADD; DROP CONSTRAINT lifts it; the Arrow sink refuses unless
    opted out."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.writer import ConstraintViolation
    from ducklake_kafka_connect_spark.sources.lake_datasource import (
        register_lake_datasource,
    )

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cat.sql("CREATE TABLE c (id BIGINT, cents BIGINT, PRIMARY KEY (id))")
    w = LakeWriter(cat.table("c"), pk=["id"])
    w.write(spark.createDataFrame([(1, 10), (2, 20)], "id long, cents long"))
    cat.sql("ALTER TABLE c ADD CONSTRAINT pos CHECK (cents >= 0)")
    # a FRESH writer (no check_constraints arg) enforces the stored one
    w2 = LakeWriter(cat.table("c"), pk=["id"])
    with pytest.raises(ConstraintViolation, match="pos"):
        w2.write(spark.createDataFrame([(3, -5)], "id long, cents long"))
    w2.write(spark.createDataFrame([(3, 5)], "id long, cents long"))
    # NULL passes (SQL CHECK semantics)
    w2.write(spark.createDataFrame([(4, None)], "id long, cents long"))
    # ADD with existing violations refuses
    with pytest.raises(ValueError, match="existing rows"):
        cat.sql("ALTER TABLE c ADD CONSTRAINT big CHECK (cents >= 100)")
    # duplicate name refuses; DROP lifts enforcement
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE c ADD CONSTRAINT pos CHECK (cents >= 1)")
    cat.sql("ALTER TABLE c DROP CONSTRAINT pos")
    w2.write(spark.createDataFrame([(5, -1)], "id long, cents long"))
    with pytest.raises(ValueError, match="does not exist|IF EXISTS|absent"):
        cat.sql("ALTER TABLE c DROP CONSTRAINT nope")
    cat.sql("ALTER TABLE c DROP CONSTRAINT IF EXISTS nope")
    # r14 (VERDICT r13 #3): the sink now EVALUATES compilable constraints
    # executor-side via pyarrow.compute — a violating batch fails the
    # write with the ConstraintViolation message shape, a clean batch
    # lands, and skipConstraints still opts out entirely
    register_lake_datasource(spark)
    cat.sql("ALTER TABLE c ADD CONSTRAINT pos CHECK (cents >= -1)")
    d = spark.createDataFrame([(9, -100)], "id long, cents long")
    with pytest.raises(Exception, match="violates CHECK constraint"):
        d.write.format("ducklake").option("path", str(tmp_path / "lake")) \
            .option("table", "c").option("mergeKeys", "id").mode("append").save()
    assert cat.table("c").read().filter("id = 9").count() == 0
    spark.createDataFrame([(10, 50)], "id long, cents long") \
        .write.format("ducklake").option("path", str(tmp_path / "lake")) \
        .option("table", "c").option("mergeKeys", "id").mode("append").save()
    assert cat.table("c").read().filter("id = 10").collect()[0]["cents"] == 50
    d.write.format("ducklake").option("path", str(tmp_path / "lake")) \
        .option("table", "c").option("mergeKeys", "id") \
        .option("skipConstraints", "true").mode("append").save()
    assert cat.table("c").read().filter("id = 9").collect()[0]["cents"] == -100
    # genuinely non-compilable predicates keep the plan-time refusal
    # (arithmetic is outside the sink's subset; trivially true so the
    # ADD-time validation over existing rows passes)
    cat.sql("ALTER TABLE c ADD CONSTRAINT ident CHECK (cents * 1 = cents)")
    with pytest.raises(Exception, match="skipConstraints"):
        spark.createDataFrame([(11, 2)], "id long, cents long") \
            .write.format("ducklake").option("path", str(tmp_path / "lake")) \
            .option("table", "c").option("mergeKeys", "id").mode("append").save()


def test_vacuum_dry_run_and_describe_detail(spark, tmp_path):
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    t = cat.table("v")
    w = LakeWriter(t, pk=["id"])
    w.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    w.write(spark.createDataFrame([(1, "A2")], "id long, s string"))  # rewrite
    det = cat.sql("DESCRIBE DETAIL v").collect()[0]
    assert det["table"] == "v" and det["num_files"] >= 1
    assert det["num_rows"] == 2 and det["primary_key"] == "id"
    files_before = set(t.manifest().all_files())
    r = cat.sql("VACUUM v RETAIN 1 VERSIONS DRY RUN").collect()[0]
    assert "would delete" in r["detail"]
    n_would = int(r["detail"].split()[2])
    assert n_would >= 1
    # dry run deleted nothing and time travel still works
    assert set(t.manifest().all_files()) == files_before
    assert t.read(version=1).count() == 2
    r2 = cat.sql("VACUUM v RETAIN 1 VERSIONS").collect()[0]
    assert f"deleted {n_would} files" in r2["detail"]


def test_create_table_like_and_show_tables_like(spark, tmp_path):
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cat.sql(
        "CREATE TABLE src (id BIGINT, ts TIMESTAMP, v STRING, "
        "PRIMARY KEY (id)) PARTITIONED BY (month(ts))"
    )
    cat.sql("CREATE TABLE dst LIKE src")
    md, ms = cat.table("dst").manifest(), cat.table("src").manifest()
    assert md.schema == ms.schema and md.pk == ms.pk
    assert md.partition_spec == ms.partition_spec
    assert cat.table("dst").read().count() == 0
    cat.sql("CREATE TABLE IF NOT EXISTS dst LIKE src")  # no-op
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE TABLE dst LIKE src")
    with pytest.raises(ValueError, match="does not exist"):
        cat.sql("CREATE TABLE y LIKE nope")
    names = [r["name"] for r in cat.sql("SHOW TABLES LIKE 'd%'").collect()]
    assert names == ["dst"]
    names = [r["name"] for r in cat.sql("SHOW TABLES LIKE '%s%'").collect()]
    assert set(names) == {"src", "dst"}


def test_explain_refuses_ddl_dml(spark, tmp_path):
    """r14 (ADVICE): EXPLAIN must never execute — EXPLAIN DELETE /
    INSERT / VACUUM / OPTIMIZE previously routed through sql() and
    MUTATED the table while returning a plan of the status row."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    import pytest as _pytest

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    t = cat.table("ex")
    LakeWriter(t, pk=["id"]).write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    v0 = t.current_version()
    for stmt in (
        "EXPLAIN DELETE FROM ex WHERE id = 1",
        "EXPLAIN INSERT INTO ex VALUES (9, 'z')",
        "EXPLAIN UPDATE ex SET v = 'q' WHERE id = 2",
        "EXPLAIN VACUUM ex",
        "EXPLAIN OPTIMIZE ex",
        "EXPLAIN DROP TABLE ex",
        "EXPLAIN MERGE INTO ex USING (SELECT 1 AS id) AS s ON ex.id = s.id "
        "WHEN MATCHED THEN DELETE",
    ):
        with _pytest.raises(ValueError, match="SELECT queries only"):
            cat.sql(stmt)
    assert t.current_version() == v0  # nothing executed
    assert t.read().count() == 2
    # plain EXPLAIN SELECT still plans
    plan = cat.sql("EXPLAIN SELECT * FROM ex WHERE id = 1").collect()[0]["plan"]
    assert "Physical Plan" in plan or "Scan" in plan


def test_update_subquery_unqualified_pk_in_set(spark, tmp_path):
    """r14 (ADVICE): UPDATE ... SET referencing a PK column unqualified
    (SET val = concat('k', id)) while the WHERE is a subquery compiled
    onto MERGE — the source's PK columns are aliased away, so the SET
    expression resolves against the target only."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    t = cat.table("t")
    LakeWriter(t, pk=["id"]).write(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, val string"
        )
    )
    LakeWriter(cat.table("picked")).append(
        spark.createDataFrame([(3,), (7,)], "id long")
    )
    cat.sql(
        "UPDATE t SET val = concat('k', id) WHERE id IN (SELECT id FROM picked)"
    )
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[3] == "k3" and got[7] == "k7"
    assert got[0] == "v0" and got[9] == "v9"


def test_duckdb_dialect_qualify_and_exclude(spark, tmp_path):
    """r14: DuckDB-dialect SELECT features rewrite onto Spark SQL —
    QUALIFY (alias predicates, inline OVER() windows, with ORDER/LIMIT
    tails, under WITH) and `* EXCLUDE (...)`."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    LakeWriter(cat.table("s"), pk=["id"]).write(
        spark.createDataFrame(
            [(i, f"g{i % 3}", i * 10) for i in range(12)],
            "id int, grp string, cents long",
        )
    )
    # alias-predicate QUALIFY
    rows = cat.sql(
        "SELECT grp, id, row_number() OVER (PARTITION BY grp ORDER BY cents DESC) AS rn "
        "FROM s QUALIFY rn <= 2 ORDER BY grp, rn"
    ).collect()
    assert [(r["grp"], r["id"]) for r in rows] == [
        ("g0", 9), ("g0", 6), ("g1", 10), ("g1", 7), ("g2", 11), ("g2", 8)
    ]
    # inline-window QUALIFY (no alias) + LIMIT tail
    rows = cat.sql(
        "SELECT grp, id FROM s "
        "QUALIFY row_number() OVER (PARTITION BY grp ORDER BY cents DESC) = 1 "
        "ORDER BY grp LIMIT 2"
    ).collect()
    assert [(r["grp"], r["id"]) for r in rows] == [("g0", 9), ("g1", 10)]
    assert rows[0].asDict().keys() == {"grp", "id"}  # __qualify dropped
    # QUALIFY under WITH (alias predicate wraps the whole statement)
    rows = cat.sql(
        "WITH big AS (SELECT * FROM s WHERE cents >= 40) "
        "SELECT grp, id, rank() OVER (PARTITION BY grp ORDER BY cents DESC) AS rk "
        "FROM big QUALIFY rk = 1 ORDER BY grp"
    ).collect()
    assert [(r["grp"], r["id"]) for r in rows] == [("g0", 9), ("g1", 10), ("g2", 11)]
    # inline window under WITH refuses with the alias remedy
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alias the window"):
        cat.sql(
            "WITH b AS (SELECT * FROM s) SELECT grp FROM b "
            "QUALIFY row_number() OVER (ORDER BY grp) = 1"
        )
    # * EXCLUDE -> * EXCEPT
    cols = cat.sql("SELECT * EXCLUDE (cents, _inserted_at) FROM s").columns
    assert cols == ["id", "grp"]
    # QUALIFY inside a string literal is untouched
    n = cat.sql("SELECT count(*) AS n FROM s WHERE grp != 'QUALIFY x'").collect()[0]["n"]
    assert n == 12


def test_duckdb_upsert_dml_forms(spark, tmp_path):
    """r14: DuckDB's joined DML — INSERT ... ON CONFLICT (DO NOTHING /
    DO UPDATE SET [WHERE]), UPDATE ... FROM, DELETE ... USING — all
    compile onto the pk-keyed MERGE."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cat.sql("CREATE TABLE t (id BIGINT, v STRING, n BIGINT, PRIMARY KEY (id))")
    cat.sql("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20)")
    cat.sql(
        "INSERT INTO t VALUES (2, 'B2', 99), (3, 'c', 30) ON CONFLICT (id) "
        "DO UPDATE SET v = excluded.v, n = t.n + excluded.n"
    )
    got = {r["id"]: (r["v"], r["n"]) for r in cat.table("t").read().collect()}
    assert got == {1: ("a", 10), 2: ("B2", 119), 3: ("c", 30)}
    cat.sql("INSERT INTO t VALUES (3, 'z', 1), (4, 'd', 40) ON CONFLICT DO NOTHING")
    got = {r["id"]: (r["v"], r["n"]) for r in cat.table("t").read().collect()}
    assert got[3] == ("c", 30) and got[4] == ("d", 40)
    # conditional DO UPDATE ... WHERE over the excluded row
    cat.sql(
        "INSERT INTO t VALUES (1, 'A9', 500), (4, 'D9', 1) ON CONFLICT (id) "
        "DO UPDATE SET v = excluded.v WHERE excluded.n > 100"
    )
    got = {r["id"]: r["v"] for r in cat.table("t").read().collect()}
    assert got[1] == "A9" and got[4] == "d"
    # joined UPDATE / DELETE
    cat.sql("CREATE TABLE s (id BIGINT, bump BIGINT, PRIMARY KEY (id))")
    cat.sql("INSERT INTO s VALUES (2, 1000), (3, 2000), (9, 1)")
    cat.sql("UPDATE t SET n = t.n + s.bump FROM s WHERE t.id = s.id AND s.bump > 1500")
    got = {r["id"]: r["n"] for r in cat.table("t").read().collect()}
    assert got[3] == 2030 and got[2] == 119
    cat.sql("DELETE FROM t USING s WHERE t.id = s.id AND s.bump >= 1000")
    assert sorted(r["id"] for r in cat.table("t").read().collect()) == [1, 4]
    # guards: wrong conflict target, pk-less table, no pk equality
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        cat.sql("INSERT INTO t VALUES (1,'x',1) ON CONFLICT (v) DO NOTHING")
    cat.sql("CREATE TABLE nk (id BIGINT, v BIGINT)")
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        cat.sql("INSERT INTO nk VALUES (1, 1) ON CONFLICT DO NOTHING")
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        cat.sql("DELETE FROM t USING s WHERE t.n = s.bump")
    # plain UPDATE / DELETE / INSERT still route to their own paths
    cat.sql("UPDATE t SET n = 7 WHERE id = 1")
    assert {r["n"] for r in cat.table("t").read().filter("id=1").collect()} == {7}
    cat.sql("DELETE FROM t WHERE id = 4")
    assert cat.table("t").read().count() == 1


def test_dml_returning(cat):
    """DuckDB's RETURNING tail on the plain three DML forms: INSERT
    returns the inserted frame, UPDATE the post-assignment rows (SET
    right-hand sides see OLD values), DELETE the deleted rows pinned to
    the pre-statement snapshot. Merge-compiled dialects refuse."""
    cat.sql(
        "CREATE TABLE t (id BIGINT, s STRING, v DOUBLE, PRIMARY KEY (id))"
    )
    cat.sql("INSERT INTO t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")

    r = cat.sql("INSERT INTO t VALUES (4, 'd', 4.0) RETURNING id, s")
    assert [tuple(x) for x in r.collect()] == [(4, "d")]

    r = cat.sql("UPDATE t SET v = v * 10 WHERE id <= 2 RETURNING id, v")
    assert sorted(tuple(x) for x in r.collect()) == [(1, 10.0), (2, 20.0)]
    got = {x["id"]: x["v"] for x in cat.table("t").read().collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 3.0, 4: 4.0}

    # simultaneous assignment: v's RHS sees the OLD s, s's RHS the OLD v
    r = cat.sql(
        "UPDATE t SET s = CAST(v AS STRING), v = length(s) "
        "WHERE id = 3 RETURNING id, s, v"
    )
    assert [tuple(x) for x in r.collect()] == [(3, "3.0", 1.0)]

    r = cat.sql("DELETE FROM t WHERE v >= 10.0 RETURNING id")
    assert sorted(x["id"] for x in r.collect()) == [1, 2]
    assert sorted(x["id"] for x in cat.table("t").read().collect()) == [3, 4]

    # RETURNING * carries the full row (incl. the engine's stamp column)
    r = cat.sql("DELETE FROM t RETURNING *")
    assert sorted(x["id"] for x in r.collect()) == [3, 4]
    assert "_inserted_at" in r.columns
    assert cat.table("t").read().count() == 0

    # merge-compiled forms refuse with a clear message
    cat.sql("INSERT INTO t VALUES (1, 'a', 1.0)")
    for bad in [
        "INSERT INTO t VALUES (1, 'x', 9.0) ON CONFLICT DO NOTHING RETURNING id",
        "MERGE INTO t USING (SELECT CAST(1 AS BIGINT) AS id) s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE RETURNING *",
        "DELETE FROM t WHERE id IN (SELECT CAST(1 AS BIGINT) AS id) RETURNING id",
        "UPDATE t SET v = 0 WHERE id IN (SELECT CAST(1 AS BIGINT)) RETURNING id",
    ]:
        with pytest.raises(ValueError, match="RETURNING"):
            cat.sql(bad)


def test_insert_values_literal_upcast(cat):
    """SQL literals arrive typed DECIMAL/INT; against DOUBLE/BIGINT
    columns the insert up-casts instead of tripping the evolution
    planner. A WIDER incoming type still widens the table (no silent
    downcast)."""
    cat.sql("CREATE TABLE t (id BIGINT, v DOUBLE, PRIMARY KEY (id))")
    cat.sql("INSERT INTO t VALUES (1, 4.0)")  # DECIMAL(2,1) literal
    (row,) = cat.table("t").read().collect()
    assert row["v"] == 4.0
    assert dict(cat.table("t").read().dtypes)["v"] == "double"
    # int-typed column receiving BIGINT-range values widens the TABLE
    cat.sql("CREATE TABLE n (id INT, PRIMARY KEY (id))")
    cat.sql("INSERT INTO n SELECT CAST(5000000000 AS BIGINT) AS id")
    assert dict(cat.table("n").read().dtypes)["id"] == "bigint"


def test_summarize(cat):
    """DuckDB's SUMMARIZE: one profiling row per column from a single
    aggregate pass, for a table name or an arbitrary SELECT."""
    cat.sql("CREATE TABLE t (id BIGINT, s STRING, v DOUBLE, PRIMARY KEY (id))")
    cat.sql(
        "INSERT INTO t VALUES (1, 'a', 1.0), (2, 'b', 2.0), "
        "(3, NULL, 4.0), (4, 'd', NULL)"
    )
    out = {r["column_name"]: r for r in cat.sql("SUMMARIZE t").collect()}
    assert out["id"]["min"] == "1" and out["id"]["max"] == "4"
    assert out["id"]["count"] == 4 and out["id"]["null_percentage"] == 0.0
    assert out["s"]["null_percentage"] == 25.0
    assert out["v"]["avg"] == pytest.approx(7.0 / 3)
    assert out["v"]["q50"] == pytest.approx(2.0)
    assert out["id"]["approx_unique"] == 4
    # SELECT form profiles the query result, not a stored table
    out2 = {
        r["column_name"]: r
        for r in cat.sql("SUMMARIZE SELECT v * 2 AS w FROM t WHERE v IS NOT NULL").collect()
    }
    assert out2["w"]["max"] == "8.0" and out2["w"]["count"] == 3


class TestDucklakeAtSyntax:
    """DuckLake's native `AT (VERSION => n)` / `AT (TIMESTAMP => 'ts')`
    table-reference spelling — what DuckDB users write against the
    reference's catalog. SNAPSHOT is a synonym for VERSION here
    (snapshot ids ARE versions in this lake format)."""

    def _three_versions(self, cat, name="tt"):
        t = cat.table(name)
        w = LakeWriter(t, pk=["pk"])
        for i in range(3):
            w.write(
                cat.spark.range(10).select(
                    F.col("id").alias("pk"), F.lit(i).alias("gen")
                )
            )
        return t

    def test_at_version_and_snapshot(self, cat):
        self._three_versions(cat)
        assert (
            cat.sql("SELECT max(gen) AS g FROM tt AT (VERSION => 1)")
            .collect()[0]["g"]
            == 0
        )
        assert (
            cat.sql("SELECT max(gen) AS g FROM tt AT (SNAPSHOT => 2)")
            .collect()[0]["g"]
            == 1
        )
        with pytest.raises(ValueError, match="does not exist"):
            cat.sql("SELECT * FROM tt AT (VERSION => 99)").collect()

    def test_at_timestamp(self, cat):
        t = self._three_versions(cat)
        ts1 = float(t.manifest(1).props["committed_at"])
        import datetime

        lit = datetime.datetime.fromtimestamp(
            ts1, tz=datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f")
        got = cat.sql(
            f"SELECT max(gen) AS g FROM tt AT (TIMESTAMP => '{lit}')"
        ).collect()[0]["g"]
        assert got == 0

    def test_at_joins_two_snapshots(self, cat):
        self._three_versions(cat)
        diff = cat.sql(
            "SELECT count(*) AS changed FROM tt AT (VERSION => 3) a "
            "JOIN tt AT (VERSION => 1) b ON a.pk = b.pk AND a.gen <> b.gen"
        ).collect()[0]["changed"]
        assert diff == 10

    def test_at_through_view_refused(self, cat):
        self._three_versions(cat)
        cat.sql("CREATE VIEW vtt AS SELECT * FROM tt")
        with pytest.raises(ValueError, match="ambiguous"):
            cat.sql("SELECT * FROM vtt AT (VERSION => 1)").collect()


class TestInsertOrReplaceIgnore:
    """DuckDB's INSERT OR REPLACE / OR IGNORE shorthand — sugar over
    the ON CONFLICT MERGE compilation (same plan, same PK contract)."""

    def _seed(self, cat):
        cat.sql("CREATE TABLE u (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        cat.sql("INSERT INTO u VALUES (1, 10), (2, 20)")

    def test_or_replace_overwrites_conflicts(self, cat):
        self._seed(cat)
        cat.sql("INSERT OR REPLACE INTO u VALUES (2, 99), (3, 30)")
        rows = {r["pk"]: r["v"] for r in cat.sql("SELECT * FROM u").collect()}
        assert rows == {1: 10, 2: 99, 3: 30}

    def test_or_ignore_keeps_existing(self, cat):
        self._seed(cat)
        cat.sql("INSERT OR IGNORE INTO u VALUES (2, 99), (3, 30)")
        rows = {r["pk"]: r["v"] for r in cat.sql("SELECT * FROM u").collect()}
        assert rows == {1: 10, 2: 20, 3: 30}

    def test_or_replace_with_column_list_and_select(self, cat):
        self._seed(cat)
        cat.sql(
            "INSERT OR REPLACE INTO u (pk, v) "
            "SELECT pk, v * 1000 FROM u WHERE pk = 1"
        )
        rows = {r["pk"]: r["v"] for r in cat.sql("SELECT * FROM u").collect()}
        assert rows == {1: 10000, 2: 20}

    def test_requires_pk(self, cat):
        cat.sql("CREATE TABLE nopk (pk BIGINT, v BIGINT)")
        with pytest.raises(ValueError, match="PRIMARY KEY"):
            cat.sql("INSERT OR REPLACE INTO nopk VALUES (1, 1)")

    def test_returning_refused(self, cat):
        self._seed(cat)
        with pytest.raises(ValueError, match="RETURNING"):
            cat.sql("INSERT OR IGNORE INTO u VALUES (4, 40) RETURNING pk")


class TestSnapshotsTvf:
    """table_snapshots('t') — version history as SQL rows (DuckLake's
    ducklake_snapshots as a per-table TVF), and the committed_at column
    on DESCRIBE HISTORY."""

    def test_snapshots_rows_and_join(self, cat):
        cat.sql("CREATE TABLE s1 (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
        cat.sql("INSERT INTO s1 VALUES (1, 10)")
        cat.sql("INSERT INTO s1 VALUES (2, 20)")
        rows = cat.sql(
            "SELECT version, op FROM table_snapshots('s1') ORDER BY version"
        ).collect()
        assert [r["version"] for r in rows] == [0, 1, 2]
        assert rows[0]["op"].startswith("CREATE") or rows[0]["op"] == "WRITE"
        # joins/aggregates work like any relation
        (row,) = cat.sql(
            "SELECT count(*) AS n, max(version) AS mv "
            "FROM table_snapshots('s1') WHERE n_files > 0"
        ).collect()
        assert row["mv"] == 2
        # committed_at present and non-null on write versions
        hist = cat.sql("DESCRIBE HISTORY s1").collect()
        assert all(r["committed_at"] is not None for r in hist)

    def test_unknown_table_refused(self, cat):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown table"):
            cat.sql("SELECT * FROM table_snapshots('ghost')").collect()
