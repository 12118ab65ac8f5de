"""Data inlining (lake/inline.py): tiny commits live in the manifest.

Reference parity: ``data.inlining.row.limit``
(``DucklakeSinkConfig.java:39/85``, semantics pinned by
``DucklakeSinkConfigTest.java:58-88``) and DuckLake's
``ducklake_flush_inlined_data()`` flush call."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.inline import (
    inline_state,
    parse_inlining_limit,
    table_inline_limit,
)


def _cat(spark, tmp_path, limit="50"):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cat.sql("CREATE TABLE ev (id INT, v STRING, PRIMARY KEY (id))")
    if limit is not None:
        cat.sql(
            "ALTER TABLE ev SET TBLPROPERTIES "
            f"('write.inlining.row.limit'='{limit}')"
        )
    return cat


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "id int, v string")


class TestParseLimit:
    def test_reference_semantics(self):
        assert parse_inlining_limit(None) == 10_000
        assert parse_inlining_limit("off") is None
        assert parse_inlining_limit("OFF") is None
        assert parse_inlining_limit("123") == 123
        assert parse_inlining_limit(7) == 7
        for bad in ("x", -1, True):
            with pytest.raises(ValueError):
                parse_inlining_limit(bad)

    def test_table_optin_defaults_off(self, spark, tmp_path):
        cat = _cat(spark, tmp_path, limit=None)
        assert table_inline_limit(cat.table("ev").manifest()) is None


class TestInlineAppend:
    def test_tiny_appends_mint_no_files(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        for i in range(4):
            w.append(_rows(spark, [(i, f"r{i}")]))
        m = t.manifest()
        blobs, n = inline_state(m)
        assert len(blobs) == 4 and n == 4
        assert m.all_files() == []
        assert m.props["last_op"] == "INSERT_INLINE"

    def test_reads_union_inlined(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "a"), (2, "b")]))
        assert sorted(r.id for r in t.read().collect()) == [1, 2]
        assert t.read(where="id = 2").count() == 1
        assert t.row_count() == 2  # metadata-only count includes buffer
        assert cat.sql("SELECT count(*) AS n FROM ev").collect()[0].n == 2

    def test_mixed_files_and_buffer(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        w = LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(i, "bulk") for i in range(60)]))  # > limit
        assert inline_state(cat.table("ev").manifest())[1] == 0
        w.append(_rows(spark, [(100, "tiny")]))
        m = cat.table("ev").manifest()
        assert inline_state(m)[1] == 1 and len(m.all_files()) >= 1
        assert cat.table("ev").read().count() == 61

    def test_overflow_flushes_buffer_and_batch(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        for i in range(3):
            w.append(_rows(spark, [(i, "x")]))
        w.append(_rows(spark, [(100 + i, "y") for i in range(48)]))
        m = t.manifest()
        blobs, n = inline_state(m)
        assert blobs == [] and n == 0
        assert m.props["last_op"] == "FLUSH_INLINED"
        assert len(m.all_files()) >= 1
        assert t.read().count() == 51

    def test_schema_evolution_across_blobs(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "old")]))
        w.append(
            spark.createDataFrame(
                [(2, "new", 9.5)], "id int, v string, score double"
            )
        )
        got = {r.id: (r.v, r.score) for r in t.read().collect()}
        assert got[1] == ("old", None)
        assert got[2] == ("new", 9.5)
        # flush lands both shapes in files under the evolved schema
        n = LakeWriter(t, pk=["id"]).flush_inlined()
        assert n == 2
        got = {r.id: (r.v, r.score) for r in t.read().collect()}
        assert got[1] == ("old", None) and got[2] == ("new", 9.5)


class TestFlushAndRewrites:
    def test_flush_sql_statement(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        w = LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "a")]))
        out = cat.sql("FLUSH INLINED DATA ev").collect()[0]
        assert "1 row" in out.detail
        m = cat.table("ev").manifest()
        assert inline_state(m)[1] == 0 and len(m.all_files()) == 1
        # idempotent no-op second flush
        assert "0 row" in cat.sql("FLUSH INLINED DATA ev").collect()[0].detail

    def test_merge_flushes_first(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "inlined")]))
        w.merge(_rows(spark, [(1, "merged"), (2, "new")]))
        got = {r.id: r.v for r in t.read().collect()}
        assert got == {1: "merged", 2: "new"}  # no duplicate id=1
        assert inline_state(t.manifest())[1] == 0

    def test_delete_and_update_see_buffered_rows(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "a"), (2, "b")]))
        w.delete_where("id = 1")
        assert {r.id for r in t.read().collect()} == {2}
        w2 = LakeWriter(t, pk=["id"])
        w2.append(_rows(spark, [(3, "c")]))
        w2.update_where("id = 3", {"v": "'updated'"})
        assert {r.v for r in t.read().where("id=3").collect()} == {"updated"}

    def test_insert_overwrite_drops_buffer(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "stale")]))
        w.overwrite(_rows(spark, [(9, "only")]))
        assert [(r.id, r.v) for r in t.read().collect()] == [(9, "only")]
        assert inline_state(t.manifest())[1] == 0

    def test_truncate_drops_buffer(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "x")]))
        cat.sql("TRUNCATE TABLE ev")
        assert t.read().count() == 0
        assert inline_state(t.manifest())[1] == 0

    def test_optimize_flushes(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake.maintenance import compact

        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(i, "bulk") for i in range(60)]))
        w.append(_rows(spark, [(100, "tiny")]))
        compact(t, max_files_per_partition=1)
        assert inline_state(t.manifest())[1] == 0
        assert t.read().count() == 61


class TestGuards:
    def test_rename_drop_refused_with_pending_buffer(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "x")]))
        with pytest.raises(ValueError, match="FLUSH INLINED DATA"):
            t.rename_column("v", "v2")
        with pytest.raises(ValueError, match="FLUSH INLINED DATA"):
            t.drop_column("v")
        LakeWriter(t, pk=["id"]).flush_inlined()
        t.rename_column("v", "v2")  # fine after flush

    def test_cdf_refuses_buffer_delta_span(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(i, "f") for i in range(60)]))  # v1: files
        v_files = t.current_version()
        w.append(_rows(spark, [(100, "tiny")]))  # v2: inline
        with pytest.raises(ValueError, match="inline buffer differs"):
            t.changes(v_files, t.current_version())
        LakeWriter(t, pk=["id"]).flush_inlined()
        ch = t.changes(v_files, t.current_version())
        assert {r.id for r in ch.collect()} == {100}

    def test_time_travel_sees_buffer_as_of_version(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "a")]))
        v1 = t.current_version()
        w.append(_rows(spark, [(2, "b")]))
        assert t.read(version=v1).count() == 1
        assert t.read().count() == 2


class TestClone:
    def test_clone_carries_buffer(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        t, w = cat.table("ev"), LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "a"), (2, "b")]))
        t.clone(str(tmp_path / "lake"), "ev_clone")
        assert cat.table("ev_clone").read().count() == 2


class TestDataSourceRead:
    def test_ducklake_format_reads_buffer(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.sources.lake_datasource import (
            register_lake_datasource,
        )

        register_lake_datasource(spark)
        cat = _cat(spark, tmp_path)
        w = LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(i, "bulk") for i in range(60)]))
        w.append(_rows(spark, [(100, "tiny"), (101, "tiny2")]))
        df = (
            spark.read.format("ducklake")
            .option("path", str(tmp_path / "lake"))
            .option("table", "ev")
            .load()
        )
        assert df.count() == 62
        assert df.filter(F.col("id") >= 100).count() == 2


class TestSqlAndReplication:
    def test_sql_insert_values_inlines(self, spark, tmp_path):
        """SQL INSERT routes through merge-vs-insert routing (D3): on a
        pk-less table it is a pure append and inlines; on a pk table it
        is the connector's UPSERT and flushes first by design."""
        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        cat.sql("CREATE TABLE logs (id INT, v STRING)")
        cat.sql(
            "ALTER TABLE logs SET TBLPROPERTIES "
            "('write.inlining.row.limit'='50')"
        )
        cat.sql("INSERT INTO logs VALUES (1, 'sql-row'), (2, 'sql-row2')")
        m = cat.table("logs").manifest()
        blobs, n = inline_state(m)
        assert n == 2 and m.all_files() == []
        assert cat.sql("SELECT count(*) AS n FROM logs").collect()[0].n == 2

    def test_replicate_carries_buffer(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake.replicate import replicate
        from ducklake_kafka_connect_spark.lake.table import LakeTable

        cat = _cat(spark, tmp_path)
        w = LakeWriter(cat.table("ev"), pk=["id"])
        w.append(_rows(spark, [(1, "a"), (2, "b")]))
        mirror = str(tmp_path / "mirror")
        replicate(cat.table("ev"), mirror)
        mt = LakeTable(spark, mirror, "ev")
        assert mt.read().count() == 2  # buffer travels inside segments


class TestTypesAndConstraints:
    def test_exotic_types_round_trip_through_blob(self, spark, tmp_path):
        """The Arrow-IPC blob form must round-trip types a JSON encoding
        would mangle: timestamps, binary, decimal, arrays."""
        import datetime
        from decimal import Decimal

        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        cat.sql(
            "CREATE TABLE typed (id INT, ts TIMESTAMP, raw BINARY, "
            "amt DECIMAL(10,2), tags ARRAY<STRING>, PRIMARY KEY (id))"
        )
        cat.sql(
            "ALTER TABLE typed SET TBLPROPERTIES "
            "('write.inlining.row.limit'='50')"
        )
        t = cat.table("typed")
        w = LakeWriter(t, pk=["id"])
        row = (
            1,
            datetime.datetime(2026, 2, 3, 4, 5, 6, 789000),
            b"\x00\xffbytes",
            Decimal("12345.67"),
            ["a", "b"],
        )
        w.append(
            spark.createDataFrame(
                [row],
                "id int, ts timestamp, raw binary, amt decimal(10,2), "
                "tags array<string>",
            )
        )
        assert inline_state(t.manifest())[1] == 1  # inlined, not a file
        got = t.read().collect()[0]
        assert got.ts == row[1]
        assert bytes(got.raw) == row[2]
        assert got.amt == row[3]
        # complex columns store as JSON strings (B9 reference semantics)
        # on BOTH the file and inline paths
        import json

        assert json.loads(got.tags) == row[4]
        # and the flush lands byte-identical values in parquet
        LakeWriter(t, pk=["id"]).flush_inlined()
        got2 = t.read().collect()[0]
        assert (got2.ts, bytes(got2.raw), got2.amt, got2.tags) == (
            row[1],
            row[2],
            row[3],
            got.tags,
        )

    def test_constraints_enforced_before_inline_commit(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake import ConstraintViolation

        cat = _cat(spark, tmp_path)
        cat.sql("ALTER TABLE ev ADD CONSTRAINT pos CHECK (id > 0)")
        w = LakeWriter(cat.table("ev"), pk=["id"])
        with pytest.raises(ConstraintViolation):
            w.append(_rows(spark, [(-1, "bad")]))
        m = cat.table("ev").manifest()
        assert inline_state(m)[1] == 0  # nothing buffered from the reject
        w.append(_rows(spark, [(1, "good")]))
        assert inline_state(cat.table("ev").manifest())[1] == 1

    def test_default_fill_applies_to_inlined_rows(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        cat.sql(
            "CREATE TABLE d (id INT, v STRING DEFAULT 'filled', "
            "PRIMARY KEY (id))"
        )
        cat.sql(
            "ALTER TABLE d SET TBLPROPERTIES "
            "('write.inlining.row.limit'='50')"
        )
        w = LakeWriter(cat.table("d"), pk=["id"])
        w.append(spark.createDataFrame([(1,)], "id int"))
        assert inline_state(cat.table("d").manifest())[1] == 1
        assert cat.table("d").read().collect()[0].v == "filled"


class TestCheckpointStatement:
    """DuckDB's CHECKPOINT mapped onto the lake: flush pending inlined
    rows to real files — one table by name, or a bare catalog sweep."""

    def test_named_table_flush(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        w = LakeWriter(cat.table("ev"), auto_create=False)
        w.write(_rows(spark, [(1, "a"), (2, "b")]))
        assert inline_state(cat.table("ev").manifest())[0]
        out = cat.sql("CHECKPOINT ev").collect()[0]
        assert "2 row(s)" in out["detail"]
        assert not inline_state(cat.table("ev").manifest())[0]
        assert cat.sql("SELECT count(*) AS n FROM ev").collect()[0]["n"] == 2

    def test_bare_sweeps_catalog(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        cat.sql("CREATE TABLE ev2 (id INT, v STRING, PRIMARY KEY (id))")
        cat.sql(
            "ALTER TABLE ev2 SET TBLPROPERTIES "
            "('write.inlining.row.limit'='50')"
        )
        for t in ("ev", "ev2"):
            LakeWriter(cat.table(t), auto_create=False).write(
                _rows(spark, [(1, "a")])
            )
        out = cat.sql("CHECKPOINT").collect()[0]
        assert "2 table(s)" in out["detail"]
        for t in ("ev", "ev2"):
            assert not inline_state(cat.table(t).manifest())[0]

    def test_force_spelling_and_noop(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        out = cat.sql("FORCE CHECKPOINT").collect()[0]
        assert "0 row(s)" in out["detail"]

    def test_unknown_table_raises(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        with pytest.raises(ValueError, match="does not exist"):
            cat.sql("CHECKPOINT ghost")

    def test_explain_checkpoint_refused(self, spark, tmp_path):
        cat = _cat(spark, tmp_path)
        w = LakeWriter(cat.table("ev"), auto_create=False)
        w.write(_rows(spark, [(1, "a")]))
        with pytest.raises(ValueError, match="SELECT queries only"):
            cat.sql("EXPLAIN CHECKPOINT ev")
        assert inline_state(cat.table("ev").manifest())[0]  # still buffered
