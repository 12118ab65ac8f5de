"""Multi-table atomic transactions (lake/txn.py).

The reference reaches cross-table atomicity through its Postgres-backed
DuckLake catalog (``DucklakeConnectionFactory.java:36-95``: every task
shares one catalog connection whose transactions span tables); here the
commit point is a single create-if-absent marker PUT, exercised across
both storage backends' semantics by the posix emulation."""

import pytest

from ducklake_kafka_connect_spark.lake import txn as txn_mod
from ducklake_kafka_connect_spark.lake.table import CommitConflict, LakeCatalog
from ducklake_kafka_connect_spark.lake.txn import TxnInProgress
from ducklake_kafka_connect_spark.lake.writer import LakeWriter


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, v string")


@pytest.fixture()
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "lake"))
    LakeWriter(c.table("a"), pk=["id"]).write(_df(spark, [(1, "x"), (2, "y")]))
    LakeWriter(c.table("b"), pk=["id"]).write(_df(spark, [(1, "x")]))
    return c


def _outside(cat):
    """A second catalog over the same root — a foreign reader/writer."""
    return LakeCatalog(cat.spark, cat.root)


class TestAtomicCommit:
    def test_invisible_until_commit_then_both_flip(self, spark, cat):
        other = _outside(cat)
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        LakeWriter(cat.table("b"), pk=["id"]).write(
            _df(spark, [(2, "w"), (3, "z")])
        )
        # mid-txn: outside readers see the pre-txn snapshot of BOTH
        assert other.table("a").read().count() == 2
        assert other.table("b").read().count() == 1
        # inside: read-your-writes
        assert cat.table("a").read().count() == 3
        assert cat.table("b").read().count() == 3
        cat.commit_txn()
        # after the single marker PUT: both visible
        assert other.table("a").read().count() == 3
        assert other.table("b").read().count() == 3

    def test_sql_reads_inside_txn_see_pending(self, spark, cat):
        cat.begin()
        cat.sql("INSERT INTO a VALUES (7, 'in-txn')")
        assert cat.sql("SELECT * FROM a WHERE id = 7").count() == 1
        assert _outside(cat).sql("SELECT * FROM a WHERE id = 7").count() == 0
        cat.commit_txn()
        assert _outside(cat).sql("SELECT * FROM a WHERE id = 7").count() == 1

    def test_nested_begin_refused(self, cat):
        cat.begin()
        with pytest.raises(ValueError, match="already open"):
            cat.begin()
        cat.rollback_txn()

    def test_commit_without_begin_refused(self, cat):
        with pytest.raises(ValueError, match="no open transaction"):
            cat.commit_txn()


class TestRollback:
    def test_rollback_undoes_all_tables(self, spark, cat):
        va = cat.table("a").current_version()
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        LakeWriter(cat.table("b"), pk=["id"]).write(_df(spark, [(9, "q")]))
        cat.rollback_txn()
        assert cat.table("a").read().count() == 2
        assert cat.table("b").read().count() == 1
        # chain is clean: version numbers freed and reused
        assert cat.table("a").current_version() == va
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(4, "n")]))
        assert cat.table("a").current_version() == va + 1
        assert cat.table("a").read().count() == 3

    def test_rollback_deletes_pending_data_files(self, spark, cat):
        t = cat.table("a")
        before = set(t.fs.list_names(t.data_dir))
        cat.begin()
        LakeWriter(t, pk=["id"]).write(_df(spark, [(3, "z")]))
        assert set(t.fs.list_names(t.data_dir)) != before
        cat.rollback_txn()
        assert set(t.fs.list_names(t.data_dir)) == before

    def test_context_manager_commit_and_abort(self, spark, cat):
        with cat.transaction():
            LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(5, "c")]))
        assert _outside(cat).table("a").read().count() == 3
        with pytest.raises(RuntimeError, match="boom"):
            with cat.transaction():
                LakeWriter(cat.table("a"), pk=["id"]).write(
                    _df(spark, [(6, "d")])
                )
                raise RuntimeError("boom")
        assert _outside(cat).table("a").read().count() == 3

    def test_crashed_txn_cleanup_from_fresh_process(self, spark, cat):
        """Simulated crash: BEGIN + writes, then the context is dropped
        without COMMIT — a different catalog instance rolls it back by
        id (what an operator does after a dead driver)."""
        txn_id = cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        cat._txn.active = None  # the "crash": context lost, no marker
        other = _outside(cat)
        assert other.table("a").read().count() == 2  # still invisible
        other.rollback_txn(txn_id)
        assert other.table("a").read().count() == 2
        LakeWriter(other.table("a"), pk=["id"]).write(_df(spark, [(4, "n")]))
        assert other.table("a").read().count() == 3

    def test_rollback_of_committed_txn_refused(self, spark, cat):
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        txn_id = cat.commit_txn()
        with pytest.raises(ValueError, match="already committed"):
            cat.rollback_txn(txn_id)

    def test_table_created_inside_aborted_txn_disappears(self, spark, cat):
        cat.begin()
        LakeWriter(cat.table("newt"), pk=["id"]).write(_df(spark, [(1, "x")]))
        other = _outside(cat)
        with pytest.raises(FileNotFoundError, match="created inside"):
            other.table("newt").read()
        cat.rollback_txn()
        assert not cat.table("newt").exists()


class TestWriteFence:
    def test_foreign_writer_blocked_with_remedy(self, spark, cat):
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        other = _outside(cat)
        with pytest.raises(TxnInProgress, match="rollback_txn"):
            LakeWriter(other.table("a"), pk=["id"]).write(
                _df(spark, [(8, "f")])
            )
        cat.rollback_txn()
        # fence lifts after rollback
        LakeWriter(other.table("a"), pk=["id"]).write(_df(spark, [(8, "f")]))
        assert other.table("a").read().count() == 3

    def test_untouched_table_not_fenced(self, spark, cat):
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        other = _outside(cat)
        LakeWriter(other.table("b"), pk=["id"]).write(_df(spark, [(5, "k")]))
        assert other.table("b").read().count() == 2
        cat.rollback_txn()

    def test_commit_race_first_finalizer_wins(self, spark, cat):
        txn_id = cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        # a foreign operator rolls the txn back first
        _outside(cat).rollback_txn(txn_id)
        with pytest.raises(ValueError, match="already finalized"):
            cat.commit_txn()
        cat._txn.active = None


class TestTimeTravelAndHistory:
    def test_pending_version_not_addressable(self, spark, cat):
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        tip = cat.table("a").current_version()
        other = _outside(cat)
        with pytest.raises(ValueError, match="belongs to transaction"):
            other.table("a").manifest(tip)
        cat.rollback_txn()

    def test_timestamp_as_of_uses_marker_instant(self, spark, cat):
        """A version committed inside a txn became VISIBLE at the final
        marker, not at its segment stamp — AS OF between the two must
        resolve to the pre-txn version."""
        t = cat.table("a")
        v_pre = t.current_version()
        cat.begin()
        LakeWriter(t, pk=["id"]).write(_df(spark, [(3, "z")]))
        v_txn = cat.table("a").current_version()
        seg_time = t.manifest(v_txn, check_txn=False).props["committed_at"]
        cat.commit_txn()
        marker_time = txn_mod.txn_committed_at(
            t.fs, cat.root, t.manifest(v_txn).props["pending_txn"]
        )
        assert marker_time > seg_time
        mid = (seg_time + marker_time) / 2
        assert t.resolve_timestamp(mid) == v_pre
        assert t.resolve_timestamp(marker_time + 0.001) == v_txn

    def test_history_shows_pending_rows(self, spark, cat):
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        tip = cat.table("a").current_version()
        hist = _outside(cat).table("a").history()
        assert hist.where(f"version = {tip}").count() == 1
        cat.rollback_txn()

    def test_visible_version_skips_pending(self, spark, cat):
        t = cat.table("a")
        v = t.current_version()
        cat.begin()
        LakeWriter(t, pk=["id"]).write(_df(spark, [(3, "z")]))
        assert _outside(cat).table("a").visible_version() == v
        assert t.current_version() == v + 1
        cat.commit_txn()
        assert _outside(cat).table("a").visible_version() == v + 1


class TestSqlSurface:
    def test_begin_commit_statements(self, spark, cat):
        out = cat.sql("BEGIN TRANSACTION").collect()[0]
        assert out.status == "open"
        cat.sql("INSERT INTO a VALUES (11, 's')")
        assert _outside(cat).sql("SELECT * FROM a WHERE id=11").count() == 0
        done = cat.sql("COMMIT").collect()[0]
        assert done.status == "committed"
        assert done.txn == out.txn
        assert _outside(cat).sql("SELECT * FROM a WHERE id=11").count() == 1

    def test_rollback_statement(self, spark, cat):
        cat.sql("BEGIN")
        cat.sql("INSERT INTO a VALUES (12, 't')")
        cat.sql("ROLLBACK")
        assert cat.sql("SELECT * FROM a WHERE id=12").count() == 0

    def test_show_transactions(self, spark, cat):
        cat.sql("BEGIN")
        cat.sql("INSERT INTO a VALUES (13, 'u')")
        cat.sql("COMMIT")
        rows = {r.status for r in cat.sql("SHOW TRANSACTIONS").collect()}
        assert "committed" in rows

    def test_multi_statement_multi_table_atomicity(self, spark, cat):
        cat.sql("BEGIN")
        cat.sql("INSERT INTO a VALUES (20, 'm')")
        cat.sql("UPDATE b SET v = 'updated' WHERE id = 1")
        other = _outside(cat)
        assert other.sql("SELECT * FROM b WHERE v='updated'").count() == 0
        cat.sql("COMMIT")
        assert other.sql("SELECT * FROM a WHERE id=20").count() == 1
        assert other.sql("SELECT * FROM b WHERE v='updated'").count() == 1


class TestStacking:
    def test_multiple_writes_same_table_inside_txn(self, spark, cat):
        cat.begin()
        w = LakeWriter(cat.table("a"), pk=["id"])
        w.write(_df(spark, [(3, "z")]))
        w.write(_df(spark, [(4, "q"), (3, "z2")]))
        assert cat.table("a").read().count() == 4
        assert _outside(cat).table("a").read().count() == 2
        cat.commit_txn()
        got = {
            (r.id, r.v) for r in _outside(cat).table("a").read().collect()
        }
        assert (3, "z2") in got and (4, "q") in got

    def test_pending_txn_prop_not_inherited_by_later_writes(self, spark, cat):
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        cat.commit_txn()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(4, "p")]))
        m = cat.table("a").manifest()
        assert "pending_txn" not in m.props


class TestUnversionedDdlGuard:
    def test_drop_table_refused_inside_txn(self, spark, cat):
        cat.begin()
        with pytest.raises(ValueError, match="cannot be rolled back"):
            cat.sql("DROP TABLE a")
        cat.rollback_txn()
        cat.sql("DROP TABLE a")  # fine outside
        assert not cat.table("a").exists()

    def test_vacuum_and_views_refused_inside_txn(self, spark, cat):
        cat.begin()
        for stmt in (
            "VACUUM a",
            "OPTIMIZE a",
            "CREATE VIEW v1 AS SELECT * FROM a",
            "CREATE MATERIALIZED VIEW mv1 AS SELECT count(*) AS n FROM a",
        ):
            with pytest.raises(ValueError, match="open transaction"):
                cat.sql(stmt)
        cat.rollback_txn()

    def test_versioned_ddl_allowed_and_rolls_back(self, spark, cat):
        cat.begin()
        cat.sql("ALTER TABLE a ADD COLUMN extra INT")
        assert "extra" in cat.table("a").manifest().schema.fieldNames()
        cat.rollback_txn()
        assert "extra" not in cat.table("a").manifest().schema.fieldNames()


class TestDisjointTxns:
    def test_two_catalogs_disjoint_tables_both_commit(self, spark, cat):
        other = _outside(cat)
        cat.begin()
        other.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        LakeWriter(other.table("b"), pk=["id"]).write(_df(spark, [(7, "q")]))
        cat.commit_txn()
        other.commit_txn()
        fresh = _outside(cat)
        assert fresh.table("a").read().count() == 3
        assert fresh.table("b").read().count() == 2

    def test_same_table_second_txn_blocked(self, spark, cat):
        other = _outside(cat)
        cat.begin()
        other.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(_df(spark, [(3, "z")]))
        with pytest.raises(TxnInProgress):
            LakeWriter(other.table("a"), pk=["id"]).write(
                _df(spark, [(4, "w")])
            )
        cat.rollback_txn()
        other.rollback_txn()


class TestMatviewInterplay:
    def test_refresh_inside_txn_rolls_back_with_base(self, spark, cat):
        """REFRESH MATERIALIZED VIEW is versioned commits on the MV
        table — inside a transaction it sees the txn's pending base
        rows (read-your-writes) and rolls back WITH them, so MV and
        base stay consistent either way."""
        cat.sql(
            "CREATE MATERIALIZED VIEW mv_n AS "
            "SELECT v, count(*) AS n FROM a GROUP BY v"
        )
        before = sorted(
            (r.v, r.n) for r in cat.table("mv_n").read().collect()
        )
        cat.begin()
        LakeWriter(cat.table("a"), pk=["id"]).write(
            _df(spark, [(30, "x"), (31, "x")])
        )
        cat.sql("REFRESH MATERIALIZED VIEW mv_n")
        got = dict(
            (r.v, r.n) for r in cat.table("mv_n").read().collect()
        )
        assert got["x"] == 3  # sees pending base rows inside the txn
        # outside: MV still shows pre-txn state
        outside = _outside(cat)
        assert sorted(
            (r.v, r.n) for r in outside.table("mv_n").read().collect()
        ) == before
        cat.rollback_txn()
        assert sorted(
            (r.v, r.n) for r in cat.table("mv_n").read().collect()
        ) == before
        # post-rollback refresh from scratch stays consistent
        cat.sql("REFRESH MATERIALIZED VIEW mv_n")
        assert sorted(
            (r.v, r.n) for r in cat.table("mv_n").read().collect()
        ) == before
