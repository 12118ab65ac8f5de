"""EXPORT DATABASE / IMPORT DATABASE: whole-catalog round trip.

DuckDB's EXPORT DATABASE writes every table's rows plus a replayable
DDL script; IMPORT DATABASE replays it into a fresh catalog. Here the
data lands as one distributed parquet write per table and the DDL
replays through LakeCatalog.sql, so the import inherits COPY INTO's
idempotence and the writer's merge-vs-insert routing.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter


@pytest.fixture
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "src"))


def _fill(cat, name, n=20):
    w = LakeWriter(cat.table(name), auto_create=False)
    w.write(
        cat.spark.range(n).select(
            F.col("id").alias("pk"),
            (F.col("id") * 2).alias("v"),
            (F.col("id") % 3).cast("string").alias("grp"),
        )
    )


def _build_source(cat):
    cat.sql("CREATE TABLE t1 (pk BIGINT, v BIGINT, grp STRING, PRIMARY KEY (pk))")
    _fill(cat, "t1")
    cat.sql(
        "CREATE TABLE evt (pk BIGINT, v BIGINT, grp STRING) PARTITIONED BY (grp)"
    )
    _fill(cat, "evt", n=30)
    cat.sql("CREATE MACRO dbl(x) AS x * 2")
    # view uses the macro — import must create macros before views
    cat.sql("CREATE VIEW v_big AS SELECT pk, dbl(v) AS v2 FROM t1 WHERE v >= 10")
    # view over view — import must respect dependency order
    cat.sql("CREATE VIEW v_bigger AS SELECT pk, v2 FROM v_big WHERE v2 >= 40")
    cat.sql(
        "CREATE MATERIALIZED VIEW mv_sum AS SELECT grp, sum(v) AS total, "
        "count(*) AS n FROM t1 GROUP BY grp"
    )


class TestExportImportDatabase:
    def test_full_round_trip(self, cat, spark, tmp_path):
        _build_source(cat)
        out = str(tmp_path / "dump")
        res = cat.sql(f"EXPORT DATABASE '{out}'").collect()[0]
        assert res["op"] == "EXPORT DATABASE"
        # artifacts: parquet dir per data table + schema.sql + manifest
        assert os.path.isdir(os.path.join(out, "t1"))
        assert os.path.isdir(os.path.join(out, "evt"))
        assert not os.path.exists(os.path.join(out, "mv_sum"))  # DDL-only
        sql_text = open(os.path.join(out, "schema.sql")).read()
        assert "CREATE TABLE" in sql_text and "CREATE MACRO" in sql_text
        with open(os.path.join(out, "manifest.json")) as f:
            man = json.load(f)
        assert sorted(man["tables"]) == ["evt", "t1"]
        # macros precede views in the replay script
        stmts = man["statements"]
        i_macro = next(i for i, s in enumerate(stmts) if "CREATE MACRO" in s)
        i_view = next(i for i, s in enumerate(stmts) if "CREATE VIEW" in s)
        assert i_macro < i_view
        # view-over-view dependency order: v_big before v_bigger
        i_big = next(i for i, s in enumerate(stmts) if '"v_big"' in s or "v_big " in s)
        i_bigger = next(i for i, s in enumerate(stmts) if "v_bigger" in s)
        assert i_big < i_bigger

        dst = LakeCatalog(spark, str(tmp_path / "dst"))
        res2 = dst.sql(f"IMPORT DATABASE '{out}'").collect()[0]
        assert res2["op"] == "IMPORT DATABASE"
        # data round-trips exactly
        src_rows = sorted(
            (r["pk"], r["v"], r["grp"])
            for r in cat.sql("SELECT pk, v, grp FROM t1").collect()
        )
        dst_rows = sorted(
            (r["pk"], r["v"], r["grp"])
            for r in dst.sql("SELECT pk, v, grp FROM t1").collect()
        )
        assert src_rows == dst_rows
        assert dst.table("t1").manifest().pk == ["pk"]
        assert dst.table("evt").manifest().partition_spec == ["grp"]
        # views + macro replay and compute the same rows
        got = sorted(
            (r["pk"], r["v2"])
            for r in dst.sql("SELECT * FROM v_bigger").collect()
        )
        want = sorted(
            (r["pk"], r["v2"])
            for r in cat.sql("SELECT * FROM v_bigger").collect()
        )
        assert got == want and got  # non-empty
        # matview rebuilt against the imported base
        mv = sorted(
            (r["grp"], r["total"], r["n"])
            for r in dst.sql("SELECT * FROM mv_sum").collect()
        )
        assert mv == sorted(
            (r["grp"], r["total"], r["n"])
            for r in cat.sql("SELECT * FROM mv_sum").collect()
        )

    def test_import_is_idempotent(self, cat, spark, tmp_path):
        _build_source(cat)
        out = str(tmp_path / "dump")
        cat.sql(f"EXPORT DATABASE '{out}'")
        dst = LakeCatalog(spark, str(tmp_path / "dst"))
        dst.sql(f"IMPORT DATABASE '{out}'")
        n1 = dst.sql("SELECT count(*) AS n FROM t1").collect()[0]["n"]
        ne = dst.sql("SELECT count(*) AS n FROM evt").collect()[0]["n"]
        # a rerun (crashed-import recovery) is a no-op for rows: DDL
        # replays as IF NOT EXISTS / OR REPLACE and COPY INTO's
        # loaded-file memory skips every file that already landed —
        # including on the PK-less table where a reload would duplicate
        dst.sql(f"IMPORT DATABASE '{out}'")
        assert dst.sql("SELECT count(*) AS n FROM t1").collect()[0]["n"] == n1
        assert dst.sql("SELECT count(*) AS n FROM evt").collect()[0]["n"] == ne

    def test_replicas_are_skipped(self, cat, spark, tmp_path):
        cat.sql("CREATE TABLE t1 (pk BIGINT, v BIGINT, grp STRING, PRIMARY KEY (pk))")
        _fill(cat, "t1")
        mirror_root = str(tmp_path / "mirror")
        cat.sql(f"REPLICATE TABLE t1 TO '{mirror_root}'")
        mcat = LakeCatalog(spark, mirror_root)
        mcat.sql("CREATE TABLE own (pk BIGINT, v BIGINT, grp STRING)")
        _fill(mcat, "own")
        out = str(tmp_path / "dump")
        mcat.sql(f"EXPORT DATABASE '{out}'")
        with open(os.path.join(out, "manifest.json")) as f:
            man = json.load(f)
        assert man["tables"] == ["own"]
        assert man["skipped_replicas"] == ["t1"]

    def test_import_requires_manifest(self, cat, tmp_path):
        empty = str(tmp_path / "nothing")
        os.makedirs(empty)
        with pytest.raises(ValueError, match="manifest.json"):
            cat.sql(f"IMPORT DATABASE '{empty}'")
