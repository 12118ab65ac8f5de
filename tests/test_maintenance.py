"""Compaction + vacuum: file counts shrink, data is identical, retained
snapshots stay readable, unreferenced files are reclaimed."""

import os

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.maintenance import compact, vacuum


def _file_count(table):
    return sum(len(v) for v in table.manifest().files.values())


def _rows(table):
    return sorted(tuple(r) for r in table.read().select("id", "v").collect())


class TestCompact:
    def test_compact_merges_small_files(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("c1")
        w = LakeWriter(t)
        for i in range(4):  # 4 appends → ≥4 files
            w.append(spark.createDataFrame([(i, f"v{i}")], "id long, v string"))
        before_rows = _rows(t)
        assert _file_count(t) >= 4
        res = compact(t)
        assert res.partitions_compacted == 1
        assert _file_count(t) == 1
        assert _rows(t) == before_rows

    def test_compact_partitioned_only_offenders(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("c2")
        w = LakeWriter(t, partition_by="id")
        w.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
        w.append(spark.createDataFrame([(1, "c")], "id long, v string"))  # id=1 now 2 files
        m = t.manifest()
        multi = [k for k, v in m.files.items() if len(v) > 1]
        assert len(multi) == 1
        before_rows = _rows(t)
        res = compact(t)
        assert res.partitions_compacted == 1
        m2 = t.manifest()
        assert all(len(v) == 1 for v in m2.files.values())
        assert _rows(t) == before_rows

    def test_compact_noop_when_already_compacted(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("c3")
        LakeWriter(t).append(spark.createDataFrame([(1, "a")], "id long, v string"))
        compact(t)
        v = t.current_version()
        res = compact(t)  # second pass: nothing above threshold
        assert res.partitions_compacted == 0
        assert t.current_version() == v  # no empty commit


class TestVacuum:
    def test_vacuum_reclaims_unreferenced(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("v1")
        w = LakeWriter(t, pk=["id"])
        w.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
        w.write(spark.createDataFrame([(1, "a2")], "id long, v string"))  # merge rewrites
        before_rows = _rows(t)

        def on_disk():
            return sum(
                1
                for dp, _, fns in os.walk(t.data_dir)
                for fn in fns
                if fn.endswith(".parquet")
            )

        assert on_disk() > _file_count(t)  # old version's files still present
        deleted = vacuum(t, keep_versions=1)
        assert deleted > 0
        assert on_disk() == _file_count(t)
        assert _rows(t) == before_rows
        # old manifest gone, latest retained
        assert not os.path.exists(os.path.join(t.meta_dir, "v0.json"))
        assert t.read() is not None

    def test_vacuum_retains_time_travel_window(self, spark, tmp_path):
        cat = LakeCatalog(spark, str(tmp_path))
        t = cat.table("v2")
        w = LakeWriter(t, pk=["id"])
        w.write(spark.createDataFrame([(1, "a")], "id long, v string"))
        w.write(spark.createDataFrame([(1, "b")], "id long, v string"))
        vacuum(t, keep_versions=2)
        v = t.current_version()
        old = t.read(version=v - 1).select("v").collect()
        assert [r["v"] for r in old] == ["a"]


class TestAutoCompaction:
    """Write-path auto-compaction (VERDICT r2 #5): a steady drip of
    small commits must keep per-partition file counts bounded without
    any external OPTIMIZE schedule."""

    def test_file_count_bounded_under_50_small_appends(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
        from ducklake_kafka_connect_spark.lake.writer import AUTO_COMPACT_MIN_FILES

        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        w = LakeWriter(cat.table("drip"), pk=[], auto_create=True)
        for i in range(50):
            w.append(
                spark.createDataFrame([(i, f"r{i}")], "id long, name string")
            )
        m = cat.table("drip").manifest()
        n_files = sum(len(v) for v in m.files.values())
        assert n_files <= AUTO_COMPACT_MIN_FILES + 1, (
            f"auto-compaction failed to bound file count: {n_files}"
        )
        assert cat.table("drip").read().count() == 50

    def test_disabled_accretes(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        w = LakeWriter(cat.table("raw"), pk=[], auto_create=True, auto_compact=False)
        for i in range(12):
            w.append(
                spark.createDataFrame([(i, f"r{i}")], "id long, name string")
            )
        m = cat.table("raw").manifest()
        assert sum(len(v) for v in m.files.values()) == 12

    def test_small_file_mode_keeps_right_sized_files(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
        from ducklake_kafka_connect_spark.lake.maintenance import compact

        cat = LakeCatalog(spark, str(tmp_path / "lake"))
        w = LakeWriter(cat.table("mix"), pk=[], auto_create=True, auto_compact=False)
        # one "big" file and a dozen tiny ones
        w.append(spark.range(50_000).select(F.col("id"), F.lit("big").alias("name")))
        t = cat.table("mix")
        big_files = set(t.manifest().all_files())
        for i in range(12):
            w.append(spark.createDataFrame([(i, "small")], "id long, name string"))
        res = compact(t, max_files_per_partition=4, small_file_bytes=100_000)
        m = t.manifest()
        kept = set(m.all_files())
        assert big_files <= kept, "right-sized file was rewritten"
        assert res.files_after < res.files_before
        assert t.read().count() == 50_012


class TestDedupRewrite:
    """Table-wide exact-dedup rewrite: one versioned pass, survivors
    deterministic, time travel keeps the pre-dedup snapshot."""

    def test_removes_exact_duplicates(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
        from ducklake_kafka_connect_spark.lake.maintenance import dedup_rewrite

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=[])
        base = spark.range(100).select(
            (F.col("id") % 25).alias("k"), F.lit("v").alias("name")
        )
        w.append(base)  # every (k, name) appears 4x
        t = cat.table("t")
        v0 = t.current_version()
        removed = dedup_rewrite(t, columns=["k", "name"])
        assert removed == 75
        t2 = cat.table("t")
        assert t2.read().count() == 25
        assert t2.read(version=v0).count() == 100  # time travel intact
        ops = [r["op"] for r in t2.history().collect()]
        assert "DEDUP" in ops

    def test_keep_order_picks_deterministic_survivor(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
        from ducklake_kafka_connect_spark.lake.maintenance import dedup_rewrite

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=[])
        rows = spark.createDataFrame(
            [("a", 3, "third"), ("a", 1, "first"), ("a", 2, "second"), ("b", 9, "only")],
            "k string, seq int, tag string",
        )
        w.append(rows)
        removed = dedup_rewrite(cat.table("t"), columns=["k"], keep_order=["seq"])
        assert removed == 2
        got = {r["k"]: r["tag"] for r in cat.table("t").read().collect()}
        assert got == {"a": "first", "b": "only"}


def test_optimize_where_scoped(spark, tmp_path):
    """r13: OPTIMIZE ... WHERE compacts only partitions whose files the
    predicate's stats admit — out-of-scope partitions keep their file
    sets byte-identical, and a scoped OPTIMIZE on a merge-on-read table
    materializes the touched files only."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.mor import mor_state

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    t = cat.table("hot")
    w = LakeWriter(t, pk=["id"], partition_by="grp")
    # several appends → multiple files per partition
    for lo in (0, 100, 200):
        w.append(
            spark.createDataFrame(
                [(lo + i, f"v{lo+i}", i % 2) for i in range(40)],
                "id long, val string, grp int",
            )
        )
    m0 = t.manifest()
    files_by_part = {k: set(v) for k, v in m0.files.items()}
    assert all(len(v) >= 3 for v in files_by_part.values())
    before = {r["id"]: r["val"] for r in t.read().collect()}
    cat.sql("OPTIMIZE hot WHERE grp = 1")
    m1 = t.manifest()
    after_by_part = {k: set(v) for k, v in m1.files.items()}
    # grp=0's files survived untouched; grp=1 compacted to fewer files
    g0 = next(k for k in files_by_part if "grp=0" in k or k.endswith("=0"))
    g1 = next(k for k in files_by_part if "grp=1" in k or k.endswith("=1"))
    assert after_by_part[g0] == files_by_part[g0]
    assert len(after_by_part[g1]) < len(files_by_part[g1])
    assert {r["id"]: r["val"] for r in t.read().collect()} == before
    # scoped materialize on a MOR table: tombstone survives when it
    # still suppresses rows in out-of-scope files
    mor = LakeWriter(t, pk=["id"], merge_mode="merge-on-read")
    mor.merge(
        spark.createDataFrame(
            [(0, "u0", 0), (1, "u1", 1)], "id long, val string, grp int"
        )
    )
    assert mor_state(t.manifest())[1]
    cat.sql("OPTIMIZE hot WHERE grp = 1")
    # grp=1's debt materialized; the tombstone still guards grp=0's old
    # row, so state stands until a full OPTIMIZE
    assert mor_state(t.manifest())[1]
    got = {r["id"]: r["val"] for r in t.read().collect()}
    assert got[0] == "u0" and got[1] == "u1" and got[121] == "v121"
    cat.sql("OPTIMIZE hot")
    assert mor_state(t.manifest()) == ({}, {})
    assert {r["id"]: r["val"] for r in t.read().collect()} == got
