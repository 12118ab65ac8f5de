"""CLONE (Delta SHALLOW/DEEP CLONE analogue) — zero-copy snapshot
tables, write isolation, and vacuum interaction.

Reference scope parity: the reference has no CLONE; this is a lakehouse
extension (SURVEY §7 phase 5) mirroring Delta Lake semantics.
"""

import os

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeTable, LakeWriter
from ducklake_kafka_connect_spark.lake.maintenance import vacuum


def _mk(spark, root, name="src", n=100):
    df = spark.range(n).select(
        F.col("id").alias("pk"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 2).alias("val"),
    )
    t = LakeTable(spark, root, name)
    w = LakeWriter(t, pk=["pk"], partition_by="grp")
    w.write(df)
    return t, w, df


class TestShallowClone:
    def test_zero_copy_read_parity(self, spark, tmp_path):
        t, _, df = _mk(spark, str(tmp_path))
        c = t.clone(str(tmp_path), "dst")
        assert sorted(r["pk"] for r in c.read().collect()) == list(range(100))
        # zero-copy: no parquet landed under the clone's data dir
        parquet = [
            f
            for _, _, fs in os.walk(c.data_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
        assert parquet == []
        m = c.manifest()
        assert all(os.path.isabs(p) for p in m.all_files())
        assert m.pk == ["pk"] and m.partition_spec == ["grp"]
        assert m.props["clone_source_version"] == t.current_version()

    def test_pruned_read_uses_cloned_stats(self, spark, tmp_path):
        t, _, _ = _mk(spark, str(tmp_path))
        c = t.clone(str(tmp_path), "dst")
        # stats traveled: a selective read prunes to fewer files
        all_files = len(c.manifest().all_files())
        kept, n_pruned = c.prune_files("grp = '3'")
        assert n_pruned > 0 and 0 < len(kept) < all_files

    def test_writes_to_clone_never_touch_source(self, spark, tmp_path):
        t, _, df = _mk(spark, str(tmp_path))
        src_rows = {(r["pk"], r["val"]) for r in t.read().collect()}
        c = t.clone(str(tmp_path), "dst")
        cw = LakeWriter(c, pk=["pk"])
        upd = spark.range(10).select(
            F.col("id").alias("pk"),
            (F.col("id") % 5).cast("string").alias("grp"),
            F.lit(-1).alias("val"),
        )
        cw.write(upd)
        got = {(r["pk"], r["val"]) for r in c.read().collect()}
        assert sum(1 for _, v in got if v == -1) == 10
        # source is byte-for-byte the same result set
        assert {(r["pk"], r["val"]) for r in t.read().collect()} == src_rows
        # rewritten partitions now reference LOCAL files; untouched
        # partitions still reference the source absolutely
        m = c.manifest()
        assert any(not os.path.isabs(p) for p in m.all_files())

    def test_vacuum_on_clone_spares_source_files(self, spark, tmp_path):
        t, _, _ = _mk(spark, str(tmp_path))
        c = t.clone(str(tmp_path), "dst")
        cw = LakeWriter(c, pk=["pk"])
        cw.write(
            spark.range(5).select(
                F.col("id").alias("pk"),
                (F.col("id") % 5).cast("string").alias("grp"),
                F.lit(7).alias("val"),
            )
        )
        vacuum(c, keep_versions=1)
        # every source file still on disk and source still reads clean
        assert all(
            os.path.exists(os.path.join(t.dir, f))
            for f in t.manifest().all_files()
        )
        assert t.read().count() == 100

    def test_clone_of_historical_version(self, spark, tmp_path):
        t, w, _ = _mk(spark, str(tmp_path))
        v0 = t.current_version()
        w.write(
            spark.range(100, 150).select(
                F.col("id").alias("pk"),
                (F.col("id") % 5).cast("string").alias("grp"),
                F.col("id").alias("val"),
            )
        )
        c = t.clone(str(tmp_path), "dst", version=v0)
        assert c.read().count() == 100  # pre-append snapshot

    def test_refuses_existing_destination(self, spark, tmp_path):
        t, _, _ = _mk(spark, str(tmp_path))
        t.clone(str(tmp_path), "dst")
        with pytest.raises(ValueError, match="already exists"):
            t.clone(str(tmp_path), "dst")


class TestDeepClone:
    def test_deep_clone_survives_source_vacuum(self, spark, tmp_path):
        t, w, _ = _mk(spark, str(tmp_path))
        c = t.clone(str(tmp_path), "dst", deep=True)
        # rewrite the source so v0's files become unreferenced, vacuum
        w.write(
            t.read().withColumn("val", F.col("val") + 1).drop("_inserted_at")
        )
        vacuum(t, keep_versions=1)
        # the deep clone still reads its own copies
        assert c.read().count() == 100
        m = c.manifest()
        assert all(not os.path.isabs(p) for p in m.all_files())
        assert all(
            os.path.exists(os.path.join(c.dir, p)) for p in m.all_files()
        )

    def test_deep_clone_copies_bloom_sidecars(self, spark, tmp_path):
        t, _, _ = _mk(spark, str(tmp_path))
        src_side = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(t.data_dir)
            for f in fs
            if f.endswith(".bloom")
        ]
        c = t.clone(str(tmp_path), "dst", deep=True)
        dst_side = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(c.data_dir)
            for f in fs
            if f.endswith(".bloom")
        ]
        assert len(dst_side) == len(src_side)


class TestPinnedClone:
    def test_pin_protects_shared_files_from_source_vacuum(
        self, spark, tmp_path
    ):
        t, w, _ = _mk(spark, str(tmp_path))
        c = t.clone(str(tmp_path), "dst", pin=True)
        assert t.tags().get("clone-dst") == c.manifest().props[
            "clone_source_version"
        ]
        # rewrite the source so the cloned version's files fall out of
        # the keep_versions window, then vacuum — the tag keeps them
        w.write(
            t.read().withColumn("val", F.col("val") + 1).drop("_inserted_at")
        )
        deleted = vacuum(t, keep_versions=1)
        assert c.read().count() == 100  # clone still reads clean
        # releasing the pin lets the next vacuum reclaim
        t.delete_tag("clone-dst")
        vacuum(t, keep_versions=1)
        missing = [
            f
            for f in c.manifest().all_files()
            if not os.path.exists(os.path.join(c.dir, f))
        ]
        assert missing  # shared files are gone once unpinned


def test_replicate_incremental(spark, tmp_path):
    """r13: cross-lake replication — full history, delta chains, and
    tags mirror to a second root; re-runs copy only what's new."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.replicate import replicate

    import pytest as _pytest

    cat = LakeCatalog(spark, str(tmp_path / "primary"))
    t = cat.table("m")
    w = LakeWriter(t, pk=["id"])
    w.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    w.write(spark.createDataFrame([(1, "A2"), (3, "c")], "id long, s string"))
    t.tag("gold", 1)
    dest_root = str(tmp_path / "mirror")
    r1 = replicate(t, dest_root)
    assert r1.versions_synced >= 2 and r1.files_copied >= 2
    assert r1.tags_synced == 1 and r1.dest_version == t.current_version()
    mcat = LakeCatalog(spark, dest_root)
    mt = mcat.table("m")
    # content, history, and tags all mirror
    assert {r["id"]: r["s"] for r in mt.read().collect()} == {1: "A2", 2: "b", 3: "c"}
    assert mt.read(version=1).count() == 2
    assert mt.resolve_tag("gold") == t.resolve_tag("gold")
    # steady state: nothing new → nothing copied
    r2 = replicate(t, dest_root)
    assert r2.versions_synced == 0 and r2.files_copied == 0
    # incremental: one more commit + a re-pointed tag syncs exactly that
    w.delete_where("id = 2")
    t.tag("gold", t.current_version())
    r3 = replicate(t, dest_root)
    assert r3.versions_synced == 1 and r3.tags_synced == 1
    mt2 = LakeCatalog(spark, dest_root).table("m")
    assert {r["id"] for r in mt2.read().collect()} == {1, 3}
    assert mt2.resolve_tag("gold") == t.current_version()
    # MOR state replicates too (tombstones are retention files)
    mor = LakeWriter(t, pk=["id"], merge_mode="merge-on-read")
    mor.merge(spark.createDataFrame([(1, "A3")], "id long, s string"))
    replicate(t, dest_root)
    mt3 = LakeCatalog(spark, dest_root).table("m")
    assert {r["id"]: r["s"] for r in mt3.read().collect()} == {1: "A3", 3: "c"}
    # shallow-clone sources (absolute refs) refuse with a remedy
    t.clone(str(tmp_path / "primary"), "m_shallow")
    with _pytest.raises(ValueError, match="absolute"):
        replicate(cat.table("m_shallow"), dest_root, dest_name="m_shallow")


def test_replicate_cross_backend(spark, tmp_path):
    """Replication across commit protocols: posix source → CAS mirror
    (segments are format-blind; the CAS tip derives by LIST, so segment
    arrival is the publish)."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.replicate import replicate

    cat = LakeCatalog(spark, str(tmp_path / "primary"))
    t = cat.table("x")
    w = LakeWriter(t, pk=["id"])
    w.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    w.write(spark.createDataFrame([(2, "B")], "id long, s string"))
    r = replicate(t, str(tmp_path / "mirror"), dest_backend="cas")
    assert r.dest_version == t.current_version()
    from ducklake_kafka_connect_spark.lake.table import LakeTable

    mt = LakeTable(spark, str(tmp_path / "mirror"), "x", backend="cas")
    assert {q["id"]: q["s"] for q in mt.read().collect()} == {1: "a", 2: "B"}
    assert mt.read(version=1).count() == 2


def test_replicate_table_sql(spark, tmp_path):
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    cat = LakeCatalog(spark, str(tmp_path / "p"))
    w = LakeWriter(cat.table("s"), pk=["id"])
    w.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    r = cat.sql(f"REPLICATE TABLE s TO '{tmp_path / 'm'}'").collect()[0]
    assert "version(s)" in r["detail"]
    mcat = LakeCatalog(spark, str(tmp_path / "m"))
    assert mcat.table("s").read().count() == 1


def test_replicate_names_vacuum_race(spark, tmp_path):
    """A source file vanishing mid-replication (concurrent vacuum) must
    raise a descriptive error naming the remedy, not a bare missing-file."""
    import os

    import pytest as _pytest

    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.replicate import replicate

    cat = LakeCatalog(spark, str(tmp_path / "p"))
    t = cat.table("r")
    LakeWriter(t, pk=["id"]).write(
        spark.createDataFrame([(1, "a")], "id long, v string")
    )
    rel = t.manifest().all_files()[0]
    os.remove(os.path.join(t.dir, rel))  # simulate the vacuum race
    with _pytest.raises(ValueError, match="retention|tag"):
        replicate(t, str(tmp_path / "m"))


def test_replica_write_fence_and_promote(spark, tmp_path):
    """r14 (VERDICT r13 #5): the first sync stamps the mirror with
    REPLICA_OF; every local commit path (writer, DDL/DML, maintenance
    commits) refuses with a remedy; promote_replica() detaches; after
    promotion re-replicating refuses on the version collision."""
    import pytest as _pytest

    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.replicate import replicate

    cat = LakeCatalog(spark, str(tmp_path / "primary"))
    t = cat.table("f")
    w = LakeWriter(t, pk=["id"])
    w.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    dest_root = str(tmp_path / "mirror")
    replicate(t, dest_root)
    mcat = LakeCatalog(spark, dest_root)
    mt = mcat.table("f")
    assert mt.replica_of() is not None
    # writer commit refuses
    with _pytest.raises(ValueError, match="replication mirror"):
        LakeWriter(mt, pk=["id"]).write(
            spark.createDataFrame([(9, "z")], "id long, s string")
        )
    # SQL DML refuses too (same chokepoint)
    with _pytest.raises(ValueError, match="replication mirror"):
        mcat.sql("DELETE FROM f WHERE id = 1")
    # reads / time travel keep working on the fenced mirror
    assert mt.read().count() == 2
    # replication itself keeps flowing past the fence
    w.write(spark.createDataFrame([(3, "c")], "id long, s string"))
    r = replicate(t, dest_root)
    assert r.versions_synced == 1
    assert mt.read().count() == 3
    # promote: fence lifts, local writes accepted, fork is explicit
    mt.promote_replica()
    assert mt.replica_of() is None
    LakeWriter(mt, pk=["id"]).write(
        spark.createDataFrame([(9, "z")], "id long, s string")
    )
    assert mt.read().count() == 4
    # source advances again: re-replication onto the fork refuses on
    # the version collision rather than silently interleaving
    w.write(spark.createDataFrame([(4, "d")], "id long, s string"))
    before = mt.current_version()
    replicate(t, dest_root)  # same version already present -> skipped
    assert mt.current_version() == before
    assert {r["id"] for r in mt.read().collect()} == {1, 2, 3, 9}


def test_replicate_respects_mirror_vacuum_retention(spark, tmp_path):
    """r14: a mirror keeping a shorter history (mirror-side VACUUM)
    stays trimmed — replication syncs only past the mirror's tip and
    never re-copies reclaimed versions."""
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.maintenance import vacuum
    from ducklake_kafka_connect_spark.lake.replicate import replicate

    cat = LakeCatalog(spark, str(tmp_path / "primary"))
    t = cat.table("vr")
    w = LakeWriter(t, pk=["id"])
    for i in range(4):
        w.write(spark.createDataFrame([(i, f"v{i}")], "id long, s string"))
    dest_root = str(tmp_path / "mirror")
    replicate(t, dest_root)
    mt = LakeCatalog(spark, dest_root).table("vr")
    assert mt.current_version() == t.current_version()
    # trim the mirror to 1 retained version (vacuum is not a commit, so
    # the fence does not block retention maintenance)
    vacuum(mt, keep_versions=1, orphan_grace_s=0.0)
    old = [v for v in range(mt.current_version()) if mt.has_version(v)]
    assert old == [], old
    # source keeps writing; replication extends the mirror WITHOUT
    # resurrecting the vacuumed history
    w.write(spark.createDataFrame([(9, "new")], "id long, s string"))
    r = replicate(t, dest_root)
    assert r.versions_synced == 1
    mt2 = LakeCatalog(spark, dest_root).table("vr")
    assert mt2.current_version() == t.current_version()
    assert {q["id"] for q in mt2.read().collect()} == {0, 1, 2, 3, 9}
    assert [v for v in range(1, mt2.current_version() - 1) if mt2.has_version(v)] == []
    # steady state stays zero-copy
    r2 = replicate(t, dest_root)
    assert r2.versions_synced == 0 and r2.files_copied == 0


def test_replicate_parallel_many_files(spark, tmp_path):
    """r14: the byte loop fans out over a thread pool — a >=100-file
    version replicates correctly (content + per-file presence) and the
    pool path is exercised with more files than workers."""
    from pyspark.sql import functions as F

    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
    from ducklake_kafka_connect_spark.lake.replicate import replicate

    cat = LakeCatalog(spark, str(tmp_path / "primary"))
    t = cat.table("many")
    # 120 partition dirs -> >=120 data files in one commit
    LakeWriter(t, partition_by="grp").append(
        spark.range(1200).select(
            F.col("id"), (F.col("id") % 120).alias("grp")
        )
    )
    n_files = sum(len(v) for v in t.manifest().files.values())
    assert n_files >= 100, n_files
    dest_root = str(tmp_path / "mirror")
    r = replicate(t, dest_root, copy_workers=8)
    assert r.files_copied == n_files
    mt = LakeCatalog(spark, dest_root).table("many")
    assert mt.read().count() == 1200
    assert (
        mt.read().agg(F.sum("id").alias("s")).collect()[0]["s"]
        == sum(range(1200))
    )
    assert sum(len(v) for v in mt.manifest().files.values()) == n_files
