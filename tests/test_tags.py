"""Named snapshot refs (tags): pin a table version under a name, read
it back, and survive vacuum — tagged snapshots are retention roots.
"""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.maintenance import vacuum


@pytest.fixture()
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / "lake"))


def _batch(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("payload")
    )


def test_tag_and_read_back(spark, cat):
    t = cat.table("t")
    w = LakeWriter(t, pk=["k"])
    w.write(_batch(spark, 0, 10, "v0"))
    v = t.tag("release-1")
    w.write(_batch(spark, 0, 10, "v1"))
    assert t.tags() == {"release-1": v}
    assert t.read(tag="release-1").filter("payload = 'v0'").count() == 10
    assert t.read().filter("payload = 'v1'").count() == 10
    with pytest.raises(ValueError, match="not both"):
        t.read(version=0, tag="release-1")
    with pytest.raises(ValueError, match="Unknown tag"):
        t.read(tag="nope")


def test_tag_validation(spark, cat):
    t = cat.table("t")
    LakeWriter(t, pk=["k"]).write(_batch(spark, 0, 5))
    with pytest.raises(ValueError, match="does not exist"):
        t.tag("x", version=99)
    for bad in ("", "a/b", ".hidden"):
        with pytest.raises(ValueError, match="Invalid tag name"):
            t.tag(bad)


def test_vacuum_keeps_tagged_snapshot(spark, cat):
    t = cat.table("t")
    w = LakeWriter(t, pk=[])
    w.append(_batch(spark, 0, 10, "gen0"))
    tagged = t.tag("keep-me")
    for i in range(5):
        w.append(_batch(spark, 100 + i * 10, 110 + i * 10, f"gen{i+1}"))
    vacuum(t, keep_versions=1)
    # the tagged snapshot still reads in full after vacuum
    assert t.read(tag="keep-me").count() == 10
    assert t.manifest(tagged).version == tagged
    # latest unchanged
    assert t.read().count() == 60


def test_vacuum_drops_untagged_after_delete_tag(spark, cat):
    t = cat.table("t")
    w = LakeWriter(t, pk=[])
    w.append(_batch(spark, 0, 10))
    old = t.tag("tmp")
    # rewrite everything so the old files are unreferenced by latest
    from ducklake_kafka_connect_spark.lake.maintenance import compact

    for i in range(3):
        w.append(_batch(spark, 100 + i * 10, 110 + i * 10))
    compact(t)
    t.delete_tag("tmp")
    vacuum(t, keep_versions=1)
    assert not t.has_version(old)
    with pytest.raises(ValueError, match="Unknown tag"):
        t.read(tag="tmp")


class TestHistoryRestore:
    """DESCRIBE-HISTORY and RESTORE analogues over the manifest chain."""

    def test_history_rows_and_ops(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
        from pyspark.sql import functions as F

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=["id"])
        w.write(spark.range(10).select(F.col("id"), F.lit("a").alias("name")))
        w.write(spark.range(5).select(F.col("id"), F.lit("b").alias("name")))
        h = {r["version"]: r for r in cat.table("t").history().collect()}
        assert set(h) >= {1, 2}
        assert h[2]["parent"] == 1
        assert h[2]["n_files"] >= 1 and h[2]["n_bytes"] > 0

    def test_restore_recovers_old_state_forward(self, spark, tmp_path):
        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
        from pyspark.sql import functions as F

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=["id"])
        w.write(spark.range(10).select(F.col("id"), F.lit("good").alias("name")))
        v_good = cat.table("t").current_version()
        w.write(spark.range(10).select(F.col("id"), F.lit("BAD").alias("name")))
        t = cat.table("t")
        assert t.read().filter(F.col("name") == "BAD").count() == 10
        v_new = t.restore(v_good)
        assert v_new == t.current_version()
        got = {r["name"] for r in t.read().collect()}
        assert got == {"good"}
        # history preserved: the BAD version still resolves
        assert t.manifest(v_good + 1).version == v_good + 1
        ops = {r["version"]: r["op"] for r in t.history().collect()}
        assert ops[v_new].startswith("RESTORE(")
        # and writing after a restore continues the chain normally
        w2 = LakeWriter(cat.table("t"), pk=["id"])
        w2.write(spark.range(3).select(F.col("id"), F.lit("after").alias("name")))
        assert cat.table("t").read().filter(F.col("name") == "after").count() == 3

    def test_restore_refuses_vacuumed_version(self, spark, tmp_path):
        import pytest
        from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
        from ducklake_kafka_connect_spark.lake.maintenance import vacuum
        from pyspark.sql import functions as F

        cat = LakeCatalog(spark, str(tmp_path))
        w = LakeWriter(cat.table("t"), pk=["id"])
        w.write(spark.range(10).select(F.col("id"), F.lit("v1").alias("name")))
        v1 = cat.table("t").current_version()
        # rewrite everything so v1's files become unreferenced
        w.write(spark.range(10).select(F.col("id"), F.lit("v2").alias("name")))
        vacuum(cat.table("t"), keep_versions=1)
        with pytest.raises((ValueError, FileNotFoundError)):
            cat.table("t").restore(v1)


def test_refs_chain_linear_and_legacy_migration(spark, tmp_path):
    """The lock-free refs CAS chain: each mutating edit advances exactly
    one generation, no-op edits commit nothing, a legacy refs.json reads
    as generation 0 and is superseded by the first chain commit, and
    superseded generations GC down to the reader tail."""
    import json

    cat = LakeCatalog(spark, str(tmp_path / "lake_chain"), backend="cas")
    t = cat.table("t")
    LakeWriter(t, pk=["k"]).write(_batch(spark, 0, 10))
    v0 = t.current_version()
    # pre-chain layout: a bare refs.json object
    t.fs.put(t._refs_path, json.dumps({"tags": {"old": v0}}))
    assert t.tags() == {"old": v0}
    t.tag("a", v0)                      # g1 (migrates legacy content)
    assert not t.fs.exists(t._refs_path), "legacy object superseded"
    t.tag("a", v0)                      # no-op: same value
    assert t._refs_tip()[0] == 1
    t.delete_tag("missing")             # no-op: nothing to remove
    assert t._refs_tip()[0] == 1
    t.tag("b", v0)                      # g2
    t.delete_tag("old")                 # g3
    gen, tags = t._refs_tip()
    assert gen == 3 and tags == {"a": v0, "b": v0}
    for i in range(12):                 # push past the GC tail
        t.tag(f"t{i}", v0)
    gen, _ = t._refs_tip()
    assert gen == 15
    assert len(t._refs_gens()) <= t.REFS_GC_TAIL


def test_refs_tip_rederives_when_tip_vanishes_mid_read(spark, tmp_path):
    """A reader that LISTed a tip which a concurrent writer's GC removed
    before the GET must re-derive from a fresh LIST, not crash or return
    stale tags."""
    cat = LakeCatalog(spark, str(tmp_path / "lake_race"), backend="cas")
    t = cat.table("t")
    LakeWriter(t, pk=["k"]).write(_batch(spark, 0, 5))
    t.tag("a")
    t.tag("b")
    orig = t.fs.try_read_bytes
    calls = {"misses": 0}

    def flaky(path):
        if "refs.g" in path and calls["misses"] == 0:
            calls["misses"] = 1
            return None  # simulate GC between the LIST and the GET
        return orig(path)

    t.fs.try_read_bytes = flaky
    try:
        tags = t.tags()
    finally:
        del t.fs.try_read_bytes
    assert calls["misses"] == 1, "the injected miss must have been hit"
    assert set(tags) == {"a", "b"}
