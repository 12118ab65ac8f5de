"""LakeTable.changes(): CDC feed between committed versions."""

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter


@pytest.fixture()
def table(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    w = LakeWriter(cat.table("t"), pk=["id"])
    base = spark.range(20).select(
        F.col("id"), (F.col("id") * 10).alias("v"), F.lit("a").alias("tag")
    )
    w.write(base)  # v0-ish (create + append)
    return cat.table("t"), w


def _by_type(df):
    out = {"insert": {}, "update": {}, "delete": {}}
    for r in df.collect():
        out[r["_change_type"]][r["id"]] = (r["v"], r["tag"])
    return out


def test_changes_classifies_insert_update_delete(spark, table):
    t, w = table
    v0 = t.current_version()
    batch = spark.createDataFrame(
        [(5, 999, "b"), (7, 70, "a"), (100, 1, "new")], "id long, v long, tag string"
    )
    # id=7 payload identical to base (7*10=70, 'a') → must NOT appear
    w.write(batch)
    ch = _by_type(t.changes(v0))
    assert ch["insert"] == {100: (1, "new")}
    assert ch["update"] == {5: (999, "b")}
    assert ch["delete"] == {}
    assert 7 not in ch["update"]


def test_changes_reports_deletes_with_last_values(spark, table):
    t, w = table
    v0 = t.current_version()
    w.delete_where("id >= 18")
    ch = _by_type(t.changes(v0))
    assert ch["delete"] == {18: (180, "a"), 19: (190, "a")}
    assert ch["insert"] == {} and ch["update"] == {}


def test_changes_skips_shared_files(spark, tmp_path):
    """A multi-file table where one partition's files survive untouched:
    the diff must scan only the changed files (and stay correct)."""
    cat = LakeCatalog(spark, str(tmp_path / "lake2"))
    w = LakeWriter(cat.table("p"), pk=["id"], partition_by="bucket")
    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 2).alias("bucket"), F.lit(1.0).alias("x")
    )
    w.write(base)
    t = cat.table("p")
    v0 = t.current_version()
    # touch only bucket 0
    batch = spark.createDataFrame([(2, 0, 5.0), (101, 1, 7.0)], "id long, bucket int, x double")
    w.write(batch)
    ch = t.changes(v0)
    rows = {r["id"]: (r["_change_type"], r["x"]) for r in ch.collect()}
    assert rows == {2: ("update", 5.0), 101: ("insert", 7.0)}


def test_changes_across_multiple_versions_and_requires_pk(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "lake3"))
    w = LakeWriter(cat.table("t"), pk=["id"])
    w.write(spark.range(5).select(F.col("id"), F.lit(0).alias("v")))
    t = cat.table("t")
    v0 = t.current_version()
    w.write(spark.range(5).select(F.col("id"), F.lit(1).alias("v")))
    w.write(spark.range(3).select((F.col("id") + 5).alias("id"), F.lit(2).alias("v")))
    # cumulative diff v0 → latest: 5 updates + 3 inserts
    ch = _by_type_simple(t.changes(v0))
    assert ch == {"insert": {5, 6, 7}, "update": {0, 1, 2, 3, 4}, "delete": set()}

    wn = LakeWriter(cat.table("nopk"))
    wn.write(spark.range(3).select(F.col("id")))
    with pytest.raises(ValueError, match="requires pk"):
        cat.table("nopk").changes(0)


def _by_type_simple(df):
    out = {"insert": set(), "update": set(), "delete": set()}
    for r in df.collect():
        out[r["_change_type"]].add(r["id"])
    return out


def test_changes_preimages_cdf_mode(spark, table):
    """preimages=True: updates emit pre+post image rows whose signed
    deltas fold into any SUM/COUNT state, including group migration."""
    t, w = table
    v0 = t.current_version()
    batch = spark.createDataFrame(
        [(5, 999, "b"), (100, 1, "new")], "id long, v long, tag string"
    )
    w.write(batch)
    w.delete_where("id = 19")
    feed = t.changes(v0, preimages=True)
    rows = {(r["id"], r["_change_type"]): (r["v"], r["tag"]) for r in feed.collect()}
    assert rows == {
        (100, "insert"): (1, "new"),
        (5, "update_preimage"): (50, "a"),
        (5, "update_postimage"): (999, "b"),
        (19, "delete"): (190, "a"),
    }
    # signed fold reproduces a per-tag count/sum recompute exactly
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    base = (
        t.read(version=v0).groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    delta = (
        feed.select("tag", sign.alias("s"), "v")
        .groupBy("tag")
        .agg(F.sum("s").alias("dn"), F.sum(F.col("s") * F.col("v")).alias("dsv"))
    )
    z = F.lit(0).cast("long")
    maintained = {
        r["tag"]: (r["n"], r["sv"])
        for r in base.join(delta, "tag", "full_outer")
        .select(
            "tag",
            (F.coalesce("n", z) + F.coalesce("dn", z)).alias("n"),
            (F.coalesce("sv", z) + F.coalesce("dsv", z)).alias("sv"),
        )
        .collect()
        if r["n"] > 0
    }
    recomputed = {
        r["tag"]: (r["n"], r["sv"])
        for r in t.read().groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert maintained == recomputed


def test_changes_across_replace_raises_descriptive(spark, tmp_path):
    from ducklake_kafka_connect_spark.lake import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    cat.sql("CREATE TABLE rr (pk BIGINT, v BIGINT, PRIMARY KEY (pk))")
    cat.sql("INSERT INTO rr VALUES (1, 10)")
    cat.sql("CREATE OR REPLACE TABLE rr AS SELECT pk AS k, v FROM rr")
    with pytest.raises(ValueError, match="REPLACE or\\s+pk redefinition"):
        cat.table("rr").changes(1)


def test_changes_standing_tombstones_equal_state(spark, tmp_path):
    """r13 fix: equal MOR state on both ends of the span, with standing
    tombstones, and a CoW delete that drops an entire seq-0 file whose
    rows the tombstones were suppressing — the raw file diff would emit
    a SPURIOUS delete for the suppressed key; the visible-snapshot path
    must emit only the real one."""
    from ducklake_kafka_connect_spark.lake.mor import mor_state

    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    t = cat.table("t")
    w = LakeWriter(t, pk=["id"])
    # two key-disjoint seq-0 files: f1={10,20}, f2={1,2}; the MOR delta
    # below will carry {1,10} whose stat range [1,10] does NOT admit the
    # key deleted later (20), so the delete prunes to f1 alone
    w.write(spark.createDataFrame([(10, 100, "a"), (20, 200, "a")], "id long, v long, tag string"))
    w.append(spark.createDataFrame([(1, 10, "a"), (2, 20, "a")], "id long, v long, tag string"))
    # MOR merge touching keys 10 AND 1 -> one tombstone {10,1}, one delta
    mor = LakeWriter(t, pk=["id"], merge_mode="merge-on-read")
    mor.merge(spark.createDataFrame([(10, 101, "b"), (1, 11, "b")], "id long, v long, tag string"))
    v_before = t.current_version()
    st_before = mor_state(t.manifest())
    assert st_before[1], "scenario requires standing tombstones"
    # CoW delete of id=20: f1's visible rows are then empty (key 10's old
    # version is suppressed) -> the file is dropped outright, no rewrite
    LakeWriter(t, pk=["id"]).delete_where("id = 20")
    v_after = t.current_version()
    st_after = mor_state(t.manifest())
    assert st_before == st_after, (
        "scenario requires UNCHANGED mor state across the span "
        f"({st_before} -> {st_after})"
    )
    ch = _by_type(t.changes(v_before, v_after))
    assert ch["delete"] == {20: (200, "a")}
    assert ch["update"] == {} and ch["insert"] == {}
    # visible content is intact: key 10 still shows its merged version
    vis = {r["id"]: r["v"] for r in t.read().collect()}
    assert vis == {10: 101, 1: 11, 2: 20}
