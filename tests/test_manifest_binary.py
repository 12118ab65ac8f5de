"""Binary (Avro) manifest segments: encode/decode round-trips, the
format flag, mixed-format chain resolution, time travel + tags in
binary mode, and the size claim that motivates the format."""

import os

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.table import (
    COMPACT_EVERY,
    decode_segment_binary,
    encode_segment_binary,
)


def _batch(spark, ids, name="x"):
    return spark.range(0).sparkSession.createDataFrame(
        [(i, f"{name}{i}") for i in ids], "id long, name string"
    )


def test_segment_roundtrip_full_and_delta():
    full = {
        "version": 3,
        "schema": {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}]},
        "pk": ["id"],
        "partition_spec": ["month(ts)"],
        "files": {"m=1": ["data/s1/a.parquet", "data/s1/b.parquet"], "": ["c.parquet"]},
        "parent": 2,
        "props": {"last_op": "INSERT", "txns": {"app": 7}},
        "file_stats": {
            "data/s1/a.parquet": {"id": [0, 99], "__bytes": 1234, "__rows": 100},
            "c.parquet": {"name": ["a", None], "score": [0.25, 9.75]},
        },
    }
    assert decode_segment_binary(encode_segment_binary(full)) == full
    delta = {
        "delta": True,
        "version": 4,
        "parent": 3,
        "schema": full["schema"],
        "pk": ["id"],
        "partition_spec": [],
        "props": {},
        "files_add": {"": ["d.parquet"]},
        "files_remove": {"m=1": ["data/s1/a.parquet"]},
        "stats_add": {"d.parquet": {"id": [5, 6]}},
    }
    assert decode_segment_binary(encode_segment_binary(delta)) == delta


def test_binary_mode_commits_avro_segments(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path), manifest_format="binary")
    w = LakeWriter(cat.table("t"), pk=["id"])
    for i in range(3):
        w.write(_batch(spark, range(i * 10, i * 10 + 10)))
    t = cat.table("t")
    meta = os.listdir(t.meta_dir)
    assert not any(f.startswith("v") and f.endswith(".json") for f in meta)
    assert "v0.avro" in meta
    assert any(f.endswith(".delta.avro") for f in meta)
    assert t.read().count() == 30
    # time travel across the binary chain
    assert t.read(version=1).count() == 10
    # tags resolve binary versions
    t.tag("first", 1)
    assert t.read(version=t.resolve_tag("first")).count() == 10


def test_mixed_format_chain_resolves(spark, tmp_path):
    """Switching formats mid-history leaves a chain with both segment
    kinds; every version must still resolve."""
    cat_j = LakeCatalog(spark, str(tmp_path), manifest_format="json")
    w = LakeWriter(cat_j.table("t"), pk=["id"])
    w.write(_batch(spark, range(10)))
    w.write(_batch(spark, range(10, 20)))
    cat_b = LakeCatalog(spark, str(tmp_path), manifest_format="binary")
    w2 = LakeWriter(cat_b.table("t"), pk=["id"])
    w2.write(_batch(spark, range(20, 30)))
    t = cat_b.table("t")
    meta = os.listdir(t.meta_dir)
    assert any(f.endswith(".delta.json") for f in meta)
    assert any(f.endswith(".delta.avro") for f in meta)
    for v in range(1, 4):
        assert t.manifest(v).version == v
    assert t.read().count() == 30
    assert sorted(t.chain_filenames(3))[-1].endswith(".delta.json") or any(
        n.endswith(".avro") for n in t.chain_filenames(3)
    )


def test_binary_vacuum_materializes_avro_base(spark, tmp_path):
    from ducklake_kafka_connect_spark.lake.maintenance import vacuum

    cat = LakeCatalog(spark, str(tmp_path), manifest_format="binary")
    w = LakeWriter(cat.table("t"), pk=["id"])
    for i in range(COMPACT_EVERY + 2):
        w.write(_batch(spark, range(i * 5, i * 5 + 5)))
    t = cat.table("t")
    latest = t.current_version()
    vacuum(t, keep_versions=2)
    t2 = cat.table("t")
    assert t2.read().count() == (COMPACT_EVERY + 2) * 5
    assert t2.manifest(latest).version == latest
    meta = os.listdir(t2.meta_dir)
    assert not any(f.startswith("v") and f.endswith(".json") for f in meta)


def test_binary_segment_is_smaller(spark, tmp_path):
    """The point of the format: a full manifest with many files should
    serialize meaningfully smaller than its JSON twin."""
    import json

    files = {f"p={i % 7}": [] for i in range(7)}
    stats = {}
    for i in range(500):
        rel = f"data/s{i}/part-{i:05d}-abcdef{i:04d}.parquet"
        files[f"p={i % 7}"].append(rel)
        stats[rel] = {"id": [i * 100, i * 100 + 99], "__bytes": 4096 + i, "__rows": 100}
    d = {
        "version": 9,
        "schema": {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}]},
        "pk": ["id"],
        "partition_spec": [],
        "files": files,
        "parent": 8,
        "props": {},
        "file_stats": stats,
    }
    binary = encode_segment_binary(d)
    text = json.dumps(d, indent=1).encode()
    assert decode_segment_binary(binary) == d
    assert len(binary) < len(text) / 4, (len(binary), len(text))
