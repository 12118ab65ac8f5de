"""Metadata-only parquet import (LakeTable.add_files — Iceberg
add_files analogue) and the write-audit-publish composition.
"""

import os

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeTable, LakeWriter
from ducklake_kafka_connect_spark.lake.maintenance import vacuum


def _external_parquet(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1).write.parquet(path)
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def _mk_target(spark, root):
    t = LakeTable(spark, root, "tgt")
    w = LakeWriter(t)  # no PK, unpartitioned
    w.write(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
    )
    return t


class TestAddFiles:
    def test_zero_copy_import_reads_and_prunes(self, spark, tmp_path):
        t = _mk_target(spark, str(tmp_path))
        ext = _external_parquet(spark, str(tmp_path / "ext"), 100, 160)
        before = set(t.manifest().all_files())
        v = t.add_files(ext)
        assert t.current_version() == v
        out = t.read()
        assert out.count() == 70
        assert out.filter("k >= 100").count() == 60
        # zero-copy: imported entries are the absolute external paths
        added = set(t.manifest().all_files()) - before
        assert added == set(ext)
        # harvested stats make the imported files prunable
        kept, n_pruned = t.prune_files("k < 50")
        assert n_pruned >= 1
        # and metadata-only COUNT covers them
        assert t.row_count() == 70

    def test_copy_mode_owns_the_bytes(self, spark, tmp_path):
        t = _mk_target(spark, str(tmp_path))
        ext = _external_parquet(spark, str(tmp_path / "ext"), 100, 130)
        t.add_files(ext, copy=True)
        m = t.manifest()
        assert all(not os.path.isabs(p) for p in m.all_files())
        # the external originals are no longer needed
        for p in ext:
            os.remove(p)
        assert t.read().count() == 40

    def test_write_audit_publish_flow(self, spark, tmp_path):
        t = _mk_target(spark, str(tmp_path))
        # WRITE: stage into a scratch table
        stage = LakeTable(spark, str(tmp_path), "stage")
        LakeWriter(stage).write(
            spark.range(500, 520).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            )
        )
        # AUDIT: validate the staged data before it becomes visible
        staged = stage.read()
        assert staged.filter("v != k * 3").count() == 0
        assert t.read().count() == 10  # not yet published
        # PUBLISH: metadata-only adoption
        t.add_files(stage)
        assert t.read().count() == 30
        assert t.read().filter("k >= 500").count() == 20

    def test_time_travel_excludes_the_import(self, spark, tmp_path):
        t = _mk_target(spark, str(tmp_path))
        v0 = t.current_version()
        ext = _external_parquet(spark, str(tmp_path / "ext"), 0, 5)
        t.add_files(ext)
        assert t.read(version=v0).count() == 10

    def test_vacuum_never_deletes_external_files(self, spark, tmp_path):
        t = _mk_target(spark, str(tmp_path))
        ext = _external_parquet(spark, str(tmp_path / "ext"), 0, 5)
        t.add_files(ext)
        # drop the import from the live version, then vacuum
        LakeWriter(t).write(
            spark.range(3).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            )
        )
        vacuum(t, keep_versions=1)
        assert all(os.path.exists(p) for p in ext)  # external bytes safe


class TestAddFilesGuards:
    def test_refuses_pk_and_partitioned_targets(self, spark, tmp_path):
        pk_t = LakeTable(spark, str(tmp_path), "pkt")
        LakeWriter(pk_t, pk=["k"]).write(
            spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
        )
        ext = _external_parquet(spark, str(tmp_path / "ext"), 0, 5)
        with pytest.raises(ValueError, match="MERGE"):
            pk_t.add_files(ext)
        part_t = LakeTable(spark, str(tmp_path), "part")
        LakeWriter(part_t, partition_by="v").write(
            spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v"))
        )
        with pytest.raises(ValueError, match="unpartitioned"):
            part_t.add_files(ext)

    def test_refuses_schema_mismatch(self, spark, tmp_path):
        t = _mk_target(spark, str(tmp_path))
        bad_dir = str(tmp_path / "bad")
        spark.range(5).select(
            F.col("id").alias("k"), F.lit("nope").alias("v")  # v: string
        ).coalesce(1).write.parquet(bad_dir)
        bad = [
            os.path.join(bad_dir, f)
            for f in os.listdir(bad_dir)
            if f.endswith(".parquet")
        ]
        with pytest.raises(ValueError, match="schema mismatch"):
            t.add_files(bad)
        extra_dir = str(tmp_path / "extra")
        spark.range(5).select(
            F.col("id").alias("k"),
            F.col("id").alias("v"),
            F.col("id").alias("surprise"),
        ).coalesce(1).write.parquet(extra_dir)
        extra = [
            os.path.join(extra_dir, f)
            for f in os.listdir(extra_dir)
            if f.endswith(".parquet")
        ]
        with pytest.raises(ValueError, match="schema mismatch"):
            t.add_files(extra)

    def test_empty_list_refused(self, spark, tmp_path):
        t = _mk_target(spark, str(tmp_path))
        with pytest.raises(ValueError, match="empty"):
            t.add_files([])
