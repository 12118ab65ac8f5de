"""Cross-process concurrency: two OS processes (two SparkSessions, two
JVMs) appending to the same lake table through the flock + optimistic
commit protocol must lose nothing. The in-process suites exercise the
retry logic; this is the only test where the kernel-level flock and the
version re-read under lock actually arbitrate between two writers."""

import os
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import functions as F
    from ducklake_kafka_connect_spark.session import build_session
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    lake_dir, lo, hi = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = build_session(app_name="concurrent-writer", master="local[2]",
                          shuffle_partitions=2)
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("t"), pk=["id"])
    for start in range(lo, hi, 50):
        batch = spark.range(start, min(start + 50, hi)).select(
            F.col("id"), F.concat(F.lit("w"), F.col("id")).alias("name")
        )
        w.write(batch)
    spark.stop()
    print("WORKER_DONE")
    """
)


def test_two_processes_interleaved_appends(spark, tmp_path):
    lake_dir = str(tmp_path / "lake")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("t"), pk=["id"])
    w.write(
        spark.range(0, 100).select(
            F.col("id"), F.concat(F.lit("seed"), F.col("id")).alias("name")
        )
    )
    script = WORKER.format(repo=REPO)
    # the subprocess writes ids [1000, 1200) in 4 batches while this
    # process writes [2000, 2200) — both MERGE into the same table
    proc = subprocess.Popen(
        [sys.executable, "-c", script, lake_dir, "1000", "1200"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        for start in range(2000, 2200, 50):
            batch = spark.range(start, start + 50).select(
                F.col("id"), F.concat(F.lit("m"), F.col("id")).alias("name")
            )
            w.write(batch)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "WORKER_DONE" in out, "subprocess writer failed"
    t = cat.table("t")
    rows = {r["id"]: r["name"] for r in t.read().collect()}
    assert len(rows) == 100 + 200 + 200
    assert all(f"w{i}" == rows[i] for i in range(1000, 1200))
    assert all(f"m{i}" == rows[i] for i in range(2000, 2200))
    # every version in the commit chain resolves (no torn commits)
    m = t.manifest()
    for v in range(m.version + 1):
        assert t.manifest(v).version == v


def test_two_processes_binary_manifest_mode(spark, tmp_path, monkeypatch):
    """Same interleaving with binary (Avro) manifest segments: the
    flock + version re-read protocol must be format-agnostic."""
    monkeypatch.setenv("DUCKLAKE_MANIFEST_FORMAT", "binary")
    lake_dir = str(tmp_path / "lake_b")
    cat = LakeCatalog(spark, lake_dir, manifest_format="binary")
    w = LakeWriter(cat.table("t"), pk=["id"])
    w.write(
        spark.range(0, 50).select(
            F.col("id"), F.concat(F.lit("seed"), F.col("id")).alias("name")
        )
    )
    script = WORKER.format(repo=REPO)
    env = dict(os.environ, DUCKLAKE_MANIFEST_FORMAT="binary")
    proc = subprocess.Popen(
        [sys.executable, "-c", script, lake_dir, "500", "650"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )
    try:
        for start in range(900, 1050, 50):
            w.write(
                spark.range(start, start + 50).select(
                    F.col("id"), F.concat(F.lit("m"), F.col("id")).alias("name")
                )
            )
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "WORKER_DONE" in out
    t = cat.table("t")
    assert t.read().count() == 50 + 150 + 150
    meta = os.listdir(t.meta_dir)
    assert not any(f.startswith("v") and f.endswith(".json") for f in meta)
    for v in range(t.manifest().version + 1):
        assert t.manifest(v).version == v
