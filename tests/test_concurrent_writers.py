"""Cross-process concurrency: two OS processes (two SparkSessions, two
JVMs) appending to the same lake table through the flock + optimistic
commit protocol must lose nothing. The in-process suites exercise the
retry logic; this is the only test where the kernel-level flock and the
version re-read under lock actually arbitrate between two writers."""

import os
import subprocess
import sys
import textwrap

import pytest
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


MERGE_MANY_WORKER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import functions as F
    from ducklake_kafka_connect_spark.metrics import REGISTRY
    from ducklake_kafka_connect_spark.session import build_session
    from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter

    lake_dir, lo, hi, tag = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    spark = build_session(app_name="mm-writer-" + tag, master="local[2]",
                          shuffle_partitions=2)
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("t"), pk=["id"])
    # two group commits of three queued micro-batches each
    span = (hi - lo) // 6
    for round_ in range(2):
        base = lo + round_ * 3 * span
        batches = [
            spark.range(base + j * span, base + (j + 1) * span).select(
                F.col("id"), F.concat(F.lit(tag), F.col("id")).alias("name")
            )
            for j in range(3)
        ]
        w.merge_many(batches)
    replans = REGISTRY.snapshot()["counters"].get("merge.commitConflictReplans", 0)
    spark.stop()
    print("REPLANS=" + str(replans))
    print("WORKER_DONE")
    """
)


def _run_mm_worker(lake_dir, lo, hi, tag, extra_env=None):
    env = dict(os.environ, **(extra_env or {}))
    return subprocess.Popen(
        [sys.executable, "-c", MERGE_MANY_WORKER.format(repo=REPO),
         lake_dir, str(lo), str(hi), tag],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )


def _assert_linear_chain_and_rows(cat, expected):
    t = cat.table("t")
    rows = {r["id"]: r["name"] for r in t.read().collect()}
    assert len(rows) == len(expected), (len(rows), len(expected))
    for i, name in expected.items():
        assert rows[i] == name, (i, rows[i], name)
    m = t.manifest()
    parents = []
    for v in range(m.version + 1):
        mv = t.manifest(v)
        assert mv.version == v
        parents.append(mv.parent)
    # linear chain: every non-root version's parent is the previous one
    assert parents[0] is None and all(
        p == v - 1 for v, p in enumerate(parents) if v > 0
    ), parents


def test_three_process_merge_many_stress(spark, tmp_path):
    """THREE OS processes (two subprocess JVMs + this one) pushing
    merge_many group commits into one table through flock + optimistic
    versioning: linear version chain, zero lost updates, and the
    commit-conflict replan counter records how often the optimistic plan
    was redone (timing-dependent — reported, not asserted nonzero)."""
    from ducklake_kafka_connect_spark.metrics import REGISTRY

    lake_dir = str(tmp_path / "lake_mm")
    cat = LakeCatalog(spark, lake_dir)
    w = LakeWriter(cat.table("t"), pk=["id"])
    w.write(
        spark.range(0, 60).select(F.col("id"), F.lit("seed").alias("name"))
    )
    p1 = _run_mm_worker(lake_dir, 1000, 1600, "a")
    p2 = _run_mm_worker(lake_dir, 2000, 2600, "b")
    try:
        # main process merges [3000, 3600) via two merge_many rounds
        for base in (3000, 3300):
            w.merge_many(
                [
                    spark.range(base + j * 100, base + (j + 1) * 100).select(
                        F.col("id"),
                        F.concat(F.lit("c"), F.col("id")).alias("name"),
                    )
                    for j in range(3)
                ]
            )
        out1, _ = p1.communicate(timeout=300)
        out2, _ = p2.communicate(timeout=300)
    finally:
        for p in (p1, p2):
            if p.poll() is None:
                p.kill()
    assert "WORKER_DONE" in out1 and "WORKER_DONE" in out2
    expected = {i: "seed" for i in range(60)}
    expected |= {i: f"a{i}" for i in range(1000, 1600)}
    expected |= {i: f"b{i}" for i in range(2000, 2600)}
    expected |= {i: f"c{i}" for i in range(3000, 3600)}
    _assert_linear_chain_and_rows(cat, expected)
    mine = REGISTRY.snapshot()["counters"].get("merge.commitConflictReplans", 0)
    total = mine + sum(
        int(line.split("=", 1)[1])
        for out in (out1, out2)
        for line in out.splitlines()
        if line.startswith("REPLANS=")
    )
    # conflicts are timing-dependent; what matters is every replan
    # converged (the row assertions above) — record the observed count
    print(f"commit-conflict replans across 3 processes: {total}")
    assert total >= 0


def test_two_process_cas_backend_no_flock(spark, tmp_path):
    """Cross-PROCESS writers on the object-store (CAS) backend: no flock
    anywhere — coordination is purely lease objects + create-if-absent
    version segments, i.e. what two writer jobs on S3 would do. Linear
    chain, zero lost updates."""
    lake_dir = str(tmp_path / "lake_cas")
    cat = LakeCatalog(spark, lake_dir, backend="cas")
    w = LakeWriter(cat.table("t"), pk=["id"])
    w.write(
        spark.range(0, 60).select(F.col("id"), F.lit("seed").alias("name"))
    )
    env = {"DUCKLAKE_STORAGE_BACKEND": "cas"}
    p1 = _run_mm_worker(lake_dir, 1000, 1600, "a", extra_env=env)
    p2 = _run_mm_worker(lake_dir, 2000, 2600, "b", extra_env=env)
    try:
        out1, _ = p1.communicate(timeout=300)
        out2, _ = p2.communicate(timeout=300)
    finally:
        for p in (p1, p2):
            if p.poll() is None:
                p.kill()
    assert "WORKER_DONE" in out1 and "WORKER_DONE" in out2
    expected = {i: "seed" for i in range(60)}
    expected |= {i: f"a{i}" for i in range(1000, 1600)}
    expected |= {i: f"b{i}" for i in range(2000, 2600)}
    _assert_linear_chain_and_rows(cat, expected)
    t = cat.table("t")
    assert not any(
        n.startswith("LOCK.lease") for n in t.fs.list_names(t.meta_dir)
    ), "no lease generation objects may survive a clean run"


TAG_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from ducklake_kafka_connect_spark.lake.table import LakeTable

    root, name, prefix, n = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    # refs edits are pure-metadata CAS commits: no SparkSession needed
    t = LakeTable(None, root, name)
    for i in range(n):
        t.tag(prefix + str(i), 0)
        if i % 3 == 2:
            t.delete_tag(prefix + str(i))
    print("WORKER_DONE")
    """
)


@pytest.mark.parametrize("backend", ["posix", "cas"])
def test_two_process_tag_edit_stress(spark, tmp_path, backend):
    """Lock-free refs CAS chain under cross-process contention, on both
    backends: two OS processes hammering tag/delete_tag on one table
    lose NO edit — a lost CAS replays the mutation against the advanced
    chain instead of overwriting it (the pre-r11 lock-guarded
    read-PUT was only as safe as the lock; the chain is safe by
    construction), and the chain stays linear: tip generation == total
    mutating edits."""
    lake_dir = str(tmp_path / f"lake_tags_{backend}")
    cat = LakeCatalog(spark, lake_dir, backend=backend)
    w = LakeWriter(cat.table("t"), pk=["id"])
    w.write(spark.range(10).select(F.col("id"), F.lit("x").alias("v")))
    n = 40
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TAG_WORKER.format(repo=REPO),
             lake_dir, "t", p, str(n)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=dict(os.environ, DUCKLAKE_STORAGE_BACKEND=backend),
        )
        for p in ("a", "b")
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all("WORKER_DONE" in o for o in outs), outs
    t = cat.table("t")
    expected = {
        f"{p}{i}": 0 for p in ("a", "b") for i in range(n) if i % 3 != 2
    }
    gen, tags = t._refs_tip()
    diag = f"gen={gen} live_gens={t._refs_gens()} tags={sorted(tags)}"
    assert tags == expected, diag
    # linear chain, no lost updates: every mutating edit advanced the tip
    edits = 2 * (n + n // 3)
    assert gen == edits, diag
    # superseded generations are GC'd down to the reader tail
    assert len(t._refs_gens()) <= t.REFS_GC_TAIL, diag
