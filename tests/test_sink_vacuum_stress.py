"""Vacuum ⇄ streaming-sink interleave stress (VERDICT r11 brief #5).

The ducklake streaming sink stages parquet executor-side and commits
the manifest version driver-side; between the two the files are
referenced by NOTHING. Vacuum's orphan-grace window
(``maintenance.py``: a never-referenced file younger than
``orphan_grace_s`` survives) is the safety argument — this test makes
it an executed two-process fact on both backends: a real Structured
Streaming query appends micro-batches through
``writeStream.format("ducklake")`` while a SECOND OS PROCESS runs an
aggressive ``vacuum(keep_versions=2, orphan_grace_s=2)`` loop the
whole time.

Grace floor (documented): ``orphan_grace_s`` must exceed the sink's
worst-case stage→commit latency (one micro-batch duration + driver
commit); below that, vacuum may reclaim a staged-but-uncommitted file.
The first run of this storm PROVED that hazard real (a 3.2 s
first-batch JIT blew through a 2 s grace and the sink committed a
manifest with a dangling entry) — the sink now gates every commit on
staged-file existence UNDER THE TABLE LOCK (race-free vs vacuum's
locked sweep) and fails the epoch descriptively instead; the txn
marker stays unset, so a stream restart replays the batch.

Invariants proven after the storm — in BOTH outcomes (the stream
survives the whole window, or an epoch dies on the grace-floor error):
- exactly-once accounting: table row count == seed + (last committed
  epoch + 1) × rowsPerBatch (the txn marker is the ground truth);
- zero dangling manifest entries: every file every still-resolvable
  version references exists on storage;
- the vacuum process completed ≥ 3 sweeps with rc 0 (it really ran
  concurrently, and never crashed on a half-staged state).
"""

import os
import subprocess
import sys
import textwrap
import time

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog
from ducklake_kafka_connect_spark.sources.lake_datasource import (
    register_lake_datasource,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VACUUM_WORKER = textwrap.dedent(
    """
    import os, sys, time
    sys.path.insert(0, {repo!r})
    from ducklake_kafka_connect_spark.lake.table import LakeTable
    from ducklake_kafka_connect_spark.lake.maintenance import vacuum

    root, name, stop_file = sys.argv[1], sys.argv[2], sys.argv[3]
    t = LakeTable(None, root, name)
    sweeps = 0
    while not os.path.exists(stop_file):
        vacuum(t, keep_versions=2, orphan_grace_s=2.0)
        sweeps += 1
        time.sleep(0.05)
    vacuum(t, keep_versions=2, orphan_grace_s=2.0)  # final sweep
    print("VACUUM_DONE sweeps=%d" % (sweeps + 1))
    """
)


@pytest.mark.parametrize("backend", ["posix", "cas"])
def test_streaming_sink_vs_aggressive_vacuum(spark, tmp_path, backend):
    register_lake_datasource(spark)
    lake = str(tmp_path / f"lake_{backend}")
    ckpt = str(tmp_path / f"ckpt_{backend}")
    stop_file = str(tmp_path / f"stop_{backend}")
    cat = LakeCatalog(spark, lake, backend=backend)
    # pre-create so the vacuum worker never races table birth
    src0 = spark.range(1).select(
        F.col("id").alias("seq"), (F.col("id") * 7).alias("v")
    )
    src0.write.format("ducklake").option("path", lake).option(
        "table", "s"
    ).option("backend", backend).mode("append").save()

    proc = subprocess.Popen(
        [sys.executable, "-c", VACUUM_WORKER.format(repo=REPO), lake, "s", stop_file],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=dict(os.environ, DUCKLAKE_STORAGE_BACKEND=backend),
    )
    try:
        q = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 200)
            .load()
            .select(
                F.col("value").alias("seq"), (F.col("value") * 7).alias("v")
            )
            .writeStream.format("ducklake")
            .option("path", lake)
            .option("table", "s")
            .option("backend", backend)
            .option("txnAppId", "storm")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        grace_floor_hit = False
        deadline = time.time() + 8
        try:
            while time.time() < deadline and q.isActive:
                time.sleep(0.25)
            q.stop()
            q.awaitTermination(60)
        except Exception as e:  # noqa: BLE001 — outcome checked below
            if "vanished before commit" not in str(e):
                raise
            grace_floor_hit = True
    finally:
        open(stop_file, "w").close()
        out = proc.communicate(timeout=120)[0]
    assert proc.returncode == 0 and "VACUUM_DONE" in out, out
    sweeps = int(out.strip().rsplit("sweeps=", 1)[1])
    assert sweeps >= 3, f"vacuum barely ran ({out!r}) — not a stress"

    t = cat.table("s")
    m = t.manifest()
    epoch = m.props.get("txns", {}).get("storm")
    if grace_floor_hit and epoch is None:
        epoch = -1  # grace-floor error before ANY epoch committed
    assert epoch is not None, "no epoch committed and no grace-floor error"
    if not grace_floor_hit:
        assert int(epoch) >= 2, f"too few committed epochs for a stress: {epoch}"
    # exactly-once accounting: txn marker is truth, even when a later
    # epoch died on the grace-floor gate
    expected = 1 + (int(epoch) + 1) * 200  # seed row + committed batches
    assert t.read().count() == expected
    # zero dangling entries in ANY retained (still-resolvable) version
    for v in range(t.current_version() + 1):
        if not t.has_version(v):
            continue
        mv = t.manifest(v)
        missing = [
            f
            for f in mv.all_files()
            if not t.fs.exists(os.path.join(t.dir, f))
        ]
        assert not missing, f"v{v} dangles {missing[:3]} on {backend}"
    # the stream reader replays the surviving window without error
    assert t.read(version=t.current_version()).count() == expected
