"""Object-store (CAS) lake-storage backend: the commit protocol a real
S3/GCS deployment needs — create-if-absent versioned manifests as the
transaction, LIST-derived current version (LATEST is a hint), and a
lease lock built from the same conditional-PUT primitive instead of
flock. Mirrors the reference's S3 DATA_PATH + PostgreSQL-catalog commit
shape (``connect/DucklakeConnectionFactory.java:36-95``) with the PG
serialization-conflict retry (``:68-70``) re-expressed as a storage CAS.
"""

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.backend import (
    CasLeaseLock,
    CasObjectStoreBackend,
    PosixBackend,
    resolve_backend,
)
from ducklake_kafka_connect_spark.lake.maintenance import vacuum
from ducklake_kafka_connect_spark.lake.table import CommitConflict, LakeTable, Manifest


def _cat(spark, tmp_path, **kw):
    return LakeCatalog(spark, str(tmp_path / "lake"), backend="cas", **kw)


# ---------- primitive semantics ----------


def test_put_if_absent_is_create_once(tmp_path):
    fs = CasObjectStoreBackend()
    p = str(tmp_path / "obj")
    assert fs.put_if_absent(p, b"first") is True
    assert fs.put_if_absent(p, b"second") is False
    assert fs.read_bytes(p) == b"first"
    # plain PUT overwrites (hint semantics)
    fs.put(p, b"third")
    assert fs.read_bytes(p) == b"third"


def test_put_if_absent_race_has_one_winner(tmp_path):
    fs = CasObjectStoreBackend()
    p = str(tmp_path / "contested")
    wins = []
    barrier = threading.Barrier(8)

    def contender(i):
        barrier.wait()
        if fs.put_if_absent(p, f"writer-{i}".encode()):
            wins.append(i)

    ts = [threading.Thread(target=contender, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1
    assert fs.read_bytes(p) == f"writer-{wins[0]}".encode()


def test_resolve_backend_env_and_errors(monkeypatch):
    assert isinstance(resolve_backend(None), PosixBackend)
    monkeypatch.setenv("DUCKLAKE_STORAGE_BACKEND", "cas")
    assert isinstance(resolve_backend(None), CasObjectStoreBackend)
    with pytest.raises(ValueError, match="unknown storage backend"):
        resolve_backend("hdfs-classic")
    inst = CasObjectStoreBackend()
    assert resolve_backend(inst) is inst


# ---------- lease lock ----------


def _lease_names(fs, tmp_path):
    return [n for n in fs.list_names(str(tmp_path)) if n.startswith("LOCK.lease")]


def test_lease_lock_mutual_exclusion_and_timeout(tmp_path):
    fs = CasObjectStoreBackend()
    path = str(tmp_path / "LOCK.lease")
    with CasLeaseLock(fs, path, timeout=5.0, ttl=60.0) as lk:
        assert lk.gen == 1
        assert fs.exists(lk._gen_path(1))
        with pytest.raises(CommitConflict, match="Timed out"):
            with CasLeaseLock(fs, path, timeout=0.3, ttl=60.0):
                pass
    # released on exit: no lease generation objects remain
    assert _lease_names(fs, tmp_path) == []


def test_lease_lock_steals_expired_holder(tmp_path):
    """A crashed holder's lease (expiry passed) is stolen instead of
    deadlocking — the bounded-damage story flock gets from the kernel.
    A legacy un-numbered lease object is generation 0; the steal
    CAS-creates generation 1 and garbage-collects the corpse."""
    fs = CasObjectStoreBackend()
    path = str(tmp_path / "LOCK.lease")
    fs.put_if_absent(
        path, json.dumps({"holder": "dead-process", "expires": time.time() - 5})
    )
    t0 = time.monotonic()
    with CasLeaseLock(fs, path, timeout=5.0, ttl=60.0) as lk:
        assert lk.gen == 1
        assert json.loads(fs.read_bytes(lk._gen_path(1)))["holder"] == lk.holder
        assert not fs.exists(path), "superseded gen-0 corpse is GC'd"
    assert time.monotonic() - t0 < 2.0


def test_lease_release_respects_new_holder(tmp_path):
    """Release deletes exactly the releaser's OWN generation object — a
    thief's newer generation survives untouched (the old read-check-
    delete window is structurally gone)."""
    fs = CasObjectStoreBackend()
    path = str(tmp_path / "LOCK.lease")
    lk = CasLeaseLock(fs, path, timeout=1.0, ttl=60.0)
    lk.__enter__()
    # a thief superseded us with a higher generation (post-expiry steal)
    thief_path = lk._gen_path(2)
    fs.put_if_absent(thief_path, json.dumps({"holder": "thief", "expires": time.time() + 60}))
    lk.__exit__(None, None, None)
    assert fs.exists(thief_path), "release must not delete another holder's lease"
    assert _lease_names(fs, tmp_path) == [os.path.basename(thief_path)]
    fs.delete(thief_path)


def test_lease_steal_race_single_holder_deterministic(tmp_path):
    """THE fencing theorem, forced deterministically: two stealers both
    observe the same expired lease; the old delete-then-create protocol
    let the slow stealer delete the fast stealer's fresh lease
    (delete1 -> create1 -> delete2 -> create2 = two holders). With
    generation fencing both race on ONE conditional PUT of g{N+1}; the
    interleave is forced with a hook between observe and steal."""
    fs = CasObjectStoreBackend()
    path = str(tmp_path / "LOCK.lease")
    fs.put_if_absent(
        path, json.dumps({"holder": "dead", "expires": time.time() - 5})
    )
    a_observed = threading.Event()
    b_done = threading.Event()
    results = {}

    slow = CasLeaseLock(fs, path, timeout=1.5, ttl=60.0)

    def slow_hook(lock, target_gen):
        if not a_observed.is_set():
            results["slow_target"] = target_gen
            a_observed.set()
            # hold here until the fast stealer has fully taken the lease
            assert b_done.wait(10)

    slow.test_hook_pre_steal = slow_hook

    def run_slow():
        try:
            slow.__enter__()
            results["slow_acquired"] = True
            slow.__exit__(None, None, None)
        except CommitConflict:
            results["slow_acquired"] = False

    t = threading.Thread(target=run_slow)
    t.start()
    assert a_observed.wait(10)  # slow stealer has observed expired g0
    fast = CasLeaseLock(fs, path, timeout=5.0, ttl=60.0)
    fast.__enter__()  # fast stealer completes its whole steal
    assert fast.gen == 2 or fast.gen == 1
    b_done.set()
    t.join(timeout=15)
    assert not t.is_alive()
    # single holder: the slow stealer MUST have lost (its CAS on the same
    # generation fails, and the re-scan finds an unexpired lease)
    assert results["slow_acquired"] is False
    assert json.loads(fs.read_bytes(fast._gen_path(fast.gen)))["holder"] == fast.holder
    fast.__exit__(None, None, None)
    assert _lease_names(fs, tmp_path) == []


def test_lease_renewal_and_loss_detection(tmp_path):
    """ttl-expiry asymmetry vs flock, closed: a holder that renews keeps
    the lock past the ttl; a holder that stalls loses it to a stealer
    and renew()/assert_held() report the loss instead of silently
    double-holding."""
    from ducklake_kafka_connect_spark.lake.backend import LeaseConflict

    fs = CasObjectStoreBackend()
    path = str(tmp_path / "LOCK.lease")
    # renewing holder survives several ttl windows
    with CasLeaseLock(fs, path, timeout=2.0, ttl=0.4) as lk:
        for _ in range(3):
            time.sleep(0.25)
            lk.renew()
        # still the authoritative lease after 0.75s > ttl
        lk.assert_held()
        with pytest.raises(CommitConflict, match="Timed out"):
            with CasLeaseLock(fs, path, timeout=0.2, ttl=60.0):
                pass
    # stalled holder: stealer takes over after expiry; loss is detected
    lk = CasLeaseLock(fs, path, timeout=2.0, ttl=0.2)
    lk.__enter__()
    time.sleep(0.3)
    with CasLeaseLock(fs, path, timeout=2.0, ttl=60.0) as thief:
        assert thief.gen == lk.gen + 1
        with pytest.raises(LeaseConflict, match="lost|superseded"):
            lk.renew()
    # the stalled holder's exit must not disturb anything further
    lk.__exit__(None, None, None)
    assert _lease_names(fs, tmp_path) == []


# ---------- clone-vs-vacuum handshake ----------

VACUUM_WORKER = """
import os, sys, time
sys.path.insert(0, {repo!r})
from ducklake_kafka_connect_spark.lake.table import LakeTable
from ducklake_kafka_connect_spark.lake.maintenance import vacuum

root, flag_read, flag_go = sys.argv[1], sys.argv[2], sys.argv[3]
t = LakeTable(None, root, "t")  # backend from $DUCKLAKE_STORAGE_BACKEND
orig_tags = t.tags
def hooked_tags():
    out = orig_tags()
    open(flag_read, "w").write("tags-read")   # retention decision made
    while not os.path.exists(flag_go):        # hold before the deletes
        time.sleep(0.01)
    return out
t.tags = hooked_tags
print("DELETED=" + str(vacuum(t, keep_versions=1)))
print("WORKER_DONE")
"""


def test_clone_pin_vs_vacuum_interleave_two_process(spark, tmp_path):
    """The adversarial interleave the VACUUM.intent handshake exists
    for, forced deterministically across two OS processes: vacuum (its
    own process) reads tags and STALLS before deleting; a pin clone then
    lands its tag (too late for this vacuum's retention set), observes
    the intent, and blocks; vacuum deletes the cloned version's files
    and finishes; the clone's deferred validation now sees the loss,
    FAILS CLEANLY and rolls back its pin — no committed clone ever
    references vacuumed files, and no stray tag survives."""
    import subprocess
    import sys as _sys

    lake_dir = str(tmp_path / "lake")
    cat = _cat(spark, tmp_path)
    t = cat.table("t")
    w = LakeWriter(t, pk=["id"])
    w.write(spark.range(100).select(F.col("id"), F.lit("a").alias("v")))
    v_first = t.current_version()
    # rewrite every row so v_first's files are unreferenced at the tip
    w.write(spark.range(100).select(F.col("id"), F.lit("b").alias("v")))
    flag_read = str(tmp_path / "tags_read.flag")
    flag_go = str(tmp_path / "vacuum_go.flag")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [_sys.executable, "-c", VACUUM_WORKER.format(repo=repo),
         lake_dir, flag_read, flag_go],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=dict(os.environ, DUCKLAKE_STORAGE_BACKEND="cas"),
    )
    try:
        deadline = time.monotonic() + 60
        while not os.path.exists(flag_read):
            assert time.monotonic() < deadline, "vacuum worker never read tags"
            time.sleep(0.01)
        # vacuum has decided retention; now the clone pins (too late)
        clone_err = []

        def run_clone():
            try:
                t.clone(str(tmp_path / "clones"), "c", version=v_first, pin=True)
                clone_err.append(None)
            except Exception as e:
                clone_err.append(e)

        th = threading.Thread(target=run_clone)
        th.start()
        # wait until the pin tag is visible, then release the vacuum
        while "clone-c" not in t.tags():
            assert time.monotonic() < deadline
            time.sleep(0.01)
        assert t._vacuum_intent_active(), "clone must be gated on the intent"
        open(flag_go, "w").write("go")
        out, _ = proc.communicate(timeout=120)
        th.join(timeout=120)
        assert not th.is_alive()
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "WORKER_DONE" in out, out
    deleted = int(next(l for l in out.splitlines() if l.startswith("DELETED=")).split("=")[1])
    assert deleted >= 1, "vacuum must have deleted the unpinned v_first files"
    # the clone failed CLEANLY: explicit error, no committed clone, pin rolled back
    assert clone_err and isinstance(clone_err[0], ValueError), clone_err
    assert "vacuum" in str(clone_err[0])
    dest = LakeTable(spark, str(tmp_path / "clones"), "c", backend="cas")
    assert not dest.exists(), "a failed clone must not leave a committed manifest"
    assert "clone-c" not in t.tags(), "failed clone must roll back its pin tag"
    assert not t._vacuum_intent_active(), "intent cleared after vacuum"
    # tip unaffected
    assert t.read().count() == 100


def test_clone_pin_before_vacuum_survives(spark, tmp_path):
    """The safe ordering: pin lands before vacuum's retention read →
    the pinned version's files are retention roots and the clone stays
    fully readable after an aggressive vacuum."""
    cat = _cat(spark, tmp_path)
    t = cat.table("t")
    w = LakeWriter(t, pk=["id"])
    w.write(spark.range(100).select(F.col("id"), F.lit("a").alias("v")))
    v_first = t.current_version()
    w.write(spark.range(100).select(F.col("id"), F.lit("b").alias("v")))
    dest = t.clone(str(tmp_path / "clones"), "c", version=v_first, pin=True)
    deleted = vacuum(t, keep_versions=1)
    assert deleted == 0, "pinned files are retention roots"
    rows = {r["id"]: r["v"] for r in dest.read().collect()}
    assert len(rows) == 100 and set(rows.values()) == {"a"}


# ---------- table lifecycle on the CAS backend ----------


def test_create_append_merge_read_roundtrip(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    t = cat.table("events")
    w = LakeWriter(t, pk=["id"])
    w.write(
        spark.range(0, 100).select(
            F.col("id"), F.concat(F.lit("a"), F.col("id")).alias("name")
        )
    )
    w.write(
        spark.range(50, 150).select(
            F.col("id"), F.concat(F.lit("b"), F.col("id")).alias("name")
        )
    )
    rows = {r["id"]: r["name"] for r in t.read().collect()}
    assert len(rows) == 150
    assert rows[10] == "a10" and rows[60] == "b60" and rows[140] == "b140"
    # no flock LOCK artifact is load-bearing; all lease gens released
    assert not any(
        n.startswith("LOCK.lease") for n in t.fs.list_names(t.meta_dir)
    )
    # version chain is linear and fully resolvable
    for v in range(t.current_version() + 1):
        assert t.manifest(v).version == v


def test_current_version_survives_stale_latest_hint(spark, tmp_path):
    """A writer dying between the segment CAS and the LATEST PUT leaves a
    stale/regressed hint; readers must derive the tip from LIST."""
    cat = _cat(spark, tmp_path)
    t = cat.table("t")
    w = LakeWriter(t, pk=["id"])
    for lo in (0, 10, 20):
        w.write(
            spark.range(lo, lo + 10).select(
                F.col("id"), F.lit("x").alias("v")
            )
        )
    tip = t.current_version()
    assert tip >= 2
    # simulate the crash window: regress the hint
    t.fs.put(os.path.join(t.meta_dir, "LATEST"), "0")
    assert t.current_version() == tip
    assert t.read().count() == 30
    # posix would have trusted the pointer — pin the divergence
    posix_view = LakeTable(spark, str(tmp_path / "lake"), "t", backend="posix")
    assert posix_view.current_version() == 0


def test_commit_cas_single_winner(spark, tmp_path):
    """Two writers that planned the SAME version: the conditional PUT of
    v{N} admits exactly one; the loser gets CommitConflict (the
    reference's PG serialization conflict, DucklakeConnectionFactory.java:68-70)."""
    cat = _cat(spark, tmp_path)
    t = cat.table("t")
    t.create(spark.range(1).select(F.col("id")).schema, pk=[])
    base = t.manifest()

    def planned(tag):
        return Manifest(
            version=base.version + 1,
            schema=base.schema,
            pk=base.pk,
            partition_spec=base.partition_spec,
            files={},
            parent=base.version,
            props={"last_op": tag},
            file_stats={},
        )

    t._commit(planned("winner"), parent_manifest=base)
    with pytest.raises(CommitConflict, match="already committed|lost the commit CAS"):
        t._commit(planned("loser"), parent_manifest=base)
    assert t.manifest().props["last_op"] == "winner"


def test_concurrent_writers_lose_nothing(spark, tmp_path):
    """Two in-process writers (separate LakeWriter instances, shared
    table) interleaving MERGEs through the lease + CAS protocol: linear
    chain, all rows survive, latest value wins per key."""
    cat = _cat(spark, tmp_path)
    t = cat.table("t")
    LakeWriter(t, pk=["id"]).write(
        spark.range(0, 50).select(F.col("id"), F.lit("seed").alias("name"))
    )
    errs = []

    def writer(lo, hi, tag):
        try:
            w = LakeWriter(cat.table("t"), pk=["id"])
            for start in range(lo, hi, 25):
                w.write(
                    spark.range(start, start + 25).select(
                        F.col("id"),
                        F.concat(F.lit(tag), F.col("id")).alias("name"),
                    )
                )
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(100, 200, "p"))
    t2 = threading.Thread(target=writer, args=(300, 400, "q"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    rows = {r["id"]: r["name"] for r in t.read().collect()}
    assert len(rows) == 50 + 100 + 100
    assert all(rows[i] == f"p{i}" for i in range(100, 200))
    assert all(rows[i] == f"q{i}" for i in range(300, 400))
    for v in range(t.current_version() + 1):
        assert t.manifest(v).version == v


def test_vacuum_time_travel_restore_on_cas(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    t = cat.table("t")
    w = LakeWriter(t, pk=["id"])
    for lo in (0, 100, 200):
        w.write(
            spark.range(lo, lo + 100).select(
                F.col("id"), (F.col("id") * 2).alias("v")
            )
        )
    v_mid = t.current_version() - 1
    assert t.read(version=v_mid).count() == 200  # time travel pre-vacuum
    restored = t.restore(v_mid)
    assert t.read().count() == 200 and restored == t.current_version()
    deleted = vacuum(t, keep_versions=1)
    assert deleted >= 0
    assert t.read().count() == 200
    # vacuumed history is gone; the tip still resolves by LIST
    assert t.current_version() == restored


def test_ddl_dml_surface_on_cas(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.ddl("CREATE TABLE docs (id BIGINT, body STRING)")
    assert cat.table_exists("docs")
    t = cat.table("docs")
    LakeWriter(t, pk=[]).append(
        spark.range(5).select(F.col("id"), F.lit("text").alias("body"))
    )
    assert t.read().count() == 5
    cat.ddl("TRUNCATE TABLE docs")
    assert cat.table("docs").read().count() == 0
    cat.ddl("DROP TABLE docs")
    assert not cat.table_exists("docs")


def test_binary_manifest_format_on_cas(spark, tmp_path):
    cat = LakeCatalog(
        spark, str(tmp_path / "lake_b"), manifest_format="binary", backend="cas"
    )
    t = cat.table("t")
    w = LakeWriter(t, pk=["id"])
    for lo in (0, 30):
        w.write(
            spark.range(lo, lo + 30).select(F.col("id"), F.lit("x").alias("v"))
        )
    assert t.read().count() == 60
    meta = t.fs.list_names(t.meta_dir)
    assert not any(f.startswith("v") and f.endswith(".json") for f in meta)
    for v in range(t.current_version() + 1):
        assert t.manifest(v).version == v


def test_expired_holder_cannot_renew_even_before_steal(tmp_path):
    """ADVICE r11 #3: renew()/assert_held() must self-check the holder's
    own expiry — a holder stalled past TTL could otherwise rewrite its
    expired generation in the window BEFORE any thief CAS-creates the
    next one, extending an expiry a thief may already have observed as
    expired (contradicting the protocol invariant)."""
    from ducklake_kafka_connect_spark.lake.backend import LeaseConflict

    fs = CasObjectStoreBackend()
    path = str(tmp_path / "LOCK.lease")
    lk = CasLeaseLock(fs, path, timeout=2.0, ttl=0.2)
    lk.__enter__()
    time.sleep(0.3)  # stall past TTL; NO thief exists yet
    with pytest.raises(LeaseConflict, match="expired"):
        lk.renew()
    assert lk._held is False
    lk2 = CasLeaseLock(fs, path, timeout=2.0, ttl=0.2)
    lk2.__enter__()
    time.sleep(0.3)
    with pytest.raises(LeaseConflict, match="expired"):
        lk2.assert_held()
    lk2.__exit__(None, None, None)
    lk.__exit__(None, None, None)
