"""Deterministic interleave coverage for the lock-free refs CAS chain
(root-cause of the r11 ``test_two_process_tag_edit_stress[posix]``
flake).

The chain's one structural hole: GC deletes superseded generation
objects, so their NAMES become create-able again. A writer stalled
between its tip LIST (gen N) and its CAS-create of ``g{N+1}`` can
"succeed" after the chain advanced ≥ REFS_GC_TAIL generations and GC
freed that name — landing its edit BELOW the tip (silent lost update,
exactly the once-seen stress failure: one missing tag, tip generation
one short). These tests force every interleave through the
``_refs_pre_cas_hook`` / ``_refs_post_cas_hook`` injection points
(mirroring ``CasLeaseLock.test_hook_pre_steal``) on BOTH backends and
pin the post-create tip-verification + ancestor-ring protocol that
closes it.

Reference parity note: the reference serializes ref edits behind its
PG row lock (ducklake-kafka-connect has no lock-free metadata path);
this chain is the object-store re-design, so its safety argument has
to be carried by these interleaves rather than by a lock.
"""

import json

import pytest
from pyspark.sql import functions as F

from ducklake_kafka_connect_spark.lake import LakeCatalog, LakeWriter
from ducklake_kafka_connect_spark.lake.table import LakeTable


@pytest.fixture(params=["posix", "cas"])
def tagged_table(spark, tmp_path, request):
    cat = LakeCatalog(spark, str(tmp_path / "lake"), backend=request.param)
    t = cat.table("t")
    LakeWriter(t, pk=["k"]).write(
        spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    )
    # independent handle = the "other process" (separate instance state)
    other = LakeTable(None, str(tmp_path / "lake"), "t", backend=t.fs)
    return t, other


def test_gen_reuse_after_gc_replays_edit(tagged_table):
    """THE flake: victim reads tip N, stalls; interloper advances the
    chain past N+TAIL so GC frees ``g{N+1}``; victim's CAS-create of the
    freed name succeeds below the tip. The post-create verification must
    detect the orphan (ancestor ring proves non-descent), retract it,
    and replay — the edit lands exactly once at the real tip."""
    t, other = tagged_table
    fired = {"n": 0}

    def stall_then_let_interloper_run(table, target):
        if fired["n"] == 0:
            fired["n"] = 1
            for i in range(t.REFS_GC_TAIL + 2):
                other.tag(f"interloper{i}", 0)

    t._refs_pre_cas_hook = stall_then_let_interloper_run
    try:
        t.tag("victim", 0)
    finally:
        t._refs_pre_cas_hook = None
    gen, tags = t._refs_tip()
    assert tags.get("victim") == 0, f"lost update: gen={gen} tags={sorted(tags)}"
    # linear chain: seed edits + retracted-then-replayed victim edit == tip gen
    assert gen == t.REFS_GC_TAIL + 3, (gen, sorted(tags))
    # the orphaned generation object must not survive as a stray
    assert t._refs_gens() == sorted(t._refs_gens())
    assert min(t._refs_gens()) > gen - t.REFS_GC_TAIL - 1


def test_lost_cas_replays_against_twice_advanced_tip(tagged_table):
    """A lost CAS replays the mutation against a tip that advanced TWICE
    during the stall — no interleaved edit is overwritten."""
    t, other = tagged_table
    fired = {"n": 0}

    def advance_twice(table, target):
        if fired["n"] == 0:
            fired["n"] = 1
            other.tag("first", 0)
            other.tag("second", 0)

    t._refs_pre_cas_hook = advance_twice
    try:
        t.tag("victim", 0)
    finally:
        t._refs_pre_cas_hook = None
    gen, tags = t._refs_tip()
    assert tags == {"first": 0, "second": 0, "victim": 0}
    assert gen == 3


def test_benign_descendants_confirmed_by_ancestor_ring(tagged_table):
    """The converse interleave: our create DID become the tip, then ≥TAIL
    descendants commit before our verification LIST (post-CAS hook). The
    ancestor ring must prove descent so we do NOT retract/replay — a
    replay here would resurrect a tag the descendants deleted."""
    t, other = tagged_table
    fired = {"n": 0}

    def descendants_land(table, target):
        if fired["n"] == 0:
            fired["n"] = 1
            other.delete_tag("victim")  # conflicting later edit
            for i in range(t.REFS_GC_TAIL + 2):
                other.tag(f"desc{i}", 0)

    t._refs_post_cas_hook = descendants_land
    try:
        t.tag("victim", 0)
    finally:
        t._refs_post_cas_hook = None
    gen, tags = t._refs_tip()
    # real-time order: set(victim) → delete(victim) → desc* — victim stays deleted
    assert "victim" not in tags, f"replay resurrected a deleted tag: {sorted(tags)}"
    assert gen == 1 + 1 + (t.REFS_GC_TAIL + 2)
    assert {f"desc{i}" for i in range(t.REFS_GC_TAIL + 2)} <= set(tags)


def test_two_stale_writers_race_one_freed_name(tagged_table):
    """Both processes stall at the same observed tip and race the SAME
    freed generation name: exactly one CAS wins it, both edits land."""
    t, other = tagged_table
    import os

    filler = LakeTable(None, os.path.dirname(t.dir), "t", backend=t.fs)
    fired = {"t": 0, "o": 0}

    def stall_t(table, target):
        if fired["t"] == 0:
            fired["t"] = 1
            for i in range(t.REFS_GC_TAIL + 2):
                filler.tag(f"fill{i}", 0)
            # the second stale writer now attempts the same freed name
            other.tag("from_other", 0)

    t._refs_pre_cas_hook = stall_t
    try:
        t.tag("from_t", 0)
    finally:
        t._refs_pre_cas_hook = None
    gen, tags = t._refs_tip()
    assert tags.get("from_t") == 0 and tags.get("from_other") == 0, sorted(tags)
    assert gen == t.REFS_GC_TAIL + 4


def test_gc_min_age_floor_keeps_young_gens(tagged_table, monkeypatch):
    """With REFS_GC_MIN_AGE_S set, young superseded generations survive
    GC (so their names cannot be reused within the floor), and GC
    resumes once they age out (floor 0 restores the tail bound)."""
    t, _ = tagged_table
    monkeypatch.setattr(LakeTable, "REFS_GC_MIN_AGE_S", 3600.0)
    for i in range(t.REFS_GC_TAIL + 4):
        t.tag(f"young{i}", 0)
    assert len(t._refs_gens()) == t.REFS_GC_TAIL + 4  # nothing GC'd
    monkeypatch.setattr(LakeTable, "REFS_GC_MIN_AGE_S", 0.0)
    t.tag("old", 0)
    assert len(t._refs_gens()) <= t.REFS_GC_TAIL


def test_refs_objects_carry_id_and_bounded_ancestor_ring(tagged_table):
    t, _ = tagged_table
    for i in range(3):
        t.tag(f"r{i}", 0)
    gen = t._refs_tip()[0]
    obj = json.loads(t.fs.read_bytes(t._refs_gen_path(gen)))
    assert obj["id"] and len(obj["ancestors"]) == gen - 1
    assert len(obj["ancestors"]) <= t.REFS_ANCESTOR_RING


def test_legacy_refs_object_upgrades_into_chain(spark, tmp_path):
    """A pre-chain ``refs.json`` (no id/ancestors) reads as generation 0
    and is superseded — and a conservative retract/replay handles a tip
    that is still a legacy-format object."""
    cat = LakeCatalog(spark, str(tmp_path / "lake"))
    t = cat.table("t")
    LakeWriter(t, pk=["k"]).write(
        spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    )
    t.fs.put(t._refs_path, json.dumps({"tags": {"legacy": 0}}))
    assert t.tags() == {"legacy": 0}
    t.tag("modern", 0)
    gen, tags = t._refs_tip()
    assert gen == 1 and tags == {"legacy": 0, "modern": 0}
    assert not t.fs.exists(t._refs_path)
