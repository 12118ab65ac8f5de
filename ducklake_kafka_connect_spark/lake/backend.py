"""Pluggable lake-storage backends: the manifest/commit I/O surface.

The reference deploys its lake on S3/GCS with a PostgreSQL catalog doing
the transactional commit (``connect/DucklakeConnectionFactory.java:36-95``
wires DATA_PATH + the PG catalog; ``:68-70`` is the serialization-conflict
retry knob). This engine's catalog is the manifest chain itself, so the
deployment question becomes: what are the storage primitives a commit
needs, and which stores provide them?

Two answers, one interface:

- :class:`PosixBackend` — a shared POSIX filesystem (local disk, NFS).
  Atomic publish is ``tmp + rename``; the commit critical section is an
  ``fcntl.flock`` advisory lock (kernel-owned: released on process death,
  no stale-lock TOCTOU).

- :class:`CasObjectStoreBackend` — an object store with conditional PUT
  (S3 ``If-None-Match: *``, GCS ``x-goods-if-generation-match: 0``).
  Object stores have no rename and no advisory locks; what they DO have
  is create-if-absent. The commit transaction therefore becomes a CAS on
  the versioned manifest object itself: whoever creates ``v{N}`` first
  owns version N, the loser gets :class:`~.table.CommitConflict` and
  replans against the advanced manifest (exactly the reference's PG
  serialization-conflict retry loop, re-expressed on storage). The
  ``LATEST`` pointer degrades to a last-writer-wins HINT — readers
  derive the current version from a LIST of the manifest prefix, never
  from the hint. Multi-step read-modify-write sections that are not
  single-object CAS (vacuum; historically tag edits, now a lock-free
  refs CAS chain) additionally take a lease lock built from the same
  create-if-absent primitive (the public S3-conditional-put mutex
  pattern): generation-numbered ``LOCK.lease.g{N}`` objects carrying
  holder + expiry — steal = CAS-create of the next generation after
  expiry (fenced: one conditional PUT decides), release = delete of
  one's own generation only, renewal heartbeats for long sections.

  The local implementation here is an EMULATION rooted at a directory —
  every method documents the object-store call it stands in for, and
  nothing outside this class assumes rename or flock exist. Data-plane
  bytes (parquet) already travel through Spark/Hadoop and pyarrow, both
  of which speak s3a:// / gs:// natively once the jars of a real cluster
  are present (``storage.apply_storage_conf`` wires the fs.s3a.* conf);
  it is only the COMMIT protocol that needed re-founding, and that is
  what this module owns.

Selection: explicit ``backend=`` on LakeTable/LakeCatalog, else
``$DUCKLAKE_STORAGE_BACKEND`` (``posix`` | ``cas``), default posix.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


class LeaseConflict(RuntimeError):
    pass


class StorageBackend:
    """Small-object + file-level storage surface for the lake.

    Paths are plain strings (local emulation: absolute local paths; a
    real object-store subclass would take bucket-relative keys). All
    methods are synchronous and raise ``FileNotFoundError`` for missing
    required objects.
    """

    name = "abstract"

    # ---- small-object I/O (manifests, pointers, refs) ----

    def read_bytes(self, path: str) -> bytes:  # GET
        raise NotImplementedError

    def try_read_bytes(self, path: str) -> bytes | None:
        try:
            return self.read_bytes(path)
        except FileNotFoundError:
            return None

    def exists(self, path: str) -> bool:  # HEAD
        raise NotImplementedError

    def put(self, path: str, payload: "bytes | str") -> None:  # PUT
        """Atomic publish, overwrite allowed: readers see the old object
        or the complete new one, never a partial write."""
        raise NotImplementedError

    def put_if_absent(self, path: str, payload: "bytes | str") -> bool:
        """Conditional PUT (create-if-absent). True if this call created
        the object; False if it already existed. THE commit primitive."""
        raise NotImplementedError

    def delete(self, path: str, missing_ok: bool = True) -> None:  # DELETE
        raise NotImplementedError

    # ---- listing ----

    def list_names(self, dirpath: str) -> list[str]:
        """Immediate child object names under a prefix (LIST with
        delimiter). [] if the prefix is empty/absent."""
        raise NotImplementedError

    def walk_files(self, dirpath: str) -> list[str]:
        """All file paths under a prefix, relative to it (recursive
        LIST). [] if absent."""
        raise NotImplementedError

    # ---- file-level data ops (clone / add_files / vacuum) ----

    def copy_file(self, src: str, dst: str) -> None:  # server-side COPY
        raise NotImplementedError

    def file_size(self, path: str) -> int:  # HEAD content-length
        raise NotImplementedError

    def file_mtime(self, path: str) -> float:  # HEAD Last-Modified
        """Epoch seconds of last modification (vacuum's orphan-grace
        check for never-referenced, possibly in-flight staged files)."""
        raise NotImplementedError

    def ensure_dir(self, path: str) -> None:
        """mkdir -p where directories are real; no-op on a pure object
        store (prefixes need no creation)."""
        raise NotImplementedError

    def remove_empty_dirs(self, dirpath: str, min_age_s: float = 0.0) -> None:
        """Prune empty subdirectories bottom-up; no-op on object stores.
        ``min_age_s`` skips recently-modified dirs (concurrent-stage
        guard, see the local mixin)."""
        raise NotImplementedError

    def delete_tree(self, dirpath: str) -> None:
        """Recursive delete of a prefix (batch DELETE on object stores)."""
        raise NotImplementedError

    # ---- commit protocol ----

    #: True → version-segment create is itself the transaction (readers
    #: must derive the current version by LISTing, not trust LATEST).
    cas_commits = False

    def commit_lock(self, meta_dir: str, timeout: float = 60.0):
        """Context manager serializing a read-modify-write critical
        section on one table."""
        raise NotImplementedError


def _write_local_atomic(path: str, payload: "bytes | str") -> None:
    tmp = path + f".{uuid.uuid4().hex[:8]}.tmp"
    mode = "wb" if isinstance(payload, bytes) else "w"
    with open(tmp, mode) as f:
        f.write(payload)
    os.replace(tmp, path)


def _create_if_absent_local(path: str, payload: "bytes | str") -> bool:
    """Atomic create-if-absent on POSIX: publish complete content under a
    tmp name, then ``os.link`` it to the final name — link fails with
    EEXIST if the object exists, and readers can never observe a partial
    object (the link appears only after the bytes are durable)."""
    tmp = path + f".{uuid.uuid4().hex[:8]}.tmp"
    mode = "wb" if isinstance(payload, bytes) else "w"
    with open(tmp, mode) as f:
        f.write(payload)
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


class _LocalFilesMixin(StorageBackend):
    """Shared local-FS method bodies (both backends emulate on a local
    directory in this image; a real S3 subclass replaces every body)."""

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str, missing_ok: bool = True) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def list_names(self, dirpath: str) -> list[str]:
        try:
            return sorted(os.listdir(dirpath))
        except FileNotFoundError:
            return []

    def walk_files(self, dirpath: str) -> list[str]:
        out: list[str] = []
        for dp, _dn, fns in os.walk(dirpath):
            for fn in fns:
                out.append(os.path.relpath(os.path.join(dp, fn), dirpath))
        return sorted(out)

    def copy_file(self, src: str, dst: str) -> None:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)

    def delete_tree(self, dirpath: str) -> None:
        shutil.rmtree(dirpath, ignore_errors=True)

    def file_size(self, path: str) -> int:
        return os.path.getsize(path)

    def file_mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def ensure_dir(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove_empty_dirs(self, dirpath: str, min_age_s: float = 0.0) -> None:
        """Prune empty subdirectories bottom-up. ``min_age_s`` skips
        directories modified more recently than that: a concurrent
        writer's just-created staging dir is EMPTY for the instant
        between mkdir and its first file open, and pruning it in that
        window kills the writer's task (found by
        tests/test_sink_vacuum_stress.py); a transient empty dir is
        always YOUNG, so the age guard removes the race without leaking
        genuinely abandoned dirs past the grace window."""
        now = time.time()
        for dp, dns, fns in os.walk(dirpath, topdown=False):
            if not dns and not fns and dp != dirpath:
                try:
                    if min_age_s > 0 and now - os.path.getmtime(dp) < min_age_s:
                        continue
                    os.rmdir(dp)
                except OSError:
                    pass


class PosixBackend(_LocalFilesMixin):
    """Shared-POSIX-filesystem backend: rename is atomic, flock exists.
    Byte-for-byte the engine's original behavior."""

    name = "posix"
    cas_commits = False

    def put(self, path: str, payload: "bytes | str") -> None:
        _write_local_atomic(path, payload)

    def put_if_absent(self, path: str, payload: "bytes | str") -> bool:
        return _create_if_absent_local(path, payload)

    def commit_lock(self, meta_dir: str, timeout: float = 60.0):
        from .table import TableLock

        os.makedirs(meta_dir, exist_ok=True)
        return TableLock(os.path.join(meta_dir, "LOCK"), timeout=timeout)


class CasLeaseLock:
    """Fenced mutex from create-if-absent alone (no flock, no rename).

    Leases are GENERATION-NUMBERED objects ``{path}.g{N}`` created with
    conditional PUT; the authoritative lease is the HIGHEST generation,
    and a generation object is never overwritten by anyone but its own
    creator (renewal). The protocol:

    - **acquire**: LIST the lease prefix. No lease → CAS-create ``g1``.
      Highest gen unexpired → poll. Highest gen EXPIRED → steal by
      CAS-creating ``g{N+1}`` — never delete-then-create, so two
      stealers that both observed the expired ``g{N}`` race on ONE
      conditional PUT and exactly one wins (If-Match semantics built
      from the only primitive the store guarantees). The winner then
      garbage-collects gens ≤ N, which are expired-forever by the
      invariant below.
    - **release**: delete exactly your OWN generation object — a
      releaser can never remove a thief's newer lease (the old
      read-check-delete window is gone; there is nothing to check).
    - **renew** (:meth:`renew`): the holder overwrites its own gen
      object with a fresh expiry, then verifies it is still the highest
      gen — if a thief CAS'd a higher gen in the meantime the lock was
      lost and :class:`LeaseConflict` is raised. Long critical sections
      call :meth:`renew`/:meth:`assert_held` at checkpoints (and before
      their destructive step), closing the 60 s-TTL asymmetry vs flock.

    Invariant making GC/steal safe: a new generation is only ever
    created when the previous highest was EXPIRED (or absent), and
    expiry timestamps in superseded objects are never extended (renewal
    rewrites only the CURRENT highest gen, and detects supersession), so
    every gen below the highest is expired forever.

    Expiry bounds the damage of a crashed holder, exactly like the
    reference's PG lock timeout. A legacy un-numbered ``{path}`` object
    (pre-fencing layout) is treated as generation 0.
    """

    def __init__(self, backend: StorageBackend, path: str, timeout: float = 60.0, ttl: float = 60.0):
        self.backend = backend
        self.path = path
        self.timeout = timeout
        self.ttl = ttl
        self.holder = uuid.uuid4().hex
        self.gen: int | None = None
        self._held = False
        #: test hook: called as f(lock, target_gen) between observing an
        #: expired lease and attempting the steal CAS — lets a test force
        #: the two-stealer interleave deterministically.
        self.test_hook_pre_steal = None

    def _gen_path(self, gen: int) -> str:
        return self.path if gen == 0 else f"{self.path}.g{gen:08d}"

    def _scan(self) -> "tuple[int | None, dict | None]":
        """(highest generation, its decoded payload). ``(None, None)`` if
        no lease object exists; payload ``None`` if the object vanished
        between LIST and GET (caller re-scans)."""
        d = os.path.dirname(self.path)
        base = os.path.basename(self.path)
        gens = []
        for n in self.backend.list_names(d):
            if n == base:
                gens.append(0)
            elif n.startswith(base + ".g") and n[len(base) + 2:].isdigit():
                gens.append(int(n[len(base) + 2:]))
        if not gens:
            return None, None
        top = max(gens)
        raw = self.backend.try_read_bytes(self._gen_path(top))
        if raw is None:
            return top, None
        try:
            return top, json.loads(raw)
        except (ValueError, TypeError):
            return top, {}

    def _payload(self) -> str:
        return json.dumps({"holder": self.holder, "expires": time.time() + self.ttl})

    def _gc_below(self, gen: int) -> None:
        """Delete superseded generations (< ``gen``): all expired forever
        by the protocol invariant, so removal cannot change who holds."""
        d = os.path.dirname(self.path)
        base = os.path.basename(self.path)
        for n in self.backend.list_names(d):
            if n == base and gen > 0:
                self.backend.delete(self.path)
            elif n.startswith(base + ".g") and n[len(base) + 2:].isdigit():
                if int(n[len(base) + 2:]) < gen:
                    self.backend.delete(os.path.join(d, n))

    def __enter__(self):
        from .table import CommitConflict

        deadline = time.monotonic() + self.timeout
        while True:
            top, payload = self._scan()
            if top is None:
                target = 1
            elif payload is None:
                # vanished between LIST and GET (release/GC race) — re-scan
                if time.monotonic() > deadline:
                    raise CommitConflict(f"Timed out acquiring lease lock {self.path}")
                continue
            else:
                try:
                    expires = float(payload.get("expires", 0))
                except (ValueError, TypeError):
                    expires = 0.0
                if time.time() <= expires:
                    if time.monotonic() > deadline:
                        raise CommitConflict(f"Timed out acquiring lease lock {self.path}")
                    time.sleep(0.05)
                    continue
                target = top + 1
                if self.test_hook_pre_steal is not None:
                    self.test_hook_pre_steal(self, target)
            if self.backend.put_if_absent(self._gen_path(target), self._payload()):
                self.gen = target
                self._held = True
                self._gc_below(target)
                return self
            # lost the steal/create CAS — someone else holds; loop

    def _top_gen(self) -> "int | None":
        top, _ = self._scan()
        return top

    def assert_held(self) -> None:
        """Raise :class:`LeaseConflict` if this lock is no longer the
        authoritative lease (stolen after expiry, released, or — new —
        EXPIRED while still unstolen). The expiry self-check keeps the
        protocol invariant honest: a holder stalled past its TTL must
        never extend an expiry a thief may already have observed as
        expired, so it may not "successfully" renew — it must abort.
        Residual window (unavoidable without a conditional overwrite
        primitive): a holder whose expiry check passes can still stall
        BETWEEN this check and its subsequent write; the thief's higher
        generation then wins every later check, bounding the overlap to
        one stalled write. Call before the destructive step of a long
        critical section."""
        if not self._held or self.gen is None:
            raise LeaseConflict(f"lease {self.path} is not held")
        raw = self.backend.try_read_bytes(self._gen_path(self.gen))
        owned = False
        expires = 0.0
        if raw is not None:
            try:
                obj = json.loads(raw)
                owned = obj.get("holder") == self.holder
                expires = float(obj.get("expires", 0))
            except (ValueError, TypeError):
                owned = False
        if owned and time.time() > expires:
            self._held = False
            raise LeaseConflict(
                f"lease {self.path} g{self.gen} expired before "
                f"renew/assert (holder stalled past TTL {self.ttl}s)"
            )
        if not owned or self._top_gen() != self.gen:
            self._held = False
            raise LeaseConflict(
                f"lease {self.path} g{self.gen} lost (stolen after expiry?)"
            )

    def renew(self) -> None:
        """Extend the holder's expiry (heartbeat for critical sections
        longer than the TTL). Overwrites only this holder's OWN gen
        object, then re-verifies it is still the highest generation —
        raising :class:`LeaseConflict` if a thief superseded it (the
        overwrite can never demote the thief: its gen is higher)."""
        self.assert_held()
        self.backend.put(self._gen_path(self.gen), self._payload())
        if self._top_gen() != self.gen:
            self._held = False
            raise LeaseConflict(f"lease {self.path} g{self.gen} superseded during renew")

    def __exit__(self, *exc):
        if self._held and self.gen is not None:
            # delete exactly OUR generation object — never a thief's
            self.backend.delete(self._gen_path(self.gen))
            self._held = False
            self.gen = None


class CasObjectStoreBackend(_LocalFilesMixin):
    """Object-store commit protocol, emulated on a local directory.

    Per-method mapping to a real store:

    - ``read_bytes``/``exists``/``file_size`` → GET / HEAD
    - ``put`` → PUT (last-writer-wins; used only for HINTS and
      content-addressed objects, never as a transaction)
    - ``put_if_absent`` → PUT + ``If-None-Match: *`` (S3, 2024+) /
      generation-0 precondition (GCS) — THE commit primitive
    - ``list_names``/``walk_files`` → LIST (delimited / recursive)
    - ``copy_file`` → server-side COPY; ``delete`` → DELETE
    - ``ensure_dir``/``remove_empty_dirs`` → no-ops on a real store
      (kept real here so local Spark/pyarrow can write the data plane)
    - ``commit_lock`` → :class:`CasLeaseLock`

    ``cas_commits = True`` tells the table layer that version-segment
    creation is the transaction and LATEST is only a hint.
    """

    name = "cas"
    cas_commits = True

    def put(self, path: str, payload: "bytes | str") -> None:
        # local emulation of PUT's all-or-nothing visibility
        _write_local_atomic(path, payload)

    def put_if_absent(self, path: str, payload: "bytes | str") -> bool:
        return _create_if_absent_local(path, payload)

    def commit_lock(self, meta_dir: str, timeout: float = 60.0):
        self.ensure_dir(meta_dir)
        return CasLeaseLock(self, os.path.join(meta_dir, "LOCK.lease"), timeout=timeout)


_BACKENDS = {"posix": PosixBackend, "cas": CasObjectStoreBackend}


def resolve_backend(backend: "StorageBackend | str | None") -> StorageBackend:
    """Explicit instance > explicit name > $DUCKLAKE_STORAGE_BACKEND >
    posix default."""
    if isinstance(backend, StorageBackend):
        return backend
    name = backend or os.environ.get("DUCKLAKE_STORAGE_BACKEND", "posix")
    try:
        return _BACKENDS[name]()
    except KeyError:
        raise ValueError(
            f"unknown storage backend {name!r} (expected one of {sorted(_BACKENDS)})"
        ) from None
