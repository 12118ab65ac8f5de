"""Atomic multi-table transactions over the lake catalog.

DuckLake's headline catalog capability (README / spec: "ACID
transactions across multiple tables") re-expressed on storage instead
of Postgres: the reference reaches multi-table atomicity through its
catalog database's transactions (``DucklakeConnectionFactory.java:36-95``
hands every task one PG-backed connection); here the commit point is a
single create-if-absent PUT, so the protocol works on any backend the
lake already runs on (posix or object-store CAS).

Protocol
--------
- ``BEGIN`` publishes ``<root>/_txns/<id>.open.json`` (create-if-absent;
  the id is a uuid, so the CAS never loses) and makes the catalog's
  subsequent writes stamp ``pending_txn: <id>`` into each committed
  manifest's props (done centrally in ``LakeTable._commit``).
- Table writes inside the transaction commit *normally* — version
  segments are CAS-owned, data files land distributed — but readers
  outside the transaction skip pending versions (``LakeTable.manifest``
  walks parent pointers past any version whose ``pending_txn`` is not
  committed), so a half-done transaction is invisible everywhere.
- ``COMMIT`` is ONE atomic operation: create-if-absent of
  ``<root>/_txns/<id>.final.json`` with ``status: committed``. Every
  pending version across every touched table becomes visible at that
  instant — all-or-nothing, no per-table publish ordering to race.
- ``ROLLBACK`` writes the final marker with ``status: aborted`` FIRST
  (so a crash mid-cleanup is resumable: re-running rollback is
  idempotent), then physically deletes the pending segments and the
  data files only they referenced, restoring a clean chain whose next
  writer reuses the freed version numbers.
- A writer outside the transaction that runs into a pending tip gets
  ``TxnInProgress`` naming the transaction and the remedy — an open
  transaction is, deliberately, a table-level write fence (the
  reference serializes concurrent writers through PG's serializable
  conflicts, ``DucklakeConnectionFactory.java:68-70``; same effect).

Crash matrix
------------
- crash before COMMIT: final marker absent → status stays ``open`` →
  nothing visible; ``rollback_txn(id)`` (any process) cleans up.
- crash between table commits: same — visibility is governed solely by
  the final marker.
- crash during ROLLBACK cleanup: marker already says aborted → pending
  versions stay invisible; re-run ``rollback_txn`` to finish deleting.

Invariant the reader walk relies on: non-visible versions form a
CONTIGUOUS TIP SUFFIX of one transaction — ``_commit`` refuses to build
on a foreign pending or aborted version, so nothing committed can ever
sit above an invisible version.

Why marker reads don't tax the hot path: a manifest props check is free
(the manifest is already in hand), and the marker file is read only when
``pending_txn`` is actually present — then memoized process-wide once
final (final markers are immutable).

Touched tables are discoverable after a crash via per-table breadcrumbs
(``<id>.t.<table>.json``, one idempotent PUT per table per txn) so
``rollback_txn`` from a fresh process needs no in-memory state and no
O(catalog) scan.
"""

from __future__ import annotations

import json
import os
import time
import uuid

TXN_DIR = "_txns"

#: process-wide memo of FINAL statuses only — final markers never change
#: once written, so (root, txn_id) → "committed"/"aborted" is cacheable
#: forever. "open" is never cached (it can flip at any moment).
_FINAL_CACHE: dict[tuple[str, str], str] = {}


class TxnInProgress(Exception):
    """A table's tip belongs to another (open or aborted-uncleaned)
    transaction; the write must wait or the txn must be resolved."""


class TxnContext:
    """Shared mutable holder for a catalog's active transaction id.

    Every ``LakeTable`` a catalog hands out carries a reference to the
    SAME context object, so ``BEGIN`` on the catalog is immediately
    seen by tables created before or after it."""

    __slots__ = ("active",)

    def __init__(self) -> None:
        self.active: str | None = None


def _txn_dir(root: str) -> str:
    return os.path.join(root, TXN_DIR)


def _open_path(root: str, txn_id: str) -> str:
    return os.path.join(_txn_dir(root), f"{txn_id}.open.json")


def final_path(root: str, txn_id: str) -> str:
    return os.path.join(_txn_dir(root), f"{txn_id}.final.json")


def _crumb_path(root: str, txn_id: str, table: str) -> str:
    return os.path.join(_txn_dir(root), f"{txn_id}.t.{table}.json")


def begin_txn(fs, root: str) -> str:
    """Open a transaction: publish the open marker, return its id."""
    txn_id = uuid.uuid4().hex[:16]
    fs.ensure_dir(_txn_dir(root))
    ok = fs.put_if_absent(
        _open_path(root, txn_id),
        json.dumps({"txn": txn_id, "opened_at": round(time.time(), 3)}),
    )
    if not ok:  # uuid collision — not expected, but never silently reuse
        raise RuntimeError(f"transaction id collision on {txn_id}")
    return txn_id


def record_touched(fs, root: str, txn_id: str, table: str) -> None:
    """Breadcrumb: table ``table`` holds pending versions of ``txn_id``.

    Plain PUT (idempotent content) — repeated writes inside one txn
    cost one small object each commit, only on the in-txn path."""
    fs.ensure_dir(_txn_dir(root))
    fs.put(_crumb_path(root, txn_id, table), json.dumps({"table": table}))


def touched_tables(fs, root: str, txn_id: str) -> list[str]:
    prefix = f"{txn_id}.t."
    try:
        names = fs.list_names(_txn_dir(root))
    except FileNotFoundError:
        return []
    return sorted(
        n[len(prefix):-len(".json")]
        for n in names
        if n.startswith(prefix) and n.endswith(".json")
    )


def txn_status(fs, root: str, txn_id: str) -> str:
    """→ ``"open"`` | ``"committed"`` | ``"aborted"``.

    A missing final marker means the transaction never committed —
    whether it is mid-flight or its process died, its writes must stay
    invisible, so both read as ``open`` (resolvable any time via
    ``rollback_txn``). Final statuses are memoized process-wide."""
    key = (root, txn_id)
    cached = _FINAL_CACHE.get(key)
    if cached is not None:
        return cached
    b = fs.try_read_bytes(final_path(root, txn_id))
    if b is None:
        return "open"
    status = json.loads(b).get("status", "aborted")
    _FINAL_CACHE[key] = status
    return status


def txn_committed_at(fs, root: str, txn_id: str) -> float | None:
    """Wall-clock of the atomic COMMIT (the final marker's stamp) — the
    moment the transaction's versions became visible, which is what
    ``TIMESTAMP AS OF`` must resolve against (the per-segment
    ``committed_at`` stamps predate visibility)."""
    b = fs.try_read_bytes(final_path(root, txn_id))
    if b is None:
        return None
    d = json.loads(b)
    if d.get("status") != "committed":
        return None
    v = d.get("committed_at")
    return float(v) if v is not None else None


def finalize_txn(
    fs, root: str, txn_id: str, status: str, tables: list[str]
) -> None:
    """Publish the final marker — THE atomic commit/abort point."""
    if status not in ("committed", "aborted"):
        raise ValueError(f"bad final status {status!r}")
    ok = fs.put_if_absent(
        final_path(root, txn_id),
        json.dumps(
            {
                "txn": txn_id,
                "status": status,
                "committed_at": round(time.time(), 3),
                "tables": sorted(tables),
            }
        ),
    )
    if not ok:
        prev = txn_status(fs, root, txn_id)
        raise ValueError(
            f"transaction {txn_id} is already finalized ({prev}); "
            f"COMMIT/ROLLBACK races resolve to the first finalizer"
        )
    _FINAL_CACHE[(root, txn_id)] = status


def list_txns(fs, root: str) -> list[dict]:
    """One row per transaction ever begun (open marker present):
    (txn, status, opened_at, committed_at, tables)."""
    try:
        names = fs.list_names(_txn_dir(root))
    except FileNotFoundError:
        return []
    out = []
    for n in sorted(names):
        if not (n.endswith(".open.json") and n.count(".") == 2):
            continue
        txn_id = n.split(".", 1)[0]
        opened = json.loads(fs.read_bytes(_open_path(root, txn_id)))
        status = txn_status(fs, root, txn_id)
        committed_at = None
        b = fs.try_read_bytes(final_path(root, txn_id))
        if b is not None:
            committed_at = json.loads(b).get("committed_at")
        out.append(
            {
                "txn": txn_id,
                "status": status,
                "opened_at": opened.get("opened_at"),
                "finalized_at": committed_at,
                "tables": touched_tables(fs, root, txn_id),
            }
        )
    return out
