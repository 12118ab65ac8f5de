"""Per-file Bloom-filter sidecars for point-lookup data skipping.

Min/max footer stats prune range predicates, but after enough appends a
key column's per-file ranges interleave and an equality probe
(``pk = K``) survives range pruning everywhere. A small Bloom filter
per data file answers "is K definitely absent?" and prunes those files.

Layout: each data file ``f.parquet`` gets a sidecar ``f.parquet.bloom``
(magic + k + m header, then the bit array). Sidecars live next to the
data (object-store friendly: one small GET per surviving file, only for
equality probes), are immutable like the data files, and are vacuumed
with them. The manifest does not grow — at 100 TB a manifest carrying
inline blooms would dwarf the metadata budget, while sidecars cost one
ranged read per file that already survived range pruning.

Hashing is deterministic md5 double-hashing over a canonical string
form, so filters are portable across engines and sessions. Only
integer and string columns are bloomed (float canonicalization is a
parity trap). fpp ≈ 0.008 at 10 bits/key with k=5.
"""

from __future__ import annotations

import hashlib
import math
import os
import struct

MAGIC = b"DLBF"
# 20 bits/key (fpp ~6e-5 at k=5): optimized writes consolidate many keys
# per file, so a rewrite-set false positive costs a whole-file rewrite —
# worth the still-tiny sidecar (2.5 KB per 1k keys).
BITS_PER_KEY = 20
NUM_HASHES = 5
MAX_BITS = 1 << 23  # 1 MiB cap per sidecar


def _hash_pair(value) -> tuple[int, int]:
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def _size_bits(n_keys: int) -> int:
    m = 1 << max(8, math.ceil(math.log2(max(1, n_keys) * BITS_PER_KEY)))
    return min(m, MAX_BITS)


def build_bloom(values) -> bytes:
    """Serialize a Bloom filter of ``values`` (ints/strings; None skipped)."""
    vals = [v for v in values if v is not None]
    m = _size_bits(len(vals))
    bits = bytearray(m // 8)
    for v in vals:
        h1, h2 = _hash_pair(v)
        for i in range(NUM_HASHES):
            idx = (h1 + i * h2) % m
            bits[idx >> 3] |= 1 << (idx & 7)
    return MAGIC + struct.pack("<II", NUM_HASHES, m) + bytes(bits)


def bloom_might_contain(blob: bytes, value) -> bool:
    """True unless the filter proves ``value`` absent. Malformed blobs
    conservatively return True."""
    if not blob or blob[:4] != MAGIC or len(blob) < 12:
        return True
    k, m = struct.unpack("<II", blob[4:12])
    bits = blob[12:]
    if m == 0 or len(bits) * 8 < m:
        return True
    h1, h2 = _hash_pair(value)
    for i in range(k):
        idx = (h1 + i * h2) % m
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True


def sidecar_path(data_file_path: str) -> str:
    return data_file_path + ".bloom"


def write_sidecar(data_file_path: str, values) -> None:
    tmp = sidecar_path(data_file_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(build_bloom(values))
    os.replace(tmp, sidecar_path(data_file_path))


def sidecar_might_contain(data_file_path: str, values: list) -> bool:
    """True if ANY of ``values`` might be present (or no sidecar exists)."""
    p = sidecar_path(data_file_path)
    try:
        with open(p, "rb") as f:
            blob = f.read()
    except OSError:
        return True
    return any(bloom_might_contain(blob, v) for v in values)


def _probe_file(path: str, pairs: list[tuple[int, int]]) -> bool:
    """True unless this file's sidecar proves NONE of the hashed values
    is present (missing/malformed sidecars keep the file)."""
    try:
        with open(sidecar_path(path), "rb") as f:
            blob = f.read()
    except OSError:
        return True
    if not blob or blob[:4] != MAGIC or len(blob) < 12:
        return True
    k, m = struct.unpack("<II", blob[4:12])
    bits = blob[12:]
    if m == 0 or len(bits) * 8 < m:
        return True
    for h1, h2 in pairs:
        if all(
            (bits[idx >> 3] >> (idx & 7)) & 1
            for idx in ((h1 + i * h2) % m for i in range(k))
        ):
            return True
    return False


def membership_filter(paths: list[str], values: list) -> list[bool]:
    """Driver-side probe: for each path, False only when that file's
    sidecar proves NONE of ``values`` is present. Hash pairs are computed
    once per value, not per (value, file). Right-sized for a handful of
    files; above MEMBERSHIP_SPARK_THRESHOLD files use
    membership_filter_spark to keep the write path off the driver."""
    pairs = [_hash_pair(v) for v in values if v is not None]
    return [_probe_file(p, pairs) for p in paths]


# Below this many files a driver loop beats a Spark job's scheduling cost.
MEMBERSHIP_SPARK_THRESHOLD = 64


def membership_filter_spark(spark, paths: list[str], values: list) -> list[bool]:
    """Executor-side probe: hash the values ONCE on the driver, broadcast
    the (h1, h2) pairs, and fan the sidecar reads out over the cluster —
    wall-time stays flat as the overlap file count grows (the driver loop
    in membership_filter is O(files) single-threaded). Paths must be
    executor-readable (posix-mounted or local; an object-store deployment
    swaps open() for a ranged GET in _probe_file)."""
    if not paths:
        return []
    pairs = [_hash_pair(v) for v in values if v is not None]
    sc = spark.sparkContext
    bpairs = sc.broadcast(pairs)
    n_slices = min(len(paths), sc.defaultParallelism)
    results = (
        sc.parallelize(list(enumerate(paths)), n_slices)
        .map(lambda t: (t[0], _probe_file(t[1], bpairs.value)))
        .collect()
    )
    bpairs.unpersist()
    out = [True] * len(paths)
    for i, keep in results:
        out[i] = keep
    return out
