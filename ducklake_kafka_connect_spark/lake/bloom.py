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

Hashing is deterministic double-hashing, portable across sessions:
int64-range integers use a splitmix64-style finalizer (numpy-vectorized
at build time — a 1M-key sidecar builds in ~10 ms instead of ~1 s of
per-key md5), everything else md5 over the canonical string form. Only
integer and string columns are bloomed (float canonicalization is a
parity trap). fpp ≈ 6e-5 at 20 bits/key with k=5. The magic is
versioned: sidecars written by the old all-md5 format fail the magic
check and are conservatively kept until their file is next rewritten.
"""

from __future__ import annotations

import hashlib
import math
import os
import struct

MAGIC = b"DLB2"
# 20 bits/key (fpp ~6e-5 at k=5): optimized writes consolidate many keys
# per file, so a rewrite-set false positive costs a whole-file rewrite —
# worth the still-tiny sidecar (2.5 KB per 1k keys).
BITS_PER_KEY = 20
NUM_HASHES = 5
MAX_BITS = 1 << 23  # 1 MiB cap per sidecar

_M64 = (1 << 64) - 1
_GOLDEN = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB
_H2_XOR = 0xD6E8FEB86659FD93
# numpy vectorization pays off past this many int keys
_NUMPY_MIN_KEYS = 256


def _mix64(x: int) -> int:
    """splitmix64 finalizer on a uint64 (python-int arithmetic, masked).
    MUST stay bit-identical to the numpy form in ``_int_hash_arrays``."""
    x = (x + _GOLDEN) & _M64
    x ^= x >> 30
    x = (x * _MIX1) & _M64
    x ^= x >> 27
    x = (x * _MIX2) & _M64
    x ^= x >> 31
    return x


def _is_hash_int(v) -> bool:
    return (
        isinstance(v, int)
        and not isinstance(v, bool)
        and -(1 << 63) <= v < (1 << 63)
    )


def _hash_pair(value) -> tuple[int, int]:
    if _is_hash_int(value):
        u = value & _M64  # two's complement, matches int64.view(uint64)
        return _mix64(u), _mix64(u ^ _H2_XOR) | 1
    d = hashlib.md5(str(value).encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def _int_hash_arrays(arr):
    """Vectorized ``_hash_pair`` for an int64 numpy array."""
    import numpy as np

    def mix(x):
        x = x + np.uint64(_GOLDEN)
        x ^= x >> np.uint64(30)
        x *= np.uint64(_MIX1)
        x ^= x >> np.uint64(27)
        x *= np.uint64(_MIX2)
        x ^= x >> np.uint64(31)
        return x

    u = arr.astype(np.int64, copy=False).view(np.uint64)
    return mix(u.copy()), mix(u ^ np.uint64(_H2_XOR)) | np.uint64(1)


def _size_bits(n_keys: int) -> int:
    m = 1 << max(8, math.ceil(math.log2(max(1, n_keys) * BITS_PER_KEY)))
    return min(m, MAX_BITS)


def build_bloom(values) -> bytes:
    """Serialize a Bloom filter of ``values`` (ints/strings; None
    skipped). Int64-range keys go through the vectorized numpy path
    (the write-path hot loop: every data file's PK column passes through
    here at harvest time); anything else through the scalar loop."""
    if hasattr(values, "dtype"):  # numpy integer array → no list round-trip
        import numpy as np

        arr = np.asarray(values)
        m = _size_bits(len(arr))
        mask = m - 1
        h1, h2 = _int_hash_arrays(arr)
        bset = np.zeros(m, dtype=bool)
        for i in range(NUM_HASHES):
            bset[(h1 + np.uint64(i) * h2) & np.uint64(mask)] = True
        packed = np.packbits(bset, bitorder="little").tobytes()
        return MAGIC + struct.pack("<II", NUM_HASHES, m) + packed
    vals = [v for v in values if v is not None]
    m = _size_bits(len(vals))
    mask = m - 1  # m is always a power of two
    ints = [v for v in vals if _is_hash_int(v)]
    rest = [v for v in vals if not _is_hash_int(v)]
    bits = None
    if len(ints) >= _NUMPY_MIN_KEYS:
        import numpy as np

        h1, h2 = _int_hash_arrays(np.array(ints, dtype=np.int64))
        bset = np.zeros(m, dtype=bool)
        for i in range(NUM_HASHES):
            bset[(h1 + np.uint64(i) * h2) & np.uint64(mask)] = True
        bits = bytearray(np.packbits(bset, bitorder="little").tobytes())
        ints = []
    if bits is None:
        bits = bytearray(m // 8)
    for v in ints + rest:
        h1, h2 = _hash_pair(v)
        for i in range(NUM_HASHES):
            idx = (h1 + i * h2) & mask
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
