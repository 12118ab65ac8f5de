"""Property-based tests (hypothesis): invariants that unit fixtures
cannot sweep — codec roundtrips over arbitrary shapes/contents,
partition-value canonicalization agreement, and data-skipping
conservativeness."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ducklake_kafka_connect_spark.lake.partitioning import (
    canon_partition_token,
    canon_partition_value,
)
from ducklake_kafka_connect_spark.lake.skipping import parse_conjuncts, prune_files
from ducklake_kafka_connect_spark.operators import codecs

# --------------------------------------------------------------------------
# codecs: decode(encode(x)) == x for every shape and content
# --------------------------------------------------------------------------

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@settings(max_examples=50, deadline=None)
@given(dims, st.integers(0, 2**32 - 1), st.sampled_from([1, 3]))
def test_pnm_roundtrip_any_shape(shape, seed, ch):
    h, w = shape
    arr = np.random.RandomState(seed).randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    out = codecs.decode_ppm(codecs.encode_ppm(arr))
    assert out.shape == arr.shape and np.array_equal(out, arr)


@settings(max_examples=50, deadline=None)
@given(dims, st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_any_shape(shape, seed):
    h, w = shape
    arr = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.decode_bmp(codecs.encode_bmp(arr))
    assert np.array_equal(out, arr)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 2000), st.sampled_from([1, 2]), st.integers(0, 2**32 - 1),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_any_length(n, ch, seed, rate):
    rng = np.random.RandomState(seed)
    samples = rng.randint(-(2**15), 2**15, size=(n, ch)).astype(np.int16)
    arr, r = codecs.decode_wav(codecs.encode_wav(samples, rate=rate))
    assert r == rate and np.array_equal(arr, samples)


@settings(max_examples=50, deadline=None)
@given(dims, dims, st.integers(0, 2**32 - 1))
def test_resize_shape_and_pixel_provenance(src, dst, seed):
    h, w = src
    th, tw = dst
    arr = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = codecs.resize_nearest(arr, tw, th)
    assert out.shape == (th, tw, 3)
    # nearest-neighbor: every output pixel exists somewhere in the input
    src_px = {bytes(p) for p in arr.reshape(-1, 3)}
    assert all(bytes(p) in src_px for p in out.reshape(-1, 3))


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 2**32 - 1), st.sampled_from([1, 3]),
       st.sampled_from(["4:4:4", "4:2:0"]), st.sampled_from([0, 2]))
def test_jpeg_roundtrip_any_shape(shape, seed, ch, sub, ri):
    """JPEG is lossy in pixels but EXACT in geometry, and smooth inputs
    must clear a PSNR floor at q90 for every shape/subsampling/restart
    combination."""
    from ducklake_kafka_connect_spark.operators import jpeg

    h, w = shape
    rng = np.random.RandomState(seed)
    base = 128 + 80 * np.sin(np.add.outer(np.arange(h), np.arange(w)) / 7.0)
    arr = np.stack(
        [np.clip(base + rng.randint(-10, 10), 0, 255) for _ in range(ch)],
        axis=-1,
    ).astype(np.uint8)
    payload = jpeg.encode_jpeg(arr, quality=90, subsample=sub, restart_interval=ri)
    out = jpeg.decode_jpeg(payload)
    assert out.shape == arr.shape
    mse = ((out.astype(float) - arr.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(1e-9, mse)) > 28


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=64))
def test_codec_errors_never_crash(payload):
    """Arbitrary garbage either decodes or raises CodecError — never an
    unhandled exception (one bad payload must not kill a corpus scan)."""
    for fn in (codecs.decode_ppm, codecs.decode_bmp, codecs.decode_wav,
               codecs.decode_image_array):
        try:
            fn(payload)
        except codecs.CodecError:
            pass
    codecs.sniff_format(payload)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=96))
def test_jpeg_garbage_never_crashes(payload):
    """Garbage after a JPEG SOI must raise CodecError, never a raw
    IndexError/KeyError/struct.error from the bit/marker machinery."""
    from ducklake_kafka_connect_spark.operators import jpeg

    try:
        jpeg.decode_jpeg(b"\xff\xd8" + payload)
    except codecs.CodecError:
        pass


# --------------------------------------------------------------------------
# partition canonicalization: value-side and token-side must agree
# --------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.one_of(
    st.integers(-(2**50), 2**50),
    st.booleans(),
    st.text(alphabet=st.characters(codec="ascii", exclude_characters="/\x00"),
            max_size=20),
))
def test_canon_value_token_agreement(v):
    """A partition value written as its Hive token must canonicalize to
    the same string from BOTH directions (Row value vs dir token) — the
    invariant that makes MERGE's partition pruning safe. The token is
    built WITH writer-side escaping (a string containing a literal '%'
    is %-escaped in the directory name; hypothesis found the raw-token
    model falsified by the string '%00')."""

    def esc(s: str) -> str:
        return "".join(
            f"%{ord(c):02X}" if c == "%" or ord(c) < 0x20 or c in '"#*:=?\\' else c
            for c in s
        )

    canon_v = canon_partition_value(v)
    token = "true" if v is True else "false" if v is False else esc(str(v))
    assert canon_partition_token(token) == canon_v


# --------------------------------------------------------------------------
# data skipping: pruning is conservative (never drops a matching file)
# --------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(st.integers(-100, 100), st.integers(0, 50)),
             min_size=1, max_size=6),
    st.integers(-120, 120),
    st.sampled_from(["=", "<", "<=", ">", ">="]),
)
def test_prune_never_drops_matching_file(ranges, lit, op):
    files = [f"f{i}" for i in range(len(ranges))]
    stats = {
        f: {"x": [lo, lo + width]} for f, (lo, width) in zip(files, ranges)
    }
    pred = f"x {op} {lit}"
    kept, _ = prune_files(files, stats, pred)
    # brute force: a file whose [lo, hi] contains ANY value satisfying
    # the predicate must be kept
    ops = {"=": lambda a: a == lit, "<": lambda a: a < lit,
           "<=": lambda a: a <= lit, ">": lambda a: a > lit,
           ">=": lambda a: a >= lit}
    for f, (lo, width) in zip(files, ranges):
        if any(ops[op](v) for v in range(lo, lo + width + 1)):
            assert f in kept, f"{f} [{lo},{lo+width}] pruned but matches {pred}"


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=40))
def test_parse_conjuncts_never_crashes(s):
    """Arbitrary predicate text parses to conjuncts or none — a parse
    the skipper cannot understand must degrade to 'keep everything',
    never to an exception in the read path."""
    parse_conjuncts(s)


# ---------------------------------------------------------------------------
# Binary manifest segment codec: round-trip over arbitrary shapes
# ---------------------------------------------------------------------------

_stat_val = st.one_of(
    st.none(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.booleans(),
)
_rel = st.text(alphabet="abcdefghij0123456789/_-.", min_size=1, max_size=60)


@given(
    files=st.dictionaries(
        st.text(alphabet="abcxyz=0123456789/_-", max_size=30),
        st.lists(_rel, max_size=5),
        max_size=5,
    ),
    stats=st.dictionaries(
        _rel,
        st.dictionaries(
            st.text(alphabet="abc_", min_size=1, max_size=8),
            st.one_of(_stat_val, st.lists(_stat_val, min_size=2, max_size=2)),
            max_size=4,
        ),
        max_size=5,
    ),
    version=st.integers(min_value=0, max_value=10**6),
    parent=st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
)
@settings(max_examples=60, deadline=None)
def test_binary_segment_roundtrip_arbitrary(files, stats, version, parent):
    from ducklake_kafka_connect_spark.lake.table import (
        decode_segment_binary,
        encode_segment_binary,
    )

    d = {
        "version": version,
        "schema": {"type": "struct", "fields": []},
        "pk": ["id"],
        "partition_spec": [],
        "files": files,
        "parent": parent,
        "props": {"last_op": "WRITE"},
        "file_stats": stats,
    }
    assert decode_segment_binary(encode_segment_binary(d)) == d


@given(st.binary(max_size=300))
@settings(max_examples=40, deadline=None)
def test_tar_member_parse_never_crashes(payload):
    """Garbage tar payloads must yield zero members, never an exception
    (the shard-level DLQ philosophy). Pure-Python harness over the same
    parse the Spark decode uses."""
    import io
    import tarfile

    rows = []
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r") as tf:
            for info in tf:
                if info.isfile():
                    rows.append(info.name)
    except (tarfile.TarError, EOFError, OSError):
        pass  # exactly what decode_members swallows per shard
    assert isinstance(rows, list)


# ---------------------------------------------------------------------------
# progressive JPEG: must decode to EXACTLY the baseline pixels (shared
# quantized coefficients) for any geometry/subsampling/restart combo
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(dims, st.integers(0, 2**32 - 1), st.sampled_from([1, 3]),
       st.sampled_from(["4:4:4", "4:2:0"]), st.sampled_from([0, 2]))
def test_progressive_jpeg_equals_baseline(shape, seed, ch, sub, ri):
    from ducklake_kafka_connect_spark.operators import jpeg

    h, w = shape
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg(
        arr, quality=80, subsample=sub, restart_interval=ri, progressive=True
    ))
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(
        arr, quality=80, subsample=sub, restart_interval=ri
    ))
    assert np.array_equal(prog, base)


# ---------------------------------------------------------------------------
# SQL WHERE-conjunct extraction: conservative by construction — any row
# satisfying the full WHERE must satisfy every extracted per-table
# predicate (else pruning with it could drop matching rows)
# ---------------------------------------------------------------------------

from ducklake_kafka_connect_spark.lake.sql_prune import (  # noqa: E402
    extract_table_predicates,
    strip_catalog_prefix,
)

_atom = st.one_of(
    st.tuples(st.sampled_from(["a", "b"]),
              st.sampled_from(["=", "<", "<=", ">", ">=", "!="]),
              st.integers(-20, 20)),
    st.tuples(st.just("s"), st.just("="),
              st.text(alphabet="xy'", max_size=4)),
)


def _atom_sql(a):
    col, op, lit = a
    return f"{col} {op} {lit}" if isinstance(lit, int) else (
        f"{col} {op} '" + lit.replace("'", "''") + "'"
    )


def _atom_true(a, row):
    col, op, lit = a
    v = row[col]
    return {"=": v == lit, "!=": v != lit, "<": v < lit,
            "<=": v <= lit, ">": v > lit, ">=": v >= lit}[op]


@settings(max_examples=120, deadline=None)
@given(
    st.lists(_atom, min_size=1, max_size=4),
    st.booleans(),  # inject a top-level OR → extraction must bail
    st.lists(
        st.fixed_dictionaries({
            "a": st.integers(-25, 25),
            "b": st.integers(-25, 25),
            "s": st.text(alphabet="xy'", max_size=4),
        }),
        min_size=1, max_size=8,
    ),
)
def test_sql_extraction_is_conservative(atoms, with_or, rows):
    where = " AND ".join(_atom_sql(a) for a in atoms)
    if with_or:
        where += " OR a = 999"
    q = f"SELECT * FROM t WHERE {where}"
    got = extract_table_predicates(q, {"t"}, {"t": {"a", "b", "s"}})
    if with_or:
        assert got == {}
        return
    if "t" not in got:
        return  # extracting nothing is always safe
    extracted = got["t"]
    # re-parse the rendered predicate with the skipper's own parser: the
    # rendered text must parse back to provable conjuncts
    from ducklake_kafka_connect_spark.lake.skipping import parse_conjuncts

    back = parse_conjuncts(extracted)
    assert back, f"rendered predicate did not re-parse: {extracted!r}"
    for row in rows:
        if all(_atom_true(a, row) for a in atoms):
            # row matches the full WHERE → must match every extracted
            # conjunct (conservativeness)
            for c in back:
                assert _atom_true((c.column, c.op, c.value), row), (
                    f"row {row} satisfies WHERE but fails extracted {c}"
                )


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=60))
def test_sql_extraction_never_crashes(s):
    extract_table_predicates(s, {"t"}, {"t": {"a"}})
    strip_catalog_prefix(s)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=60))
def test_strip_prefix_identity_without_namespace(s):
    if "lake.main." not in s.lower():
        assert strip_catalog_prefix(s) == s
