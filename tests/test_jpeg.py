"""Baseline JPEG codec (operators/jpeg.py): encode→decode roundtrip
across geometries/subsampling/restart intervals, standard conformance
details (markers, tables), corrupt-payload CodecError contract, optional
cross-check vs Pillow when present, and the Spark decode_image e2e."""

import numpy as np
import pytest

from ducklake_kafka_connect_spark.operators import codecs, jpeg


def _img(h, w, ch=3, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 100 * np.sin(yy / 11.0) * np.cos(xx / 13.0)
    chans = [np.clip(base + 20 * c, 0, 255) for c in range(ch)]
    return np.stack(chans, axis=-1).astype(np.uint8)


def _psnr(a, b):
    err = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    return 10 * np.log10(255**2 / max(1e-9, err.mean()))


class TestRoundtrip:
    @pytest.mark.parametrize(
        "h,w,ch,sub,ri",
        [
            (64, 64, 3, "4:4:4", 0),
            (64, 64, 3, "4:2:0", 0),
            (33, 41, 3, "4:2:0", 0),
            (64, 64, 3, "4:2:0", 3),
            (48, 32, 3, "4:4:4", 2),
            (17, 9, 3, "4:2:0", 1),
            (64, 64, 1, "4:4:4", 0),
            (8, 8, 1, "4:4:4", 0),
        ],
    )
    def test_psnr_and_shape(self, h, w, ch, sub, ri):
        img = _img(h, w, ch)
        payload = jpeg.encode_jpeg(
            img, quality=90, subsample=sub, restart_interval=ri
        )
        out = jpeg.decode_jpeg(payload)
        assert out.shape == (h, w, ch)
        assert _psnr(out, img) > 30

    def test_quality_monotone(self):
        img = _img(40, 40)
        lo = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=20))
        hi = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        assert _psnr(hi, img) > _psnr(lo, img)
        assert len(jpeg.encode_jpeg(img, quality=20)) < len(
            jpeg.encode_jpeg(img, quality=95)
        )

    def test_flat_color_nearly_exact(self):
        img = np.full((16, 16, 3), [200, 30, 90], dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    def test_conformance_markers(self):
        payload = jpeg.encode_jpeg(_img(16, 16), subsample="4:2:0")
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        assert payload[2:4] == b"\xff\xe0" and payload[6:11] == b"JFIF\x00"
        # SOF0 present, SOF2 absent
        assert b"\xff\xc0" in payload and b"\xff\xc2" not in payload


class TestErrors:
    def test_corrupt_payloads_raise_codec_error(self):
        ok = jpeg.encode_jpeg(_img(24, 24))
        bad = [
            ok[:40],                      # truncated mid-headers
            ok[:-20],                     # truncated entropy stream
            b"\xff\xd8" + b"\x00" * 10,   # garbage after SOI
            ok[:2] + b"\xff\xc2" + ok[4:],  # progressive SOF
            b"not a jpeg",
        ]
        for payload in bad:
            with pytest.raises(codecs.CodecError):
                jpeg.decode_jpeg(payload)

    def test_encode_rejects_bad_shapes(self):
        with pytest.raises(codecs.CodecError):
            jpeg.encode_jpeg(np.zeros((0, 4, 3), np.uint8))
        with pytest.raises(codecs.CodecError):
            jpeg.encode_jpeg(np.zeros((4, 4, 2), np.uint8))


class TestDispatch:
    def test_sniff_and_decode_image_array(self):
        img = _img(20, 20)
        payload = jpeg.encode_jpeg(img, quality=92)
        assert codecs.sniff_format(payload) == "jpeg"
        out = codecs.decode_image_array(payload)
        assert out.shape == img.shape and _psnr(out, img) > 30


def test_pillow_cross_check_if_available():
    """When Pillow exists (not in this container), our encoder's output
    must decode identically-shaped and visually equal there too."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _img(32, 24)
    payload = jpeg.encode_jpeg(img, quality=90, subsample="4:2:0")
    with PIL.open(io.BytesIO(payload)) as im:
        theirs = np.asarray(im.convert("RGB"))
    assert theirs.shape == img.shape
    assert _psnr(theirs, img) > 30


def test_spark_decode_image_with_jpeg(spark):
    """decode_image (mapInPandas) now handles JPEG without Pillow; a
    corrupt JPEG yields a NULL row, not a dead task."""
    from ducklake_kafka_connect_spark.operators import multimodal

    img = _img(24, 16)
    good = jpeg.encode_jpeg(img, quality=90)
    rows = [(1, good), (2, good[:30]), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = {r["media_id"]: r for r in multimodal.decode_image(df).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 24
    assert out[1]["channels"] == 3
    assert out[2]["width"] is None and out[3]["width"] is None


class TestConformanceEdges:
    def test_fill_bytes_before_marker_tolerated(self):
        # ITU-T T.81 B.1.1.2: any number of 0xFF fill bytes may precede
        # a marker code. Pad the DQT marker and expect identical pixels.
        img = _img(24, 16)
        payload = jpeg.encode_jpeg(img)
        i = payload.index(b"\xff\xdb")
        padded = payload[:i] + b"\xff\xff" + payload[i:]
        assert np.array_equal(jpeg.decode_jpeg(padded), jpeg.decode_jpeg(payload))

    def test_non_interleaved_scan_raises_not_misdecodes(self):
        # A color SOF with a single-component SOS (legal baseline,
        # non-interleaved) must raise CodecError — not silently return a
        # 1-channel image with a wrong byte_sum.
        payload = jpeg.encode_jpeg(_img(16, 16))
        i = payload.index(b"\xff\xda")
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        entropy = payload[i + 2 + seglen :]
        # rebuild SOS with ns=1, component id/tables from the original
        orig = payload[i + 4 :]
        ns, c1, t1 = orig[0], orig[1], orig[2]
        assert ns == 3
        sos = b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, c1, t1, 0, 63, 0])
        with pytest.raises(codecs.CodecError, match="non-interleaved"):
            jpeg.decode_jpeg(payload[:i] + sos + entropy)


class TestProgressive:
    """SOF2 round trip: the progressive scan script (DC first+refine,
    spectral-split AC first+refine, per-scan optimal tables, EOB runs)
    must decode to EXACTLY the pixels of the baseline encoding of the
    same image — both paths share the quantized coefficient grids, so
    any bit drift in the successive-approximation machinery shows up as
    a pixel diff."""

    @pytest.mark.parametrize(
        "h,w,ch,sub,ri",
        [
            (64, 64, 3, "4:4:4", 0),
            (64, 64, 3, "4:2:0", 0),
            (33, 41, 3, "4:2:0", 0),
            (48, 32, 3, "4:4:4", 2),
            (17, 9, 3, "4:2:0", 1),
            (64, 64, 1, "4:4:4", 0),
            (8, 8, 1, "4:4:4", 0),
            (120, 88, 3, "4:2:0", 7),
        ],
    )
    def test_progressive_equals_baseline(self, h, w, ch, sub, ri):
        img = _img(h, w, ch)
        prog = jpeg.encode_jpeg(
            img, quality=90, subsample=sub, restart_interval=ri,
            progressive=True,
        )
        base = jpeg.encode_jpeg(
            img, quality=90, subsample=sub, restart_interval=ri
        )
        assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog
        out = jpeg.decode_jpeg(prog)
        assert out.shape == (h, w, ch)
        assert np.array_equal(out, jpeg.decode_jpeg(base))

    def test_noise_image_exercises_eob_runs_and_zrl(self):
        # dense high-frequency noise → long runs, ZRLs, and multi-block
        # EOB runs in both first and refinement scans
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (56, 72, 3)).astype(np.uint8)
        prog = jpeg.encode_jpeg(img, quality=35, progressive=True)
        base = jpeg.encode_jpeg(img, quality=35)
        assert np.array_equal(jpeg.decode_jpeg(prog), jpeg.decode_jpeg(base))

    def test_flat_image_is_all_eob(self):
        # flat color: every AC band is a pure EOB run (the degenerate
        # extreme of the EOBRUN accumulator)
        img = np.full((32, 24, 3), [10, 200, 55], dtype=np.uint8)
        prog = jpeg.encode_jpeg(img, quality=90, progressive=True)
        base = jpeg.encode_jpeg(img, quality=90)
        assert np.array_equal(jpeg.decode_jpeg(prog), jpeg.decode_jpeg(base))

    def test_multiple_scans_parsed(self):
        # 3-component file: 1 DC first + 6 AC first + 1 DC refine +
        # 6 AC refine = 14 SOS markers
        prog = jpeg.encode_jpeg(_img(16, 16, 3), progressive=True)
        n_sos = prog.count(b"\xff\xda")
        assert n_sos == 14

    def test_corrupt_progressive_raises(self):
        prog = bytearray(jpeg.encode_jpeg(_img(24, 24, 3), progressive=True))
        with pytest.raises(codecs.CodecError):
            jpeg.decode_jpeg(bytes(prog[: len(prog) // 2]))  # truncated

    def test_dispatch_decodes_progressive(self):
        img = _img(20, 28, 3)
        prog = jpeg.encode_jpeg(img, progressive=True)
        assert codecs.sniff_format(prog) == "jpeg"
        out = codecs.decode_image_array(prog)
        assert out.shape == (20, 28, 3)
