"""GIF codec (operators/gif.py): pixel-exact LZW roundtrip, palette
limits, corrupt-payload CodecError contract, and the Spark
decode_video_frames e2e (frame timing + sampling + bad-payload rows)."""

import numpy as np
import pytest

from ducklake_kafka_connect_spark.operators import gif
from ducklake_kafka_connect_spark.operators.codecs import CodecError


def _anim(n, h=12, w=10, colors=8, seed=3):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (colors, 3), dtype=np.uint8)
    return pal[rng.randint(0, colors, (n, h, w))]


class TestRoundtrip:
    def test_animated_pixel_exact(self):
        frames = _anim(3)
        payload = gif.encode_gif(frames, delays_ms=[100, 50, 200])
        dec, delays = gif.decode_gif(payload)
        assert np.array_equal(dec, frames)
        assert delays == [100, 50, 200]

    def test_single_frame(self):
        f = _anim(1, 9, 9, colors=2)
        dec, _ = gif.decode_gif(gif.encode_gif(f))
        assert np.array_equal(dec, f)

    def test_256_colors_dictionary_growth(self):
        rng = np.random.RandomState(11)
        pal = np.unique(rng.randint(0, 256, (300, 3), dtype=np.uint8), axis=0)[:256]
        frames = pal[rng.randint(0, len(pal), (1, 64, 64))]
        dec, _ = gif.decode_gif(gif.encode_gif(frames))
        assert np.array_equal(dec, frames)

    def test_magic_and_trailer(self):
        payload = gif.encode_gif(_anim(2))
        assert payload[:6] == b"GIF89a" and payload[-1:] == b"\x3b"


class TestErrors:
    def test_too_many_colors_rejected(self):
        rng = np.random.RandomState(0)
        with pytest.raises(CodecError, match="palette-exact"):
            gif.encode_gif(rng.randint(0, 256, (1, 40, 40, 3), dtype=np.uint8))

    def test_corrupt_payloads_raise_codec_error(self):
        ok = gif.encode_gif(_anim(2))
        for bad in (ok[:20], b"GIF89a" + b"\x00" * 10, ok[:-5], b"nope", b""):
            with pytest.raises(CodecError):
                gif.decode_gif(bad)

    def test_bad_shapes_rejected(self):
        with pytest.raises(CodecError):
            gif.encode_gif(np.zeros((0, 4, 4, 3), np.uint8))
        with pytest.raises(CodecError):
            gif.encode_gif(np.zeros((4, 4, 4), np.uint8))  # not 3 channels


def test_spark_decode_video_frames(spark):
    from ducklake_kafka_connect_spark.operators import multimodal

    rows = [
        (1, gif.encode_gif(_anim(5), delays_ms=100)),
        (2, gif.encode_gif(_anim(2), delays_ms=[30, 70])),
        (3, b"not a gif"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = multimodal.decode_video_frames(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], []).append(r)
    assert [r["frame_ts_ms"] for r in sorted(by[1], key=lambda r: r["frame_index"])] == [
        0, 100, 200, 300, 400,
    ]
    assert len(by[2]) == 2
    assert by[3][0]["width"] is None and by[4][0]["width"] is None
    sampled = multimodal.decode_video_frames(
        df.filter("media_id = 1"), every_ms=200
    ).collect()
    assert sorted(r["frame_ts_ms"] for r in sampled) == [0, 200, 400]


class TestDisposal:
    """Hand-built GIFs with explicit disposal methods (the encoder only
    writes disposal 0, so these payloads are constructed directly)."""

    @staticmethod
    def _build(w, h, pal, frames, bg=0):
        """frames: [(left, top, idx2d, disposal, delay_ms)] → GIF bytes."""
        import struct

        depth = max(2, int(np.ceil(np.log2(max(2, len(pal))))))
        size = 1 << depth
        p = np.zeros((size, 3), np.uint8)
        p[: len(pal)] = pal
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), bg, 0)
        out += p.tobytes()
        for il, it, idx, disposal, delay in frames:
            out += b"\x21\xf9\x04"
            out += bytes([(disposal & 7) << 2])
            out += struct.pack("<H", delay // 10) + b"\x00\x00"
            ih, iw = idx.shape
            out += b"\x2c" + struct.pack("<HHHHB", il, it, iw, ih, 0)
            min_code = max(2, depth)
            out += bytes([min_code])
            lzw = gif._lzw_encode(idx.astype(np.int32), min_code)
            for off in range(0, len(lzw), 255):
                chunk = lzw[off : off + 255]
                out += bytes([len(chunk)]) + chunk
            out += b"\x00"
        out += b"\x3b"
        return bytes(out)

    PAL = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)

    def test_restore_to_previous_applies_after_frame(self):
        # frame1 = all red, disposal 3 ("restore to previous"); frame2 =
        # 2x2 green patch. Spec: frame2 composites onto the PRE-frame1
        # canvas (black) — red must not leak into frame2.
        payload = self._build(
            4, 4, self.PAL,
            [
                (0, 0, np.full((4, 4), 1), 3, 100),
                (1, 1, np.full((2, 2), 2), 0, 100),
            ],
        )
        dec, _ = gif.decode_gif(payload)
        assert np.array_equal(dec[0], np.tile(self.PAL[1], (4, 4, 1)))
        assert np.array_equal(dec[1][1, 1], self.PAL[2])  # green patch
        assert np.array_equal(dec[1][3, 3], self.PAL[0])  # black, not red

    def test_restore_to_background_uses_declared_color(self):
        # background index 1 (red); frame1 = all green, disposal 2;
        # frame2 = 1x1 black dot. The disposed region must be RED (the
        # declared background color), not cleared to black.
        payload = self._build(
            4, 4, self.PAL,
            [
                (0, 0, np.full((4, 4), 2), 2, 100),
                (0, 0, np.full((1, 1), 0), 0, 100),
            ],
            bg=1,
        )
        dec, _ = gif.decode_gif(payload)
        assert np.array_equal(dec[0], np.tile(self.PAL[2], (4, 4, 1)))
        assert np.array_equal(dec[1][0, 0], self.PAL[0])  # the dot
        assert np.array_equal(dec[1][3, 3], self.PAL[1])  # red background

    def test_disposal_none_keeps_composite(self):
        payload = self._build(
            4, 4, self.PAL,
            [
                (0, 0, np.full((4, 4), 1), 0, 100),
                (1, 1, np.full((2, 2), 2), 0, 100),
            ],
        )
        dec, _ = gif.decode_gif(payload)
        assert np.array_equal(dec[1][3, 3], self.PAL[1])  # red persists


def test_spark_sampling_multi_tick_delay(spark):
    """A frame whose delay spans several sampling ticks must not cause
    every following frame to be taken for the ticks it already covered:
    ticks are a fixed grid, 'first frame at or after each tick'."""
    from ducklake_kafka_connect_spark.operators import multimodal

    payload = gif.encode_gif(_anim(4), delays_ms=[500, 10, 10, 10])
    df = spark.createDataFrame([(1, payload)], "media_id long, data binary")
    out = multimodal.decode_video_frames(df, every_ms=100).collect()
    # frames at ts 0,500,510,520; grid 0,100,...: frame0 covers tick 0,
    # frame1 (ts 500) covers tick 500; next tick 600 > all later frames.
    assert sorted(r["frame_index"] for r in out) == [0, 1]
