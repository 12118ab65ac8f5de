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
