"""Unit tests for operators/perceptual.py (pHash + dominant-bin FFT)."""

import numpy as np
import pytest

from ducklake_kafka_connect_spark.operators.perceptual import (
    PHASH_SIDE,
    box_downsample,
    dominant_bin,
    hamming63,
    phash63,
    synth_gray_image,
)


class TestPhash:
    def test_scale_invariance_exact(self):
        # 2x block replication box-averages back to the base raster, so
        # the hash must be bit-identical (the oracle's invariant)
        for seed in range(7):
            base = synth_gray_image(seed=seed * 31 + 1, scale=1)
            big = synth_gray_image(seed=seed * 31 + 1, scale=2)
            assert phash63(base) == phash63(big)

    def test_distinct_seeds_distinct_hashes(self):
        hashes = {phash63(synth_gray_image(seed=s)) for s in range(64)}
        assert len(hashes) == 64

    def test_small_noise_small_hamming(self):
        # pHash is a low-frequency fingerprint: +/-1 uniform pixel noise
        # moves few of the 63 sign bits
        base = synth_gray_image(seed=5)
        noisy = base.astype(np.int16).copy()
        noisy[::2, ::2] += 1
        d = hamming63(phash63(base), phash63(np.clip(noisy, 0, 255)))
        assert d <= 8

    def test_bits_range(self):
        h = phash63(synth_gray_image(seed=9))
        assert 0 <= h < (1 << 63)

    def test_rgb_input_averaged(self):
        g = synth_gray_image(seed=3)
        rgb = np.stack([g, g, g], axis=-1)
        assert phash63(rgb) == phash63(g)

    def test_box_downsample_exact_on_blocks(self):
        g = synth_gray_image(seed=4)
        big = np.kron(g, np.ones((3, 3), dtype=np.uint8))
        down = box_downsample(big)
        assert down.shape == (PHASH_SIDE, PHASH_SIDE)
        assert np.array_equal(down, g.astype(np.float64))


class TestDominantBin:
    @pytest.mark.parametrize("k", [1, 5, 17, 200, 511])
    def test_pure_sine_exact(self, k):
        n = np.arange(1024, dtype=np.float64)
        wave = np.round(12000.0 * np.sin(2 * np.pi * k * n / 1024)).astype(
            np.int16
        )
        assert dominant_bin(wave) == k

    def test_stereo_mean(self):
        n = np.arange(1024, dtype=np.float64)
        wave = np.round(8000.0 * np.sin(2 * np.pi * 9 * n / 1024)).astype(
            np.int16
        )
        stereo = np.stack([wave, wave], axis=1)
        assert dominant_bin(stereo) == 9

    def test_degenerate_short_clip(self):
        assert dominant_bin(np.array([3], dtype=np.int16)) == 0

    def test_dc_excluded(self):
        # constant signal: all energy at DC, which is excluded
        const = np.full(256, 1000, dtype=np.int16)
        b = dominant_bin(const)
        assert b >= 1  # argmax over the (all-~zero) non-DC bins
