"""Noise-mixing SNR semantics tests (golden vs hand computation)."""

import numpy as np

from mertools_tpu.data import corruption as C


def test_snr_formula():
    assert C.adjusted_noise_rms(100.0, 20.0) == 10.0
    assert C.adjusted_noise_rms(100.0, 0.0) == 100.0


def test_mix_noise_achieves_snr(rng):
    clean = (rng.normal(size=16000) * 3000).astype(np.float64)
    noise = [(rng.normal(size=7000) * 500).astype(np.float64) for _ in range(3)]
    for snr in (0.0, 10.0, 20.0):
        mixed, info = C.mix_noise(clean, noise, snr, rng=np.random.default_rng(1))
        added = mixed - clean
        got_snr = 20 * np.log10(C.rms(clean) / C.rms(added))
        assert abs(got_snr - snr) < 0.2, (snr, got_snr)
        assert info["snr"] == snr


def test_mix_noise_clipping_guard(rng):
    clean = np.full(8000, 30000.0)
    noise = [np.full(9000, 20000.0)]
    mixed, _ = C.mix_noise(clean, noise, snr=0.0, rng=np.random.default_rng(0))
    assert mixed.max() <= np.iinfo(np.int16).max + 1e-6
    assert mixed.min() >= np.iinfo(np.int16).min - 1e-6


def test_blur_frames_lowpass(rng):
    frames = rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.uint8)
    blurred = C.blur_frames(frames, blur_rate=4)
    assert blurred.shape == frames.shape
    # blur reduces high-frequency energy
    def hf_energy(x):
        d = np.diff(x.astype(np.float64), axis=1)
        return np.mean(d ** 2)
    assert hf_energy(blurred) < hf_energy(frames) * 0.5
    # blur_rate 1 is identity
    np.testing.assert_array_equal(C.blur_frames(frames, 1), frames)
