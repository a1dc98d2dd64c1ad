"""Fused Pallas log-mel kernel vs the XLA/FFT reference (interpret mode on
the CPU test backend; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mertools_tpu.ops.mel import log_mel_spectrogram
from mertools_tpu.ops.mel_pallas import log_mel_spectrogram_fused


def test_fused_matches_reference(rng):
    wav = np.zeros((2, 480000), np.float32)
    t = np.arange(64000) / 16000.0
    wav[0, :64000] = 0.4 * np.sin(2 * np.pi * 440 * t)
    wav[1, :32000] = rng.normal(size=32000).astype(np.float32) * 0.1

    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
    got = np.asarray(log_mel_spectrogram_fused(jnp.asarray(wav),
                                               interpret=True))
    assert got.shape == ref.shape == (2, 80, 3000)
    np.testing.assert_allclose(got, ref, atol=2e-3)
