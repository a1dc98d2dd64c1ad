"""Data corruption for robustness research (MER-NOISE style).

Reference semantics (``MER2023/main-corrupt.py:25-116`` and
``MERBench/toolkit/utils/functions.py:349-433``):

  * **Audio SNR noise**: concatenate random MUSAN noise clips until they
    cover the clean wav, cut a random window, scale the noise so that
    ``noise_rms = clean_rms / 10^(snr/20)``, add, then rescale if int16
    would clip.
  * **Video blur**: ``log2(blur_rate)`` pyramid downs then ups per frame
    (cv2.pyrDown/pyrUp). Implemented here as on-device average-pool
    down/bilinear up (jax.image), which matches the pyramid's low-pass
    effect without an OpenCV dependency.

These operate on arrays; file IO goes through ``mertools_tpu.io.wav``.
"""

from __future__ import annotations

import math

import numpy as np


def rms(x: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.square(x.astype(np.float64)))))


def adjusted_noise_rms(clean_rms: float, snr: float) -> float:
    """noise rms for a target SNR in dB (main-corrupt.py:35-38)."""
    return clean_rms / (10 ** (float(snr) / 20))


def mix_noise(clean: np.ndarray, noise_pool: list[np.ndarray], snr: float,
              rng: np.random.Generator | None = None,
              int16_range: bool = True) -> tuple[np.ndarray, dict]:
    """Add MUSAN-style noise at a given SNR (main-corrupt.py:44-80).

    clean/noise in int16-scale float (as the reference reads them).
    """
    rng = rng or np.random.default_rng()
    clean = clean.astype(np.float64)

    noise_amp: list[float] = []
    picks = []
    while len(noise_amp) <= len(clean):
        i = int(rng.integers(0, len(noise_pool)))
        noise_amp.extend(noise_pool[i].astype(np.float64))
        picks.append(i)
    start = int(rng.integers(0, len(noise_amp) - len(clean) + 1))
    noise = np.asarray(noise_amp[start: start + len(clean)])

    target = adjusted_noise_rms(rms(clean), snr)
    noise = noise * (target / max(rms(noise), 1e-12))
    mixed = clean + noise

    if int16_range:
        max_i, min_i = np.iinfo(np.int16).max, np.iinfo(np.int16).min
        if mixed.max() > max_i or mixed.min() < min_i:
            if mixed.max() >= abs(mixed.min()):
                mixed = mixed * (max_i / mixed.max())
            else:
                mixed = mixed * (min_i / mixed.min())
    return mixed, {"noise_indices": picks, "snr": snr, "start": start}


def blur_frames(frames: np.ndarray, blur_rate: int) -> np.ndarray:
    """Pyramid-style blur: log2(blur_rate) 2x downsamples then upsamples.

    frames: (T, H, W, C) uint8. Uses area-downsample + bilinear-upsample on
    device (jax.image), the same low-pass pyramid the reference builds with
    cv2.pyrDown/pyrUp (main-corrupt.py:84-95).
    """
    import jax
    import jax.numpy as jnp

    steps = int(math.log2(blur_rate))
    if steps <= 0:
        return frames
    x = jnp.asarray(frames).astype(jnp.float32)
    t, h, w, c = x.shape
    for s in range(steps):
        x = jax.image.resize(x, (t, x.shape[1] // 2, x.shape[2] // 2, c), "linear")
    for s in range(steps):
        x = jax.image.resize(x, (t, x.shape[1] * 2, x.shape[2] * 2, c), "linear")
    return np.asarray(jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8))
