"""Whisper-compatible log-mel spectrogram, on device.

Replaces the reference's host-side numpy ``WhisperFeatureExtractor``
(``extract_audio_huggingface.py:83-91`` produces [1, 80, 3000] features):
frame -> Hann window -> rFFT -> power -> slaney mel filterbank (a single MXU
matmul) -> log10 -> dynamic-range clamp -> scale. Runs under jit; one
spectrogram per 30 s padded clip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SAMPLES = 30 * SAMPLE_RATE  # 480000
N_FRAMES = CHUNK_SAMPLES // HOP   # 3000


def hertz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mels = 3.0 * f / 200.0
    log_region = f >= 1000.0
    logstep = 27.0 / np.log(6.4)
    mels = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) * logstep, mels)
    return mels


def mel_to_hertz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    logstep = np.log(6.4) / 27.0
    f = np.where(log_region, 1000.0 * np.exp(logstep * (m - 15.0)), f)
    return f


def mel_filter_bank(n_freqs: int = N_FFT // 2 + 1, n_mels: int = N_MELS,
                    fmin: float = 0.0, fmax: float = 8000.0,
                    sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filterbank (n_mels, n_freqs),
    matching HF ``mel_filter_bank(..., norm='slaney', mel_scale='slaney')``."""
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(hertz_to_mel_slaney(fmin), hertz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = mel_to_hertz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    return (fb * enorm[:, None]).astype(np.float32)


_MEL_FB: dict = {}


def _get_fb(n_mels: int = N_MELS):
    if n_mels not in _MEL_FB:
        _MEL_FB[n_mels] = mel_filter_bank(n_mels=n_mels)
    return _MEL_FB[n_mels]


def pad_or_trim(wav: np.ndarray, length: int = CHUNK_SAMPLES) -> np.ndarray:
    """Whisper 30 s zero-pad/truncate (feature-extractor max_length)."""
    if len(wav) >= length:
        return np.asarray(wav[:length], np.float32)
    out = np.zeros(length, np.float32)
    out[: len(wav)] = wav
    return out


def log_mel_spectrogram(wav: jnp.ndarray, n_mels: int = N_MELS) -> jnp.ndarray:
    """(B, 480000) float32 -> (B, n_mels, 3000) Whisper log-mel features.

    Matches WhisperFeatureExtractor: reflect-pad n_fft//2, Hann window, power
    spectrum, mel matmul, log10, clamp to (max - 8), (x + 4) / 4.
    ``n_mels=128`` is the Qwen2-Audio / whisper-large-v3 feature extractor.
    """
    B, T = wav.shape
    pad = N_FFT // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = T // HOP  # whisper drops the final frame
    starts = jnp.arange(n_frames) * HOP
    idx = starts[:, None] + jnp.arange(N_FFT)[None, :]
    frames = x[:, idx]  # (B, F, N_FFT)
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)  # (B, F, 201)
    fb = jnp.asarray(_get_fb(n_mels))  # (n_mels, 201)
    mel = jnp.einsum("bfk,mk->bmf", power, fb,
                     precision=jax.lax.Precision.HIGHEST)  # (B, 80, F)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0
