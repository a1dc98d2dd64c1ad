"""Kaldi-compatible log-mel filterbank ("fbank") on device.

Replaces the reference's ``torchaudio.compliance.kaldi.fbank`` call inside the
ImageBind audio frontend (``MER2025/MER2025_Track23/my_affectgpt/models/
ImageBind/data.py:28-68``: AST-style ``waveform2melspec`` with
``htk_compat=True, window_type="hanning", num_mel_bins=128, dither=0.0,
frame_length=25, frame_shift=10``), and the 2 s constant-clips sampler
(``data.py:117-166``, pytorchvideo ``ConstantClipsPerVideoSampler``).

Kaldi semantics implemented (matching torchaudio.compliance.kaldi defaults
for the flags above):
- snip_edges=True framing: ``m = 1 + (n - 400) // 160`` frames,
- per-frame DC-offset removal (subtract the frame mean),
- preemphasis 0.97 with replicate-padded first sample,
- symmetric Hann window (``torch.hann_window(400, periodic=False)``),
- zero-pad to the next power of two (512) -> power spectrum (257 bins),
- Kaldi mel scale ``1127 ln(1 + f/700)``, triangular banks over
  ``[low=20 Hz, high=nyquist]`` with a zero nyquist column,
- ``log(max(x, FLT_EPS))``.

Everything is a fixed-shape jittable pipeline: frames come from one gather,
the mel projection is a single MXU matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
FRAME_LEN = 400          # 25 ms
FRAME_SHIFT = 160        # 10 ms
PADDED_LEN = 512         # next power of two
_EPSILON = float(np.finfo(np.float32).eps)   # kaldi EPSILON = 1.1921e-7


def kaldi_mel_banks(num_bins: int, padded_window_size: int = PADDED_LEN,
                    sample_freq: int = SAMPLE_RATE, low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """Kaldi triangular mel banks, shape (num_bins, padded//2 + 1); the last
    (nyquist) column is zero, as in torchaudio's ``get_mel_banks`` + pad."""
    if high_freq <= 0.0:
        high_freq = sample_freq / 2.0 + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_freq / padded_window_size
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64)[:, None]
    left = mel_low + bin_idx * mel_delta
    center = mel_low + (bin_idx + 1.0) * mel_delta
    right = mel_low + (bin_idx + 2.0) * mel_delta
    freqs = mel(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up = (freqs - left) / (center - left)
    down = (right - freqs) / (right - center)
    banks = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((num_bins, num_fft_bins + 1), np.float64)
    out[:, :num_fft_bins] = banks
    return out.astype(np.float32)


def _hann_symmetric(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def kaldi_fbank(wavs: jnp.ndarray, num_mel_bins: int = 128) -> jnp.ndarray:
    """(B, n_samples) -> (B, n_frames, num_mel_bins) kaldi-style log-mels.

    ``n_samples`` is static; dither is 0 (the ImageBind setting), energy off.
    """
    n = wavs.shape[-1]
    m = 1 + (n - FRAME_LEN) // FRAME_SHIFT
    starts = np.arange(m) * FRAME_SHIFT
    idx = starts[:, None] + np.arange(FRAME_LEN)[None, :]
    frames = wavs[:, idx]                                # (B, m, 400)
    frames = frames - frames.mean(axis=-1, keepdims=True)   # remove_dc_offset
    # preemphasis with replicate-padded first sample (torchaudio kaldi)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    frames = frames * jnp.asarray(_hann_symmetric(FRAME_LEN))
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, PADDED_LEN - FRAME_LEN)))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)   # (B, m, 257)
    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins))
    mel = jnp.einsum("bmf,nf->bmn", power, banks,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, _EPSILON))


def constant_clip_timepoints(duration: float, clip_duration: float = 2.0,
                             clips_per_video: int = 8) -> list[tuple[float, float]]:
    """pytorchvideo ``ConstantClipsPerVideoSampler``: uniformly spaced clip
    starts covering ``duration`` (data.py:130-152)."""
    max_start = max(duration - clip_duration, 0.0)
    denom = max(clips_per_video - 1, 1)
    return [(i * max_start / denom, i * max_start / denom + clip_duration)
            for i in range(clips_per_video)]


def sample_audio_clips(wav: np.ndarray, sample_rate: int = SAMPLE_RATE,
                       clip_duration: float = 2.0, clips_per_video: int = 8
                       ) -> np.ndarray:
    """wav (n,) -> (clips_per_video, clip_samples) exactly as the reference
    ``load_audio`` (data.py:170-215): zero-pad to >= 2 s, then slice
    ``int(start*sr):int(end*sr)`` windows."""
    clip_samples = int(clip_duration * sample_rate)
    wav = np.asarray(wav, np.float32)
    if len(wav) < clip_samples:
        wav = np.pad(wav, (0, clip_samples - len(wav)))
    duration = len(wav) / sample_rate
    clips = np.zeros((clips_per_video, clip_samples), np.float32)
    for i, (s, e) in enumerate(constant_clip_timepoints(
            duration, clip_duration, clips_per_video)):
        seg = wav[int(s * sample_rate): int(e * sample_rate)]
        clips[i, : len(seg)] = seg
    return clips


@functools.partial(jax.jit, static_argnums=(1, 2))
def imagebind_melspec(clips: jnp.ndarray, num_mel_bins: int = 128,
                      target_length: int = 204,
                      mean: float = -4.268, std: float = 9.138) -> jnp.ndarray:
    """(B, clip_samples) 2 s clips -> (B, num_mel_bins, target_length)
    normalized mel "images" (``waveform2melspec`` + Normalize, data.py:28-68):
    subtract the clip mean, fbank, transpose to (mels, frames), zero-pad or
    cut to ``target_length`` frames, normalize with the AudioSet stats."""
    clips = clips - clips.mean(axis=-1, keepdims=True)
    fb = kaldi_fbank(clips, num_mel_bins)                # (B, m, mels)
    fb = jnp.swapaxes(fb, 1, 2)                          # (B, mels, m)
    m = fb.shape[-1]
    if m < target_length:
        fb = jnp.pad(fb, ((0, 0), (0, 0), (0, target_length - m)))
    else:
        fb = fb[..., :target_length]
    return (fb - mean) / std
