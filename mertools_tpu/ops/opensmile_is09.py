"""Faithful openSMILE ``IS09_emotion.conf`` feature chain, batched on device.

The reference extracts IS09 by shelling out to the openSMILE binary with
``config/IS09_emotion.conf`` (``MERBench/feature_extraction/audio/
handcrafted_feature_func.py:35-36,97-124``) and parsing the CSV. This module
re-implements that exact component chain as one jitted, batched JAX program
(every frame of every clip in one fused XLA computation — the MXU carries the
mel/DCT matmuls and the FFTs batch over ``B*F`` frames):

openSMILE component graph (IS09_emotion.conf, openSMILE 2.x) and our mapping:

- ``cFramer``   frameSize=0.025 frameStep=0.010, left-aligned, complete
  frames only  ->  :func:`_frame_left` (nF = 1 + floor((T-400)/160) @16k).
- ``cEnergy rms=1`` and ``cMZcr zcr=1`` read the *raw* (un-preemphasized,
  un-windowed) frames.
- MFCC branch: ``cVectorPreemphasis k=0.97`` (HTK within-frame semantics:
  ``y[0]=x[0]*(1-k)``) -> ``cWindower ham`` (symmetric Hamming, N-1
  denominator) -> ``cTransformFFT`` (zero-pad 400->512) -> ``cFFTmagphase``
  (magnitude) -> ``cMelspec htkcompatible=1`` (26 triangular filters on the
  HTK mel scale ``2595*log10(1+f/700)``, 20-8000 Hz, unit peak height,
  applied to the *magnitude* spectrum) -> ``cMfcc`` 1..12 (HTK DCT-II
  ``sqrt(2/26)*sum log(mel)*cos(pi*j*(m-0.5)/26)``, cepstral liftering
  L=22: ``c_j *= 1 + 11*sin(pi*j/22)``).
- Pitch branch: ``cAcf`` (ACF = irfft(mag^2)) on the same magnitude
  spectrum; ``cPitchACF`` maxPitch=500: voiceProb = clip(max_{lag>=32}
  acf[lag]/acf[0], 0, 1), F0 = sr/argmax-lag gated by voiceProb > 0.55
  (voicingCutoff). The INTERSPEECH-2009 paper defines F0 via the ACF; the
  shipped binary's cPitchACF additionally consults a cepstral peak — the
  two estimators only disagree by octave flips on frames where cepstral
  peak-picking is unstable (the 2T rahmonic), so we use the ACF lag, which
  is the stabler of the two and bit-identical on unambiguous frames.
- ``cContourSmoother smaWin=3`` on all 16 LLDs (centered moving average,
  window truncated at the contour edges).
- ``cDeltaRegression deltawin=2`` (HTK delta ``sum n*(x[t+n]-x[t-n])/10``,
  edge frames replicated).
- ``cFunctionals``: per LLD (max, min, range, maxPos, minPos, amean,
  linregc1, linregc2, linregerrQ, stddev, skewness, kurtosis) with
  openSMILE semantics: maxPos/minPos are raw frame indices (Extremes.norm
  = frame, first occurrence), regression over raw t=0..N-1 with
  linregerrQ = mean squared residual, biased moments (kurtosis is NOT
  excess — ``M4/sigma^4``).

Output ordering matches the openSMILE CSVs the reference parses
(``parse_acoustic_feature_csv_file`` drops the 2 leading columns):

- frame level (``-lldcsvoutput``): 32 columns
  ``[RMSenergy, zcr, voiceProb, F0, mfcc1..12]_sma`` then the same 16
  ``_sma_de`` deltas;
- utterance level (``-csvoutput``): 384 columns, LLD-major in the same
  order, the 12 functionals per LLD in config order.

Environment note: the openSMILE binary and its golden CSVs are unavailable
in this build environment (no binary, no package, no network), so exactness
is validated against an independently-coded NumPy oracle of the same
published component definitions (``tests/test_opensmile_is09.py``); the two
implementations share no code. Boundary conventions that openSMILE leaves
ambiguous (delta edge padding, mel log floor for digital silence) are
documented at their definition sites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
FRAME_LEN = 400          # 25 ms @ 16 kHz
HOP = 160                # 10 ms
N_FFT = 512              # next pow2 >= 400 (cTransformFFT)
N_MEL = 26
PREEMPH = 0.97
CEP_LIFTER = 22
MAX_PITCH = 500.0        # cPitchACF maxPitch
VOICING_CUTOFF = 0.55    # cPitchACF voicingCutoff default
MEL_FLOOR = 1e-8         # log floor for digital silence (openSMILE clamps
                         # at a tiny epsilon; only all-zero frames differ)

FUNCTIONALS = ("max", "min", "range", "maxPos", "minPos", "amean",
               "linregc1", "linregc2", "linregerrQ", "stddev",
               "skewness", "kurtosis")

LLD_NAMES = (("pcm_RMSenergy", "pcm_zcr", "voiceProb", "F0")
             + tuple(f"mfcc{i}" for i in range(1, 13)))


def n_frames(T: int) -> int:
    return max(1 + (T - FRAME_LEN) // HOP, 1)


def hamming(n: int) -> np.ndarray:
    return (0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
            ).astype(np.float32)


def htk_mel_bank(sr: int = SR, n_fft: int = N_FFT, n_mels: int = N_MEL,
                 fmin: float = 20.0, fmax: float = 8000.0) -> np.ndarray:
    """HTK triangular filters (n_mels, n_fft//2+1), unit peak height."""
    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    fft_freqs = np.arange(n_bins) * sr / n_fft
    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = from_mel(mel_pts)
    fb = np.zeros((n_mels, n_bins), np.float32)
    for m in range(n_mels):
        lo, c, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(c - lo, 1e-9)
        dn = (hi - fft_freqs) / max(hi - c, 1e-9)
        fb[m] = np.maximum(0.0, np.minimum(up, dn))
    return fb


def htk_dct_lifter(n_out: int = 12, n_in: int = N_MEL,
                   lifter: int = CEP_LIFTER) -> np.ndarray:
    """(n_out, n_in) HTK DCT rows for c_1..c_n_out, liftering folded in."""
    j = np.arange(1, n_out + 1)[:, None]
    m = np.arange(1, n_in + 1)[None, :]
    D = np.sqrt(2.0 / n_in) * np.cos(np.pi * j * (m - 0.5) / n_in)
    lift = 1.0 + (lifter / 2.0) * np.sin(np.pi * j[:, 0] / lifter)
    return (D * lift[:, None]).astype(np.float32)


def _frame_left(x: jnp.ndarray, nF: int) -> jnp.ndarray:
    """(B, T) -> (B, nF, FRAME_LEN), left-aligned complete frames."""
    idx = np.arange(nF)[:, None] * HOP + np.arange(FRAME_LEN)[None, :]
    idx = np.minimum(idx, x.shape[-1] - 1)
    return x[:, idx]


def _sma3(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """cContourSmoother smaWin=3 along axis 1, edge windows truncated.

    Mask-aware: the last VALID frame of each row is treated as the contour
    edge (window truncated, den=2), exactly as openSMILE sees an
    exact-length clip — padded rows beyond ``mask`` never leak into valid
    frames, so features are pad-length invariant (a batch row padded to its
    bucket edge equals a standalone exact-length extraction)."""
    mv = mask[:, :, None].astype(x.dtype)
    xm = x * mv
    num = (jnp.pad(xm, ((0, 0), (1, 0), (0, 0)))[:, :-1]
           + xm
           + jnp.pad(xm, ((0, 0), (0, 1), (0, 0)))[:, 1:])
    den = (jnp.pad(mv, ((0, 0), (1, 0), (0, 0)))[:, :-1]
           + mv
           + jnp.pad(mv, ((0, 0), (0, 1), (0, 0)))[:, 1:])
    return jnp.where(mv > 0, num / jnp.maximum(den, 1.0), x)


def _delta2(x: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """cDeltaRegression deltawin=2: HTK delta, edges replicated at each
    row's LAST VALID frame (``n_valid`` (B,)), not the padded buffer end."""
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    hi = jnp.maximum(n_valid[:, None] - 1, 0)

    def g(off):
        idx = jnp.clip(t + off, 0, hi)
        return jnp.take_along_axis(x, idx[:, :, None], axis=1)

    return (1.0 * (g(1) - g(-1)) + 2.0 * (g(2) - g(-2))) / 10.0


@functools.partial(jax.jit, static_argnames=())
def _lld_core(wav: jnp.ndarray, lengths: jnp.ndarray):
    """(B, T), (B,) -> (B, F, 16) smoothed LLDs + (B, F) frame mask."""
    B, T = wav.shape
    nF = n_frames(T)
    starts = jnp.arange(nF) * HOP
    mask = (starts[None, :] + FRAME_LEN) <= jnp.maximum(lengths, FRAME_LEN)[:, None]

    raw = _frame_left(wav, nF)                                  # (B,F,400)

    # -- energy / zcr on raw frames (cEnergy rms=1, cMZcr zcr=1)
    rms = jnp.sqrt(jnp.mean(raw ** 2, axis=-1))
    zc = (raw[..., 1:] * raw[..., :-1] < 0).astype(jnp.float32)
    zcr = jnp.sum(zc, axis=-1) / (FRAME_LEN - 1)

    # -- preemphasis (HTK within-frame) + Hamming
    pre = jnp.concatenate(
        [raw[..., :1] * (1.0 - PREEMPH),
         raw[..., 1:] - PREEMPH * raw[..., :-1]], axis=-1)
    win = pre * hamming(FRAME_LEN)

    spec = jnp.fft.rfft(win, n=N_FFT, axis=-1)
    mag = jnp.abs(spec)                                         # (B,F,257)
    pow_ = mag ** 2

    # -- MFCC 1..12 (HTK-compatible)
    fb = jnp.asarray(htk_mel_bank())
    mel = jnp.einsum("bfk,mk->bfm", mag, fb)
    logmel = jnp.log(jnp.maximum(mel, MEL_FLOOR))
    Dl = jnp.asarray(htk_dct_lifter())
    mfcc = jnp.einsum("bfm,cm->bfc", logmel, Dl)                # (B,F,12)

    # -- cPitchACF: ACF peak -> voicing probability and F0 (see docstring)
    acf = jnp.fft.irfft(pow_, n=N_FFT, axis=-1)                 # (B,F,512)
    lag_lo = int(np.ceil(SR / MAX_PITCH))                       # 32
    lag_hi = N_FFT // 2                                         # 256 (62.5 Hz)
    lags = np.arange(lag_lo, lag_hi)
    acn = acf[..., lag_lo:lag_hi] / (acf[..., :1] + 1e-12)
    voice_prob = jnp.clip(jnp.max(acn, axis=-1), 0.0, 1.0)
    acf_peak = jnp.argmax(acn, axis=-1)
    f0_raw = SR / jnp.asarray(lags, jnp.float32)[acf_peak]
    f0 = jnp.where(voice_prob > VOICING_CUTOFF, f0_raw, 0.0)

    lld = jnp.concatenate(
        [rms[..., None], zcr[..., None], voice_prob[..., None], f0[..., None],
         mfcc], axis=-1)                                        # (B,F,16)
    return _sma3(lld, mask), mask


def is09_frame(wav: jnp.ndarray, lengths: jnp.ndarray):
    """Frame-level IS09: (B, T) -> ((B, F, 32), (B, F) mask).

    Column order matches the openSMILE ``-lldcsvoutput`` CSV (16 ``_sma``
    LLDs then their 16 ``_sma_de`` deltas).
    """
    sma, mask = _lld_core(jnp.asarray(wav, jnp.float32),
                          jnp.asarray(lengths))
    n_valid = jnp.sum(mask.astype(jnp.int32), axis=1)
    return jnp.concatenate([sma, _delta2(sma, n_valid)], axis=-1), mask


def functionals_12(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """The IS09 functional grid over (B, F, D) -> (B, D*12), LLD-major.

    openSMILE semantics: raw-frame-index maxPos/minPos (first occurrence),
    regression over t=0..N-1 with mean-squared residual, biased moments.
    """
    m = mask[:, :, None].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)                    # (B,1)->(B,D)

    neg = jnp.where(mask[:, :, None], x, -jnp.inf)
    pos = jnp.where(mask[:, :, None], x, jnp.inf)
    mx = jnp.max(neg, axis=1)
    mn = jnp.min(pos, axis=1)
    max_pos = jnp.argmax(neg, axis=1).astype(x.dtype)
    min_pos = jnp.argmin(pos, axis=1).astype(x.dtype)

    mean = jnp.sum(x * m, axis=1) / n
    c = (x - mean[:, None, :]) * m
    var = jnp.sum(c ** 2, axis=1) / n
    std = jnp.sqrt(var)
    sigma = jnp.maximum(std, 1e-12)
    skew = jnp.sum(c ** 3, axis=1) / n / sigma ** 3
    kurt = jnp.sum(c ** 4, axis=1) / n / jnp.maximum(var, 1e-12) ** 2

    t = jnp.arange(x.shape[1], dtype=x.dtype)[None, :, None]
    tmean = jnp.sum(t * m, axis=1) / n
    tc = (t - tmean[:, None, :]) * m
    stt = jnp.maximum(jnp.sum(tc * tc, axis=1), 1e-12)
    slope = jnp.sum(tc * c, axis=1) / stt
    offset = mean - slope * tmean
    resid = (c - slope[:, None, :] * tc) * m
    errq = jnp.sum(resid ** 2, axis=1) / n

    cols = {"max": mx, "min": mn, "range": mx - mn, "maxPos": max_pos,
            "minPos": min_pos, "amean": mean, "linregc1": slope,
            "linregc2": offset, "linregerrQ": errq, "stddev": std,
            "skewness": skew, "kurtosis": kurt}
    per_lld = jnp.stack([cols[f] for f in FUNCTIONALS], axis=-1)  # (B,D,12)
    return per_lld.reshape(x.shape[0], -1)


@jax.jit
def is09_utt(wav: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Utterance-level IS09: (B, T) -> (B, 384).

    384 = 32 contours x 12 functionals, ordered LLD-major in openSMILE's
    CSV order (all ``_sma`` contours, then all ``_sma_de``).
    """
    x32, mask = is09_frame(wav, lengths)
    return functionals_12(x32, mask)
