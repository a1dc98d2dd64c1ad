"""Faithful openSMILE ``IS10_paraling.conf`` feature chain, batched on device.

The reference extracts IS10 by shelling out to the openSMILE binary with
``config/IS10_paraling.conf`` (``MERBench/feature_extraction/audio/
handcrafted_feature_func.py:37,50-51``); its own docstring records the
output contract (``:18``): **frame level 32 dims, utterance level 1582**.
This module assembles that chain from the validated component library built
for IS09 (:mod:`.opensmile_is09`: HTK framing/preemphasis/Hamming/mel/DCT,
mask-aware sma + delta) and eGeMAPS (:mod:`.egemaps`: SHS pitch + Viterbi
smoothing) plus LPC/LSP (:mod:`.handcrafted`).

The INTERSPEECH 2010 Paralinguistic Challenge set (Schuller et al. 2010):

- 38 LLDs @ 25 ms / 10 ms frames, smoothed (cContourSmoother smaWin=3):
  **standard group** (34): pcm_loudness, mfcc 0-14 (HTK-compatible, 26 mel
  bands 20-8000 Hz, lifter 22 — the IS09 branch extended to c0),
  logMelFreqBand 0-7 (log of 8 HTK mel band magnitudes), lspFreq 0-7 (line
  spectral frequencies from LPC order 8), F0finEnv (sample-hold envelope of
  F0), voicingFinalUnclipped (SHS voicing score, unclipped);
  **pitch group** (4): F0final (SHS + Viterbi, 52-620 Hz, 0 = unvoiced),
  jitterLocal, jitterDDP, shimmerLocal.
- cDeltaRegression deltawin=2 on all 38.
- Functionals: 21 on the standard group x {sma, sma_de} (34 x 2 x 21 =
  1428); 19 (the same minus maxPos/minPos) on the pitch group x {sma,
  sma_de} over VOICED frames only (4 x 2 x 19 = 152); plus ``numOnsets``
  (voiced-segment onset count) and ``turnDuration`` (clip length, s):
  1428 + 152 + 2 = **1582**.
- Frame level (``-lldcsvoutput``): the 32 spectral-branch ``_sma``
  contours [pcm_loudness, mfcc0-14, logMelFreqBand0-7, lspFreq0-7]
  (the reference-observed 32; the pitch-branch contours live on a
  separate openSMILE level that the lld CSV does not include).

The 21 functionals (openSMILE names / exact definitions used here):
maxPos, minPos (raw frame index of extremum, first occurrence), amean,
linregc1 / linregc2 (slope / offset over t = 0..N-1), linregerrA /
linregerrQ (mean absolute / mean squared regression residual), stddev,
skewness, kurtosis (biased moments, kurtosis NOT excess — IS09 semantics),
quartile1/2/3, iqr1-2, iqr2-3, iqr1-3, percentile1.0, percentile99.0,
pctlrange0-1 (interpolated percentiles), upleveltime75, upleveltime90
(fraction of frames above min + 0.75/0.90 x range).

Environment note: as for IS09/eGeMAPS, the openSMILE binary is unavailable
here (no binary, no package, no network); exactness is validated against an
independently-coded NumPy oracle of the same published definitions
(``tests/test_opensmile_is10.py``). Documented deviations from the binary:
(a) F0 sub-components: SHS + Viterbi reproduce cPitchShs +
cPitchSmootherViterbi's roles with this implementation's weight constants
(egemaps.py:_viterbi_f0); (b) jitter/shimmer are frame-contour proxies of
cPitchJitter's period-level measures (eGeMAPS module, same deviation);
(c) lspFreq is emitted in radians in [0, pi] (openSMILE normalized
frequency x pi); (d) loudness uses I0 = 1e-6 as the Zwicker intensity
reference (cIntensity narrow-band approximation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import egemaps as eg
from .handcrafted import _lpc_levinson, _lsp_from_lpc
from .opensmile_is09 import (FRAME_LEN, HOP, MEL_FLOOR, N_FFT, PREEMPH, SR,
                             _delta2, _frame_left, _sma3, hamming,
                             htk_dct_lifter, htk_mel_bank, n_frames)

F0_LO, F0_HI = 52.0, 620.0        # IS10_paraling cPitchShs range
N_CAND = 180                      # log-spaced candidates (~21 cents)
VOICING_CUTOFF = 0.70             # cPitchShs voicingCutoff default
WIN_P = 960                       # 60 ms Gaussian pitch window
NFFT_P = 1024
LPC_ORDER = 8

_CAND = np.exp(np.linspace(np.log(F0_LO), np.log(F0_HI), N_CAND)
               ).astype(np.float32)

FUNCTIONALS_21 = ("maxPos", "minPos", "amean", "linregc1", "linregc2",
                  "linregerrA", "linregerrQ", "stddev", "skewness",
                  "kurtosis", "quartile1", "quartile2", "quartile3",
                  "iqr1-2", "iqr2-3", "iqr1-3", "percentile1.0",
                  "percentile99.0", "pctlrange0-1", "upleveltime75",
                  "upleveltime90")
FUNCTIONALS_19 = FUNCTIONALS_21[2:]          # pitch group drops maxPos/minPos

LLD_STD = (("pcm_loudness",) + tuple(f"mfcc{i}" for i in range(15))
           + tuple(f"logMelFreqBand{i}" for i in range(8))
           + tuple(f"lspFreq{i}" for i in range(8))
           + ("F0finEnv", "voicingFinalUnclipped"))        # 34
LLD_PITCH = ("F0final", "jitterLocal", "jitterDDP", "shimmerLocal")  # 4
LLD_FRAME = LLD_STD[:32]                                   # lld CSV: 32

assert len(LLD_STD) == 34 and len(LLD_FRAME) == 32

IS10_NAMES = tuple(
    [f"{n}_sma_{f}" for n in LLD_STD for f in FUNCTIONALS_21]
    + [f"{n}_sma_de_{f}" for n in LLD_STD for f in FUNCTIONALS_21]
    + [f"{n}_sma_{f}" for n in LLD_PITCH for f in FUNCTIONALS_19]
    + [f"{n}_sma_de_{f}" for n in LLD_PITCH for f in FUNCTIONALS_19]
    + ["F0final_numOnsets", "turnDuration"])
assert len(IS10_NAMES) == 1582, len(IS10_NAMES)


def _frames_at_valid(x: jnp.ndarray, nF: int, win: int,
                     lengths: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, nF, win) frames whose indices clamp to each row's LAST
    VALID sample (not the buffer end): the 60 ms pitch window of late
    frames crosses the clip boundary, and clamping to ``lengths-1`` makes
    the read content independent of how far the buffer is padded
    (pad-length invariance; an exact-length buffer clamps the same way)."""
    idx = np.arange(nF)[:, None] * HOP + np.arange(win)[None, :]
    idx = jnp.minimum(jnp.asarray(idx)[None],
                      (jnp.maximum(lengths, 1) - 1)[:, None, None])
    return jax.vmap(lambda xi, ii: xi[ii])(x, idx)


@jax.jit
def _lld_core(wav: jnp.ndarray, lengths: jnp.ndarray):
    """(B, T), (B,) -> (std (B,F,34), pitch (B,F,4), voiced (B,F), mask)."""
    B, T = wav.shape
    nF = n_frames(T)
    starts = jnp.arange(nF) * HOP
    mask = (starts[None, :] + FRAME_LEN) <= jnp.maximum(
        lengths, FRAME_LEN)[:, None]

    raw = _frame_left(wav, nF)                               # (B,F,400)
    ham = hamming(FRAME_LEN)

    # -- pcm_loudness (cIntensity loudness=1: Zwicker (I/I0)^0.3 on the
    # Hamming-weighted frame intensity)
    wsum = float(np.sum(ham))
    intensity = jnp.sum(raw ** 2 * ham, axis=-1) / wsum
    loudness = (jnp.maximum(intensity, 0.0) / 1e-6) ** 0.3

    # -- HTK MFCC 0-14 branch (IS09 chain with c0 included)
    pre = jnp.concatenate(
        [raw[..., :1] * (1.0 - PREEMPH),
         raw[..., 1:] - PREEMPH * raw[..., :-1]], axis=-1)
    win = pre * ham
    mag = jnp.abs(jnp.fft.rfft(win, n=N_FFT, axis=-1))       # (B,F,257)
    fb26 = jnp.asarray(htk_mel_bank())
    mel26 = jnp.einsum("bfk,mk->bfm", mag, fb26)
    logmel26 = jnp.log(jnp.maximum(mel26, MEL_FLOOR))
    # HTK DCT rows 0..14 over 26 bands; c0 row is unliftered (sin(0)=0)
    j = np.arange(0, 15)[:, None]
    m = np.arange(1, 27)[None, :]
    D = np.sqrt(2.0 / 26.0) * np.cos(np.pi * j * (m - 0.5) / 26.0)
    lift = 1.0 + 11.0 * np.sin(np.pi * j[:, 0] / 22.0)
    Dl = jnp.asarray((D * lift[:, None]).astype(np.float32))
    mfcc = jnp.einsum("bfm,cm->bfc", logmel26, Dl)           # (B,F,15)

    # -- logMelFreqBand 0-7 (8 HTK mel bands, log magnitude energies)
    fb8 = jnp.asarray(htk_mel_bank(n_mels=8))
    logmel8 = jnp.log(jnp.maximum(
        jnp.einsum("bfk,mk->bfm", mag, fb8), MEL_FLOOR))     # (B,F,8)

    # -- lspFreq 0-7 from LPC order 8 of the windowed-frame autocorrelation
    pw = jnp.fft.rfft(win, n=2 * N_FFT, axis=-1)
    acf_w = jnp.fft.irfft(pw.real ** 2 + pw.imag ** 2,
                          n=2 * N_FFT, axis=-1)[..., : LPC_ORDER + 1]
    lpc = _lpc_levinson(acf_w.reshape(B * nF, LPC_ORDER + 1), LPC_ORDER)
    lsp = _lsp_from_lpc(lpc.reshape(B * nF, LPC_ORDER), LPC_ORDER)
    lsp = lsp.reshape(B, nF, LPC_ORDER)                      # (B,F,8) rad

    # -- pitch branch: 60 ms Gaussian window, SHS + Viterbi (52-620 Hz)
    fr_p = _frames_at_valid(wav, nF, WIN_P, lengths) * eg._gauss_win(WIN_P)
    mag_p = jnp.abs(jnp.fft.rfft(fr_p, n=NFFT_P, axis=-1))
    pow_p = mag_p ** 2
    acf = jnp.fft.irfft(pow_p, n=NFFT_P, axis=-1)
    lag_lo = int(SR / F0_HI)                                 # 25
    lag_hi = min(int(SR / F0_LO) + 1, NFFT_P // 2)           # 308
    acn = acf[..., lag_lo:lag_hi] / (acf[..., :1] + 1e-12)
    p_voiced = jnp.max(acn, axis=-1)                         # UNCLIPPED
    shs = eg._shs_scores(mag_p, cand_freqs=_CAND, nfft=NFFT_P)
    f0 = eg._viterbi_f0(shs, jnp.clip(p_voiced, 0.0, 1.0), mask,
                        cand_freqs=_CAND)
    voiced = (f0 > 0) & (p_voiced > VOICING_CUTOFF) & mask
    f0 = jnp.where(voiced, f0, 0.0)

    # F0finEnv: sample-hold envelope (unvoiced frames keep the last voiced
    # F0; leading unvoiced frames are 0)
    def hold(carry, x):
        e = jnp.where(x > 0, x, carry)
        return e, e
    _, env = jax.lax.scan(hold, jnp.zeros(B), f0.T)
    f0_env = env.T

    # jitter / shimmer: frame-contour proxies (docstring deviation (b))
    per = jnp.where(voiced, 1.0 / jnp.maximum(f0, 1.0), 0.0)
    per_prev = jnp.pad(per, ((0, 0), (1, 0)))[:, :-1]
    both = voiced & (per_prev > 0)
    jit = jnp.abs(per - per_prev) / jnp.maximum((per + per_prev) / 2, 1e-6)
    jitter = jnp.where(both, jit, 0.0)
    jit_prev = jnp.pad(jitter, ((0, 0), (1, 0)))[:, :-1]
    both3 = both & (jnp.pad(both, ((0, 0), (1, 0)))[:, :-1])
    jitter_ddp = jnp.where(both3, jnp.abs(jitter - jit_prev), 0.0)
    rms_p = jnp.sqrt(jnp.mean(fr_p ** 2, axis=-1) + 1e-12)
    rms_prev = jnp.pad(rms_p, ((0, 0), (1, 0)), constant_values=1e-6)[:, :-1]
    shim = jnp.abs(rms_p - rms_prev) / jnp.maximum(
        (rms_p + rms_prev) / 2, 1e-8)
    shimmer = jnp.where(both, shim, 0.0)

    std = jnp.concatenate(
        [loudness[..., None], mfcc, logmel8, lsp,
         f0_env[..., None], p_voiced[..., None]], axis=-1)   # (B,F,34)
    pitch = jnp.stack([f0, jitter, jitter_ddp, shimmer], axis=-1)  # (B,F,4)

    std = _sma3(std, mask)
    pitch = _sma3nz_nd(pitch, mask)
    voiced_sm = pitch[..., 0] > 0
    return std, pitch, voiced_sm & mask, mask


def _sma3nz_nd(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """eGeMAPS _sma3nz lifted to (B, F, D): nonzero-and-valid neighbours
    only; zeros (unvoiced) stay zero."""
    nz = ((x != 0) & mask[:, :, None]).astype(x.dtype)
    xm = x * nz
    num = (jnp.pad(xm, ((0, 0), (1, 0), (0, 0)))[:, :-1] + xm
           + jnp.pad(xm, ((0, 0), (0, 1), (0, 0)))[:, 1:])
    den = (jnp.pad(nz, ((0, 0), (1, 0), (0, 0)))[:, :-1] + nz
           + jnp.pad(nz, ((0, 0), (0, 1), (0, 0)))[:, 1:])
    return jnp.where(nz > 0, num / jnp.maximum(den, 1.0), 0.0)


def functionals_21(x: jnp.ndarray, mask: jnp.ndarray,
                   drop_extremes: bool = False) -> jnp.ndarray:
    """(B, F, D), (B, F) -> (B, D * n_funcs), LLD-major, in
    :data:`FUNCTIONALS_21` order (19 when ``drop_extremes``)."""
    B, F, D = x.shape
    m = mask[:, :, None].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)

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

    t = jnp.arange(F, dtype=x.dtype)[None, :, None]
    tmean = jnp.sum(t * m, axis=1) / n
    tc = (t - tmean[:, None, :]) * m
    stt = jnp.maximum(jnp.sum(tc * tc, axis=1), 1e-12)
    slope = jnp.sum(tc * c, axis=1) / stt
    offset = mean - slope * tmean
    resid = (c - slope[:, None, :] * tc) * m
    err_a = jnp.sum(jnp.abs(resid), axis=1) / n
    err_q = jnp.sum(resid ** 2, axis=1) / n

    # interpolated percentiles over the masked values (eGeMAPS method)
    big = jnp.where(mask[:, :, None], x, jnp.inf)
    s = jnp.sort(big, axis=1)
    nn = n  # (B, D)

    def pctl(q):
        pos_ = q * (nn - 1.0)
        i0 = jnp.clip(jnp.floor(pos_).astype(jnp.int32), 0, F - 1)
        i1 = jnp.clip(i0 + 1, 0, F - 1)
        w = pos_ - i0.astype(pos_.dtype)
        v0 = jnp.take_along_axis(s, i0[:, None, :], axis=1)[:, 0]
        v1 = jnp.take_along_axis(s, i1[:, None, :], axis=1)[:, 0]
        v1 = jnp.where(jnp.isfinite(v1), v1, v0)
        return (1 - w) * v0 + w * v1

    q1, q2, q3 = pctl(0.25), pctl(0.5), pctl(0.75)
    p1, p99 = pctl(0.01), pctl(0.99)

    rng = mx - mn

    def uplevel(frac):
        thr = mn + frac * rng
        above = (x > thr[:, None, :]) & mask[:, :, None]
        return jnp.sum(above.astype(x.dtype), axis=1) / n

    cols = {"maxPos": max_pos, "minPos": min_pos, "amean": mean,
            "linregc1": slope, "linregc2": offset, "linregerrA": err_a,
            "linregerrQ": err_q, "stddev": std, "skewness": skew,
            "kurtosis": kurt, "quartile1": q1, "quartile2": q2,
            "quartile3": q3, "iqr1-2": q2 - q1, "iqr2-3": q3 - q2,
            "iqr1-3": q3 - q1, "percentile1.0": p1, "percentile99.0": p99,
            "pctlrange0-1": p99 - p1, "upleveltime75": uplevel(0.75),
            "upleveltime90": uplevel(0.90)}
    funcs = FUNCTIONALS_19 if drop_extremes else FUNCTIONALS_21
    per_lld = jnp.stack([cols[f] for f in funcs], axis=-1)   # (B, D, nf)
    # empty masks (e.g. fully-unvoiced pitch group) -> 0, not inf/nan
    ok = (jnp.sum(m, axis=1) > 0)
    per_lld = jnp.where(ok[..., None], per_lld, 0.0)
    return jnp.nan_to_num(per_lld, posinf=0.0, neginf=0.0
                          ).reshape(B, -1)


def is10_frame(wav: jnp.ndarray, lengths: jnp.ndarray):
    """Frame-level IS10: (B, T) -> ((B, F, 32), (B, F) mask).

    The 32 ``_sma`` spectral-branch contours the reference's lld CSV
    carries (handcrafted_feature_func.py:18)."""
    std, _, _, mask = _lld_core(jnp.asarray(wav, jnp.float32),
                                jnp.asarray(lengths))
    return std[..., :32], mask


@jax.jit
def is10_utt(wav: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Utterance-level IS10: (B, T) -> (B, 1582) in ``IS10_NAMES`` order."""
    std, pitch, voiced, mask = _lld_core(jnp.asarray(wav, jnp.float32),
                                         jnp.asarray(lengths))
    n_valid = jnp.sum(mask.astype(jnp.int32), axis=1)
    std_de = _delta2(std, n_valid)
    pitch_de = _delta2(pitch, n_valid)

    parts = [functionals_21(std, mask),
             functionals_21(std_de, mask),
             # pitch-group functionals run over VOICED frames only
             functionals_21(pitch, voiced, drop_extremes=True),
             functionals_21(pitch_de, voiced, drop_extremes=True)]

    # numOnsets: voiced-segment starts on the smoothed F0 contour
    prev = jnp.pad(voiced, ((0, 0), (1, 0)))[:, :-1]
    n_onsets = jnp.sum((voiced & ~prev).astype(jnp.float32), axis=1)
    dur = n_valid.astype(jnp.float32) * (HOP / SR)
    parts.append(jnp.stack([n_onsets, dur], axis=-1))
    out = jnp.concatenate(parts, axis=-1)
    assert out.shape[-1] == 1582, out.shape
    return out
