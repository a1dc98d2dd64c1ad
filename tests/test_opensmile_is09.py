"""Faithful IS09 chain vs an independently-coded NumPy oracle.

The openSMILE binary is unavailable in this environment (no binary, no
package, no network), so the oracle below re-implements the published
``IS09_emotion.conf`` component definitions from scratch with plain
per-frame Python loops — deliberately sharing no code with
``mertools_tpu.ops.opensmile_is09`` — and the test demands per-dimension
agreement. This catches vectorization/masking/ordering bugs in the JAX
implementation; residual risk vs the real binary is limited to the
boundary conventions documented in the module docstring.
"""

import numpy as np
import pytest

from mertools_tpu.ops import opensmile_is09 as sm


# ----------------------------------------------------------------- oracle


def _oracle_llds(wav: np.ndarray) -> np.ndarray:
    """(T,) float32 -> (F, 16) smoothed LLDs, per the IS09 component chain."""
    sr, fl, hop, nfft = 16000, 400, 160, 512
    F = max(1 + (len(wav) - fl) // hop, 1)
    ham = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(fl) / (fl - 1))

    # HTK mel bank, 26 filters, 20-8000 Hz, unit height
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    edges = imel(np.linspace(mel(20.0), mel(8000.0), 28))
    bins = np.arange(nfft // 2 + 1) * sr / nfft

    rows = []
    for f in range(F):
        fr = wav[f * hop: f * hop + fl].astype(np.float64)
        if len(fr) < fl:
            fr = np.pad(fr, (0, fl - len(fr)))
        rms = np.sqrt(np.mean(fr ** 2))
        zcr = np.sum(fr[1:] * fr[:-1] < 0) / (fl - 1)

        pre = np.empty_like(fr)
        pre[0] = fr[0] * (1 - 0.97)
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        w = pre * ham
        spec = np.fft.rfft(w, n=nfft)
        mag = np.abs(spec)

        melE = np.zeros(26)
        for mth in range(26):
            lo, ce, hi = edges[mth], edges[mth + 1], edges[mth + 2]
            tri = np.clip(np.minimum((bins - lo) / (ce - lo),
                                     (hi - bins) / (hi - ce)), 0, None)
            melE[mth] = np.sum(mag * tri)
        logmel = np.log(np.maximum(melE, 1e-8))
        cc = np.zeros(12)
        for j in range(1, 13):
            cc[j - 1] = np.sqrt(2.0 / 26.0) * np.sum(
                logmel * np.cos(np.pi * j * (np.arange(1, 27) - 0.5) / 26.0))
            cc[j - 1] *= 1.0 + 11.0 * np.sin(np.pi * j / 22.0)

        p = mag ** 2
        acf = np.fft.irfft(p, n=nfft)
        lag_lo, lag_hi = 32, 256
        vp = float(np.clip(np.max(acf[lag_lo:lag_hi]) / (acf[0] + 1e-12),
                           0.0, 1.0))
        lag = lag_lo + int(np.argmax(acf[lag_lo:lag_hi]))
        f0 = sr / lag if vp > 0.55 else 0.0
        rows.append([rms, zcr, vp, f0] + cc.tolist())
    x = np.asarray(rows)

    # cContourSmoother smaWin=3, truncated edges
    out = np.copy(x)
    for t in range(len(x)):
        lo, hi = max(t - 1, 0), min(t + 2, len(x))
        out[t] = x[lo:hi].mean(0)
    return out


def _oracle_delta(x: np.ndarray) -> np.ndarray:
    xp = np.pad(x, ((2, 2), (0, 0)), mode="edge")
    return np.stack([(xp[t + 3] - xp[t + 1]) + 2 * (xp[t + 4] - xp[t])
                     for t in range(len(x))]) / 10.0


def _oracle_functionals(col: np.ndarray) -> list:
    N = len(col)
    mx, mn = col.max(), col.min()
    t = np.arange(N, dtype=np.float64)
    slope, offset = np.polyfit(t, col, 1)
    resid = col - (slope * t + offset)
    mean = col.mean()
    var = ((col - mean) ** 2).mean()
    std = np.sqrt(var)
    skew = ((col - mean) ** 3).mean() / max(std, 1e-12) ** 3
    kurt = ((col - mean) ** 4).mean() / max(var, 1e-12) ** 2
    return [mx, mn, mx - mn, float(np.argmax(col)), float(np.argmin(col)),
            mean, slope, offset, (resid ** 2).mean(), std, skew, kurt]


# ------------------------------------------------------------------ tests


def _speechlike(seed, dur=1.0, sr=16000):
    """Harmonic tone + noise with amplitude/pitch modulation."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * sr)) / sr
    f0 = 140.0 + 30.0 * np.sin(2 * np.pi * 1.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(5))
    x *= 0.4 + 0.3 * np.sin(2 * np.pi * 2.3 * t)
    x += 0.01 * rng.normal(size=len(t))
    return (0.3 * x / np.abs(x).max()).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_frame_level_matches_oracle(seed):
    wav = _speechlike(seed)
    ours, mask = sm.is09_frame(wav[None], np.array([len(wav)]))
    ours = np.asarray(ours)[0][np.asarray(mask)[0]]

    sma = _oracle_llds(wav)
    ref = np.concatenate([sma, _oracle_delta(sma)], axis=-1)
    assert ours.shape == ref.shape == (ref.shape[0], 32)
    # all 32 contours: tight absolute/relative agreement
    for d in range(32):
        np.testing.assert_allclose(ours[:, d], ref[:, d], rtol=2e-3,
                                   atol=2e-3, err_msg=f"lld dim {d}")


def test_utt_level_matches_oracle():
    wav = _speechlike(2)
    ours = np.asarray(sm.is09_utt(wav[None], np.array([len(wav)])))[0]
    assert ours.shape == (384,)

    sma = _oracle_llds(wav)
    x32 = np.concatenate([sma, _oracle_delta(sma)], axis=-1)
    ref = np.concatenate([_oracle_functionals(x32[:, d]) for d in range(32)])
    # per-dim: correlation-style tolerance scaled to each contour's range
    scale = np.repeat(np.maximum(np.abs(x32).max(0), 1e-3), 12)
    bad = np.abs(ours - ref) / scale
    assert np.max(bad) < 5e-3, (np.argmax(bad), np.max(bad))


def test_ragged_batch_equals_per_clip():
    sr = 16000
    a, b = _speechlike(3, 0.53), _speechlike(4, 1.0)
    batch = np.zeros((2, len(b)), np.float32)
    batch[0, : len(a)] = a
    batch[1] = b
    lengths = np.array([len(a), len(b)])
    both = np.asarray(sm.is09_utt(batch, lengths))
    solo = np.asarray(sm.is09_utt(batch[:1], lengths[:1]))
    np.testing.assert_allclose(both[0], solo[0], rtol=1e-4, atol=1e-4)


def test_f0_on_harmonic_tone():
    # Harmonic-rich signals at >=200 Hz: the IS09 ACF chain's voicing
    # detector is legitimately weak at long lags (the Hamming-windowed,
    # zero-padded linear ACF attenuates lag L by ~the window correlation,
    # which drops below the 0.55 cutoff near L/N ~ 0.35, i.e. F0 < ~115 Hz
    # on 25 ms frames) — that is chain behavior, not an implementation bug.
    sr = 16000
    t = np.arange(sr) / sr
    for freq in [200.0, 330.0]:
        wav = np.sin(2 * np.pi * freq * t) + 0.3 * np.sin(
            2 * np.pi * 2 * freq * t)
        wav = (0.3 * wav / np.abs(wav).max()).astype(np.float32)
        sma, mask = sm.is09_frame(wav[None], np.array([sr]))
        f0 = np.asarray(sma)[0, :, 3][np.asarray(mask)[0]]
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.6 * len(f0), freq
        # ACF lag grid quantizes F0 to sr/round(sr/f); 6% tolerance
        med = np.median(voiced)
        assert abs(med - freq) / freq < 0.06, (freq, med)


def test_pad_length_invariance():
    """ADVICE r2 (high): smoothing/deltas must truncate at the mask boundary,
    not the buffer edge — a clip padded to a larger bucket must produce the
    SAME features as a truly exact-length extraction (production
    extract_batch pads every clip to bucket edges)."""
    a = _speechlike(7, 0.53)  # 8480 samples
    exact = np.asarray(sm.is09_utt(a[None], np.array([len(a)])))[0]
    for pad_to in (16000, 48000):
        buf = np.zeros((1, pad_to), np.float32)
        buf[0, : len(a)] = a
        padded = np.asarray(sm.is09_utt(buf, np.array([len(a)])))[0]
        np.testing.assert_allclose(padded, exact, rtol=1e-4, atol=1e-4,
                                   err_msg=str(pad_to))

    # frame level too: valid frames identical, independent of pad length
    sma_e, mask_e = sm.is09_frame(a[None], np.array([len(a)]))
    buf = np.zeros((1, 16000), np.float32)
    buf[0, : len(a)] = a
    sma_p, mask_p = sm.is09_frame(buf, np.array([len(a)]))
    nv = int(np.asarray(mask_e).sum())
    assert int(np.asarray(mask_p).sum()) == nv
    np.testing.assert_allclose(np.asarray(sma_p)[0, :nv],
                               np.asarray(sma_e)[0, :nv],
                               rtol=1e-4, atol=1e-4)
