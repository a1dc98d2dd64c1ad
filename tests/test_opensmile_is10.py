"""Faithful IS10_paraling chain vs an independently-coded NumPy oracle.

Like the IS09/eGeMAPS tests: openSMILE is unavailable in this environment,
so the oracle re-implements the published component definitions with plain
per-frame Python loops sharing no code with ``ops/opensmile_is10``, and the
reference contract (handcrafted_feature_func.py:18: frame 32 / utt 1582)
pins the output structure.
"""

import numpy as np
import pytest

from mertools_tpu.ops import opensmile_is10 as s10


def _speechlike(seed, dur, sr=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * sr)) / sr
    f0 = 140.0 + 30.0 * np.sin(2 * np.pi * 1.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(5))
    x = x * (0.5 + 0.45 * np.sin(2 * np.pi * 2.1 * t))
    x = x + 0.05 * rng.normal(size=t.size)
    return (0.4 * x / np.abs(x).max()).astype(np.float32)


def test_names_and_dims():
    assert len(s10.IS10_NAMES) == 1582
    assert len(s10.LLD_FRAME) == 32
    assert s10.IS10_NAMES[0] == "pcm_loudness_sma_maxPos"
    assert s10.IS10_NAMES[-2:] == ("F0final_numOnsets", "turnDuration")
    # structural split: 34*21*2 + 4*19*2 + 2
    assert 34 * 21 * 2 + 4 * 19 * 2 + 2 == 1582
    wav = _speechlike(0, 0.6)
    x, mask = s10.is10_frame(wav[None], np.array([len(wav)]))
    assert x.shape[-1] == 32
    u = np.asarray(s10.is10_utt(wav[None], np.array([len(wav)])))
    assert u.shape == (1, 1582) and np.isfinite(u).all()


def _oracle_spectral_llds(wav):
    """(T,) -> (F, 24): loudness, mfcc0-14, logMelFreqBand0-7 (unsmoothed),
    coded independently from the published definitions."""
    sr, fl, hop, nfft = 16000, 400, 160, 512
    F = max(1 + (len(wav) - fl) // hop, 1)
    ham = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(fl) / (fl - 1))
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    def bank(nm):
        edges = imel(np.linspace(mel(20.0), mel(8000.0), nm + 2))
        bins = np.arange(nfft // 2 + 1) * sr / nfft
        fb = np.zeros((nm, nfft // 2 + 1))
        for m in range(nm):
            lo, ce, hi = edges[m], edges[m + 1], edges[m + 2]
            fb[m] = np.clip(np.minimum((bins - lo) / (ce - lo),
                                       (hi - bins) / (hi - ce)), 0, None)
        return fb

    fb26, fb8 = bank(26), bank(8)
    rows = []
    for f in range(F):
        fr = wav[f * hop: f * hop + fl].astype(np.float64)
        if len(fr) < fl:
            fr = np.pad(fr, (0, fl - len(fr)))
        inten = np.sum(ham * fr ** 2) / np.sum(ham)
        loud = (max(inten, 0.0) / 1e-6) ** 0.3
        pre = np.empty_like(fr)
        pre[0] = fr[0] * (1 - 0.97)
        pre[1:] = fr[1:] - 0.97 * fr[:-1]
        mag = np.abs(np.fft.rfft(pre * ham, n=nfft))
        lm26 = np.log(np.maximum(fb26 @ mag, 1e-8))
        cc = np.zeros(15)
        for j in range(15):
            cc[j] = np.sqrt(2.0 / 26.0) * np.sum(
                lm26 * np.cos(np.pi * j * (np.arange(1, 27) - 0.5) / 26.0))
            cc[j] *= 1.0 + 11.0 * np.sin(np.pi * j / 22.0)
        lm8 = np.log(np.maximum(fb8 @ mag, 1e-8))
        rows.append(np.concatenate([[loud], cc, lm8]))
    return np.stack(rows)


def _oracle_sma(x):
    """3-frame edge-truncated moving average, per-frame loop."""
    F = len(x)
    out = np.empty_like(x)
    for t in range(F):
        lo, hi = max(0, t - 1), min(F, t + 2)
        out[t] = x[lo:hi].mean(0)
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_spectral_branch_matches_oracle(seed):
    wav = _speechlike(seed, 0.5)
    x, mask = s10.is10_frame(wav[None], np.array([len(wav)]))
    ours = np.asarray(x)[0]                        # (F, 32) smoothed
    ref = _oracle_sma(_oracle_spectral_llds(wav))  # (F, 24)
    F = min(len(ours), len(ref))
    scale = np.maximum(np.abs(ref[:F]).max(0), 1e-3)
    # loudness + mfcc0-14 + logmel8 = the first 24 columns
    bad = np.abs(ours[:F, :24] - ref[:F]) / scale
    assert np.max(bad) < 5e-3, (np.argmax(bad.max(0)), np.max(bad))


def test_lsp_matches_root_oracle():
    """lspFreq via the grid method vs the exact polynomial roots of the
    P/Q LSP polynomials of the same LPC coefficients."""
    import jax.numpy as jnp

    from mertools_tpu.ops.handcrafted import _lpc_levinson, _lsp_from_lpc

    rng = np.random.default_rng(1)
    # a stable AR(4) process gives well-separated LSPs
    x = rng.normal(size=4000)
    for a in (0.6, -0.3):
        x[2:] += a * x[1:-1]
    r = np.array([np.dot(x[: len(x) - k], x[k:]) for k in range(9)])
    lpc = np.asarray(_lpc_levinson(jnp.asarray(r[None]), 8))[0]
    ours = np.asarray(_lsp_from_lpc(jnp.asarray(lpc[None]), 8))[0]

    a_full = np.concatenate([[1.0], -lpc])
    P = np.zeros(10)
    Q = np.zeros(10)
    P[:9] += a_full
    P[1:] += a_full[::-1]
    Q[:9] += a_full
    Q[1:] -= a_full[::-1]
    roots = []
    for poly in (P, Q):
        rts = np.roots(poly[::-1])
        ang = np.angle(rts[np.abs(np.abs(rts) - 1.0) < 1e-4])
        roots.extend(a for a in ang if 1e-6 < a < np.pi - 1e-6)
    ref = np.sort(np.unique(np.round(roots, 6)))[:8]
    assert len(ref) == 8
    # grid resolution is pi/256 ~ 0.0123 rad
    np.testing.assert_allclose(ours, ref, atol=0.02)


def test_f0_and_temporal_on_harmonic_tone():
    sr = 16000
    t = np.arange(sr) / sr
    wav = sum((0.6 ** k) * np.sin(2 * np.pi * (k + 1) * 160.0 * t)
              for k in range(6))
    wav = (0.35 * wav / np.abs(wav).max()).astype(np.float32)
    u = np.asarray(s10.is10_utt(wav[None], np.array([sr])))[0]
    names = s10.IS10_NAMES
    f0m = u[names.index("F0final_sma_amean")]
    assert abs(f0m - 160.0) / 160.0 < 0.05, f0m
    assert u[names.index("F0final_numOnsets")] == 1.0
    np.testing.assert_allclose(u[names.index("turnDuration")], 0.98,
                               atol=1e-5)
    # voicing probability of a clean tone is high
    assert u[names.index("voicingFinalUnclipped_sma_amean")] > 0.7


def _np_functionals_21(x):
    """Independent NumPy oracle of the 21-functional grid on (F,) data."""
    F = len(x)
    t = np.arange(F, dtype=np.float64)
    mx, mn = x.max(), x.min()
    out = {"maxPos": float(np.argmax(x)), "minPos": float(np.argmin(x)),
           "amean": x.mean()}
    A = np.polyfit(t, x, 1)
    out["linregc1"], out["linregc2"] = A[0], A[1]
    resid = x - np.polyval(A, t)
    out["linregerrA"] = np.abs(resid).mean()
    out["linregerrQ"] = (resid ** 2).mean()
    out["stddev"] = x.std()
    c = x - x.mean()
    out["skewness"] = (c ** 3).mean() / max(x.std(), 1e-12) ** 3
    out["kurtosis"] = (c ** 4).mean() / max(x.var(), 1e-12) ** 2
    for q, nm in ((25, "quartile1"), (50, "quartile2"), (75, "quartile3"),
                  (1, "percentile1.0"), (99, "percentile99.0")):
        out[nm] = np.percentile(x, q, method="linear")
    out["iqr1-2"] = out["quartile2"] - out["quartile1"]
    out["iqr2-3"] = out["quartile3"] - out["quartile2"]
    out["iqr1-3"] = out["quartile3"] - out["quartile1"]
    out["pctlrange0-1"] = out["percentile99.0"] - out["percentile1.0"]
    rng_ = mx - mn
    out["upleveltime75"] = np.mean(x > mn + 0.75 * rng_)
    out["upleveltime90"] = np.mean(x > mn + 0.90 * rng_)
    return out


def test_functional_grid_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    F, D = 57, 3
    x = rng.normal(size=(1, F, D)).astype(np.float32) * [1.0, 5.0, 0.2]
    mask = np.ones((1, F), bool)
    got = np.asarray(s10.functionals_21(x, mask)).reshape(D, 21)
    for d in range(D):
        ref = _np_functionals_21(x[0, :, d].astype(np.float64))
        for i, f in enumerate(s10.FUNCTIONALS_21):
            np.testing.assert_allclose(
                got[d, i], ref[f], rtol=2e-3, atol=2e-3,
                err_msg=f"{f} (lld {d})")


def test_pad_length_invariance():
    a = _speechlike(7, 0.53)
    exact = np.asarray(s10.is10_utt(a[None], np.array([len(a)])))[0]
    buf = np.zeros((1, 16000), np.float32)
    buf[0, : len(a)] = a
    padded = np.asarray(s10.is10_utt(buf, np.array([len(a)])))[0]
    scale = np.maximum(np.abs(exact), 1.0)
    np.testing.assert_allclose(padded / scale, exact / scale, atol=2e-4)


def test_ragged_batch_equals_per_clip():
    a, b = _speechlike(3, 0.53), _speechlike(4, 1.0)
    batch = np.zeros((2, len(b)), np.float32)
    batch[0, : len(a)] = a
    batch[1] = b
    lengths = np.array([len(a), len(b)])
    both = np.asarray(s10.is10_utt(batch, lengths))
    solo = np.asarray(s10.is10_utt(batch[:1], lengths[:1]))
    scale = np.maximum(np.abs(solo[0]), 1.0)
    np.testing.assert_allclose(both[0] / scale, solo[0] / scale, atol=2e-4)
