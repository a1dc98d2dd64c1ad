"""Faithful IS13_ComParE chain: structure contract + independent NumPy
oracles for the deterministic components (RASTA filter, spectral moments,
functional engine) + analytic pitch/temporal checks + pad invariance."""

import numpy as np
import pytest

import jax.numpy as jnp

from mertools_tpu.ops import opensmile_is13 as s13


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
    assert len(s13.IS13_NAMES) == 6372          # reference-observed contract
    assert len(s13.FRAME_LLDS) == 60
    # accounting: 59*54 + 59*46 + 6*39 + 6*36 + 22
    assert 59 * 54 + 59 * 46 + 6 * 39 + 6 * 36 + 22 == 6372
    wav = _speechlike(0, 0.6)
    x, mask = s13.is13_frame(wav[None], np.array([len(wav)]))
    assert x.shape[-1] == 120
    u = np.asarray(s13.is13_utt(wav[None], np.array([len(wav)])))
    assert u.shape == (1, 6372) and np.isfinite(u).all()


def test_rasta_matches_numpy_oracle():
    """y[t] = 0.94 y[t-1] + (2x[t] + x[t-1] - x[t-3] - 2x[t-4]) / 10."""
    rng = np.random.default_rng(0)
    B, F, M = 2, 40, 5
    x = rng.normal(size=(B, F, M)).astype(np.float32)
    mask = np.ones((B, F), bool)
    got = np.asarray(s13._rasta(jnp.asarray(x), jnp.asarray(mask)))

    ref = np.zeros_like(x)
    for b in range(B):
        hist = np.zeros((4, M))
        y = np.zeros(M)
        for t in range(F):
            y = 0.94 * y + (2 * x[b, t] + hist[0] - hist[2] - 2 * hist[3]) / 10
            ref[b, t] = y
            hist = np.roll(hist, 1, axis=0)
            hist[0] = x[b, t]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_functional_engine_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    F = 61
    x = (rng.normal(size=F).cumsum() * 0.3 + rng.normal(size=F)
         ).astype(np.float32)
    xb = x[None, :, None]
    mask = np.ones((1, F), bool)
    names = s13.FUNCS_A
    got = np.asarray(s13.contour_functionals(
        jnp.asarray(xb), jnp.asarray(mask), names))[0]
    g = dict(zip(names, got))

    xd = x.astype(np.float64)
    t = np.arange(F, dtype=np.float64)
    np.testing.assert_allclose(g["amean"], xd.mean(), rtol=1e-4)
    np.testing.assert_allclose(g["rqmean"], np.sqrt((xd ** 2).mean()),
                               rtol=1e-4)
    np.testing.assert_allclose(
        g["flatness"],
        np.exp(np.mean(np.log(np.maximum(np.abs(xd), 1e-12))))
        / np.abs(xd).mean(), rtol=1e-3)
    np.testing.assert_allclose(g["stddev"], xd.std(), rtol=1e-4)
    for q, nm in ((25, "quartile1"), (50, "quartile2"), (75, "quartile3"),
                  (1, "percentile1.0"), (99, "percentile99.0")):
        np.testing.assert_allclose(g[nm], np.percentile(xd, q), rtol=1e-3,
                                   atol=1e-3, err_msg=nm)
    # linear + quadratic regression vs polyfit
    A1 = np.polyfit(t, xd, 1)
    np.testing.assert_allclose(g["linregc1"], A1[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(g["linregc2"], A1[1], rtol=1e-3, atol=1e-3)
    A2 = np.polyfit(t, xd, 2)
    np.testing.assert_allclose(g["qregc1"], A2[0], rtol=1e-2, atol=1e-5)
    np.testing.assert_allclose(g["qregc2"], A2[1], rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(g["qregc3"], A2[2], rtol=1e-2, atol=1e-2)
    r2 = xd - np.polyval(A2, t)
    np.testing.assert_allclose(g["qregerrQ"], (r2 ** 2).mean(), rtol=1e-3,
                               atol=1e-4)
    # rise time & slopes
    d = np.diff(xd)
    np.testing.assert_allclose(g["risetime"], np.mean(d > 0), rtol=1e-4)
    rs = d[d > 0] / 0.01
    np.testing.assert_allclose(g["meanRisingSlope"], rs.mean(), rtol=1e-3)
    np.testing.assert_allclose(g["stddevRisingSlope"], rs.std(), rtol=1e-3)
    fs = d[d < 0] / 0.01
    np.testing.assert_allclose(g["meanFallingSlope"], np.abs(fs.mean()),
                               rtol=1e-3)
    # peaks (strict local maxima, interior)
    pk = [i for i in range(1, F - 1)
          if xd[i] > xd[i - 1] and xd[i] >= xd[i + 1]]
    np.testing.assert_allclose(g["peakMean"], np.mean(xd[pk]), rtol=1e-3)
    np.testing.assert_allclose(g["peakMeanMeanDist"],
                               np.mean(xd[pk]) - xd.mean(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(g["meanPeakDist"],
                               (pk[-1] - pk[0]) / (len(pk) - 1), rtol=1e-4)
    np.testing.assert_allclose(g["maxmeandist"], xd.max() - xd.mean(),
                               rtol=1e-4)
    np.testing.assert_allclose(g["centroid"],
                               np.sum(t * np.abs(xd)) / np.sum(np.abs(xd)),
                               rtol=1e-4)
    np.testing.assert_allclose(g["posamean"], xd[xd > 0].mean(), rtol=1e-3)
    np.testing.assert_allclose(g["absmean"], np.abs(xd).mean(), rtol=1e-4)
    # upleveltimes
    rng_ = xd.max() - xd.min()
    for frac, nm in ((0.25, "upleveltime25"), (0.90, "upleveltime90")):
        np.testing.assert_allclose(
            g[nm], np.mean(xd > xd.min() + frac * rng_), rtol=1e-4,
            err_msg=nm)
    # LP functionals vs an independent Levinson recursion
    r = np.array([np.dot(xd[: F - k] - 0, xd[k:]) for k in range(6)])
    r = r / r[0]
    a = np.zeros(6)
    a[0] = 1.0
    err = r[0]
    for i in range(5):
        acc = np.sum(a[1: i + 1] * r[i: 0: -1][: i])
        k = (r[i + 1] + acc) / err  # error-filter convention a = [1, -phi]
        a_new = a.copy()
        for j in range(1, i + 2):
            a_new[j] = a[j] - k * a[i + 1 - j]
        a = a_new
        err *= (1 - k ** 2)
    lpc_ref = -a[1:]
    got_lpc = np.array([g[f"lpc{i}"] for i in range(5)])
    np.testing.assert_allclose(got_lpc, lpc_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(g["lpgain"],
                               abs(np.sum(np.concatenate([[1.0], -lpc_ref])
                                          * r)), rtol=1e-2, atol=1e-3)


def test_f0_and_temporal_analytic():
    sr = 16000
    t = np.arange(sr) / sr
    tone = sum((0.6 ** k) * np.sin(2 * np.pi * (k + 1) * 170.0 * t)
               for k in range(6))
    tone = 0.35 * tone / np.abs(tone).max()
    rng = np.random.default_rng(0)
    # voiced tone for 0.5 s then unvoiced noise
    wav = np.concatenate([tone[: sr // 2],
                          0.05 * rng.normal(size=sr // 2)]).astype(np.float32)
    u = np.asarray(s13.is13_utt(wav[None], np.array([sr])))[0]
    names = s13.IS13_NAMES
    # F0 over voiced frames
    f0m = u[names.index("F0final_sma_amean")]
    assert abs(f0m - 170.0) / 170.0 < 0.05, f0m
    # one voiced segment covering roughly half the clip
    assert u[names.index("numVoicedSegments")] >= 1
    pv = u[names.index("percentVoiced")]
    assert 0.25 < pv < 0.75, pv
    np.testing.assert_allclose(u[names.index("turnDuration")], 0.98,
                               atol=1e-5)
    # semitone median consistent with 170 Hz: 12*log2(170/27.5) ~ 31.5
    p50 = u[names.index("F0semitoneP50")]
    assert abs(p50 - 12 * np.log2(170 / 27.5)) < 1.0, p50


def test_pad_length_invariance():
    a = _speechlike(7, 0.53)
    exact = np.asarray(s13.is13_utt(a[None], np.array([len(a)])))[0]
    buf = np.zeros((1, 16000), np.float32)
    buf[0, : len(a)] = a
    padded = np.asarray(s13.is13_utt(buf, np.array([len(a)])))[0]
    scale = np.maximum(np.abs(exact), 1.0)
    d = np.abs(padded - exact) / scale
    # LP functionals of near-unit-pole smoothed contours amplify benign
    # ~1e-7 float32 deltas through the Levinson recursion (ill-conditioned
    # err term); everything else is pad-exact
    is_lpc = np.array(["_lpc" in n or "lpgain" in n for n in s13.IS13_NAMES])
    assert np.max(d[~is_lpc]) < 3e-4, (
        s13.IS13_NAMES[int(np.argmax(np.where(is_lpc, 0, d)))],
        float(np.max(d[~is_lpc])))
    assert np.max(d[is_lpc]) < 5e-3, float(np.max(d[is_lpc]))


def test_ragged_batch_equals_per_clip():
    a, b = _speechlike(3, 0.53), _speechlike(4, 1.0)
    batch = np.zeros((2, len(b)), np.float32)
    batch[0, : len(a)] = a
    batch[1] = b
    lengths = np.array([len(a), len(b)])
    both = np.asarray(s13.is13_utt(batch, lengths))
    solo = np.asarray(s13.is13_utt(batch[:1], lengths[:1]))
    scale = np.maximum(np.abs(solo[0]), 1.0)
    np.testing.assert_allclose(both[0] / scale, solo[0] / scale, atol=3e-4)
