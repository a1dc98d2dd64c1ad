"""Third-party anchors for the openSMILE-chain components.

The IS09/IS10/IS13/eGeMAPS oracles in the sibling suites are
independently-coded NumPy implementations of the published specs — but by
the SAME author, so a shared spec misreading would pass both sides
(round-2 VERDICT weak #7). These tests anchor the shared chain components
against genuinely third-party implementations available in this image:
scipy.signal / scipy.fft / scipy.stats / scipy.linalg, plus published
closed-form values (HTK mel formula, HTK liftering).

Reference contracts: MERBench ``feature_extraction/audio/
handcrafted_feature_func.py`` (openSMILE conf chains: Hamming windows,
HTK mel/MFCC with L=22 liftering, RASTA, LPC/LSP, the functional grids).
"""

import numpy as np
import pytest
import scipy.fft
import scipy.linalg
import scipy.signal
import scipy.stats

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


def test_hamming_matches_scipy():
    from mertools_tpu.ops.opensmile_is09 import hamming

    for n in (400, 512, 80):
        ref = scipy.signal.get_window("hamming", n, fftbins=False)
        np.testing.assert_allclose(hamming(n), ref, atol=1e-6)


# ---------------------------------------------------------------------------
# HTK mel scale + filter bank
# ---------------------------------------------------------------------------


def test_htk_mel_published_anchor_points():
    """The 2595*log10(1+f/700) HTK mel curve pins mel(700)=2595*log10(2)
    and mel(1000)~=1000 (the published calibration point of the scale)."""
    from mertools_tpu.ops.opensmile_is09 import htk_mel_bank

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    assert abs(to_mel(1000.0) - 999.99) < 0.2
    assert abs(to_mel(700.0) - 2595.0 * np.log10(2.0)) < 1e-9

    fb = htk_mel_bank()
    # unit peak height, triangular support, centers monotone increasing
    assert fb.shape == (26, 257)
    peaks = fb.max(axis=1)
    # unit analytic peak, sampled on the FFT grid: the grid max sits
    # within one bin of the apex, so it's <= 1 and close to 1
    assert (peaks <= 1.0 + 1e-6).all() and (peaks > 0.7).all(), peaks
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) > 0).all()
    # each filter's response is unimodal (one rise, one fall)
    for row in fb:
        nz = np.flatnonzero(row > 0)
        seg = row[nz[0]: nz[-1] + 1]
        d = np.diff(seg)
        # sign changes at most once
        assert (np.diff(np.sign(d[np.abs(d) > 1e-7])) != 0).sum() <= 1


def test_htk_mel_centers_match_formula():
    """Filter centers sit at the analytic equal-mel grid points."""
    from mertools_tpu.ops.opensmile_is09 import htk_mel_bank

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def from_mel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = from_mel(np.linspace(to_mel(20.0), to_mel(8000.0), 28))
    fb = htk_mel_bank()
    freqs = np.arange(257) * 16000 / 512
    centers_hz = freqs[fb.argmax(axis=1)]
    # centers quantize to the FFT grid: within one bin (31.25 Hz)
    assert np.abs(centers_hz - pts[1:-1]).max() <= 16000 / 512


# ---------------------------------------------------------------------------
# HTK DCT + liftering vs scipy.fft.dct
# ---------------------------------------------------------------------------


def test_htk_dct_lifter_matches_scipy_dct():
    from mertools_tpu.ops.opensmile_is09 import htk_dct_lifter

    N, n_out, L = 26, 12, 22
    rng = np.random.default_rng(0)
    x = rng.normal(size=N)
    D = htk_dct_lifter(n_out, N, L)
    got = D @ x
    # HTK: c_j = sqrt(2/N) sum_m x_m cos(pi j (m-0.5)/N)
    #          = sqrt(2/N)/2 * scipy DCT-II,   lift = 1 + L/2 sin(pi j/L)
    dct = scipy.fft.dct(x, type=2, norm=None)
    j = np.arange(1, n_out + 1)
    ref = np.sqrt(2.0 / N) / 2.0 * dct[1: n_out + 1] \
        * (1.0 + (L / 2.0) * np.sin(np.pi * j / L))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# functional grid vs scipy.stats
# ---------------------------------------------------------------------------


def test_is09_functionals_match_scipy_stats():
    from mertools_tpu.ops.opensmile_is09 import FUNCTIONALS, functionals_12

    rng = np.random.default_rng(1)
    F, D = 37, 3
    x = rng.normal(size=(1, F, D)).astype(np.float32) * 2.0 + 0.5
    mask = np.ones((1, F), bool)
    out = np.asarray(functionals_12(jnp.asarray(x), jnp.asarray(mask)))
    out = out.reshape(D, len(FUNCTIONALS))
    col = {f: out[:, i] for i, f in enumerate(FUNCTIONALS)}

    for d in range(D):
        v = x[0, :, d].astype(np.float64)
        t = np.arange(F, dtype=np.float64)
        lr = scipy.stats.linregress(t, v)
        np.testing.assert_allclose(col["amean"][d], v.mean(), rtol=1e-5)
        np.testing.assert_allclose(col["stddev"][d], v.std(), rtol=1e-4)
        np.testing.assert_allclose(col["skewness"][d],
                                   scipy.stats.skew(v, bias=True),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(col["kurtosis"][d],
                                   scipy.stats.kurtosis(v, fisher=False,
                                                        bias=True),
                                   rtol=1e-3)
        np.testing.assert_allclose(col["linregc1"][d], lr.slope,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(col["linregc2"][d], lr.intercept,
                                   rtol=1e-3, atol=1e-5)
        resid = v - (lr.slope * t + lr.intercept)
        np.testing.assert_allclose(col["linregerrQ"][d],
                                   np.mean(resid ** 2), rtol=1e-3)
        assert col["maxPos"][d] == v.argmax()
        assert col["minPos"][d] == v.argmin()
        np.testing.assert_allclose(col["max"][d], v.max(), rtol=1e-5)
        np.testing.assert_allclose(col["min"][d], v.min(), rtol=1e-5)
        np.testing.assert_allclose(col["range"][d], v.max() - v.min(),
                                   rtol=1e-5)


# ---------------------------------------------------------------------------
# RASTA IIR vs scipy.signal.lfilter
# ---------------------------------------------------------------------------


def test_rasta_matches_scipy_lfilter():
    from mertools_tpu.ops.opensmile_is13 import _rasta

    rng = np.random.default_rng(2)
    B, F, M = 2, 50, 4
    x = rng.normal(size=(B, F, M)).astype(np.float32)
    mask = np.ones((B, F), bool)
    got = np.asarray(_rasta(jnp.asarray(x), jnp.asarray(mask)))
    # classic RASTA: H(z) = 0.1 (2 + z^-1 - z^-3 - 2 z^-4) / (1 - 0.94 z^-1)
    b = np.array([0.2, 0.1, 0.0, -0.1, -0.2])
    a = np.array([1.0, -0.94])
    ref = scipy.signal.lfilter(b, a, x.astype(np.float64), axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Levinson-Durbin LPC vs scipy.linalg.solve_toeplitz
# ---------------------------------------------------------------------------


def test_lpc_levinson_matches_toeplitz_solve():
    from mertools_tpu.ops.handcrafted import _lpc_levinson

    rng = np.random.default_rng(3)
    order = 8
    # well-conditioned autocorrelation from a real AR signal
    sig = scipy.signal.lfilter([1.0], [1.0, -0.6, 0.3], rng.normal(size=4096))
    r = np.correlate(sig, sig, "full")[len(sig) - 1: len(sig) + order]
    r = (r / len(sig)).astype(np.float32)
    got = np.asarray(_lpc_levinson(jnp.asarray(r)[None], order))[0]
    # normal equations: R phi = r  (phi = prediction coefficients)
    ref = scipy.linalg.solve_toeplitz((r[:order], r[:order]), r[1:order + 1])
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_lsp_matches_polynomial_roots():
    from mertools_tpu.ops.handcrafted import _lpc_levinson, _lsp_from_lpc

    rng = np.random.default_rng(4)
    order = 8
    sig = scipy.signal.lfilter([1.0], [1.0, -0.9, 0.5, -0.2],
                               rng.normal(size=4096))
    r = np.correlate(sig, sig, "full")[len(sig) - 1: len(sig) + order]
    r = (r / len(sig)).astype(np.float32)
    a = np.asarray(_lpc_levinson(jnp.asarray(r)[None], order))[0]
    got = np.sort(np.asarray(_lsp_from_lpc(jnp.asarray(a)[None], order))[0])

    # third-party root-finding on P/Q via numpy.roots
    A = np.concatenate([[1.0], -a])
    P = np.concatenate([A, [0.0]]) + np.concatenate([[0.0], A[::-1]])
    Q = np.concatenate([A, [0.0]]) - np.concatenate([[0.0], A[::-1]])
    angs = []
    for poly, drop in ((P, -1.0), (Q, 1.0)):
        roots = np.roots(poly)
        roots = roots[np.abs(roots - drop) > 1e-6]   # deflate trivial root
        ang = np.angle(roots)
        angs.extend(ang[(ang > 1e-9) & (ang < np.pi - 1e-9)])
    ref = np.sort(np.asarray(angs))
    np.testing.assert_allclose(got, ref, atol=2e-3)


# ---------------------------------------------------------------------------
# sma smoothing vs scipy.ndimage
# ---------------------------------------------------------------------------


def test_sma3_matches_scipy_uniform_filter():
    from scipy.ndimage import uniform_filter1d

    from mertools_tpu.ops.opensmile_is09 import _sma3

    rng = np.random.default_rng(5)
    B, F, D = 1, 40, 2
    x = rng.normal(size=(B, F, D)).astype(np.float32)
    mask = np.ones((B, F), bool)
    got = np.asarray(_sma3(jnp.asarray(x), jnp.asarray(mask)))
    # openSMILE cContourSmoother sma(3): centered length-3 moving average
    # with edge truncation (den=2 at the boundaries)
    ref = uniform_filter1d(x.astype(np.float64), 3, axis=1, mode="constant")
    # interior matches the scipy uniform filter exactly; edges use den=2
    np.testing.assert_allclose(got[:, 1:-1], ref[:, 1:-1], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(got[:, 0], (x[:, 0] + x[:, 1]) / 2.0,
                               rtol=1e-5)
    np.testing.assert_allclose(got[:, -1], (x[:, -2] + x[:, -1]) / 2.0,
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# frame-level pipeline spot anchor: MFCC of a known tone via scipy only
# ---------------------------------------------------------------------------


def test_is09_mfcc_frame_anchor_scipy_pipeline():
    """Recompute one frame's MFCC 1-12 with a scipy-only pipeline (hamming
    window, rfft, the analytic mel bank, log, scipy DCT + lifter) and
    compare against the is09 chain's frame output."""
    from mertools_tpu.ops.opensmile_is09 import (FRAME_LEN, N_FFT, N_MEL,
                                                 htk_mel_bank, is09_frame)

    rng = np.random.default_rng(6)
    T = 16000
    t = np.arange(T) / 16000.0
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.normal(size=T)).astype(np.float32)
    frames, mask = is09_frame(jnp.asarray(wav)[None],
                              jnp.asarray([T], np.int32))
    frames = np.asarray(frames)

    # scipy-only recomputation of frame 5's raw MFCC (pre-sma, so compare
    # against the sma of a locally-constant window: use 3 adjacent frames)
    def frame_mfcc(k):
        seg = wav[k * 160: k * 160 + FRAME_LEN].astype(np.float64)
        # HTK within-frame pre-emphasis (k=0.97) via scipy.signal.lfilter
        pre = scipy.signal.lfilter([1.0, -0.97], [1.0], seg)
        pre[0] = seg[0] * (1.0 - 0.97)
        win = pre * scipy.signal.get_window("hamming", FRAME_LEN,
                                            fftbins=False)
        mag = np.abs(scipy.fft.rfft(win, N_FFT))
        mel = htk_mel_bank().astype(np.float64) @ mag
        logm = np.log(np.maximum(mel, 1e-8))
        dct = scipy.fft.dct(logm, type=2, norm=None)
        j = np.arange(1, 13)
        return (np.sqrt(2.0 / N_MEL) / 2.0 * dct[1:13]
                * (1.0 + 11.0 * np.sin(np.pi * j / 22.0)))

    k = 5
    ref_sma = (frame_mfcc(k - 1) + frame_mfcc(k) + frame_mfcc(k + 1)) / 3.0
    got = frames[0, k, 4:16]      # LLD order: rms, zcr, voiceProb, F0, mfcc
    np.testing.assert_allclose(got, ref_sma, rtol=2e-3, atol=2e-3)
