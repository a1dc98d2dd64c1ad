"""Faithful eGeMAPSv01a chain: analytic + independent-oracle validation.

openSMILE is unavailable in this environment, so validation is (a) an
independently-coded NumPy oracle for the deterministic 20 ms spectral
LLDs (alpha ratio, Hammarberg index, spectral slopes, loudness, flux),
(b) analytic signals for the pitch/HNR/formant branch (known F0 in
semitones, known formant filter), (c) masked ragged-batch equivalence,
and (d) the exact 88-name contract.
"""

import numpy as np
import pytest

from mertools_tpu.ops import egemaps as eg


def _harmonic(f0, dur=1.0, sr=16000, n_harm=8, amp=0.25):
    t = np.arange(int(dur * sr)) / sr
    x = sum((0.6 ** k) * np.sin(2 * np.pi * (k + 1) * f0 * t)
            for k in range(n_harm))
    return (amp * x / np.abs(x).max()).astype(np.float32)


def test_names_and_dims():
    assert len(eg.EGEMAPS_NAMES) == 88
    assert len(set(eg.EGEMAPS_NAMES)) == 88
    assert len(eg.LLD_NAMES) == 23
    wav = np.stack([_harmonic(180), _harmonic(250)])
    out = np.asarray(eg.egemaps_utt(wav, np.array([wav.shape[1]] * 2)))
    assert out.shape == (2, 88)
    assert np.isfinite(out).all()
    x, mask = eg.egemaps_frame(wav, np.array([wav.shape[1]] * 2))
    assert np.asarray(x).shape[-1] == 23
    assert np.isfinite(np.asarray(x)).all()


def test_f0_semitone_analytic():
    # 220 Hz harmonic tone: 12*log2(220/27.5) = 36 semitones exactly.
    wav = _harmonic(220.0)[None]
    x, mask = eg.egemaps_frame(wav, np.array([wav.shape[1]]))
    f0st = np.asarray(x)[0, :, eg.LLD_NAMES.index("F0semitone")]
    f0st = f0st[np.asarray(mask)[0]]
    voiced = f0st[f0st > 0]
    assert len(voiced) > 0.8 * len(f0st)
    # candidate grid ~21 cents => < 0.5 semitone error
    assert abs(np.median(voiced) - 36.0) < 0.5, np.median(voiced)


def test_viterbi_rejects_octave_jumps():
    # alternating-phase harmonic tone that fools greedy per-frame picks
    # must come out as a smooth contour: successive voiced frames within
    # one semitone.
    sr = 16000
    wav = _harmonic(150.0, dur=1.5)[None]
    x, mask = eg.egemaps_frame(wav, np.array([wav.shape[1]]))
    f0st = np.asarray(x)[0, :, eg.LLD_NAMES.index("F0semitone")]
    f0st = f0st[np.asarray(mask)[0]]
    v = f0st[f0st > 0]
    jumps = np.abs(np.diff(v))
    assert np.quantile(jumps, 0.95) < 1.0, np.quantile(jumps, 0.95)


def test_hnr_clean_vs_noisy():
    clean = _harmonic(200.0)
    rng = np.random.default_rng(0)
    noisy = (clean + 0.2 * rng.normal(size=len(clean)).astype(np.float32))
    batch = np.stack([clean, noisy])
    x, mask = eg.egemaps_frame(batch, np.array([len(clean)] * 2))
    hnr_i = eg.LLD_NAMES.index("HNRdBACF")
    x = np.asarray(x)
    hnr_clean = x[0, :, hnr_i][x[0, :, hnr_i] != 0]
    hnr_noisy = x[1, :, hnr_i][x[1, :, hnr_i] != 0]
    assert np.median(hnr_clean) > np.median(hnr_noisy) + 5.0


def test_formant_recovery():
    # White noise through a single resonator => F1 near the pole frequency.
    sr = 16000
    rng = np.random.default_rng(1)
    noise = rng.normal(size=sr).astype(np.float32)
    f_pole, r = 700.0, 0.97
    a1 = 2 * r * np.cos(2 * np.pi * f_pole / sr)
    a2 = -r * r
    y = np.zeros_like(noise)
    for n in range(2, sr):
        y[n] = noise[n] + a1 * y[n - 1] + a2 * y[n - 2]
    y = (0.3 * y / np.abs(y).max()).astype(np.float32)
    # voiced gating needs pitch: add a harmonic carrier below the resonance
    y = 0.7 * y + 0.5 * _harmonic(180.0, 1.0, sr, n_harm=3)
    x, mask = eg.egemaps_frame(y[None], np.array([sr]))
    f1 = np.asarray(x)[0, :, eg.LLD_NAMES.index("F1frequency")]
    f1 = f1[f1 > 0]
    assert len(f1) > 10
    med = np.median(f1)
    assert 150.0 < med < 1100.0, med  # resonance region, generous window


# ------------------------------------------------------------- oracle


def _oracle_spectral(wav):
    """Independent per-frame NumPy implementation of the 20 ms LLDs."""
    sr, win, hop, nfft = 16000, 320, 160, 512
    nF = max(1 + (max(len(wav), 960) - 960) // hop, 1)
    ham = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(win) / (win - 1))
    freqs = np.arange(nfft // 2 + 1) * sr / nfft
    rows = {"alphaRatio": [], "hammarbergIndex": [], "slope0-500": [],
            "slope500-1500": [], "loudness": [], "spectralFlux": []}
    # HTK mel bank for loudness (26 bands, 20-8000)
    from mertools_tpu.ops.opensmile_is09 import htk_mel_bank
    fb = htk_mel_bank(sr, nfft, 26, 20.0, 8000.0)
    prev_mag = None
    for f in range(nF):
        fr = wav[f * hop: f * hop + win].astype(np.float64)
        if len(fr) < win:
            fr = np.pad(fr, (0, win - len(fr)))
        mag = np.abs(np.fft.rfft(fr * ham, n=nfft))
        p = mag ** 2
        lo = p[(freqs >= 50) & (freqs < 1000)].sum()
        hi = p[(freqs >= 1000) & (freqs < 5000)].sum()
        rows["alphaRatio"].append(10 * np.log10((lo + 1e-12) / (hi + 1e-12)))
        pk_lo = p[(freqs >= 0) & (freqs < 2000)].max()
        pk_hi = p[(freqs >= 2000) & (freqs < 5000)].max()
        rows["hammarbergIndex"].append(
            10 * np.log10((pk_lo + 1e-12) / (pk_hi + 1e-12)))
        for lo_f, hi_f, key in ((0, 500, "slope0-500"),
                                (500, 1500, "slope500-1500")):
            sel = (freqs >= lo_f) & (freqs < hi_f)
            db = 10 * np.log10(p[sel] + 1e-12)
            fc = freqs[sel] - freqs[sel].mean()
            rows[key].append(np.sum(db * fc) / np.sum(fc ** 2))
        band = fb @ p
        rows["loudness"].append(np.sum(np.maximum(band, 1e-12) ** 0.3))
        if prev_mag is None:
            rows["spectralFlux"].append(0.0)
        else:
            rows["spectralFlux"].append(
                np.sqrt(np.mean((mag - prev_mag) ** 2)))
        prev_mag = mag
    sm = {}
    for k, v in rows.items():
        v = np.asarray(v)
        out = np.copy(v)
        for t in range(len(v)):
            out[t] = v[max(t - 1, 0): t + 2].mean()
        sm[k] = out
    return sm


def test_spectral_llds_match_oracle():
    rng = np.random.default_rng(2)
    t = np.arange(16000) / 16000
    wav = (0.2 * np.sin(2 * np.pi * 300 * t)
           + 0.1 * np.sin(2 * np.pi * 1800 * t)
           + 0.05 * rng.normal(size=len(t))).astype(np.float32)
    x, mask = eg.egemaps_frame(wav[None], np.array([len(wav)]))
    x = np.asarray(x)[0][np.asarray(mask)[0]]
    ref = _oracle_spectral(wav)
    for name in ("alphaRatio", "hammarbergIndex", "slope0-500",
                 "slope500-1500", "loudness", "spectralFlux"):
        ours = x[:, eg.LLD_NAMES.index(name)]
        r = ref[name][: len(ours)]
        scale = max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(ours, r, atol=5e-3 * scale, rtol=5e-3,
                                   err_msg=name)


def test_ragged_batch_equals_per_clip():
    a, b = _harmonic(170, 0.7), _harmonic(240, 1.2)
    batch = np.zeros((2, len(b)), np.float32)
    batch[0, : len(a)] = a
    batch[1] = b
    lengths = np.array([len(a), len(b)])
    both = np.asarray(eg.egemaps_utt(batch, lengths))
    solo = np.asarray(eg.egemaps_utt(batch[:1], lengths[:1]))
    np.testing.assert_allclose(both[0], solo[0], rtol=2e-4, atol=2e-4)


def test_voiced_unvoiced_split():
    # half tone + half noise: UV spectral means differ from V means,
    # and segment statistics see one voiced segment.
    sr = 16000
    tone = _harmonic(200.0, 0.5)
    rng = np.random.default_rng(3)
    noise = (0.1 * rng.normal(size=sr // 2)).astype(np.float32)
    wav = np.concatenate([tone, noise])[None]
    out = np.asarray(eg.egemaps_utt(wav, np.array([sr])))[0]
    names = list(eg.EGEMAPS_NAMES)
    v_alpha = out[names.index("alphaRatioV_sma3nz_amean")]
    uv_alpha = out[names.index("alphaRatioUV_sma3nz_amean")]
    assert v_alpha != uv_alpha
    assert v_alpha > uv_alpha  # tonal low-freq energy > flat noise
    n_vseg = out[names.index("VoicedSegmentsPerSec")]
    assert 0 < n_vseg <= 4.0
    mean_vlen = out[names.index("MeanVoicedSegmentLengthSec")]
    assert 0.2 < mean_vlen < 0.8


def test_pad_length_invariance():
    """ADVICE r2 (high): a clip padded to a larger bucket must equal a truly
    exact-length extraction — mask-aware sma3/sma3nz, Viterbi identity steps
    past the mask, and boundary-safe loudness peaks."""
    rng = np.random.default_rng(11)
    a = _harmonic(150, 0.53) + 0.02 * rng.normal(
        size=int(0.53 * 16000)).astype(np.float32)
    exact = np.asarray(eg.egemaps_utt(a[None], np.array([len(a)])))[0]
    for pad_to in (16000, 32000):
        buf = np.zeros((1, pad_to), np.float32)
        buf[0, : len(a)] = a
        padded = np.asarray(eg.egemaps_utt(buf, np.array([len(a)])))[0]
        scale = np.maximum(np.abs(exact), 1.0)
        np.testing.assert_allclose(padded / scale, exact / scale,
                                   atol=2e-4, err_msg=str(pad_to))
