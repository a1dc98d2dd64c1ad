"""Handcrafted acoustic features (openSMILE-/librosa-equivalents).

Checks the three properties that matter for the reference contract
(``MERBench/feature_extraction/audio/handcrafted_feature_func.py``):
canonical dimensionalities, masked-batch == per-clip equivalence (ragged
batching correctness), and physically sensible descriptor values on
analytic signals.
"""

import numpy as np
import pytest

from mertools_tpu.ops import handcrafted as hc


def _sine(freq, dur, sr, amp=0.3):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ---------------------------------------------------------------- dims


@pytest.mark.parametrize("fset", ["IS09", "IS10", "IS13", "eGeMAPS"])
def test_utt_dims(fset):
    sr = 16000
    wav = np.stack([_sine(220, 1.0, sr), _sine(330, 1.0, sr)])
    out = np.asarray(hc.handcrafted_utt(wav, np.array([sr, sr]), sr, fset))
    assert out.shape == (2, hc.UTT_DIMS[fset])
    assert np.isfinite(out).all()


@pytest.mark.parametrize("fset", ["IS09", "IS10", "IS13", "eGeMAPS"])
def test_frame_dims(fset):
    sr = 16000
    wav = _sine(220, 0.8, sr)[None]
    out, mask = hc.handcrafted_frame(wav, np.array([len(wav[0])]), sr, fset)
    out = np.asarray(out)
    assert out.shape[-1] == hc.FRAME_DIMS[fset]
    assert out.shape[1] == np.asarray(mask).shape[1]
    assert np.isfinite(out).all()


def test_librosa_equivalent_dims():
    sr = 22050
    wav = np.stack([_sine(440, 0.5, sr), _sine(880, 0.5, sr)])
    mel = np.asarray(hc.mel_spec_librosa(wav, sr))
    assert mel.shape[0] == 2 and mel.shape[2] == 128
    assert (mel >= 0).all()
    mf = np.asarray(hc.mfcc_librosa(wav, sr))
    assert mf.shape[2] == 120  # 40 mfcc + delta + delta-delta


# ------------------------------------------- ragged batching correctness


def test_masked_batch_matches_per_clip():
    sr = 16000
    a = _sine(200, 0.5, sr)
    b = _sine(350, 1.0, sr)
    T = len(b)
    batch = np.zeros((2, T), np.float32)
    batch[0, : len(a)] = a
    batch[1] = b
    lengths = np.array([len(a), len(b)])

    batched = np.asarray(hc.handcrafted_utt(batch, lengths, sr, "IS09"))
    # per-clip: same padded length so framing grids match
    solo_a = np.asarray(hc.handcrafted_utt(batch[:1], lengths[:1], sr, "IS09"))
    np.testing.assert_allclose(batched[0], solo_a[0], rtol=1e-4, atol=1e-4)


# ------------------------------------------------- analytic sanity


def test_f0_detection_pure_tone():
    sr = 16000
    for freq in [110.0, 220.0, 330.0]:
        wav = _sine(freq, 1.0, sr)[None]
        llds, mask = hc.extract_lld_bank(wav, np.array([wav.shape[1]]), sr)
        f0 = np.asarray(llds["F0final"])[0][np.asarray(mask)[0]]
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        med = np.median(voiced)
        assert abs(med - freq) / freq < 0.05, (freq, med)


def test_zcr_pure_tone():
    sr = 16000
    freq = 400.0
    wav = _sine(freq, 1.0, sr)[None]
    llds, mask = hc.extract_lld_bank(wav, np.array([wav.shape[1]]), sr)
    zcr = np.asarray(llds["pcm_zcr"])[0][np.asarray(mask)[0]]
    # expected crossings/sample = 2f/sr
    np.testing.assert_allclose(np.median(zcr), 2 * freq / sr, rtol=0.10)


def test_silence_is_unvoiced():
    sr = 16000
    wav = (np.random.default_rng(0).normal(size=(1, sr)) * 1e-4).astype(np.float32)
    llds, mask = hc.extract_lld_bank(wav, np.array([sr]), sr)
    f0 = np.asarray(llds["F0final"])[0][np.asarray(mask)[0]]
    assert (f0 == 0).mean() > 0.9  # noise: no stable pitch


# ------------------------------------------------- functional grid golden


def test_functional_grid_golden():
    rng = np.random.default_rng(1)
    T, D = 50, 3
    x = rng.normal(size=(1, T, D)).astype(np.float32)
    mask = np.ones((1, T), bool)
    out = np.asarray(hc.apply_functional_grid(
        jnp_x(x), jnp_x(mask), ("amean", "stddev", "max", "min", "quartile2")))
    ref_mean = x[0].mean(0)
    ref_std = x[0].std(0)
    np.testing.assert_allclose(out[0, :D], ref_mean, atol=1e-5)
    np.testing.assert_allclose(out[0, D:2 * D], ref_std, atol=1e-4)
    np.testing.assert_allclose(out[0, 2 * D:3 * D], x[0].max(0), atol=1e-6)
    np.testing.assert_allclose(out[0, 3 * D:4 * D], x[0].min(0), atol=1e-6)
    med = np.sort(x[0], axis=0)[(T - 1) // 2]
    np.testing.assert_allclose(out[0, 4 * D:5 * D], med, atol=1e-6)


def test_linear_regression_functional():
    T, D = 40, 1
    t = np.linspace(0, 1, T, dtype=np.float32)
    x = (2.5 * t - 0.7)[None, :, None]
    mask = np.ones((1, T), bool)
    out = np.asarray(hc.apply_functional_grid(
        jnp_x(x), jnp_x(mask), ("linregc1", "linregc2", "linregerrQ")))
    np.testing.assert_allclose(out[0, 0], 2.5, atol=1e-3)   # slope
    np.testing.assert_allclose(out[0, 1], -0.7, atol=1e-3)  # offset
    assert out[0, 2] < 1e-6                                  # perfect fit


def jnp_x(x):
    import jax.numpy as jnp
    return jnp.asarray(x)
