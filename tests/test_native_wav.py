"""Native libmeraudio WAV decode + resample tests (with fallback parity)."""

import os

import numpy as np
import pytest
from scipy.io import wavfile
from scipy.signal import resample_poly

from mertools_tpu.io import wav as W


def make_tone(sr, seconds=1.0, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float64)


@pytest.fixture(scope="module")
def native_available():
    if not W.have_native():
        pytest.skip("libmeraudio.so not built (run make -C native)")


def test_read_pcm16_stereo(tmp_path, native_available):
    sr = 22050
    sig = make_tone(sr)
    stereo = np.stack([sig, sig * 0.5], axis=1)
    path = str(tmp_path / "s.wav")
    wavfile.write(path, sr, (stereo * 32767).astype(np.int16))
    mono, got_sr = W.read_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(mono, stereo.mean(1), atol=1e-4)


def test_read_float32(tmp_path, native_available):
    sr = 16000
    sig = make_tone(sr).astype(np.float32)
    path = str(tmp_path / "f.wav")
    wavfile.write(path, sr, sig)
    mono, got_sr = W.read_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(mono, sig, atol=1e-6)


def test_read_pcm32(tmp_path, native_available):
    sr = 8000
    sig = make_tone(sr)
    path = str(tmp_path / "i32.wav")
    wavfile.write(path, sr, (sig * (2 ** 31 - 1)).astype(np.int32))
    mono, _ = W.read_wav(path)
    np.testing.assert_allclose(mono, sig, atol=1e-6)


def test_resample_matches_scipy(native_available):
    """Passband parity: filters differ in the transition band (Kaiser beta
    8.6/32-taps vs scipy default), so compare on band-limited signals."""
    from scipy.signal import firwin, lfilter

    rng = np.random.default_rng(0)
    for sr_in in (44100, 48000, 8000):
        sig = rng.normal(size=sr_in).astype(np.float32) * 0.3
        cutoff = 0.7 * min(sr_in, 16000) / 2
        sig = lfilter(firwin(255, cutoff, fs=sr_in), 1.0, sig).astype(np.float32)
        out = W.resample(sig, sr_in, 16000)
        g = np.gcd(sr_in, 16000)
        ref = resample_poly(sig, 16000 // g, sr_in // g)
        m = min(len(out), len(ref))
        err = np.abs(out[500: m - 500] - ref[500: m - 500]).max()
        assert err < 1e-2, (sr_in, err)
        assert len(out) == len(ref)


def test_read_wav_16k_end_to_end(tmp_path, native_available):
    sr = 48000
    sig = make_tone(sr, seconds=0.5, freq=1000.0)
    path = str(tmp_path / "t.wav")
    wavfile.write(path, sr, (sig * 32767).astype(np.int16))
    out = W.read_wav_16k(path)
    assert abs(len(out) - 8000) <= 2
    spec = np.abs(np.fft.rfft(out[:8000] * np.hanning(len(out[:8000]))))
    peak_hz = np.argmax(spec) * 16000 / 8000
    assert abs(peak_hz - 1000.0) < 5


def test_fallback_path(tmp_path, monkeypatch):
    """Force the non-native path and check it still reads PCM16."""
    monkeypatch.setattr(W, "_LIB", None)
    monkeypatch.setattr(W, "_LIB_TRIED", True)
    sr = 16000
    sig = make_tone(sr)
    path = str(tmp_path / "fb.wav")
    wavfile.write(path, sr, (sig * 32767).astype(np.int16))
    mono, got_sr = W.read_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(mono, sig, atol=1e-4)
