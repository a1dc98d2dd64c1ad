"""Whisper log-mel golden test vs transformers' WhisperFeatureExtractor."""

import numpy as np


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    from mertools_tpu.ops import mel

    ref = hf_fb(num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
                max_frequency=8000.0, sampling_rate=16000, norm="slaney",
                mel_scale="slaney")
    ours = mel.mel_filter_bank()
    # HF returns (n_freqs, n_mels)
    np.testing.assert_allclose(ours, ref.T, atol=1e-6)


def test_log_mel_matches_whisper_feature_extractor():
    import jax
    import jax.numpy as jnp

    from transformers import WhisperFeatureExtractor

    from mertools_tpu.ops import mel

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=4 * 16000) * 0.1).astype(np.float32)

    ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    padded = mel.pad_or_trim(wav)
    ours = np.asarray(jax.jit(mel.log_mel_spectrogram)(jnp.asarray(padded[None])))[0]
    assert ours.shape == ref.shape == (80, 3000)
    assert np.abs(ours - ref).max() < 1e-3


def test_log_mel_truncates_long():
    from mertools_tpu.ops import mel

    wav = np.ones(40 * 16000, np.float32)
    assert len(mel.pad_or_trim(wav)) == mel.CHUNK_SAMPLES
