"""Whisper encoder/decoder parity vs HF torch on a tiny random config."""

import numpy as np
import torch


def tiny_whisper():
    from transformers import WhisperConfig as HFCfg, WhisperModel

    # init_std=0.2 (not the 0.02 default): with default init a tiny random
    # model's activations are ~1e-2, and LayerNorm amplifies fp32 noise far
    # above the parity threshold; real checkpoints have O(1) activations.
    cfg = HFCfg(d_model=32, encoder_layers=2, decoder_layers=2,
                encoder_attention_heads=2, decoder_attention_heads=2,
                encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
                max_source_positions=1500, max_target_positions=448,
                vocab_size=60000, dropout=0.0, attention_dropout=0.0,
                activation_dropout=0.0, init_std=0.2)
    torch.manual_seed(0)
    return WhisperModel(cfg).eval()


def test_whisper_parity_full():
    import jax.numpy as jnp

    from mertools_tpu.encoders import whisper as wsp

    hf = tiny_whisper()
    cfg, params = wsp.from_hf_torch(hf)
    model = wsp.WhisperModel(cfg)

    rng = np.random.default_rng(0)
    mel = rng.normal(size=(1, 80, 3000)).astype(np.float32)
    dec_ids = np.array([[hf.config.decoder_start_token_id] * 2])
    with torch.no_grad():
        ref = hf(torch.tensor(mel), decoder_input_ids=torch.tensor(dec_ids).long()
                 ).last_hidden_state.numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(mel),
                                  jnp.asarray(dec_ids.astype(np.int32))))
    assert ours.shape == ref.shape == (1, 2, 32)
    assert np.abs(ours - ref).max() < 1e-4


def test_whisper_causal_decoder():
    """Later tokens must not influence earlier hidden states."""
    import jax.numpy as jnp

    from mertools_tpu.encoders import whisper as wsp

    hf = tiny_whisper()
    cfg, params = wsp.from_hf_torch(hf)
    model = wsp.WhisperModel(cfg)
    mel = jnp.asarray(np.random.default_rng(1).normal(size=(1, 80, 3000)).astype(np.float32))
    a = model.apply({"params": params}, mel, jnp.asarray([[5, 7, 9]], jnp.int32))
    b = model.apply({"params": params}, mel, jnp.asarray([[5, 7, 1]], jnp.int32))
    np.testing.assert_allclose(np.asarray(a[:, :2]), np.asarray(b[:, :2]), atol=1e-5)
    assert np.abs(np.asarray(a[:, 2]) - np.asarray(b[:, 2])).max() > 1e-4


def test_whisper_mel_to_feature_pipeline():
    """The reference's whisper feature: log-mel + 2-token decoder states."""
    import jax
    import jax.numpy as jnp

    from transformers import WhisperFeatureExtractor

    from mertools_tpu.encoders import whisper as wsp
    from mertools_tpu.ops import mel as melmod

    hf = tiny_whisper()
    cfg, params = wsp.from_hf_torch(hf)
    model = wsp.WhisperModel(cfg)

    wav = (np.random.default_rng(2).normal(size=3 * 16000) * 0.1).astype(np.float32)
    fe = WhisperFeatureExtractor()
    ref_mel = fe(wav, sampling_rate=16000, return_tensors="pt").input_features
    dec = torch.tensor([[hf.config.decoder_start_token_id] * 2]).long()
    with torch.no_grad():
        ref = hf(ref_mel, decoder_input_ids=dec).last_hidden_state[0].numpy()

    our_mel = jax.jit(melmod.log_mel_spectrogram)(
        jnp.asarray(melmod.pad_or_trim(wav)[None]))
    ours = np.asarray(model.apply(
        {"params": params}, our_mel,
        jnp.asarray([[cfg.decoder_start_token_id] * 2], jnp.int32)))[0]
    assert np.abs(ours - ref).max() < 1e-3  # the BASELINE parity contract


def test_whisper_audio_extractor_feature_path(rng):
    """2-token decoder-stub features (extract_audio_huggingface.py:83-91):
    UTT = mean over the two positions, FRA = (2, D)."""
    import jax

    from mertools_tpu.encoders.whisper import WhisperConfig, WhisperModel
    from mertools_tpu.features.audio import WhisperAudioExtractor

    cfg = WhisperConfig(d_model=32, encoder_layers=1, decoder_layers=1,
                        num_heads=4, ffn_dim=64, vocab_size=64,
                        decoder_start_token_id=60, eos_token_id=61)
    model = WhisperModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 80, 3000), np.float32),
                        np.zeros((1, 2), np.int32))["params"]
    ex = WhisperAudioExtractor(cfg, params, batch_size=2)
    wavs = {f"c{i}": rng.normal(size=16000 * (i + 1)).astype(np.float32) * 0.1
            for i in range(3)}
    fra = ex.extract(wavs, "FRA")
    utt = ex.extract(wavs, "UTT")
    assert fra["c0"].shape == (2, 32) and utt["c0"].shape == (32,)
    np.testing.assert_allclose(utt["c1"], fra["c1"].mean(0), rtol=1e-5,
                               atol=1e-6)
    # different clips -> different features (content-sensitive)
    assert not np.allclose(fra["c0"], fra["c2"])


def test_whisper_extractor_int16_transfer(rng):
    """int16 wire format: exact for PCM16 sources (Whisper has no input
    normalization — i16/32768 on device == the f32 the host would ship)."""
    import jax

    from mertools_tpu.encoders.whisper import WhisperConfig, WhisperModel
    from mertools_tpu.features.audio import WhisperAudioExtractor

    cfg = WhisperConfig(d_model=32, encoder_layers=1, decoder_layers=1,
                        num_heads=4, ffn_dim=64, vocab_size=64,
                        decoder_start_token_id=60, eos_token_id=61)
    model = WhisperModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 80, 3000), np.float32),
                        np.zeros((1, 2), np.int32))["params"]
    wavs16 = {f"c{i}": (rng.normal(size=16000 * (i + 1)) * 3000
                        ).astype(np.int16) for i in range(2)}
    wavs_f = {n: w.astype(np.float32) / 32768.0 for n, w in wavs16.items()}

    ref = WhisperAudioExtractor(cfg, params, batch_size=2).extract(wavs_f, "FRA")
    got = WhisperAudioExtractor(cfg, params, batch_size=2,
                                transfer_dtype="int16").extract(wavs16, "FRA")
    for n in wavs16:
        np.testing.assert_allclose(got[n], ref[n], atol=1e-5)
