"""Frozen-encoder registry for the AffectGPT raw-input path
(mllm/encoders.py vs reference my_affectgpt/models/encoder.py)."""

import numpy as np
import pytest

from mertools_tpu.mllm.encoders import (ACOUSTIC_KIND, VISUAL_KIND,
                                        build_acoustic_encoder,
                                        build_visual_encoder)
from mertools_tpu.core.registry import registry


def test_registry_names():
    assert set(registry.names(VISUAL_KIND)) >= {
        "CLIP_VIT_LARGE", "DINO2_LARGE", "SigLIP_SO",
        "EVA_CLIP_G_NO_QFORMER"}
    assert set(registry.names(ACOUSTIC_KIND)) >= {
        "HUBERT_LARGE", "WAVLM_LARGE", "DATA2VEC_BASE", "IMAGEBIND"}


@pytest.mark.parametrize("name", ["CLIP_VIT_LARGE", "DINO2_LARGE",
                                  "SigLIP_SO", "EVA_CLIP_G_NO_QFORMER"])
def test_visual_encoders_random_init(name, rng):
    enc, dim = build_visual_encoder(name, random_init=True, max_frames=3)
    faces = {"a": (rng.random((5, 112, 112, 3)) * 255).astype(np.uint8),
             "b": (rng.random((2, 112, 112, 3)) * 255).astype(np.uint8)}
    out = enc(faces)
    assert out["a"].shape == (3, dim)       # resampled to max_frames
    assert out["b"].shape == (2, dim)
    assert all(np.isfinite(v).all() for v in out.values())


@pytest.mark.parametrize("name", ["HUBERT_LARGE", "DATA2VEC_BASE",
                                  "IMAGEBIND"])
def test_acoustic_encoders_random_init(name, rng):
    # short clip windows: production is 2 s (32000); long-seq attention
    # compiles on XLA:CPU take many minutes
    kw = {} if name == "IMAGEBIND" else {"clip_samples": 2000}
    enc, dim = build_acoustic_encoder(name, random_init=True, **kw)
    wavs = {"a": rng.normal(size=50000).astype(np.float32) * 0.1,
            "b": rng.normal(size=9000).astype(np.float32) * 0.1}
    out = enc(wavs)
    # 8 ImageBind-style 2 s clips per utterance (encoder.py audio contract)
    assert out["a"].shape == (8, dim)
    assert out["b"].shape == (8, dim)
    assert all(np.isfinite(v).all() for v in out.values())


def test_hubert_clip_pooling_semantics(rng):
    """The MLLM acoustic path pools last-4 hidden-state MEAN (not the
    MERBench extractors' SUM) then frame-mean per 2 s clip
    (encoder.py:418-434)."""
    import jax

    from mertools_tpu.encoders.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
    from mertools_tpu.features.audio import normalize_wav
    from mertools_tpu.mllm.encoders import _clip_pooled_wav2vec2
    from mertools_tpu.ops.fbank import sample_audio_clips

    cfg = Wav2Vec2Config(hidden_size=16, num_hidden_layers=4,
                         num_attention_heads=4, intermediate_size=32,
                         conv_dim=(8, 8), conv_kernel=(10, 3),
                         conv_stride=(5, 2), num_conv_pos_embeddings=16,
                         num_conv_pos_embedding_groups=2)
    enc = Wav2Vec2Encoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      np.zeros((1, 4000), np.float32))["params"]
    encode = _clip_pooled_wav2vec2(cfg, params, clip_samples=2000)
    wav = rng.normal(size=40000).astype(np.float32) * 0.1
    out = encode({"x": wav})["x"]

    # oracle: clip 0 through the encoder directly
    clip0 = normalize_wav(sample_audio_clips(wav, clip_duration=0.125)[0])
    hs = enc.apply({"params": params}, clip0[None])
    ref = (sum(np.asarray(hs[i]) for i in (-4, -3, -2, -1)) / 4.0)[0].mean(0)
    np.testing.assert_allclose(out[0], ref, rtol=2e-5, atol=2e-6)
