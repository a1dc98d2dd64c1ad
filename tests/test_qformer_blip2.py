"""BLIP-2 Q-Former checkpoint compatibility: our QFormer with converted
weights must match HF Blip2QFormerModel (the LAVIS Qformer minus the text
branch — exactly what the reference keeps, encoder.py:76-85)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.mllm.qformer import (QFormer, QFormerConfig,
                                       from_blip2_qformer)


@pytest.mark.parametrize("freq", [1, 2])
def test_blip2_qformer_parity(rng, freq):
    import torch
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    hf_cfg = Blip2QFormerConfig(
        vocab_size=30, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        encoder_hidden_size=30, cross_attention_frequency=freq)
    torch.manual_seed(0)
    model = Blip2QFormerModel(hf_cfg).eval()

    B, nq, T = 2, 4, 5
    qt = rng.normal(size=(1, nq, 24)).astype(np.float32) * 0.5
    enc = rng.normal(size=(B, T, 30)).astype(np.float32)
    enc_mask = np.ones((B, T), np.int64)
    enc_mask[1, 3:] = 0
    with torch.no_grad():
        ref = model(query_embeds=torch.from_numpy(qt).expand(B, -1, -1),
                    encoder_hidden_states=torch.from_numpy(enc),
                    encoder_attention_mask=torch.from_numpy(enc_mask)
                    ).last_hidden_state.numpy()

    sd = dict(model.state_dict())
    sd["query_tokens"] = torch.from_numpy(qt)
    cfg, params = from_blip2_qformer(sd, prefix="", attn_inner="attention",
                                     num_heads=2)
    assert cfg.cross_attention_freq == freq and cfg.num_layers == 2
    assert not cfg.project_encoder and cfg.query_layernorm
    out = np.asarray(QFormer(cfg).apply({"params": params},
                                        jnp.asarray(enc),
                                        jnp.asarray(enc_mask)))
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_eva_clip_g_registry_encoder(rng):
    from mertools_tpu.mllm.encoders import build_visual_encoder

    enc, dim = build_visual_encoder("EVA_CLIP_G", random_init=True,
                                    max_frames=3)
    faces = {"a": (rng.random((5, 112, 112, 3)) * 255).astype(np.uint8)}
    out = enc(faces)["a"]
    # 3 frames x 4 queries, qformer hidden 16
    assert out.shape == (12, 16) and dim == 16
    assert np.isfinite(out).all()
