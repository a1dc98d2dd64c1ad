"""Torch->Flax parity for the generic ViT family (DINOv2 / data2vec-vision /
VideoMAE) on random tiny configs, plus structural checks for EVA-02 (no torch
oracle for timm in this environment).

Reference usage: ``MERBench/feature_extraction/visual/
extract_vision_huggingface.py:124-169`` (last_hidden_state pooling).
"""

import numpy as np
import pytest

import jax

from mertools_tpu.encoders import vit as V

ATOL = 2e-4


def _img(rng, b, s, c=3):
    return rng.normal(size=(b, s, s, c)).astype(np.float32)


def test_dinov2_parity(rng):
    import torch
    from transformers import Dinov2Config, Dinov2Model

    hf_cfg = Dinov2Config(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, mlp_ratio=2, image_size=28,
                          patch_size=14, layerscale_value=1.0)
    torch.manual_seed(0)
    model = Dinov2Model(hf_cfg).eval()
    cfg, params = V.from_hf_dinov2(model)
    x = _img(rng, 2, 28)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    out = np.asarray(V.ViTEncoder(cfg).apply({"params": params},
                                             jax.numpy.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_data2vec_vision_parity(rng):
    import torch
    from transformers import Data2VecVisionConfig, Data2VecVisionModel

    hf_cfg = Data2VecVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16,
        use_relative_position_bias=True, layer_scale_init_value=0.1,
        use_mean_pooling=True)
    torch.manual_seed(0)
    model = Data2VecVisionModel(hf_cfg).eval()
    # randomize the zero-init relative bias tables so the test is meaningful
    sd = model.state_dict()
    for k in sd:
        if "relative_position_bias_table" in k:
            sd[k] = torch.randn_like(sd[k]) * 0.1
    model.load_state_dict(sd)

    cfg, params = V.from_hf_beit(model)
    assert cfg.rel_pos_bias and cfg.pos_embed == "none"
    x = _img(rng, 2, 32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    out = np.asarray(V.ViTEncoder(cfg).apply({"params": params},
                                             jax.numpy.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_videomae_parity(rng):
    import torch
    from transformers import VideoMAEConfig, VideoMAEModel

    hf_cfg = VideoMAEConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            image_size=32, patch_size=16, num_frames=4,
                            tubelet_size=2, use_mean_pooling=True)
    torch.manual_seed(0)
    model = VideoMAEModel(hf_cfg).eval()
    cfg, params = V.from_hf_videomae(model)
    x = rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32)  # B,T,H,W,C
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3))).last_hidden_state.numpy()
    out = np.asarray(V.ViTEncoder(cfg).apply({"params": params},
                                             jax.numpy.asarray(x)))
    assert out.shape == ref.shape  # (2, (4//2)*(2*2), 32)
    np.testing.assert_allclose(out, ref, atol=ATOL)


def test_eva02_structural(rng):
    cfg = V.eva02_config(hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=48, image_size=28)
    enc = V.ViTEncoder(cfg)
    x = jax.numpy.asarray(_img(rng, 2, 28))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    out = np.asarray(enc.apply({"params": params}, x))
    assert out.shape == (2, cfg.seq_len, 32)
    assert np.isfinite(out).all()
    # rope: permuting patch positions must change outputs (position-aware)
    xp = jax.numpy.asarray(_img(rng, 2, 28)[:, ::-1])
    out2 = np.asarray(enc.apply({"params": params}, xp))
    assert not np.allclose(out, out2)


def test_siglip_parity(rng):
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from mertools_tpu.encoders import siglip as S

    hf_cfg = SiglipVisionConfig(hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=4, intermediate_size=48,
                                image_size=28, patch_size=14)
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval()
    cfg, params = S.from_hf_torch(model)
    x = _img(rng, 2, 28)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    output_hidden_states=True)
    out = jax.tree_util.tree_map(
        np.asarray,
        S.SiglipVisionEncoder(cfg).apply({"params": params},
                                         jax.numpy.asarray(x)))
    # hidden_states[-1] is what the reference mean-pools (encoder.py:277-278)
    np.testing.assert_allclose(out["last_hidden"],
                               ref.hidden_states[-1].numpy(), atol=ATOL)
    np.testing.assert_allclose(out["post_ln"],
                               ref.last_hidden_state.numpy(), atol=ATOL)
    np.testing.assert_allclose(out["pooled"],
                               ref.pooler_output.numpy(), atol=ATOL)


def test_siglip_extractor_shapes(rng):
    from mertools_tpu.encoders.siglip import (SiglipVisionConfig,
                                              SiglipVisionEncoder)
    from mertools_tpu.features.vision_zoo import siglip_token_mean_extractor

    cfg = SiglipVisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                             intermediate_size=48, image_size=28,
                             patch_size=14, use_head=False)
    enc = SiglipVisionEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      jax.numpy.zeros((1, 28, 28, 3)))["params"]
    ex = siglip_token_mean_extractor(cfg, params, batch_size=4, max_frames=3)
    faces = {"a": (rng.random((5, 112, 112, 3)) * 255).astype(np.uint8),
             "b": (rng.random((2, 112, 112, 3)) * 255).astype(np.uint8)}
    fra = ex.extract(faces, level="FRA")
    assert fra["a"].shape == (3, 32) and fra["b"].shape == (2, 32)
    utt = ex.extract(faces, level="UTT")
    assert utt["a"].shape == (32,)
    np.testing.assert_allclose(utt["a"], fra["a"].mean(0), rtol=1e-5)


def test_eva_clip_g_converter(rng):
    from mertools_tpu.encoders.vit import (ViTEncoder, eva_clip_g_config,
                                           from_eva_clip_g_checkpoint)

    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    H, inter, patch, grid, L = 16, 40, 14, 2, 2
    sd = {"patch_embed.proj.weight": r(H, 3, patch, patch),
          "patch_embed.proj.bias": r(H),
          "cls_token": r(1, 1, H),
          "pos_embed": r(1, grid * grid + 1, H)}
    for i in range(L):
        sd.update({
            f"blocks.{i}.norm1.weight": 1 + r(H), f"blocks.{i}.norm1.bias": r(H),
            f"blocks.{i}.norm2.weight": 1 + r(H), f"blocks.{i}.norm2.bias": r(H),
            f"blocks.{i}.attn.qkv.weight": r(3 * H, H),
            f"blocks.{i}.attn.q_bias": r(H), f"blocks.{i}.attn.v_bias": r(H),
            f"blocks.{i}.attn.proj.weight": r(H, H),
            f"blocks.{i}.attn.proj.bias": r(H),
            f"blocks.{i}.mlp.fc1.weight": r(inter, H),
            f"blocks.{i}.mlp.fc1.bias": r(inter),
            f"blocks.{i}.mlp.fc2.weight": r(H, inter),
            f"blocks.{i}.mlp.fc2.bias": r(H),
        })
    cfg, params = from_eva_clip_g_checkpoint(sd)
    assert (cfg.hidden_size, cfg.num_layers, cfg.intermediate_size,
            cfg.image_size) == (H, L, inter, grid * patch)
    assert not cfg.final_layernorm and cfg.qv_bias_only
    enc = ViTEncoder(cfg)
    ref = enc.init(jax.random.PRNGKey(0),
                   jax.numpy.zeros((1, 28, 28, 3)))["params"]
    assert (jax.tree_util.tree_map(lambda a: a.shape, ref)
            == jax.tree_util.tree_map(lambda a: a.shape, params))
    out = np.asarray(enc.apply({"params": params},
                               jax.numpy.asarray(_img(rng, 2, 28))))
    assert out.shape == (2, cfg.seq_len, H) and np.isfinite(out).all()


def test_eva_clip_g_extractor_ln_vision(rng):
    from mertools_tpu.encoders.vit import ViTEncoder, eva_clip_g_config
    from mertools_tpu.features.vision_zoo import \
        eva_clip_g_token_mean_extractor

    cfg = eva_clip_g_config(hidden_size=16, num_layers=1, num_heads=4,
                            intermediate_size=40, image_size=28)
    enc = ViTEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      jax.numpy.zeros((1, 28, 28, 3)))["params"]
    faces = {"a": (rng.random((3, 112, 112, 3)) * 255).astype(np.uint8)}
    ex = eva_clip_g_token_mean_extractor(cfg, params, batch_size=4)
    utt = ex.extract(faces, level="UTT")["a"]
    assert utt.shape == (16,) and np.isfinite(utt).all()
    # token-mean of a layernormed representation: near-zero mean feature
    assert abs(utt.mean()) < 1.0
    # identity-affine ln_vision == explicit identity weights
    ident = {"scale": jax.numpy.ones(16), "bias": jax.numpy.zeros(16)}
    ex2 = eva_clip_g_token_mean_extractor(cfg, params, ln_vision=ident,
                                          batch_size=4)
    np.testing.assert_allclose(ex2.extract(faces, level="UTT")["a"], utt,
                               rtol=1e-6)


def test_dinov2_giant_swiglu_parity(rng):
    """dinov2-giant class: use_swiglu_ffn=True (HF Dinov2SwiGLUFFN packs
    gate+value into weights_in; silu(x1)*x2) — converter splits it into our
    fc1_gate/fc1."""
    import torch
    from transformers import Dinov2Config, Dinov2Model

    from mertools_tpu.encoders import vit as V

    hf_cfg = Dinov2Config(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, mlp_ratio=4, image_size=28,
                          patch_size=14, layerscale_value=1.0,
                          use_swiglu_ffn=True)
    torch.manual_seed(1)
    model = Dinov2Model(hf_cfg).eval()
    cfg, params = V.from_hf_dinov2(model)
    assert cfg.use_swiglu and cfg.intermediate_size == 88  # (32*4*2/3 -> 88)
    x = _img(rng, 2, 28)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(
            x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    out = np.asarray(V.ViTEncoder(cfg).apply({"params": params},
                                             jax.numpy.asarray(x)))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-4
