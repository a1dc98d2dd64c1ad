"""Token Merging (ToMe, arXiv:2210.09461) in the ViT family: merge
mechanics, size conservation, approximation quality, extractor integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.encoders.vit import (ViTConfig, ViTEncoder, dinov2_config,
                                       tome_merge)


def test_tome_merge_mechanics(rng):
    B, N, D = 2, 9, 8
    x = rng.normal(size=(B, N, D)).astype(np.float32)
    metric = rng.normal(size=(B, N, 4)).astype(np.float32)
    sizes = np.ones((B, N), np.float32)
    out, s = tome_merge(jnp.asarray(x), jnp.asarray(metric),
                        jnp.asarray(sizes), r=2, n_protected=1)
    assert out.shape == (B, N - 2, D)
    # total token mass is conserved
    np.testing.assert_allclose(np.asarray(s).sum(-1), N, rtol=1e-6)
    # CLS row is untouched
    np.testing.assert_array_equal(np.asarray(out)[:, 0], x[:, 0])
    # size-weighted token sum is conserved EXACTLY by the merge step
    np.testing.assert_allclose(
        np.einsum("bnd,bn->bd", np.asarray(out), np.asarray(s)),
        x.sum(1), rtol=1e-4, atol=1e-5)


def test_tome_merges_identical_tokens_first(rng):
    """Duplicated tokens are the most similar pair -> merged, losslessly."""
    B, N, D = 1, 7, 6
    x = rng.normal(size=(B, N, D)).astype(np.float32)
    x[0, 2] = x[0, 3]                    # A-token 2 == B-token idx 1 (pos 3)
    metric = x.copy()
    sizes = np.ones((B, N), np.float32)
    out, s = tome_merge(jnp.asarray(x), jnp.asarray(metric),
                        jnp.asarray(sizes), r=1, n_protected=1)
    # one token gone; the duplicate pair's survivor has size 2, value equal
    s = np.asarray(s)
    merged_pos = int(np.argmax(s[0]))
    assert s[0, merged_pos] == 2.0
    np.testing.assert_allclose(np.asarray(out)[0, merged_pos], x[0, 2],
                               rtol=1e-6)


def test_tome_encoder_shapes_and_approximation(rng):
    cfg_full = dinov2_config(hidden_size=32, num_layers=4, num_heads=4,
                             intermediate_size=64, image_size=56)
    enc_full = ViTEncoder(cfg_full)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    params = enc_full.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(enc_full.apply({"params": params}, x))    # (2, 17, 32)

    import dataclasses
    cfg_tome = dataclasses.replace(cfg_full, tome_r=2)
    tokens, sizes = ViTEncoder(cfg_tome).apply({"params": params}, x)
    # 16 patches + CLS, minus 2/layer x 4 layers
    assert tokens.shape == (2, 17 - 8, 32)
    np.testing.assert_allclose(np.asarray(sizes).sum(-1), 17, rtol=1e-5)
    # size-weighted sum approximates the full token sum
    approx = np.einsum("bnd,bn->bd", np.asarray(tokens), np.asarray(sizes))
    full = ref.sum(1)
    rel = np.abs(approx - full).max() / np.abs(full).max()
    assert rel < 0.35, rel               # approximate, not exact
    # r=0 path is untouched (exact)
    again = np.asarray(enc_full.apply({"params": params}, x))
    np.testing.assert_array_equal(again, ref)


def test_tome_extractor(rng):
    import dataclasses

    from mertools_tpu.features.vision_zoo import vit_token_sum_extractor

    cfg = dinov2_config(hidden_size=32, num_layers=2, num_heads=4,
                        intermediate_size=64, image_size=56, tome_r=2)
    enc = ViTEncoder(dataclasses.replace(cfg, tome_r=0))
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 56, 56, 3)))["params"]
    ex = vit_token_sum_extractor(cfg, params, batch_size=4, max_frames=3)
    faces = {"a": (rng.random((5, 112, 112, 3)) * 255).astype(np.uint8)}
    out = ex.extract(faces, level="UTT")["a"]
    assert out.shape == (32,) and np.isfinite(out).all()


def test_tome_incompatible_with_rel_pos():
    cfg = ViTConfig(hidden_size=16, num_layers=1, num_heads=2,
                    intermediate_size=32, image_size=32, rel_pos_bias=True,
                    qv_bias_only=True, pos_embed="none", tome_r=1,
                    final_layernorm=False)
    enc = ViTEncoder(cfg)
    with pytest.raises(AssertionError):
        enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_tome_clip_tower(rng):
    import dataclasses

    from mertools_tpu.encoders.vit_clip import (CLIPVisionConfig,
                                                CLIPVisionEncoder)

    cfg = CLIPVisionConfig(hidden_size=32, num_hidden_layers=3,
                           num_attention_heads=4, intermediate_size=64,
                           image_size=56, patch_size=14, projection_dim=24)
    enc = CLIPVisionEncoder(cfg)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    ref = enc.apply({"params": params}, x)

    tcfg = dataclasses.replace(cfg, tome_r=3)
    out = CLIPVisionEncoder(tcfg).apply({"params": params}, x)
    # 16 patches + CLS -> minus 3/layer x 3 layers
    assert out["last_hidden"].shape == (2, 17 - 9, 32)
    assert out["image_embeds"].shape == (2, 24)
    # CLS-pooled output is an approximation of the full tower's
    rel = (np.abs(np.asarray(out["image_embeds"] - ref["image_embeds"])).max()
           / np.abs(np.asarray(ref["image_embeds"])).max())
    assert rel < 0.5 and np.isfinite(np.asarray(out["image_embeds"])).all()


def test_tome_siglip_tower(rng):
    import dataclasses

    from mertools_tpu.encoders.siglip import (SiglipVisionConfig,
                                              SiglipVisionEncoder)
    from mertools_tpu.features.vision_zoo import siglip_token_mean_extractor

    cfg = SiglipVisionConfig(hidden_size=32, num_layers=3, num_heads=4,
                             intermediate_size=64, image_size=56,
                             patch_size=14, use_head=False)
    enc = SiglipVisionEncoder(cfg)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    ref = enc.apply({"params": params}, x)["last_hidden"].mean(axis=1)

    tcfg = dataclasses.replace(cfg, tome_r=3)
    out = SiglipVisionEncoder(tcfg).apply({"params": params}, x)
    assert out["last_hidden"].shape == (2, 16 - 9, 32)   # no CLS
    np.testing.assert_allclose(np.asarray(out["sizes"]).sum(-1), 16,
                               rtol=1e-5)
    ex = siglip_token_mean_extractor(tcfg, params, batch_size=4, max_frames=2)
    faces = {"a": (rng.random((3, 112, 112, 3)) * 255).astype(np.uint8)}
    feat = ex.extract(faces, level="UTT")["a"]
    assert feat.shape == (32,) and np.isfinite(feat).all()
    assert np.isfinite(np.asarray(ref)).all()


def test_tome_eva_clip_g_extractor(rng):
    from mertools_tpu.encoders.vit import ViTEncoder, eva_clip_g_config
    from mertools_tpu.features.vision_zoo import \
        eva_clip_g_token_mean_extractor

    cfg = eva_clip_g_config(hidden_size=16, num_layers=2, num_heads=4,
                            intermediate_size=40, image_size=28, tome_r=2)
    import dataclasses
    enc = ViTEncoder(dataclasses.replace(cfg, tome_r=0))
    params = enc.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 28, 28, 3)))["params"]
    ex = eva_clip_g_token_mean_extractor(cfg, params, batch_size=4,
                                         max_frames=2)
    faces = {"a": (rng.random((3, 112, 112, 3)) * 255).astype(np.uint8)}
    out = ex.extract(faces, level="UTT")["a"]
    assert out.shape == (16,) and np.isfinite(out).all()
