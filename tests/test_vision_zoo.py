"""Vision-zoo extraction pipelines: pooling semantics + preprocessing parity.

Covers the reference behaviors of extract_vision_huggingface.py:124-189
(token-sum, DINOv2 64-frame resample, VideoMAE segments, UTT mean) and the
FER transform stacks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.encoders import vit as V
from mertools_tpu.features import vision_zoo as Z


def _faces(rng, n_clips=2, T=10, hw=32):
    return {f"c{i}": rng.integers(0, 255, size=(T + i, hw, hw, 3),
                                  dtype=np.uint8)
            for i in range(n_clips)}


def _tiny_vit(arch="dinov2"):
    if arch == "dinov2":
        cfg = V.dinov2_config(hidden_size=16, num_layers=1, num_heads=2,
                              intermediate_size=32, image_size=28)
    else:
        cfg = V.beit_config(hidden_size=16, num_layers=1, num_heads=2,
                            intermediate_size=32, image_size=32,
                            patch_size=16)
    enc = V.ViTEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      np.zeros((1, cfg.image_size, cfg.image_size, 3),
                               np.float32))["params"]
    return cfg, params, enc


def test_token_sum_matches_manual(rng):
    cfg, params, enc = _tiny_vit("beit")
    ex = Z.vit_token_sum_extractor(cfg, params, batch_size=4)
    faces = _faces(rng, n_clips=1, T=3, hw=32)
    out = ex.extract(faces, level="FRA")["c0"]
    assert out.shape == (3, 16)
    # manual: preprocess one frame, forward, sum tokens
    pix = Z.preprocess_device(jnp.asarray(faces["c0"][:1]), ex.spec)
    ref = np.asarray(enc.apply({"params": params}, pix).sum(1))[0]
    np.testing.assert_allclose(out[0], ref, rtol=1e-5, atol=1e-5)


def test_utt_is_frame_mean(rng):
    cfg, params, _ = _tiny_vit("beit")
    ex = Z.vit_token_sum_extractor(cfg, params, batch_size=4)
    faces = _faces(rng, n_clips=1, T=5, hw=32)
    fra = ex.extract(faces, "FRA")["c0"]
    utt = ex.extract(faces, "UTT")["c0"]
    np.testing.assert_allclose(utt, fra.mean(0), rtol=1e-5, atol=1e-6)


def test_dinov2_resamples_64_frames(rng):
    cfg, params, _ = _tiny_vit("dinov2")
    ex = Z.vit_token_sum_extractor(cfg, params, batch_size=16)
    assert ex.max_frames == 64
    faces = {"long": rng.integers(0, 255, size=(100, 28, 28, 3),
                                  dtype=np.uint8)}
    out = ex.extract(faces, "FRA")["long"]
    assert out.shape[0] == 64  # reference :136


def test_videomae_segments(rng):
    cfg = V.videomae_config(hidden_size=16, num_layers=1, num_heads=2,
                            intermediate_size=32, image_size=32,
                            patch_size=16, num_frames=8, tubelet_size=2)
    enc = V.ViTEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0),
                      np.zeros((1, 8, 32, 32, 3), np.float32))["params"]
    ex = Z.VideoMAEExtractor(cfg, params, batch_size=2)
    faces = _faces(rng, n_clips=2, T=20, hw=40)
    out = ex.extract(faces, "FRA")
    assert out["c0"].shape == (4, 16)  # 8 frames / tubelet 2
    utt = ex.extract(faces, "UTT")
    np.testing.assert_allclose(utt["c0"], out["c0"].mean(0), rtol=1e-5,
                               atol=1e-6)


def test_preprocess_center_crop_matches_torchvision(rng):
    """ferplus stack: Resize(256)+CenterCrop(224)+x255+mean-subtract."""
    import torch
    import torch.nn.functional as F

    frame = rng.integers(0, 255, size=(1, 112, 112, 3), dtype=np.uint8)
    mean = (131.0912, 103.8827, 91.4953)
    spec = Z.ferplus_spec(mean)
    out = np.asarray(Z.preprocess_device(jnp.asarray(frame), spec))

    x = torch.from_numpy(frame[..., ::-1].astype(np.float32).copy())
    x = x.permute(0, 3, 1, 2)
    x = F.interpolate(x, size=(256, 256), mode="bicubic", align_corners=False)
    off = (256 - 224) // 2
    x = x[:, :, off:off + 224, off:off + 224]
    ref = (x - torch.tensor(mean)[None, :, None, None]).numpy()
    ref = ref.transpose(0, 2, 3, 1)
    # bicubic kernel families differ across libraries (jax Catmull-Rom a=-0.5
    # vs torch a=-0.75): check the transform pipeline (BGR->RGB, crop window,
    # scale, mean subtraction) via near-perfect correlation + matched stats.
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr
    np.testing.assert_allclose(out.mean(), ref.mean(), atol=0.5)
    np.testing.assert_allclose(out.std(), ref.std(), rtol=0.05)


def test_manet_extractor_runs(rng):
    from mertools_tpu.encoders.resnet import MANet
    model = MANet(layers=(1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 224, 224, 3), np.float32))["params"]
    from mertools_tpu.features.vision_zoo import FrameStreamExtractor, PreprocessSpec

    def forward(p, pix):
        return model.apply({"params": p}, pix)

    ex = FrameStreamExtractor(forward, params, PreprocessSpec(image_size=224),
                              batch_size=4)
    out = ex.extract(_faces(rng, n_clips=1, T=2, hw=64), "UTT")["c0"]
    assert out.shape == (1024,) and np.isfinite(out).all()


def test_zoo_bf16_mode_close_to_f32(rng):
    """compute_dtype='bf16' (production) on the ViT-zoo backends stays in
    the bf16 error class of the f32 path and returns f32 arrays."""
    cfg, params, _ = _tiny_vit("beit")
    faces = _faces(rng, n_clips=2, T=3, hw=32)
    exact = Z.vit_token_sum_extractor(cfg, params, batch_size=4
                                      ).extract(faces, level="UTT")
    fast = Z.vit_token_sum_extractor(cfg, params, batch_size=4,
                                     compute_dtype="bf16"
                                     ).extract(faces, level="UTT")
    for n in faces:
        assert fast[n].dtype == np.float32
        e, q = exact[n], fast[n]
        cos = float(np.dot(e, q) / (np.linalg.norm(e) * np.linalg.norm(q)))
        assert cos > 0.995, (n, cos)
