"""Separable-matmul resize (ops/image.py) must bit-match jax.image.resize;
the fused preprocess must match the naive pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.ops.image import (fused_face_preprocess, resize_separable,
                                    resize_weight_matrix)


@pytest.mark.parametrize("method", ["bicubic", "bilinear"])
@pytest.mark.parametrize("shape", [(112, 112, 224, 224),   # upscale
                                   (112, 112, 256, 256),
                                   (240, 180, 96, 128)])    # downscale
def test_resize_matches_jax_image(rng, method, shape):
    h, w, oh, ow = shape
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    ref = np.asarray(jax.image.resize(
        jnp.asarray(x), (2, oh, ow, 3), method=method))
    out = np.asarray(resize_separable(jnp.asarray(x), oh, ow, method))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_weight_rows_sum_to_one():
    w = resize_weight_matrix(112, 224)
    np.testing.assert_allclose(w.sum(0), 1.0, atol=1e-6)


def test_fused_preprocess_matches_naive(rng):
    frames = (rng.random((3, 112, 112, 3)) * 255).astype(np.uint8)
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)

    x = jnp.asarray(frames).astype(jnp.float32)[..., ::-1] / 255.0
    x = jax.image.resize(x, (3, 224, 224, 3), method="bicubic")
    ref = np.asarray((x - jnp.asarray(mean)) / jnp.asarray(std))

    out = np.asarray(fused_face_preprocess(jnp.asarray(frames), 224,
                                           mean, std))
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_fused_preprocess_resize_short_crop(rng):
    """Resize(256) + CenterCrop(224) path (FER transform stacks)."""
    frames = (rng.random((2, 112, 112, 3)) * 255).astype(np.uint8)
    mean, std = (131.1, 103.9, 91.5), (1.0, 1.0, 1.0)

    x = jnp.asarray(frames).astype(jnp.float32)[..., ::-1]  # scale=1.0
    x = jax.image.resize(x, (2, 256, 256, 3), method="bicubic")
    off = (256 - 224) // 2
    x = x[:, off: off + 224, off: off + 224]
    ref = np.asarray((x - jnp.asarray(mean)) / jnp.asarray(std))

    out = np.asarray(fused_face_preprocess(jnp.asarray(frames), 224,
                                           mean, std, scale=1.0,
                                           resize_short=256))
    np.testing.assert_allclose(out, ref, atol=2e-4)
