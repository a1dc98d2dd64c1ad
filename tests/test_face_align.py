"""Face alignment geometry: Umeyama recovery, warp correctness, template
alignment."""

import numpy as np
import pytest

import jax.numpy as jnp

from mertools_tpu.ops import face_align as F


def _apply(A, pts):
    return pts @ np.asarray(A)[:, :2].T + np.asarray(A)[:, 2]


def test_umeyama_recovers_similarity(rng):
    ang = 0.3
    scale = 1.7
    t = np.array([5.0, -3.0])
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    src = rng.normal(size=(5, 2)).astype(np.float32) * 10
    dst = scale * src @ R.T + t
    A = np.asarray(F.umeyama(jnp.asarray(src[None]), jnp.asarray(dst[None])))[0]
    np.testing.assert_allclose(_apply(A, src), dst, atol=1e-3)


def test_warp_identity(rng):
    img = rng.normal(size=(1, 20, 24, 3)).astype(np.float32)
    eye = np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], np.float32)
    out = np.asarray(F.warp_affine(jnp.asarray(img), jnp.asarray(eye),
                                   out_h=20, out_w=24))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_warp_translation(rng):
    img = np.zeros((1, 16, 16, 1), np.float32)
    img[0, 4, 6, 0] = 1.0
    # forward: shift +2 in x, +3 in y -> pixel lands at (8, 7)... (y=7, x=8)
    A = np.array([[[1.0, 0.0, 2.0], [0.0, 1.0, 3.0]]], np.float32)
    out = np.asarray(F.warp_affine(jnp.asarray(img), jnp.asarray(A),
                                   out_h=16, out_w=16))
    assert out[0, 7, 8, 0] == pytest.approx(1.0, abs=1e-4)


def test_align_faces_moves_landmarks_to_template(rng):
    B, H, W = 2, 120, 140
    frames = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    # synthetic landmarks: template scaled 1.5x and shifted
    lm = F.ARCFACE_TEMPLATE * 1.5 + np.array([10.0, 6.0])
    lms = np.stack([lm, lm * 1.1])
    out = np.asarray(F.align_faces(jnp.asarray(frames), jnp.asarray(lms)))
    assert out.shape == (B, 112, 112, 3)
    # verify the recovered transform maps landmarks onto the template
    A = np.asarray(F.umeyama(jnp.asarray(lms.astype(np.float32)),
                             jnp.broadcast_to(F.ARCFACE_TEMPLATE, lms.shape)))
    np.testing.assert_allclose(_apply(A[0], lms[0]), F.ARCFACE_TEMPLATE,
                               atol=1e-2)


def test_crop_resize_box(rng):
    img = np.zeros((1, 32, 32, 1), np.float32)
    img[0, 8:16, 8:16, 0] = 1.0
    boxes = np.array([[8.0, 8.0, 16.0, 16.0]], np.float32)
    out = np.asarray(F.crop_resize(jnp.asarray(img), jnp.asarray(boxes),
                                   out_size=8))
    assert out[0, 2:6, 2:6, 0].mean() > 0.95  # interior of the box is ones


def test_warp_affine_np_matches_device():
    """Host NumPy warp == jitted jax warp (round 4: the video pipeline
    warps on host to avoid the full-frame device upload)."""
    import numpy as np

    from mertools_tpu.ops.face_align import warp_affine, warp_affine_np

    rng = np.random.default_rng(0)
    imgs = rng.random((3, 40, 50, 3)).astype(np.float32) * 255
    affines = np.asarray(
        [[[0.9, 0.1, 3.0], [-0.1, 0.9, 5.0]],
         [[1.2, 0.0, -4.0], [0.0, 1.2, 2.0]],
         [[0.7, -0.2, 10.0], [0.2, 0.7, -3.0]]], np.float32)
    ref = np.asarray(warp_affine(imgs, affines, 24, 28))
    got = warp_affine_np(imgs, affines, 24, 28)
    assert got.shape == ref.shape == (3, 24, 28, 3)
    assert np.abs(got - ref).max() < 1e-2, np.abs(got - ref).max()


def test_umeyama_np_matches_device():
    import numpy as np

    from mertools_tpu.ops.face_align import umeyama, umeyama_np

    rng = np.random.default_rng(1)
    src = rng.normal(size=(5, 2, 2)).astype(np.float32) * 30 + 50
    dst = rng.normal(size=(5, 2, 2)).astype(np.float32) * 30 + 50
    ref = np.asarray(umeyama(src, dst))
    got = umeyama_np(src, dst)
    assert np.abs(got - ref).max() < 1e-3, np.abs(got - ref).max()
