"""Face alignment / cropping ops (OpenFace-equivalent geometry, on device).

The reference drives the OpenFace C++ binaries to detect, align, and crop
faces into ``(T, 112, 112, 3)`` arrays
(``MERBench/feature_extraction/visual/extract_openface.py:14-97``). The
TPU-native split: detection/landmarks come from any upstream detector (or
the reference-produced ``openface_face`` stores — the toolkits themselves
consume precomputed faces), while the geometric stage — similarity-align to
a canonical template and crop/resize/normalize — runs batched under jit:

- :func:`umeyama` — least-squares similarity transform (the standard
  5-landmark alignment used by ArcFace-style pipelines).
- :func:`warp_affine` — batched inverse-warp bilinear sampler.
- :func:`align_faces` — landmarks -> aligned 112x112 crops, one fused
  computation for all frames of many clips.
- :func:`crop_resize` — bbox crop + resize for detector-box pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ArcFace 112x112 5-point template (left eye, right eye, nose, mouth L/R)
ARCFACE_TEMPLATE = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], np.float32)


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform src -> dst.

    src/dst: (..., K, 2) point sets. Returns (..., 2, 3) affine matrices
    A with [x', y']^T = A @ [x, y, 1]^T (Umeyama 1991, rotation+scale+t).
    """
    mu_s = src.mean(axis=-2, keepdims=True)
    mu_d = dst.mean(axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    var_s = (sc ** 2).sum(axis=(-1, -2))
    cov = jnp.einsum("...ki,...kj->...ij", dc, sc) / src.shape[-2]

    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d = jnp.ones(U.shape[:-1]).at[..., -1].set(jnp.sign(det))
    R = jnp.einsum("...ij,...j,...jk->...ik", U, d, Vt)
    scale = (S * d).sum(-1) / (var_s / src.shape[-2] + 1e-12)
    sR = scale[..., None, None] * R
    t = jnp.swapaxes(mu_d, -1, -2) - sR @ jnp.swapaxes(mu_s, -1, -2)
    return jnp.concatenate([sR, t], axis=-1)        # (..., 2, 3)


def _invert_affine(A: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 3) forward affine -> inverse (for pull-warping)."""
    M = A[..., :2]
    t = A[..., 2]
    Minv = jnp.linalg.inv(M)
    tinv = -jnp.einsum("...ij,...j->...i", Minv, t)
    return jnp.concatenate([Minv, tinv[..., None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_affine(images: jnp.ndarray, affines: jnp.ndarray,
                out_h: int = 112, out_w: int = 112) -> jnp.ndarray:
    """Batched inverse-warp with bilinear sampling.

    images: (B, H, W, C) float; affines: (B, 2, 3) FORWARD transforms
    (src px -> dst px). Output (B, out_h, out_w, C).
    """
    inv = _invert_affine(affines)                    # dst -> src
    ys, xs = jnp.meshgrid(jnp.arange(out_h, dtype=jnp.float32),
                          jnp.arange(out_w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], -1).reshape(-1, 2)    # (P, 2) in (x, y)

    def one(img, a):
        src = grid @ a[:, :2].T + a[:, 2]            # (P, 2) x,y
        coords = jnp.stack([src[:, 1], src[:, 0]], 0)  # (2, P) row, col

        def channel(c):
            return jax.scipy.ndimage.map_coordinates(
                img[..., c], coords, order=1, mode="constant", cval=0.0)

        out = jnp.stack([channel(c) for c in range(img.shape[-1])], -1)
        return out.reshape(out_h, out_w, img.shape[-1])

    return jax.vmap(one)(images.astype(jnp.float32), inv)


def umeyama_np(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Host (NumPy) twin of :func:`umeyama` — identical math,
    parity-tested. Exists because the host-warp video path would
    otherwise pay a device dispatch (a full tunnel RTT on this platform,
    measured ~285 ms/clip — more than the whole detect/track stage) for a
    (T, 2, 2) solve."""
    src = np.asarray(src, np.float32)
    dst = np.asarray(dst, np.float32)
    mu_s = src.mean(axis=-2, keepdims=True)
    mu_d = dst.mean(axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    var_s = (sc ** 2).sum(axis=(-1, -2))
    cov = np.einsum("...ki,...kj->...ij", dc, sc) / src.shape[-2]
    U, S, Vt = np.linalg.svd(cov)
    det = np.linalg.det(U) * np.linalg.det(Vt)
    d = np.ones(U.shape[:-1], np.float32)
    d[..., -1] = np.sign(det)
    R = np.einsum("...ij,...j,...jk->...ik", U, d, Vt)
    scale = (S * d).sum(-1) / (var_s / src.shape[-2] + 1e-12)
    sR = scale[..., None, None] * R
    t = np.swapaxes(mu_d, -1, -2) - sR @ np.swapaxes(mu_s, -1, -2)
    return np.concatenate([sR, t], axis=-1).astype(np.float32)


def warp_affine_np(images: np.ndarray, affines: np.ndarray,
                   out_h: int = 112, out_w: int = 112) -> np.ndarray:
    """Host (NumPy) twin of :func:`warp_affine` — identical bilinear
    inverse-warp semantics (order-1, zero outside), parity-tested.

    Exists for the video face pipeline on weak/remote-accelerator hosts:
    warping T full frames on device costs a (T, H, W, 3) host->device
    upload (~5 MB/clip over this platform's tunnel) only to download the
    (T, 112, 112, 3) crops again for the encoder; the host warp touches
    ~4x less link traffic and runs in ~tens of ms."""
    images = np.asarray(images, np.float32)
    affines = np.asarray(affines, np.float32)
    B, H, W, C = images.shape
    M = affines[:, :, :2]
    t = affines[:, :, 2]
    Minv = np.linalg.inv(M)
    tinv = -np.einsum("bij,bj->bi", Minv, t)
    ys, xs = np.meshgrid(np.arange(out_h, dtype=np.float32),
                         np.arange(out_w, dtype=np.float32), indexing="ij")
    grid = np.stack([xs, ys], -1).reshape(-1, 2)       # (P, 2) x,y
    # per-frame loop beats batched fancy indexing here (measured 81 vs
    # 154 ms for 32x240x208: the per-frame working set stays in cache)
    out = np.empty((B, out_h, out_w, C), np.float32)
    for b in range(B):
        src = grid @ Minv[b].T + tinv[b]
        sx, sy = src[:, 0], src[:, 1]
        x0f, y0f = np.floor(sx), np.floor(sy)
        fx, fy = sx - x0f, sy - y0f
        x0, y0 = x0f.astype(np.int64), y0f.astype(np.int64)

        def tap(yi, xi):
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            v = images[b, np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)]
            return v * valid[:, None]

        v = (tap(y0, x0) * ((1 - fy) * (1 - fx))[:, None]
             + tap(y0, x0 + 1) * ((1 - fy) * fx)[:, None]
             + tap(y0 + 1, x0) * (fy * (1 - fx))[:, None]
             + tap(y0 + 1, x0 + 1) * (fy * fx)[:, None])
        out[b] = v.reshape(out_h, out_w, C)
    return out


@functools.partial(jax.jit, static_argnames=("out_size",))
def align_faces(frames: jnp.ndarray, landmarks: jnp.ndarray,
                out_size: int = 112) -> jnp.ndarray:
    """frames (B, H, W, 3) + 5-point landmarks (B, 5, 2) in pixel (x, y)
    -> (B, out_size, out_size, 3) template-aligned crops."""
    tmpl = jnp.asarray(ARCFACE_TEMPLATE) * (out_size / 112.0)
    A = umeyama(landmarks.astype(jnp.float32),
                jnp.broadcast_to(tmpl, landmarks.shape))
    return warp_affine(frames, A, out_size, out_size)


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_resize(frames: jnp.ndarray, boxes: jnp.ndarray,
                out_size: int = 112) -> jnp.ndarray:
    """frames (B, H, W, 3) + boxes (B, 4) [x0, y0, x1, y1] px ->
    (B, out_size, out_size, 3) crops (detector-bbox pipelines)."""
    x0, y0, x1, y1 = [boxes[:, i] for i in range(4)]
    sx = (x1 - x0) / out_size
    sy = (y1 - y0) / out_size
    zeros = jnp.zeros_like(sx)
    inv = jnp.stack([jnp.stack([sx, zeros, x0], -1),
                     jnp.stack([zeros, sy, y0], -1)], 1)  # dst -> src direct
    # forward affine = inverse of inv
    A = _invert_affine(inv)
    return warp_affine(frames, A, out_size, out_size)
