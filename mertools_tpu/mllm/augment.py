"""Train-time video augmentation for raw-media MLLM training.

Reference: ``my_affectgpt/processors/video_processor.py:29-68``
(AlproVideoTrainProcessor = RandomResizedCropVideo(image_size,
scale=(0.5, 1.0)) + RandomHorizontalFlipVideo + ToTHWC + ToUint8) applied
per sample by the train datasets (``mercaptionplus_dataset.py:25-105``)
before the frozen encoders.

TPU design: crop-box/flip sampling is host-side numpy (torchvision
``RandomResizedCrop.get_params`` semantics, 10 attempts + center
fallback); the crop+resize+flip executes ON DEVICE as one jitted
vmapped bilinear gather over the whole (B, T, H, W, C) batch — dynamic
crop rectangles become per-sample affine sample grids at a static output
size, so one compile serves every step.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sample_crop_params(rng: np.random.Generator, n: int, height: int,
                       width: int, scale=(0.5, 1.0),
                       ratio=(3.0 / 4.0, 4.0 / 3.0)) -> np.ndarray:
    """(n, 4) int [top, left, h, w] — torchvision RandomResizedCrop
    .get_params (transforms.py): 10 area/aspect attempts, then the
    aspect-clamped center-crop fallback."""
    out = np.zeros((n, 4), np.int32)
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for b in range(n):
        for _ in range(10):
            target_area = area * rng.uniform(scale[0], scale[1])
            aspect = math.exp(rng.uniform(*log_ratio))
            w = int(round(math.sqrt(target_area * aspect)))
            h = int(round(math.sqrt(target_area / aspect)))
            if 0 < w <= width and 0 < h <= height:
                i = int(rng.integers(0, height - h + 1))
                j = int(rng.integers(0, width - w + 1))
                out[b] = (i, j, h, w)
                break
        else:  # center-crop fallback
            in_ratio = width / height
            if in_ratio < ratio[0]:
                w, h = width, int(round(width / ratio[0]))
            elif in_ratio > ratio[1]:
                h, w = height, int(round(height * ratio[1]))
            else:
                w, h = width, height
            out[b] = ((height - h) // 2, (width - w) // 2, h, w)
    return out


def _crop_resize_one(img: jnp.ndarray, box: jnp.ndarray, flip: jnp.ndarray,
                     out_h: int, out_w: int) -> jnp.ndarray:
    """img (T, H, W, C) float; box (4,) [top, left, h, w]; bilinear sample
    grid matching torch resize (align_corners=False)."""
    T, H, W, C = img.shape
    top, left, h, w = [box[k].astype(jnp.float32) for k in range(4)]
    ys = top + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * h / out_h - 0.5
    xs = left + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * w / out_w - 0.5
    xs = jnp.where(flip, left + left + w - 1.0 - xs, xs)

    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)

    def rows(yi):
        return img[:, yi]          # (T, out_h, W, C)

    r0, r1 = rows(y0), rows(y1)

    def cols(r, xi):
        return r[:, :, xi]         # (T, out_h, out_w, C)

    p00, p01 = cols(r0, x0), cols(r0, x1)
    p10, p11 = cols(r1, x0), cols(r1, x1)
    wy_ = wy[None, :, None, None]
    wx_ = wx[None, None, :, None]
    top_mix = p00 * (1 - wx_) + p01 * wx_
    bot_mix = p10 * (1 - wx_) + p11 * wx_
    return top_mix * (1 - wy_) + bot_mix * wy_


def random_resized_crop_flip(frames: np.ndarray, boxes: np.ndarray,
                             flips: np.ndarray, out_size: int | None = None
                             ) -> np.ndarray:
    """(B, T, H, W, C) uint8 + (B, 4) crop boxes + (B,) flip flags ->
    augmented (B, T, S, S, C) uint8 (ToUint8 — the encoders re-normalize
    from uint8 exactly as they do for unaugmented stores)."""
    B, T, H, W, C = frames.shape
    S = out_size or H
    out = _crop_resize_batched(jnp.asarray(frames), jnp.asarray(boxes),
                               jnp.asarray(flips), S, S)
    return np.asarray(out)


@partial(jax.jit, static_argnums=(3, 4))
def _crop_resize_batched(frames, boxes, flips, out_h, out_w):
    f32 = frames.astype(jnp.float32)
    out = jax.vmap(_crop_resize_one, in_axes=(0, 0, 0, None, None))(
        f32, boxes, flips, out_h, out_w)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def augment_faces(faces: dict, rng: np.random.Generator,
                  out_size: int | None = None) -> dict:
    """{name: (T, H, W, C) uint8} -> augmented dict (same T; one crop box +
    flip decision per CLIP, like the reference's per-video transform).
    Clips are grouped by (T, H, W) so each distinct shape costs one jit
    compile and the whole group runs as a single device batch."""
    names = list(faces)
    by_shape: dict = {}
    for n in names:
        by_shape.setdefault(faces[n].shape, []).append(n)
    out: dict = {}
    for shape, group in by_shape.items():
        T, H, W, C = shape
        boxes = sample_crop_params(rng, len(group), H, W)
        flips = (rng.random(len(group)) < 0.5)
        batch = np.stack([faces[n] for n in group])
        aug = random_resized_crop_flip(batch, boxes, flips,
                                       out_size or H)
        for i, n in enumerate(group):
            out[n] = aug[i]
    return out
