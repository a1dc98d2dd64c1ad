"""TPU-native face detection: BlazeFace-style anchor detector + NMS.

Completes the OpenFace replacement stack (SURVEY §2.9): detection
(this module) -> 5-point alignment + crop (ops/face_align.py) -> the
(T, 112, 112, 3) stores every visual extractor consumes. The reference runs
the OpenFace C++ binaries per video (``extract_openface.py:81-97``); here
whole frame batches run through one jitted detector forward + decode, and
NMS is a fixed-iteration ``lax`` loop (static shapes, no host round-trips).

The architecture follows the BlazeFace recipe (depthwise-separable blocks,
two anchor scales on 16x16 and 8x8 grids, per-anchor box + 5 landmark
offsets) sized for 128x128 inputs. Weights train with :func:`detection_loss`
(anchor-matched focal/softmax classification + smooth-L1 regression);
public BlazeFace checkpoints can be converted into the same layout, and the
machinery (anchors/decode/NMS/align handoff) is checkpoint-independent.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_P = jax.lax.Precision.HIGHEST

INPUT_SIZE = 128
N_LANDMARKS = 5


def generate_anchors(input_size: int = INPUT_SIZE) -> np.ndarray:
    """(A, 4) anchors as (cx, cy, w, h) in [0,1]: 2 per cell on the 16x16
    grid + 6 per cell on the 8x8 grid (BlazeFace layout)."""
    anchors = []
    for grid, per_cell in ((input_size // 8, 2), (input_size // 16, 6)):
        step = 1.0 / grid
        for y in range(grid):
            for x in range(grid):
                for _ in range(per_cell):
                    anchors.append([(x + 0.5) * step, (y + 0.5) * step,
                                    1.0, 1.0])
    return np.asarray(anchors, np.float32)


class _Blaze(nn.Module):
    """Depthwise-separable block with residual (stride 2 downsamples)."""
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(x.shape[-1], (5, 5), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=x.shape[-1],
                    name="dw", precision=_P)(x)
        y = nn.Conv(self.ch, (1, 1), name="pw", precision=_P)(y)
        if self.stride == 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if x.shape[-1] != self.ch:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                            (0, self.ch - x.shape[-1])))
        return nn.relu(y + x)


class BlazeFace(nn.Module):
    """(B, 128, 128, 3) [0,1] RGB -> (scores (B, A), boxes (B, A, 4+2L)).

    Box regressions are (dcx, dcy, w, h) relative offsets plus L landmark
    (dx, dy) pairs, in anchor-scaled units.
    """
    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = nn.relu(nn.Conv(w, (5, 5), strides=(2, 2), padding="SAME",
                            name="stem", precision=_P)(x))      # 64
        for i in range(2):
            x = _Blaze(w, name=f"b0_{i}")(x)
        x = _Blaze(w * 2, stride=2, name="d1")(x)               # 32
        for i in range(2):
            x = _Blaze(w * 2, name=f"b1_{i}")(x)
        x = _Blaze(w * 3, stride=2, name="d2")(x)               # 16
        for i in range(2):
            x = _Blaze(w * 3, name=f"b2_{i}")(x)
        feat16 = x
        x = _Blaze(w * 3, stride=2, name="d3")(x)               # 8
        for i in range(2):
            x = _Blaze(w * 3, name=f"b3_{i}")(x)
        feat8 = x

        ndim = 4 + 2 * N_LANDMARKS
        outs = []
        for feat, per_cell, tag in ((feat16, 2, "s16"), (feat8, 6, "s8")):
            score = nn.Conv(per_cell, (1, 1), name=f"score_{tag}",
                            precision=_P)(feat)
            box = nn.Conv(per_cell * ndim, (1, 1), name=f"box_{tag}",
                          precision=_P)(feat)
            B = feat.shape[0]
            outs.append((score.reshape(B, -1),
                         box.reshape(B, -1, ndim)))
        scores = jnp.concatenate([o[0] for o in outs], axis=1)
        boxes = jnp.concatenate([o[1] for o in outs], axis=1)
        return scores, boxes


def decode_boxes(raw: jnp.ndarray, anchors: jnp.ndarray,
                 scale: float = 1.0) -> jnp.ndarray:
    """(.., A, 4+2L) raw regressions -> (.., A, 4) (x0, y0, x1, y1) boxes +
    landmarks appended as absolute (x, y) pairs."""
    cx = anchors[:, 0] + raw[..., 0] * scale * anchors[:, 2]
    cy = anchors[:, 1] + raw[..., 1] * scale * anchors[:, 3]
    w = jnp.exp(raw[..., 2] * scale) * anchors[:, 2] * 0.25
    h = jnp.exp(raw[..., 3] * scale) * anchors[:, 3] * 0.25
    box = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    lms = []
    for k in range(N_LANDMARKS):
        lx = anchors[:, 0] + raw[..., 4 + 2 * k] * scale * anchors[:, 2]
        ly = anchors[:, 1] + raw[..., 5 + 2 * k] * scale * anchors[:, 3]
        lms.extend([lx, ly])
    return jnp.concatenate([box, jnp.stack(lms, -1)], -1)


def iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) vs (..., 4) corner-format IoU."""
    x0 = jnp.maximum(a[..., 0], b[..., 0])
    y0 = jnp.maximum(a[..., 1], b[..., 1])
    x1 = jnp.minimum(a[..., 2], b[..., 2])
    y1 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


@functools.partial(jax.jit, static_argnames=("top_k",))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, top_k: int = 8,
        iou_thresh: float = 0.4):
    """Static-shape greedy NMS: (A, 4), (A,) -> (top_k, 4), (top_k,) with
    suppressed slots scored -inf. Fixed top_k iterations under jit."""
    def body(carry, _):
        boxes_c, scores_c = carry
        i = jnp.argmax(scores_c)
        best_box = boxes_c[i]
        best_score = scores_c[i]
        ious = iou(boxes_c, best_box[None])
        keep = (ious < iou_thresh)
        scores_c = jnp.where(keep, scores_c, -jnp.inf)
        return (boxes_c, scores_c), (best_box, best_score)

    (_, _), (out_boxes, out_scores) = jax.lax.scan(
        body, (boxes, scores), None, length=top_k)
    return out_boxes, out_scores


@dataclass
class FaceDetector:
    """Batched detect -> best-face boxes/landmarks per frame."""

    params: dict
    width: int = 32
    score_thresh: float = 0.5

    def __post_init__(self):
        model = BlazeFace(self.width)
        anchors = jnp.asarray(generate_anchors())

        @jax.jit
        def fwd(p, frames):
            scores, raw = model.apply({"params": p}, frames)
            dec = decode_boxes(raw, anchors)
            probs = jax.nn.sigmoid(scores)
            best = jnp.argmax(probs, axis=1)
            take = jax.vmap(lambda d, i: d[i])(dec, best)
            return take, jnp.max(probs, axis=1)

        self._fwd = fwd
        self._params = jax.device_put(self.params)

    def detect(self, frames: np.ndarray):
        """(B, 128, 128, 3) [0,1] -> (boxes+landmarks (B, 4+2L), probs (B,)).
        Boxes in [0,1] image coordinates; prob < score_thresh => no face."""
        out, probs = self._fwd(self._params, jnp.asarray(frames))
        return np.asarray(out), np.asarray(probs)


# ---------------------------------------------------------------------------
# training loss (anchor matching) — for fine-tuning / the synthetic proof
# ---------------------------------------------------------------------------


def detection_loss(scores, raw, anchors, gt_boxes, scale: float = 1.0,
                   pos_iou: float = 0.35):
    """Single-face loss: anchors matching the GT (IoU > pos_iou, plus the
    best anchor) are positive; BCE on scores + L1 on box regressions.

    gt_boxes: (B, 4) corner format in [0,1].
    """
    dec_anchor = jnp.stack([
        anchors[:, 0] - anchors[:, 2] * 0.125,
        anchors[:, 1] - anchors[:, 3] * 0.125,
        anchors[:, 0] + anchors[:, 2] * 0.125,
        anchors[:, 1] + anchors[:, 3] * 0.125], -1)   # anchor footprint
    ious = jax.vmap(lambda g: iou(dec_anchor, g[None]))(gt_boxes)  # (B, A)
    best = jnp.argmax(ious, axis=1)
    pos = ious > pos_iou
    pos = pos.at[jnp.arange(pos.shape[0]), best].set(True)

    labels = pos.astype(jnp.float32)
    cls = optax_sigmoid_bce(scores, labels).mean()

    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    gw = gt_boxes[:, 2] - gt_boxes[:, 0]
    gh = gt_boxes[:, 3] - gt_boxes[:, 1]
    t_cx = (gcx[:, None] - anchors[None, :, 0]) / (scale * anchors[None, :, 2])
    t_cy = (gcy[:, None] - anchors[None, :, 1]) / (scale * anchors[None, :, 3])
    t_w = jnp.log(jnp.maximum(gw[:, None] / (anchors[None, :, 2] * 0.25),
                              1e-4)) / scale
    t_h = jnp.log(jnp.maximum(gh[:, None] / (anchors[None, :, 3] * 0.25),
                              1e-4)) / scale
    targets = jnp.stack([t_cx, t_cy, t_w, t_h], -1)
    reg = jnp.abs(raw[..., :4] - targets).sum(-1)
    reg = (reg * pos).sum() / jnp.maximum(pos.sum(), 1.0)
    return cls + reg


def optax_sigmoid_bce(logits, labels):
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    return -(labels * logp + (1.0 - labels) * lognp)
