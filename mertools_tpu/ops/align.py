"""Temporal feature alignment / resampling ops.

Reference semantics (``MERBench/toolkit/utils/read_data.py:72-125``):

``func_mapping_feature(x: (T, D), dst) -> (dst, D)``:
  * T == dst: identity.
  * T < dst : **front**-pad with zeros to length dst. (Front because the
    downstream LSTM encoder uses only the final hidden state — reference
    ``toolkit/models/modules/encoder.py:67``.)
  * T > dst : front-pad with ``(dst - T % dst) % dst`` zeros so the padded
    length is ``dst * pool`` with ``pool = ceil(T / dst)``, then mean-pool
    consecutive groups of ``pool`` frames.

All three cases collapse into one linear map:

    pool = max(ceil(T / dst), 1); pad = dst * pool - T
    out[j] = mean_{t : (t + pad) // pool == j} x[t]

so the batched on-device version is a single einsum against a weight matrix
``W[b, j, t]`` built from ``broadcasted_iota`` — an MXU matmul instead of the
reference's per-sample Python loop (its HOT LOOP #1, SURVEY.md §3.1).

Higher-level ops mirror ``read_data.py:92-125``:
  * :func:`align_to_utt`         — temporal mean per modality.
  * :func:`feature_scale_compress` — compress each sample's length by ``scale``.
  * :func:`align_to_text`        — resample audio/video to the text length.
  * :func:`pad_to_maxlen`        — batch-level pad (front) to the batch max.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host (numpy) reference implementation — used at dataset-prep time and as the
# golden oracle in tests.
# ---------------------------------------------------------------------------
def map_feature_np(x: np.ndarray, dst_len: int) -> np.ndarray:
    """Resample one (T, D) feature to (dst_len, D) with reference semantics."""
    t, d = x.shape
    if t == dst_len:
        return x
    if t < dst_len:
        pad = np.zeros((dst_len - t, d), dtype=x.dtype)
        return np.concatenate([pad, x], axis=0)
    pool = t // dst_len if t % dst_len == 0 else t // dst_len + 1
    pad_len = dst_len * pool - t
    pad = np.zeros((pad_len, d), dtype=x.dtype)
    stacked = np.concatenate([pad, x], axis=0).reshape(dst_len, pool, d)
    return stacked.mean(axis=1)


def align_to_utt_np(feats: list[np.ndarray]) -> np.ndarray:
    """Mean over time per sample -> (N, D). (read_data.py:92-97)"""
    return np.stack([f.mean(axis=0) for f in feats], axis=0)


def feature_scale_compress_np(feats: list[np.ndarray], scale: int) -> list[np.ndarray]:
    """Compress each sample to ceil(T/scale) frames. (read_data.py:100-105)"""
    if scale == 1:
        return feats
    return [map_feature_np(f, math.ceil(len(f) / scale)) for f in feats]


def align_to_text_np(audios, texts, videos):
    """Resample audio/video (and text, a no-op) to the text length per sample.
    (read_data.py:108-114)"""
    out_a, out_t, out_v = [], [], []
    for a, t, v in zip(audios, texts, videos):
        dst = len(t)
        out_a.append(map_feature_np(a, dst))
        out_t.append(map_feature_np(t, dst))
        out_v.append(map_feature_np(v, dst))
    return out_a, out_t, out_v


def pad_to_maxlen_np(feats: list[np.ndarray], max_len: int | None = None):
    """Front-pad every sample to the max length; returns (N, L, D) + lengths.
    (read_data.py:117-125 — reference pads with map_feature to batch max)"""
    lengths = np.array([len(f) for f in feats], dtype=np.int32)
    max_len = int(max_len if max_len is not None else lengths.max())
    out = np.stack([map_feature_np(f, max_len) for f in feats], axis=0)
    return out, lengths


# ---------------------------------------------------------------------------
# Device (jnp) batched implementation.
# ---------------------------------------------------------------------------
def _mapping_weights(lengths: jnp.ndarray, src_len: int, dst_len: int) -> jnp.ndarray:
    """Build W: (B, dst_len, src_len) such that out = W @ x_padded.

    ``x_padded`` is (B, src_len, D) with each sample's valid frames occupying
    ``x_padded[b, :lengths[b]]`` (i.e. *end*-padded buffers, the natural layout
    from a batched loader). W encodes the reference's front-pad + mean-pool.
    """
    lengths = lengths.astype(jnp.int32)  # (B,)
    pool = jnp.maximum((lengths + dst_len - 1) // dst_len, 1)  # (B,)
    pad = dst_len * pool - lengths  # (B,)

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, src_len), 2)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, dst_len, 1), 1)
    pool_b = pool[:, None, None]
    pad_b = pad[:, None, None]
    len_b = lengths[:, None, None]

    group = (t_idx + pad_b) // pool_b  # (B, 1, src) group index of frame t
    valid = t_idx < len_b
    w = jnp.where((group == j_idx) & valid, 1.0, 0.0)  # (B, dst, src)
    return w / pool_b.astype(w.dtype)


def map_feature_batched(x: jnp.ndarray, lengths: jnp.ndarray, dst_len: int) -> jnp.ndarray:
    """Batched reference-semantics resample: (B, T, D) + lengths -> (B, dst, D).

    One einsum on the MXU; replaces the per-sample Python resampling loop
    (reference read_data.py:72-89).
    """
    w = _mapping_weights(lengths, x.shape[1], dst_len)
    # HIGHEST precision: this op feeds the <1e-3 feature-parity contract
    # (BASELINE.md) and the default TPU matmul truncates inputs to bf16.
    return jnp.einsum("bjt,btd->bjd", w, x.astype(w.dtype),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(x.dtype)


def masked_mean_over_time(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) + lengths -> (B, D); mean over the valid (end-padded) frames.

    Device equivalent of ``align_to_utt`` (read_data.py:92-97).
    """
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], x.shape[1]), 1)
    mask = (t_idx < lengths[:, None]).astype(x.dtype)
    total = jnp.einsum("btd,bt->bd", x, mask, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    return (total / jnp.maximum(lengths[:, None], 1).astype(total.dtype)).astype(x.dtype)


def scale_compress_batched(x: jnp.ndarray, lengths: jnp.ndarray, scale: int,
                           dst_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched feature_scale_compress: per-sample target ceil(len/scale),
    materialized into a common end-padded buffer of width ``dst_len``.

    Returns (y, new_lengths) where y[b, :new_lengths[b]] holds the compressed
    frames (end-padded buffer layout, unlike the host version which returns
    exact-length arrays).
    """
    lengths = lengths.astype(jnp.int32)
    new_len = (lengths + scale - 1) // scale  # ceil
    # Build per-sample weights targeting each sample's own new_len, but
    # placed at the *front* of a dst_len buffer with zero rows after.
    src_len = x.shape[1]
    pool = jnp.maximum((lengths + new_len - 1) // jnp.maximum(new_len, 1), 1)
    pad = new_len * pool - lengths

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, src_len), 2)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, dst_len, 1), 1)
    group = (t_idx + pad[:, None, None]) // pool[:, None, None]
    valid_t = t_idx < lengths[:, None, None]
    valid_j = j_idx < new_len[:, None, None]
    w = jnp.where((group == j_idx) & valid_t & valid_j, 1.0, 0.0)
    w = w / pool[:, None, None].astype(w.dtype)
    y = jnp.einsum("bjt,btd->bjd", w, x.astype(w.dtype),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(x.dtype)
    return y, new_len
