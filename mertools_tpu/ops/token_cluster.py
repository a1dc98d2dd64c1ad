"""DPC-KNN token clustering + weighted merging (Chat-UniVi's CTM).

Re-implements, TPU-first, the density-peaks-clustering-with-kNN token
merge that Chat-UniVi uses to compress visual tokens (reference:
``MER2025/MER2025_Track23/Chat-UniVi/ChatUniVi/model/cluster.py`` —
``cluster_dpc_knn`` :111-171, ``merge_tokens`` :174-223, ``CTM`` :226-256;
note the reference's ``TCBlock.forward`` :280-287 is an identity on the
merged tokens, so the whole ``block(ctm(x))`` composite reduces to the
cluster+merge below).

Algorithm (per batch row):
  1. pairwise Euclidean distances / sqrt(C);
  2. local density rho_i = exp(-mean of the k smallest d^2 in row i)
     (the k nearest INCLUDING self);
  3. separation delta_i = min distance to any higher-density token
     (max distance in the row's real submatrix if i is the densest);
  4. centers = top ``n_clusters`` tokens by rho*delta;
  5. every token joins its nearest center (centers join themselves);
  6. cluster feature = weight-normalized mean of member tokens.

Deviations from the reference (documented, PARITY.md §2.7):
  * the reference adds ``rand()*1e-6`` density noise purely to break exact
    ties (cluster.py:143-145); we omit it so results are deterministic —
    identical whenever no two tokens have exactly equal density;
  * the reference's ``token_mask`` branch is buggy-unused (its -inf token
    weights would poison ``merge_tokens``); our ``mask`` is defined so a
    padded call equals the reference's unpadded call on the real subset
    (pad-invariance is tested), which is what static TPU shapes need.

Everything is static-shape and jit/vmap-friendly: top_k for neighbor and
center selection, one-hot matmul (MXU) for the merge.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BIG = 1e9


def ctm_cluster_num(n_tokens: int, sample_ratio: float) -> int:
    """Reference CTM rule (cluster.py:244-249): a ratio > 1 is an absolute
    cluster count; a ratio <= 1 is a fraction of the (real) token count."""
    if sample_ratio > 1:
        return max(math.ceil(sample_ratio), 1)
    return max(math.ceil(n_tokens * sample_ratio), 1)


def ctm_k(n_clusters: int, k: int) -> int:
    """Reference neighbor-count adjustment (cluster.py:251)."""
    return min(3, max(n_clusters // 2, 1)) if k > n_clusters else k


def _pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, N, N) Euclidean distance / sqrt(C) (torch.cdist
    semantics at fp32). The diagonal is exactly zero — the mm-trick's
    ~1e-7 diagonal noise would otherwise break the exact density ties the
    k=1 regime depends on (see :func:`dpc_knn_assign`)."""
    x = x.astype(jnp.float32)
    sq = jnp.sum(x * x, axis=-1)
    g = jnp.einsum("bnc,bmc->bnm", x, x,
                   precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * g, 0.0)
    d2 = d2 * (1.0 - jnp.eye(x.shape[1], dtype=d2.dtype))
    return jnp.sqrt(d2) / math.sqrt(x.shape[-1])


def dpc_knn_assign(x: jnp.ndarray, n_clusters: int, k: int,
                   mask: jnp.ndarray | None = None,
                   tiebreak: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cluster tokens and return each token's cluster index.

    Args:
      x: (B, N, C) tokens.
      n_clusters: static number of clusters (must be <= real token count).
      k: neighbors for the density estimate (use :func:`ctm_k`).
      mask: optional (B, N) {0,1}; zero rows are padding and are excluded
        from densities, separations, and center selection.
      tiebreak: optional (B, N) density perturbation, added as
        ``density + tiebreak * 1e-6`` — the reference's ``rand()*1e-6``
        tie-break noise (cluster.py:143-145). Matters in the k=1 regime
        (n_clusters <= 3) where every density is exactly 1 and center
        choice is otherwise decided by ties alone; default None keeps the
        deterministic lowest-index tie-break.

    Returns:
      (B, N) int32 cluster index in [0, n_clusters). Padded tokens get an
      arbitrary index — give them zero weight in :func:`merge_by_cluster`.
    """
    B, N, _ = x.shape
    dist = _pairwise_dist(x)
    if mask is not None:
        m = mask.astype(bool)
        pad_pair = ~(m[:, :, None] & m[:, None, :])
        dist = jnp.where(pad_pair, _BIG, dist)

    # local density: k nearest (including self); padded rows decay to 0
    neg_nearest, _ = jax.lax.top_k(-dist, k)
    density = jnp.exp(-jnp.mean(jnp.square(neg_nearest), axis=-1))
    if tiebreak is not None:
        density = density + tiebreak * 1e-6
    if mask is not None:
        density = density * mask

    # separation: distance to the nearest higher-density token
    higher = density[:, None, :] > density[:, :, None]
    if mask is not None:
        real_max = jnp.max(jnp.where(pad_pair, 0.0, dist),
                           axis=(1, 2))[:, None, None]
        cand = jnp.where(higher & m[:, None, :], dist, real_max)
    else:
        real_max = jnp.max(dist.reshape(B, -1), axis=-1)[:, None, None]
        cand = jnp.where(higher, dist, real_max)
    delta = jnp.min(cand, axis=-1)

    score = delta * density
    if mask is not None:
        score = jnp.where(m, score, -1.0)  # pads rank below any real token
    _, centers = jax.lax.top_k(score, n_clusters)  # (B, n_clusters)

    d_to_centers = jnp.take_along_axis(dist, centers[:, :, None], axis=1)
    assign = jnp.argmin(d_to_centers, axis=1).astype(jnp.int32)
    # centers always merge to themselves (cluster.py:166-169)
    assign = assign.at[jnp.arange(B)[:, None], centers].set(
        jnp.arange(n_clusters, dtype=jnp.int32)[None, :])
    return assign


def merge_by_cluster(x: jnp.ndarray, assign: jnp.ndarray, n_clusters: int,
                     weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """(B, N, C) tokens -> (B, n_clusters, C) weighted cluster means
    (merge_tokens semantics: per-cluster weight sum + 1e-6 in the
    denominator)."""
    B, N, _ = x.shape
    if weight is None:
        weight = jnp.ones((B, N), x.dtype)
    onehot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)  # (B, N, K)
    w = onehot * weight[:, :, None]
    total = jnp.sum(w, axis=1) + 1e-6  # (B, K)
    merged = jnp.einsum("bnk,bnc->bkc", w, x,
                        precision=jax.lax.Precision.HIGHEST)
    return merged / total[:, :, None]


def ctm_merge(x: jnp.ndarray, sample_ratio: float, k: int,
              mask: jnp.ndarray | None = None,
              n_valid: int | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One CTM stage: cluster + merge. ``n_valid`` is the REAL token count
    used for the cluster-count rule when ``x`` is padded (defaults to N).

    Returns (merged (B, K, C), assign (B, N)).
    """
    n = n_valid if n_valid is not None else x.shape[1]
    n_clusters = ctm_cluster_num(n, sample_ratio)
    kk = ctm_k(n_clusters, k)
    assign = dpc_knn_assign(x, n_clusters, kk, mask=mask)
    weight = None if mask is None else mask.astype(x.dtype)
    return merge_by_cluster(x, assign, n_clusters, weight=weight), assign
