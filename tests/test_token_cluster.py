"""DPC-KNN token clustering vs a torch oracle (Chat-UniVi CTM math).

Oracle re-derives ``cluster_dpc_knn``/``merge_tokens``
(Chat-UniVi/ChatUniVi/model/cluster.py:111-223) with torch primitives
(cdist / topk / index_add) — an independent numeric path from our JAX
one-hot-matmul implementation. Density noise (cluster.py:143-145) is
omitted on both sides (deterministic; random features never tie exactly).
"""

import numpy as np
import pytest
import torch

jnp = pytest.importorskip("jax.numpy")

from mertools_tpu.ops import token_cluster as tc  # noqa: E402


def oracle_dpc_knn(x: torch.Tensor, cluster_num: int, k: int,
                   tiebreak: torch.Tensor | None = None):
    """Reference math (cluster.py:111-171); ``tiebreak`` plays the role of
    the reference's rand() density noise with a chosen vector."""
    B, N, C = x.shape
    dist = torch.cdist(x.float(), x.float()) / (C ** 0.5)
    d_near, _ = torch.topk(dist, k=k, dim=-1, largest=False)
    density = (-(d_near ** 2).mean(dim=-1)).exp()
    if tiebreak is not None:
        density = density + tiebreak * 1e-6
    higher = density[:, None, :] > density[:, :, None]
    higher = higher.type(x.dtype)
    d_max = dist.flatten(1).max(dim=-1)[0][:, None, None]
    delta, _ = (dist * higher + d_max * (1 - higher)).min(dim=-1)
    score = delta * density
    _, centers = torch.topk(score, k=cluster_num, dim=-1)
    b_idx = torch.arange(B)[:, None].expand(B, cluster_num)
    d_cent = dist[b_idx.reshape(-1), centers.reshape(-1), :].reshape(
        B, cluster_num, N)
    assign = d_cent.argmin(dim=1)
    assign[b_idx.reshape(-1), centers.reshape(-1)] = torch.arange(
        cluster_num).repeat(B)
    return assign


def oracle_merge(x: torch.Tensor, assign: torch.Tensor, cluster_num: int):
    """merge_tokens (cluster.py:174-210): count-normalized cluster mean."""
    B, N, C = x.shape
    w = x.new_ones(B, N, 1)
    idx = assign + torch.arange(B)[:, None] * cluster_num
    all_w = w.new_zeros(B * cluster_num, 1)
    all_w.index_add_(0, idx.reshape(-1), w.reshape(-1, 1))
    all_w = all_w + 1e-6
    norm_w = w / all_w[idx]
    merged = x.new_zeros(B * cluster_num, C)
    merged.index_add_(0, idx.reshape(-1), (x * norm_w).reshape(-1, C))
    return merged.reshape(B, cluster_num, C)


@pytest.mark.parametrize("B,N,K,k", [(2, 64, 16, 5), (3, 256, 64, 5),
                                     (1, 32, 32, 3), (2, 48, 3, 5)])
def test_assign_and_merge_match_oracle(B, N, K, k):
    rng = np.random.default_rng(42 + N + K)
    x = rng.normal(size=(B, N, 8)).astype(np.float32)
    ref_assign = oracle_dpc_knn(torch.tensor(x), K, k).numpy()
    got_assign = np.asarray(tc.dpc_knn_assign(jnp.asarray(x), K, k))
    assert (got_assign == ref_assign).all(), \
        (got_assign != ref_assign).sum()
    ref_m = oracle_merge(torch.tensor(x), torch.tensor(ref_assign), K).numpy()
    got_m = np.asarray(tc.merge_by_cluster(jnp.asarray(x),
                                           jnp.asarray(got_assign), K))
    assert np.abs(got_m - ref_m).max() < 1e-5


def test_ctm_rules_match_reference():
    # cluster.py:244-251
    assert tc.ctm_cluster_num(256, 64) == 64          # ratio > 1: absolute
    assert tc.ctm_cluster_num(100, 1 / 16) == 7       # ceil(100/16)
    assert tc.ctm_cluster_num(16, 1 / 16) == 1
    assert tc.ctm_k(64, 5) == 5                       # k <= cluster_num
    assert tc.ctm_k(3, 5) == 1                        # min(3, max(3//2,1))
    assert tc.ctm_k(2, 5) == 1
    assert tc.ctm_k(7, 5) == 5
    assert tc.ctm_k(4, 5) == 2


@pytest.mark.parametrize("n_real,n_pad", [(40, 24), (64, 0), (17, 47)])
def test_pad_invariance(n_real, n_pad):
    """A padded+masked call == the unpadded call on the real subset —
    the static-shape contract the Chat-UniVi event path relies on."""
    rng = np.random.default_rng(7 + n_real)
    K, k = 8, 5
    x_real = rng.normal(size=(2, n_real, 6)).astype(np.float32)
    exact, _ = tc.ctm_merge(jnp.asarray(x_real), float(K), k)
    x_pad = np.concatenate(
        [x_real, rng.normal(size=(2, n_pad, 6)).astype(np.float32)], axis=1)
    mask = np.concatenate([np.ones((2, n_real), np.float32),
                           np.zeros((2, n_pad), np.float32)], axis=1)
    padded, _ = tc.ctm_merge(jnp.asarray(x_pad), float(K), k,
                             mask=jnp.asarray(mask), n_valid=n_real)
    assert np.abs(np.asarray(padded) - np.asarray(exact)).max() < 1e-5


def test_tied_density_regime_with_shared_tiebreak():
    """k=1 makes every density exactly exp(0)=1 (the reference's cn<=3
    regime, where its rand noise alone picks the centers). With the same
    tiebreak vector fed to the reference mechanism on both sides, the
    assignment is deterministic and identical."""
    rng = np.random.default_rng(11)
    for T, K in [(20, 2), (40, 3)]:
        x = rng.normal(size=(1, T, 32)).astype(np.float32)
        tb = np.arange(T, 0, -1, dtype=np.float32)[None]
        ref = oracle_dpc_knn(torch.tensor(x), K, 1,
                             tiebreak=torch.tensor(tb)).numpy()
        got = np.asarray(tc.dpc_knn_assign(jnp.asarray(x), K, 1,
                                           tiebreak=jnp.asarray(tb)))
        assert (got == ref).all(), (got, ref)


def test_merge_weighted_zero_weight_tokens_excluded():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 6, 4)).astype(np.float32)
    assign = jnp.asarray(np.array([[0, 0, 1, 1, 0, 1]], np.int32))
    w = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]], np.float32))
    got = np.asarray(tc.merge_by_cluster(jnp.asarray(x), assign, 2, weight=w))
    np.testing.assert_allclose(got[0, 0], x[0, :2].mean(0), rtol=1e-5)
    np.testing.assert_allclose(got[0, 1], x[0, 2:4].mean(0), rtol=1e-5)
