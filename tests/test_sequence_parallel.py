"""Ring attention over the 'seq' mesh axis (parallel/sp.py) vs dense
attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.parallel.sp import make_seq_mesh, sequence_sharded_attention


def _dense(q, k, v, causal=True):
    D = q.shape[-1]
    logits = np.einsum("bqnd,bknd->bnqk", q, k) / np.sqrt(D)
    if causal:
        S = q.shape[1]
        mask = np.arange(S)[:, None] >= np.arange(S)[None, :]
        logits = np.where(mask[None, None], logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.einsum("bnqk,bknd->bnqd", w, v)
    return out.transpose(0, 2, 1, 3)


@pytest.mark.parametrize("n_seq,causal", [(2, True), (4, True), (4, False)])
def test_ring_attention_matches_dense(rng, n_seq, causal):
    B, S, N, D = 2, 16, 2, 8
    q = rng.normal(size=(B, S, N, D)).astype(np.float32)
    k = rng.normal(size=(B, S, N, D)).astype(np.float32)
    v = rng.normal(size=(B, S, N, D)).astype(np.float32)
    mesh = make_seq_mesh(n_seq)
    out = np.asarray(sequence_sharded_attention(
        mesh, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal))
    ref = _dense(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_ring_attention_grad_flows(rng):
    B, S, N, D = 1, 8, 2, 4
    q = jnp.asarray(rng.normal(size=(B, S, N, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, N, D)).astype(np.float32))
    mesh = make_seq_mesh(2)

    def loss(kk):
        return jnp.sum(sequence_sharded_attention(mesh, q, kk, v) ** 2)

    g = jax.grad(loss)(k)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
