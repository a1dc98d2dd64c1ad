"""Sequence parallelism: causal ring attention over a ``seq`` mesh axis.

The reference handles long inputs by chunking/subsampling only (SURVEY.md §5
"long-context: none"); this is the TPU-native escape hatch for contexts that
outgrow one chip's HBM: shard the sequence over ``seq``, keep q local, and
rotate k/v blocks around the ring with ``jax.lax.ppermute`` while folding
each block into an online-softmax accumulator (the flash-attention recurrence
— running max ``m``, denominator ``l``, weighted accumulator ``acc``).
Communication is n-1 ICI hops of one k/v block each; memory per chip is
O(S/n) activations.

``ring_attention`` is the shard_map-side op; :func:`sequence_sharded_attention`
wraps it end-to-end over a mesh for (B, S, N, D) inputs and verifies against
dense attention in tests/test_sequence_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_seq_mesh(n_seq: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert n_seq <= len(devices)
    return Mesh(np.array(devices[:n_seq]), axis_names=("seq",))


def ring_attention(q, k, v, kv_mask=None, axis_name: str = "seq",
                   sm_scale: float | None = None, causal: bool = True):
    """Inside shard_map: q/k/v (B, S_local, N, D) sharded on S over
    ``axis_name``; returns the local slice of softmax(qk')v.

    Causal masking uses global positions reconstructed from the ring rank.
    ``kv_mask`` (B, S_local) {0,1} marks VALID keys (right-padding support
    for the production LLM path) — invalid keys rotate around the ring
    with their block and never receive weight.
    """
    n = jax.lax.psum(1, axis_name)
    rank = jax.lax.axis_index(axis_name)
    B, Sl, N, D = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(D))

    q_pos = rank * Sl + jnp.arange(Sl)                       # (Sl,)
    qf = (q * scale).astype(jnp.float32)

    m = jnp.full((B, N, Sl), -jnp.inf, jnp.float32)          # running max
    l = jnp.zeros((B, N, Sl), jnp.float32)                   # denominator
    acc = jnp.zeros((B, N, Sl, D), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    kb, vb = k, v
    mb = kv_mask
    for t in range(n):
        src = (rank - t) % n                                 # block owner
        k_pos = src * Sl + jnp.arange(Sl)
        logits = jnp.einsum("bqnd,bknd->bnqk", qf, kb.astype(jnp.float32))
        if causal:
            mask = q_pos[:, None] >= k_pos[None, :]          # (Sl, Sl)
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
        if mb is not None:
            logits = jnp.where(mb[:, None, None, :] > 0, logits, -jnp.inf)
        blk_max = jnp.max(logits, axis=-1)                   # (B, N, Sl)
        new_m = jnp.maximum(m, blk_max)
        # guard fully-masked rows (all -inf)
        safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        p = jnp.exp(logits - safe_m[..., None])
        p = jnp.where(jnp.isfinite(logits), p, 0.0)
        correction = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l = l * correction + p.sum(axis=-1)
        acc = acc * correction[..., None] + jnp.einsum(
            "bnqk,bknd->bnqd", p, vb.astype(jnp.float32))
        m = new_m
        if t < n - 1:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
            if mb is not None:
                mb = jax.lax.ppermute(mb, axis_name, perm)

    out = acc / jnp.maximum(l, 1e-30)[..., None]             # (B, N, Sl, D)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)         # (B, Sl, N, D)


def sequence_sharded_attention(mesh: Mesh, q, k, v, causal: bool = True,
                               sm_scale: float | None = None):
    """(B, S, N, D) host-side entry: shards S over ``seq`` and runs the ring."""
    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        functools.partial(ring_attention, causal=causal, sm_scale=sm_scale),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"), check_rep=False)
    with mesh:
        return fn(q, k, v)


# ---- production wiring (round 4): the LLM layer routes its attention
# through the ring when LLMConfig.seq_axis is set. The mesh is a
# trace-time constant, handed over out-of-band because flax module
# attributes and jit-static config must stay hashable.
_AMBIENT_MESH: list = [None]


def set_ambient_mesh(mesh: Mesh | None) -> None:
    """Install the mesh the next traced ``mesh_ring_attention`` binds to
    (the Runner sets this when its mesh carries a 'seq' axis)."""
    _AMBIENT_MESH[0] = mesh


def get_ambient_mesh() -> Mesh:
    mesh = _AMBIENT_MESH[0]
    assert mesh is not None, \
        "LLMConfig.seq_axis is set but no ambient mesh is installed " \
        "(parallel.sp.set_ambient_mesh)"
    return mesh


def mesh_ring_attention(q, k, v, kv_mask, seq_axis: str = "seq",
                        batch_axis: str = "data"):
    """jit-traceable entry used by the LLM layer: q/k/v (B, S, N, D)
    logically global; shard_map partitions batch over ``batch_axis`` and
    sequence over ``seq_axis`` on the ambient mesh and runs the causal
    masked ring. GSPMD inserts any reshard at the boundary."""
    from jax.experimental.shard_map import shard_map

    mesh = get_ambient_mesh()
    db = batch_axis if batch_axis in mesh.shape else None
    fn = shard_map(
        functools.partial(ring_attention, axis_name=seq_axis, causal=True),
        mesh=mesh,
        in_specs=(P(db, seq_axis), P(db, seq_axis), P(db, seq_axis),
                  P(db, seq_axis)),
        out_specs=P(db, seq_axis), check_rep=False)
    return fn(q, k, v, kv_mask)


def make_dp_sp_mesh(n_seq: int, n_data: int | None = None,
                    devices=None) -> Mesh:
    """(data, seq) mesh for dp x sp training."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        assert len(devices) % n_seq == 0, (len(devices), n_seq)
        n_data = len(devices) // n_seq
    grid = np.array(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(grid, axis_names=("data", "seq"))
