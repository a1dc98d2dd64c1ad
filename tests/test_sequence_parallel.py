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


def test_ring_attention_kv_mask_matches_dense(rng):
    """Round-4 production wiring: right-padded keys masked on the ring
    == dense attention with additive pad bias."""
    import functools

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from mertools_tpu.parallel.sp import make_seq_mesh, ring_attention

    B, S, N, D = 2, 16, 2, 8
    q = rng.normal(size=(B, S, N, D)).astype(np.float32)
    k = rng.normal(size=(B, S, N, D)).astype(np.float32)
    v = rng.normal(size=(B, S, N, D)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, 11:] = 0
    mask[1, 7:] = 0

    mesh = make_seq_mesh(4)
    fn = shard_map(functools.partial(ring_attention, causal=True),
                   mesh=mesh,
                   in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                             P(None, "seq")),
                   out_specs=P(None, "seq"), check_rep=False)
    with mesh:
        out = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(mask)))

    logits = np.einsum("bqnd,bknd->bnqk", q, k) / np.sqrt(D)
    causal = np.arange(S)[:, None] >= np.arange(S)[None, :]
    logits = np.where(causal[None, None], logits, -1e30)
    logits = np.where(mask[:, None, None, :] > 0, logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bnqk,bknd->bnqd", w, v).transpose(0, 2, 1, 3)
    # pad-query rows are irrelevant downstream (lm_loss masks them)
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-5, rtol=1e-4)


def test_llm_seq_axis_matches_dense_forward(rng):
    """LLM forward with seq_axis='seq' over a (data, seq) mesh == the
    plain dense forward, with right padding."""
    import dataclasses

    from mertools_tpu.mllm.llm import LLM, LLMConfig
    from mertools_tpu.parallel import sp

    cfg = LLMConfig.tiny(vocab=64)
    model = LLM(cfg)
    B, S = 2, 16
    emb = rng.normal(size=(B, S, cfg.hidden_size)).astype(np.float32) * 0.3
    mask = np.ones((B, S), np.int32)
    mask[1, 10:] = 0
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 4,
                                                         cfg.hidden_size),
                                                        np.float32))["params"]
    ref = np.asarray(model.apply({"params": params}, jnp.asarray(emb),
                                 attention_mask=jnp.asarray(mask)))

    sp_cfg = dataclasses.replace(cfg, seq_axis="seq")
    sp_model = LLM(sp_cfg)
    mesh = sp.make_dp_sp_mesh(4, n_data=2)
    sp.set_ambient_mesh(mesh)
    try:
        got = np.asarray(sp_model.apply({"params": params},
                                        jnp.asarray(emb),
                                        attention_mask=jnp.asarray(mask)))
    finally:
        sp.set_ambient_mesh(None)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=5e-4, rtol=1e-3)


def test_runner_dp_sp_train_step_matches_plain(rng):
    """Production Runner on a (data=2, seq=4) mesh with seq_axis routed
    attention: one train step's loss == the meshless run's."""
    import dataclasses

    from mertools_tpu.mllm import (AffectGPT, AffectGPTConfig, LLMConfig,
                                   QFormerConfig)
    from mertools_tpu.mllm.runner import Runner, RunnerConfig
    from mertools_tpu.parallel import sp

    def build(seq_axis):
        llm = dataclasses.replace(LLMConfig.tiny(vocab=96, lora_r=2),
                                  seq_axis=seq_axis)
        cfg = AffectGPTConfig(
            llm=llm,
            video_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                        num_layers=1, num_heads=2,
                                        intermediate_size=32),
            audio_qformer=QFormerConfig(num_queries=2, hidden_size=16,
                                        num_layers=1, num_heads=2,
                                        intermediate_size=32),
            video_dim=8, audio_dim=8, max_video_frames=4,
            max_audio_frames=4)
        return AffectGPT(cfg)

    B, S = 4, 24  # 4 AV tokens + text = 24 total, divisible by seq=4
    model = build(None)
    nav = model.num_av_tokens
    ids = rng.integers(1, 96, size=(B, S)).astype(np.int32)
    ids[:, 1: 1 + nav] = 0
    labels = np.full((B, S), -100, np.int64)
    labels[:, 1 + nav:] = rng.integers(0, 96, size=(B, S - 1 - nav))
    batch = {"video_feats": rng.normal(size=(B, 4, 8)).astype(np.float32),
             "audio_feats": rng.normal(size=(B, 4, 8)).astype(np.float32),
             "input_ids": ids,
             "splice_start": np.full(B, 1, np.int32),
             "attention_mask": np.ones((B, S), np.int32),
             "labels": labels}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
    # host copy: the first runner's donated train step deletes its leaves
    params_host = jax.tree_util.tree_map(np.asarray, params)

    rcfg = RunnerConfig(max_epoch=1, iters_per_epoch=1, batch_size=B,
                        warmup_steps=1, output_dir="/tmp/sp_runner_test")
    plain = Runner(rcfg, model, params)
    _, loss_ref = plain._train_step(plain.state, batch)

    sp_model = build("seq")
    mesh = sp.make_dp_sp_mesh(4, n_data=2)
    try:
        r = Runner(rcfg, sp_model, params_host, mesh=mesh)
        _, loss_sp = r._train_step(r.state, r._shard_batch(batch)
                                   if hasattr(r, "_shard_batch") else batch)
    finally:
        sp.set_ambient_mesh(None)
    assert abs(float(loss_sp) - float(loss_ref)) < 1e-4, (
        float(loss_sp), float(loss_ref))
