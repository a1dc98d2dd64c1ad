"""Pipeline parallelism (parallel/pp.py): GPipe microbatch schedule over a
'pipe' mesh axis must reproduce the single-device LLM forward exactly, be
differentiable, and compose with a 'data' axis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mertools_tpu.mllm.llm import LLM, LLMConfig
from mertools_tpu.parallel.pp import (PipelinedLLM, make_pipe_mesh,
                                      pipeline_logits, split_stage_params)


def _cfg(n_layers=4):
    return LLMConfig(vocab_size=48, hidden_size=16, num_layers=n_layers,
                     num_heads=4, num_kv_heads=4, intermediate_size=32)


def _setup(rng, n_layers=4, B=4, S=6):
    cfg = _cfg(n_layers)
    llm = LLM(cfg)
    x = rng.normal(size=(B, S, cfg.hidden_size)).astype(np.float32)
    params = llm.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    return cfg, llm, params, x


def test_split_stage_params_shapes(rng):
    cfg, llm, params, x = _setup(rng)
    stacked, shared = split_stage_params(params, cfg, 2)
    q = stacked["q_proj"]["kernel"]
    assert q.shape == (2, 2, 16, 16)   # (stages, layers/stage, in, out)
    # embed_tokens only exists when init traced the token path
    assert {"norm", "lm_head"} <= set(shared)
    assert not any(k.startswith("layer_") for k in shared)
    # stage 1 layer 0 == original layer_2
    np.testing.assert_array_equal(q[1, 0],
                                  params["layer_2"]["q_proj"]["kernel"])


@pytest.mark.parametrize("n_pipe,n_micro", [(2, 2), (4, 3)])
def test_pipeline_matches_single_device(rng, n_pipe, n_micro):
    B = 2 * n_micro * 3 // 3  # any B divisible by n_micro
    B = n_micro * 2
    cfg, llm, params, x = _setup(rng, n_layers=4 if n_pipe == 2 else 8, B=B)
    ref = np.asarray(llm.apply({"params": params}, jnp.asarray(x)))
    mesh = make_pipe_mesh(n_pipe)
    with mesh:
        out = np.asarray(pipeline_logits(cfg, params, mesh, jnp.asarray(x),
                                         n_microbatches=n_micro))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_pipeline_respects_attention_mask(rng):
    cfg, llm, params, x = _setup(rng, B=4)
    mask = np.ones((4, 6), np.int32)
    mask[:, 4:] = 0
    ref = np.asarray(llm.apply({"params": params}, jnp.asarray(x),
                               attention_mask=jnp.asarray(mask)))
    mesh = make_pipe_mesh(2)
    with mesh:
        out = np.asarray(pipeline_logits(cfg, params, mesh, jnp.asarray(x),
                                         attention_mask=jnp.asarray(mask),
                                         n_microbatches=2))
    # valid positions must match exactly
    np.testing.assert_allclose(out[:, :4], ref[:, :4], atol=2e-4, rtol=1e-4)


def test_pipeline_composes_with_data_axis(rng):
    cfg, llm, params, x = _setup(rng, B=8)
    ref = np.asarray(llm.apply({"params": params}, jnp.asarray(x)))
    mesh = make_pipe_mesh(2, n_data=2)
    with mesh:
        out = np.asarray(pipeline_logits(cfg, params, mesh, jnp.asarray(x),
                                         n_microbatches=2))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_pipeline_differentiable(rng):
    cfg, llm, params, x = _setup(rng, B=4)
    mesh = make_pipe_mesh(2)
    stacked, shared = split_stage_params(params, cfg, 2)
    pipe = PipelinedLLM(cfg, mesh, n_microbatches=2)
    tgt = rng.normal(size=(4, 6, cfg.vocab_size)).astype(np.float32)

    def loss_pp(st):
        with mesh:
            return jnp.mean((pipe(st, shared, jnp.asarray(x)) - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)

    def loss_ref(p):
        return jnp.mean((llm.apply({"params": p}, jnp.asarray(x)) - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    # compare layer_1 (stage 0, slot 1) q_proj grads
    np.testing.assert_allclose(
        np.asarray(g_pp["q_proj"]["kernel"][0, 1]),
        np.asarray(g_ref["layer_1"]["q_proj"]["kernel"]),
        atol=5e-5, rtol=1e-3)
