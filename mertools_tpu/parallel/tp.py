"""Tensor-parallel sharding rules for the LLM / MLLM stack.

The reference's only distributed mode is DDP (SURVEY.md §2.9); tensor
parallelism is designed fresh for TPU: attention q/k/v kernels shard their
OUTPUT dim (heads) over the ``model`` mesh axis, the o_proj shards its INPUT
dim, and the MLP shards gate/up outputs + down input — the Megatron layout,
where XLA inserts one psum after o_proj and one after down_proj per layer,
riding ICI.

Usage: build param PartitionSpecs with :func:`llm_param_specs`, then
``jax.device_put(params, NamedSharding(mesh, spec))`` per leaf (or use
in_shardings on the jitted step). Batch axes shard over ``data``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}   # shard out dim
_ROW = {"o_proj", "down_proj"}                                   # shard in dim


def llm_param_specs(params: dict) -> dict:
    """PartitionSpec tree for an :class:`~mertools_tpu.mllm.llm.LLM` param
    tree (and the AffectGPT tree that nests it under 'llm')."""

    def spec(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        if leaf.ndim == 2:
            for i, n in enumerate(names):
                if n in _COL and names[-1] == "kernel":
                    return P(None, "model")
                if n in _ROW and names[-1] == "kernel":
                    return P("model", None)
            if names[-1] == "lora_b" and any(n in _COL for n in names):
                return P(None, "model")
            if names[-1] == "lora_a" and any(n in _ROW for n in names):
                return P("model", None)
            if names[-1] == "embedding" or (names and names[-2:] == ["lm_head", "kernel"]):
                return P(None, None)
        if leaf.ndim == 1 and names[-1] == "bias":
            for n in names:
                if n in _COL:
                    return P("model")
        return P()  # replicate everything else

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params: dict) -> dict:
    specs = llm_param_specs(params)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def logical_batch_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))
