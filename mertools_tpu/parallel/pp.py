"""GPipe-style pipeline parallelism for the LLM over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (its only distributed mode is DDP,
SURVEY.md §2.9); this is a TPU-native addition for LLM stages that exceed one
chip's HBM. Design: layers are grouped into ``n_stages`` equal stages whose
params are stacked on a leading stage axis and sharded over ``pipe`` — each
device holds one stage. The batch is split into microbatches; a
``shard_map``-wrapped schedule runs ``n_micro + n_stages - 1`` ticks, passing
activations stage-to-stage with ``jax.lax.ppermute`` over ICI. The schedule
is a static Python loop (XLA unrolls it — no data-dependent control flow),
and it is differentiable (ppermute transposes to the reverse permute), so the
same executor serves training.

Embedding / final norm / LM head stay replicated outside the pipeline body
(they are a tiny fraction of params; the transformer stack dominates).

Composition with data parallelism: give the mesh a ``data`` axis and shard
the microbatch axis 1 over it — the stage body is already SPMD over batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mllm.llm import LLM, LLMConfig, _LLMLayer


def make_pipe_mesh(n_pipe: int, n_data: int = 1, n_model: int = 1,
                   devices=None) -> Mesh:
    """('pipe', 'data') mesh, or ('pipe', 'data', 'model') when composing
    pipeline with tensor parallelism (pp x tp x dp)."""
    devices = devices if devices is not None else jax.devices()
    need = n_pipe * n_data * n_model
    assert need <= len(devices), (n_pipe, n_data, n_model, len(devices))
    if n_model > 1:
        grid = np.array(devices[:need]).reshape(n_pipe, n_data, n_model)
        return Mesh(grid, axis_names=("pipe", "data", "model"))
    grid = np.array(devices[:need]).reshape(n_pipe, n_data)
    return Mesh(grid, axis_names=("pipe", "data"))


def split_stage_params(llm_params: dict, cfg: LLMConfig, n_stages: int):
    """LLM param tree -> (stacked_stage_params, shared_params).

    ``stacked``: every layer leaf stacked to (n_stages, layers_per_stage, ...)
    ``shared``: embed_tokens / norm / lm_head (replicated).
    """
    L = cfg.num_layers
    assert L % n_stages == 0, (L, n_stages)
    per = L // n_stages
    stages = []
    for s in range(n_stages):
        group = [llm_params[f"layer_{s * per + i}"] for i in range(per)]
        stages.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *group))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)
    shared = {k: v for k, v in llm_params.items()
              if not k.startswith("layer_")}
    return stacked, shared


class PipelinedLLM:
    """Pipeline-parallel forward (and grad) for :class:`mertools_tpu.mllm.
    llm.LLM` over a ('pipe'[, 'data']) mesh."""

    def __init__(self, cfg: LLMConfig, mesh: Mesh, n_microbatches: int):
        assert "pipe" in mesh.axis_names
        self.cfg = cfg
        self.mesh = mesh
        self.n_stages = mesh.shape["pipe"]
        self.n_micro = n_microbatches
        assert cfg.num_layers % self.n_stages == 0
        self.layers_per_stage = cfg.num_layers // self.n_stages
        self._layer = _LLMLayer(cfg)
        self._llm = LLM(cfg)

    # ---------------------------------------------------------------- body
    def _stage_fn(self, stage_params, x, positions, bias):
        """Apply this device's layers_per_stage layers (leading axis)."""
        for li in range(self.layers_per_stage):
            p_li = jax.tree_util.tree_map(lambda a, li=li: a[li], stage_params)
            x = self._layer.apply({"params": p_li}, x, positions, bias)
        return x

    # ------------------------------------------------------------- forward
    def __call__(self, stacked, shared, inputs_embeds, attention_mask=None):
        """inputs_embeds: (B, S, H) with B % n_micro == 0 -> logits (B, S, V)."""
        from jax.experimental.shard_map import shard_map

        c = self.cfg
        B, S, H = inputs_embeds.shape
        assert B % self.n_micro == 0, (B, self.n_micro)
        mb = B // self.n_micro
        positions = jnp.broadcast_to(jnp.arange(S), (mb, S))
        causal = jnp.where(jnp.arange(S)[:, None] >= jnp.arange(S)[None, :],
                           0.0, -1e30)
        bias = jnp.broadcast_to(causal[None, None], (mb, 1, S, S))
        if attention_mask is not None:
            am = attention_mask.reshape(self.n_micro, mb, S)
            # fold pad masking per microbatch into the bias by staging it
            # through the schedule alongside x would double comms; instead
            # pad positions carry a large negative bias built per microbatch
            # outside and passed stacked:
            pad = jnp.where(am[:, :, None, None, :] > 0, 0.0, -1e30)
            bias = bias[None] + pad                        # (m, mb, 1, S, S)
        else:
            bias = jnp.broadcast_to(bias[None],
                                    (self.n_micro, mb, 1, S, S))

        micro_x = inputs_embeds.reshape(self.n_micro, mb, S, H)

        if "model" in self.mesh.axis_names:
            # pp x tp (x dp) composition: shard_map is MANUAL only over
            # 'pipe' (the schedule's ppermute/psum); 'data' and 'model'
            # stay AUTO, so GSPMD partitions the stage body's matmuls over
            # 'model' (inserting the Megatron psums after o_proj/down_proj)
            # and the batch over 'data' — validated vs the single-device
            # forward and grads in test_pp_runner.
            return self._call_composed(stacked, shared, micro_x, positions,
                                       bias, B, S, H)

        data_axis = "data" if "data" in self.mesh.axis_names else None
        mspec = (P(None, "data", None, None) if data_axis
                 else P(None, None, None, None))
        bspec = (P(None, "data", None, None, None) if data_axis
                 else P(None, None, None, None, None))
        pspec = P("data", None) if data_axis else P(None, None)

        def body(sp, mx, pos, bs):
            # bias is per-microbatch: wrap the schedule to slice it per tick.
            n, m = self.n_stages, self.n_micro
            stage = jax.lax.axis_index("pipe")
            sp = jax.tree_util.tree_map(lambda a: a[0], sp)
            mbs, Ss, Hs = mx.shape[1:]
            buf = jnp.zeros((mbs, Ss, Hs), mx.dtype)
            fwd_perm = [(i, (i + 1) % n) for i in range(n)]
            outs = []
            bufb = bs[0]
            for t in range(m + n - 1):
                feed = mx[min(t, m - 1)]
                feedb = bs[min(t, m - 1)]
                inp = jnp.where(stage == 0, feed, buf)
                inb = jnp.where(stage == 0, feedb, bufb)
                h = self._stage_fn(sp, inp, pos, inb)
                outs.append(h)
                buf = jax.lax.ppermute(h, "pipe", fwd_perm)
                bufb = jax.lax.ppermute(inb, "pipe", fwd_perm)
            out = jnp.stack(outs[n - 1:])
            out = jnp.where(stage == n - 1, out, jnp.zeros_like(out))
            return jax.lax.psum(out, "pipe")

        sharded_body = shard_map(
            body, mesh=self.mesh,
            in_specs=(P("pipe"), mspec, pspec, bspec),
            out_specs=mspec, check_rep=False)
        out = sharded_body(stacked, micro_x, positions, bias)
        return self._head(out.reshape(B, S, H), shared)

    def _call_composed(self, stacked, shared, micro_x, positions, bias,
                       B, S, H):
        """pp x tp (x dp): manual 'pipe' schedule, auto 'data'/'model'."""
        from jax.sharding import NamedSharding

        n, m = self.n_stages, self.n_micro

        def body(sp, mx, pos, bs):
            stage = jax.lax.axis_index("pipe")
            sp = jax.tree_util.tree_map(lambda a: a[0], sp)
            buf = jnp.zeros(mx.shape[1:], mx.dtype)
            fwd_perm = [(i, (i + 1) % n) for i in range(n)]
            outs = []
            bufb = bs[0]
            for t in range(m + n - 1):
                inp = jnp.where(stage == 0, mx[min(t, m - 1)], buf)
                inb = jnp.where(stage == 0, bs[min(t, m - 1)], bufb)
                h = self._stage_fn(sp, inp, pos, inb)
                outs.append(h)
                buf = jax.lax.ppermute(h, "pipe", fwd_perm)
                bufb = jax.lax.ppermute(inb, "pipe", fwd_perm)
            out = jnp.stack(outs[n - 1:])
            out = jnp.where(stage == n - 1, out, jnp.zeros_like(out))
            return jax.lax.psum(out, "pipe")

        # keep the batch data-sharded through the auto axes
        micro_x = jax.lax.with_sharding_constraint(
            micro_x, NamedSharding(self.mesh, P(None, "data")))
        bias = jax.lax.with_sharding_constraint(
            bias, NamedSharding(self.mesh, P(None, "data")))
        sharded_body = jax.shard_map(
            body, mesh=self.mesh, in_specs=(P("pipe"), P(), P(), P()),
            out_specs=P(), axis_names={"pipe"}, check_vma=False)
        out = sharded_body(stacked, micro_x, positions, bias)
        return self._head(out.reshape(B, S, H), shared)

    def _head(self, x, shared):
        """Replicated head path (LLM.norm + lm_head)."""
        c = self.cfg
        norm_scale = shared["norm"]["weight"]
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        x = (x * jax.lax.rsqrt(var + c.rms_norm_eps)).astype(x.dtype)
        x = x * norm_scale
        return jnp.einsum("bsh,hv->bsv", x, shared["lm_head"]["kernel"],
                          precision=jax.lax.Precision.HIGHEST)


def merge_stage_params(stacked: dict, shared: dict, cfg: LLMConfig,
                       n_stages: int) -> dict:
    """Inverse of :func:`split_stage_params`: stacked stage tree back to the
    flat ``layer_i`` LLM layout (checkpoints are saved in the flat layout so
    they stay interchangeable between pp and non-pp runs)."""
    per = cfg.num_layers // n_stages
    out = dict(shared)
    for s in range(n_stages):
        for i in range(per):
            out[f"layer_{s * per + i}"] = jax.tree_util.tree_map(
                lambda a, s=s, i=i: a[s, i], stacked)
    return out


def pipe_param_specs(params: dict, n_model: int = 1) -> dict:
    """PartitionSpec tree for an AffectGPT param tree whose ``llm`` subtree
    has been restructured to ``{stacked, shared}``: stacked stage leaves
    shard their leading (stage) axis over ``pipe``; everything else
    replicates. With ``n_model > 1`` (pp x tp composition) the stacked
    kernels ALSO shard over ``model`` in the Megatron layout
    (parallel/tp): column kernels (q/k/v/gate/up) on their output dim, row
    kernels (o_proj/down_proj) on their input dim, LoRA factors to match.
    Path-name based, so it also applies to the optimizer's m/v trees
    (structural copies of params)."""
    from .tp import _COL, _ROW

    def spec(path, leaf):
        names = [getattr(k, "key", str(k)) for k in path]
        nd = getattr(leaf, "ndim", 0)
        if "stacked" not in names or nd < 1:
            return P()
        tail = [None] * (nd - 1)
        if n_model > 1:
            # stacked leaves are (stage, layers_per_stage, *param_dims)
            col = any(n in _COL for n in names)
            row = any(n in _ROW for n in names)
            last = names[-1]
            if last == "kernel" and nd == 4:
                if col:
                    tail[-1] = "model"      # (s, l, in, OUT)
                elif row:
                    tail[-2] = "model"      # (s, l, IN, out)
            elif last == "lora_b" and col and nd == 4:
                tail[-1] = "model"
            elif last == "lora_a" and row and nd == 4:
                tail[-2] = "model"
            elif last == "bias" and col and nd == 3:
                tail[-1] = "model"
        return P("pipe", *tail)

    return jax.tree_util.tree_map_with_path(spec, params)


def pipeline_logits(cfg: LLMConfig, llm_params: dict, mesh: Mesh,
                    inputs_embeds, attention_mask=None,
                    n_microbatches: int = 2):
    """One-call helper: split params, run the pipelined forward."""
    stacked, shared = split_stage_params(llm_params, cfg, mesh.shape["pipe"])
    pipe = PipelinedLLM(cfg, mesh, n_microbatches)
    return pipe(stacked, shared, inputs_embeds, attention_mask)
