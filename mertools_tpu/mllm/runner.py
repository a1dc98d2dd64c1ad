"""MLLM training runner.

Replaces the reference's ``RunnerBase`` (``my_affectgpt/runners/runner_base.py``)
and ``BaseTask.train_epoch`` (``tasks/base_task.py:101-185``):

  * iter-based epochs with gradient accumulation,
  * LinearWarmupCosineLR (``common/optims.py``),
  * trainable-only optimization: the LLM base is frozen via
    ``optax.multi_transform`` masking (the reference freezes encoders and
    saves trainable-only checkpoints — runner_base.py:594-638),
  * data parallelism over the (data, model) mesh — parameters replicated,
    batch sharded, gradient psum inserted by XLA (vs the reference's
    DDP/NCCL),
  * orbax checkpointing of the trainable state (+ best-val copy).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from .affectgpt import AffectGPT, trainable_labels


def warmup_cosine_schedule(init_lr: float, min_lr: float, warmup_steps: int,
                           total_steps: int, warmup_start_lr: float = 1e-6):
    """LinearWarmupCosineLR (reference common/optims.py)."""
    warmup = optax.linear_schedule(warmup_start_lr, init_lr, max(warmup_steps, 1))
    cosine = optax.cosine_decay_schedule(init_lr, max(total_steps - warmup_steps, 1),
                                         alpha=min_lr / init_lr if init_lr else 0.0)
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def make_mllm_optimizer(params, schedule, weight_decay: float = 0.05,
                        labels_fn: Callable = trainable_labels):
    labels = labels_fn(params)
    tx = optax.multi_transform(
        {"train": optax.adamw(schedule, weight_decay=weight_decay),
         "frozen": optax.set_to_zero()},
        labels)
    return tx


class MLLMTrainState(train_state.TrainState):
    pass


@dataclass
class RunnerConfig:
    max_epoch: int = 10
    iters_per_epoch: int = 100
    batch_size: int = 4
    accum_grad_iters: int = 1
    init_lr: float = 1e-4
    min_lr: float = 8e-5
    warmup_steps: int = 100
    weight_decay: float = 0.05
    output_dir: str = "./mllm_output"
    # TPU-native AMP equivalent of the reference's fp16 autocast+GradScaler
    # (runner_base.py:147-155): "bf16" runs the forward/backward in bfloat16
    # against f32 master weights — bf16's exponent range needs no loss
    # scaler. Pair with a model built at Precision.DEFAULT.
    compute_dtype: str | None = None
    # param subtrees to freeze beyond the LLM base (reference frozen_* yaml
    # keys via affectgpt.frozen_components)
    frozen: tuple = ()
    # pipeline microbatches when the mesh has a 'pipe' axis (0 = n_pipe)
    n_micro: int = 0


_SEQ_KEYS = {"input_ids": 0, "attention_mask": 0, "labels": -100}


def _pad_batch_seq(batch: dict, n: int) -> dict:
    """Right-pad the (B, S) text-sequence arrays so S divides the 'seq'
    mesh axis (ring attention shards S; pads carry mask 0 / label -100,
    so they are inert in attention and loss)."""
    S = np.asarray(batch["input_ids"]).shape[1]
    pad = (-S) % n
    if pad == 0:
        return batch
    out = dict(batch)
    for key, fill in _SEQ_KEYS.items():
        if key in out:
            v = np.asarray(out[key])
            out[key] = np.pad(v, ((0, 0), (0, pad)),
                              constant_values=fill)
    return out


class Runner:
    def __init__(self, cfg: RunnerConfig, model: AffectGPT, params: dict,
                 mesh=None):
        self.cfg = cfg
        self.model = model
        total = cfg.max_epoch * cfg.iters_per_epoch
        schedule = warmup_cosine_schedule(cfg.init_lr, cfg.min_lr,
                                          cfg.warmup_steps, total)
        tx = make_mllm_optimizer(
            params, schedule, cfg.weight_decay,
            labels_fn=lambda p: trainable_labels(p, cfg.frozen))
        if cfg.accum_grad_iters > 1:
            tx = optax.MultiSteps(tx, cfg.accum_grad_iters)
        self._pipe = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_model = mesh.shape.get("model", 1)
            n_pipe = mesh.shape.get("pipe", 1)
            if mesh.shape.get("seq", 1) > 1:
                # production sequence parallelism: the LLM layers route
                # attention through the masked causal ring
                # (parallel/sp.mesh_ring_attention); the mesh is bound
                # around each step call below (_with_mesh)
                assert model.cfg.llm.seq_axis == "seq", \
                    "a 'seq' mesh axis needs LLMConfig.seq_axis='seq'"
            if n_pipe > 1:
                # PRODUCTION pipeline parallelism: the LLM stack is split into
                # n_pipe stages whose params are stacked on a leading stage
                # axis and sharded over 'pipe' (each device group holds 1/n_pipe
                # of the transformer — the HBM win pp exists for), run by the
                # differentiable GPipe schedule in parallel/pp. The bridge
                # (encoders/Q-Formers/splice) stays replicated and SPMD over
                # 'data'. Checkpoints remain in the flat layer_i layout (see
                # save/load below) so pp and non-pp runs interoperate.
                from ..parallel.pp import (PipelinedLLM, pipe_param_specs,
                                           split_stage_params)

                n_micro = cfg.n_micro or n_pipe
                assert cfg.batch_size % (
                    n_micro * mesh.shape.get("data", 1)) == 0, (
                    "batch_size must divide n_micro x data-axis",
                    cfg.batch_size, n_micro, mesh.shape)
                stacked, shared = split_stage_params(
                    params["llm"], model.cfg.llm, n_pipe)
                params = {**{k: v for k, v in params.items() if k != "llm"},
                          "llm": {"stacked": stacked, "shared": shared}}
                # rebuild the optimizer: multi_transform's label tree must
                # match the restructured params (trainable_labels is
                # path-name based, so lora leaves stay 'train' when stacked)
                tx = make_mllm_optimizer(
                    params, schedule, cfg.weight_decay,
                    labels_fn=lambda p: trainable_labels(p, cfg.frozen))
                if cfg.accum_grad_iters > 1:
                    tx = optax.MultiSteps(tx, cfg.accum_grad_iters)
                # n_model > 1 composes tp INSIDE the pipeline stages: the
                # stacked stage kernels also shard over 'model' (Megatron
                # layout) and the schedule runs manual-'pipe' only, leaving
                # 'model'/'data' to GSPMD (parallel/pp._call_composed)
                specs = pipe_param_specs(params, n_model)
                params = jax.tree_util.tree_map(
                    lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
                    params, specs)
                self._pipe = PipelinedLLM(model.cfg.llm, mesh,
                                          cfg.n_micro or n_pipe)
                make_state = lambda p: MLLMTrainState.create(
                    apply_fn=model.apply, params=p, tx=tx)
                abstract = jax.eval_shape(make_state, params)
                out_sh = jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s),
                    pipe_param_specs(abstract, n_model))
                self.state = jax.jit(make_state, out_shardings=out_sh)(params)
            elif n_model > 1:
                # PRODUCTION tensor parallelism: shard the LLM's attention/MLP
                # kernels over the 'model' axis (Megatron layout, parallel/tp)
                # and build the optimizer state UNDER JIT so GSPMD propagates
                # the param shardings into adamw's m/v — optimizer memory
                # scales 1/n_model too. (The reference's only distributed
                # production path is the DDP wrap at runner_base.py:100; TP
                # is the TPU-native addition for LLMs too big to replicate.)
                from ..parallel.tp import llm_param_specs

                specs = llm_param_specs(params)
                params = jax.tree_util.tree_map(
                    lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
                    params, specs)
                make_state = lambda p: MLLMTrainState.create(
                    apply_fn=model.apply, params=p, tx=tx)
                # adamw's m/v are zeros_like(params) — constants under jit,
                # so sharding must be REQUESTED, not propagated. The spec
                # rules are path-name based, so they apply to the m/v trees
                # (structurally copies of params) inside the abstract state.
                abstract = jax.eval_shape(make_state, params)
                out_sh = jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s),
                    llm_param_specs(abstract))
                self.state = jax.jit(
                    make_state, out_shardings=out_sh)(params)
            else:
                self.state = MLLMTrainState.create(
                    apply_fn=model.apply, params=params, tx=tx)
                self.state = jax.device_put(
                    self.state, NamedSharding(mesh, P()))
            self._batch_sharding = lambda v: NamedSharding(
                mesh, P("data", *([None] * (np.asarray(v).ndim - 1))))
            self._n_seq = mesh.shape.get("seq", 1)
        else:
            self.state = MLLMTrainState.create(
                apply_fn=model.apply, params=params, tx=tx)
            self._batch_sharding = None
            self._n_seq = 1
        self._history: list[dict] = []

        if cfg.compute_dtype == "bf16":
            def cast_tree(t):
                return jax.tree_util.tree_map(
                    lambda x: (x.astype(jnp.bfloat16)
                               if jnp.issubdtype(x.dtype, jnp.floating)
                               else x), t)
        else:
            cast_tree = lambda t: t

        if self._pipe is not None:
            from .affectgpt import AffectGPT as _AG
            from .llm import lm_loss

            def compute_loss(p, batch):
                p, batch = cast_tree(p), cast_tree(batch)
                # bridge (encoders/Q-Formers/splice) needs only the LLM's
                # embed_tokens — flax resolves params lazily, so the layer
                # params can live in the stacked stage tree instead
                bridge = {k: v for k, v in p.items() if k != "llm"}
                llm_min = {"embed_tokens": p["llm"]["shared"]["embed_tokens"]}
                embeds = model.apply({"params": {**bridge, "llm": llm_min}},
                                     batch, method=_AG.generate_step_embeds)
                logits = self._pipe(p["llm"]["stacked"], p["llm"]["shared"],
                                    embeds, batch.get("attention_mask"))
                return lm_loss(logits, batch["labels"])
        else:
            def compute_loss(p, batch):
                loss, _ = model.apply({"params": cast_tree(p)},
                                      cast_tree(batch))
                return loss

        @partial(jax.jit, donate_argnames=("state",))
        def train_step(state: MLLMTrainState, batch: dict):
            loss, grads = jax.value_and_grad(compute_loss)(state.params, batch)
            return state.apply_gradients(grads=grads), loss

        @jax.jit
        def eval_step(state: MLLMTrainState, batch: dict):
            return compute_loss(state.params, batch)

        if mesh is not None and mesh.shape.get("seq", 1) > 1:
            # bind THIS runner's mesh around every call: tracing happens on
            # the first invocation, and a process-global set only at
            # __init__ would let an interleaved runner trace against the
            # wrong mesh (and leak past this runner's lifetime)
            from ..parallel import sp as _sp

            def _with_mesh(fn):
                def call(*a, **k):
                    prev = _sp._AMBIENT_MESH[0]
                    _sp.set_ambient_mesh(mesh)
                    try:
                        return fn(*a, **k)
                    finally:
                        _sp.set_ambient_mesh(prev)
                return call

            train_step = _with_mesh(train_step)
            eval_step = _with_mesh(eval_step)

        self._train_step = train_step
        self._eval_step = eval_step

    def place(self, batch: dict) -> dict:
        if self._batch_sharding is None:
            return batch
        if self._n_seq > 1:
            batch = _pad_batch_seq(batch, self._n_seq)
        return {k: jax.device_put(np.asarray(v), self._batch_sharding(v))
                for k, v in batch.items()}

    def train_epoch(self, epoch: int, batches: Iterator[dict],
                    log_every: int = 50) -> dict:
        losses = []
        for it in range(self.cfg.iters_per_epoch):
            batch = next(batches)
            self.state, loss = self._train_step(self.state, self.place(batch))
            losses.append(loss)
            if (it + 1) % log_every == 0:
                print(f"epoch {epoch} iter {it + 1}: "
                      f"loss {float(np.mean([float(l) for l in losses[-log_every:]])):.4f}")
        stats = {"epoch": epoch, "train_loss": float(np.mean([float(l) for l in losses]))}
        self._history.append(stats)
        self._log_stats(stats)
        return stats

    def _log_stats(self, stats: dict) -> None:
        """Append jsonl stats to output_dir/log.txt (runner_base.py:685-697)."""
        import json

        os.makedirs(self.cfg.output_dir, exist_ok=True)
        with open(os.path.join(self.cfg.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(stats) + "\n")

    def evaluate(self, batches: list[dict]) -> float:
        losses = [float(self._eval_step(self.state, self.place(b))) for b in batches]
        return float(np.mean(losses))

    # -- checkpointing (orbax): trainable-only like the reference ------------
    def save_checkpoint(self, epoch: int, is_best: bool = False) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(
            self.cfg.output_dir, "checkpoint_best" if is_best else f"checkpoint_{epoch}"))
        params = self._flat_params()
        labels = trainable_labels(params, self.cfg.frozen)
        trainable = jax.tree_util.tree_map(
            lambda p, l: p if l == "train" else None, params, labels)
        # None leaves = frozen params; tree_map's default None handling drops
        # them as empty subtrees (orbax cannot serialize object arrays)
        trainable = jax.tree_util.tree_map(np.asarray, trainable)
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, {"params": trainable, "epoch": epoch}, force=True)
        return path

    def _flat_params(self) -> dict:
        """Live params in the flat ``llm/layer_i`` layout (unstacks the pp
        stage tree when running pipelined) — checkpoint wire format."""
        params = self.state.params
        if self._pipe is not None:
            from ..parallel.pp import merge_stage_params

            flat_llm = merge_stage_params(
                params["llm"]["stacked"], params["llm"]["shared"],
                self.model.cfg.llm, self._pipe.n_stages)
            params = {**{k: v for k, v in params.items() if k != "llm"},
                      "llm": flat_llm}
        return params

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        restored = ocp.PyTreeCheckpointer.restore(ckpt, os.path.abspath(path))
        loaded = restored["params"]

        if self._pipe is not None:
            # checkpoints are flat; restack onto the live pipe layout
            from jax.sharding import NamedSharding
            from ..parallel.pp import (pipe_param_specs, split_stage_params)

            flat = self._flat_params()

            def merge_f(cur, new):
                return cur if new is None else jnp.asarray(new)

            flat = jax.tree_util.tree_map(
                merge_f, flat, loaded,
                is_leaf=lambda x: x is None or not isinstance(x, dict))
            stacked, shared = split_stage_params(
                flat["llm"], self.model.cfg.llm, self._pipe.n_stages)
            params = {**{k: v for k, v in flat.items() if k != "llm"},
                      "llm": {"stacked": stacked, "shared": shared}}
            n_model = self._pipe.mesh.shape.get("model", 1)
            params = jax.tree_util.tree_map(
                lambda p, s: jax.device_put(
                    p, NamedSharding(self._pipe.mesh, s)),
                params, pipe_param_specs(params, n_model))
            self.state = self.state.replace(params=params)
            return restored.get("epoch")

        def merge(cur, new):
            if new is None:
                return cur
            arr = jnp.asarray(new)
            sh = getattr(cur, "sharding", None)
            # keep the live leaf's sharding (TP/replicated) so the donated
            # train_step input keeps a consistent layout after resume
            return jax.device_put(arr, sh) if sh is not None else arr

        params = jax.tree_util.tree_map(
            merge, self.state.params, loaded,
            is_leaf=lambda x: x is None or not isinstance(x, dict))
        self.state = self.state.replace(params=params)
        return restored.get("epoch")


def overlay_trainable(base_params: dict, ckpt_path: str) -> tuple[dict, int]:
    """Overlay a trainable-only ``checkpoint_{epoch}`` (save_checkpoint
    output) onto a full param tree — the reference's strict=False staged
    checkpoint composition (runner_base.py:659-684). Returns (params, epoch).
    """
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
    loaded = restored["params"]

    def merge(cur, new):
        return cur if new is None else jnp.asarray(new)

    params = jax.tree_util.tree_map(
        merge, base_params, loaded,
        is_leaf=lambda x: x is None or not isinstance(x, dict))
    return params, restored.get("epoch")


def epoch_checkpoints(run_dir: str, test_epoch: str | None = None,
                      test_epochs: str | None = None,
                      skip_epoch: int = 1) -> list[tuple[int, str]]:
    """Reference epoch-sweep selection (inference_hybird.py:61-84):
    ``test_epoch=N`` -> that one; ``test_epochs='a-b'`` (+skip) -> the range;
    neither -> the last available epoch."""
    import glob as _glob
    import re

    found = {}
    for p in _glob.glob(os.path.join(run_dir, "checkpoint_*")):
        m = re.fullmatch(r"checkpoint_(\d+)", os.path.basename(p))
        if m:
            found[int(m.group(1))] = p
    if not found:
        raise FileNotFoundError(f"no checkpoint_N dirs under {run_dir}")
    if test_epoch is not None:
        e = int(test_epoch)
        if e not in found:
            raise FileNotFoundError(
                f"checkpoint_{e} not in {run_dir}; available epochs: "
                f"{sorted(found)}")
        return [(e, found[e])]
    if test_epochs:
        # NOTE: like the reference (inference_hybird.py:78-81) the skip
        # filter is anchored at epoch 0 (``e % skip == 0``), not at the
        # range start — '1-5' with skip 2 selects [2, 4].
        a, b = (int(x) for x in test_epochs.split("-"))
        return [(e, found[e]) for e in sorted(found)
                if a <= e <= b and e % max(1, skip_epoch) == 0]
    last = max(found)
    return [(last, found[last])]


# ---------------------------------------------------------------------------
# standalone model persistence (inference entry points restore from here;
# reference composes staged ckpt_1/2/3 with strict=False — runner_base.py:659)
# ---------------------------------------------------------------------------
def save_model(path: str, model: AffectGPT, params: dict) -> str:
    """Full model save: JSON config + orbax param tree."""
    import dataclasses
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    cfg = dataclasses.asdict(model.cfg)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "params"),
              jax.tree_util.tree_map(np.asarray, params), force=True)
    return path


def restore_model(path: str):
    """Returns (AffectGPT, params) from a save_model directory."""
    import json

    import orbax.checkpoint as ocp

    from .affectgpt import AffectGPTConfig
    from .llm import LLMConfig
    from .qformer import QFormerConfig

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    cfg = AffectGPTConfig(
        llm=LLMConfig(**raw["llm"]),
        video_qformer=QFormerConfig(**raw["video_qformer"]),
        audio_qformer=QFormerConfig(**raw["audio_qformer"]),
        multi_qformer=(QFormerConfig(**raw["multi_qformer"])
                       if raw.get("multi_qformer") else None),
        video_dim=raw["video_dim"], audio_dim=raw["audio_dim"],
        max_video_frames=raw["max_video_frames"],
        fusion=raw.get("fusion", "qformer"),
        **{k: raw[k] for k in (
            "image_dim", "max_audio_frames", "multi_max_positions",
            "video_fusion", "audio_fusion", "multi_fusion", "image_fusion",
            "num_video_query_token", "num_audio_query_token",
            "num_multi_query_token", "num_image_query_token",
            "face_or_frame") if k in raw})
    ckpt = ocp.PyTreeCheckpointer()
    params = ckpt.restore(os.path.join(path, "params"))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return AffectGPT(cfg), params
