"""Data-parallel training over a device mesh.

TPU-native replacement for the reference's DDP/NCCL data parallelism
(``my_affectgpt/common/dist_utils.py:54-80``, ``runner_base.py:82-108``):
parameters are replicated, the batch axis is sharded over the ``data`` mesh
axis, and XLA inserts the gradient ``psum`` over ICI during jit — no explicit
all-reduce, sampler, or barrier code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.loop import TrainState, _compute_loss


def make_dp_train_step(mesh: Mesh, use_emo: bool, use_val: bool):
    """Returns step(state, batch, mask, rng) -> (state, loss) with the batch
    sharded over the 'data' axis and the state replicated."""
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def place(state, batch, mask):
        state = jax.device_put(state, repl)
        batch = {k: jax.device_put(v, NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))))
                 for k, v in batch.items()}
        mask = jax.device_put(mask, batch_sh)
        return state, batch, mask

    @partial(jax.jit, donate_argnames=("state",))
    def step(state: TrainState, batch: dict, mask: jnp.ndarray, rng):
        def loss_fn(p):
            return _compute_loss(state.apply_fn, p, batch, mask, rng, True,
                                 use_emo, use_val)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, loss

    return step, place
